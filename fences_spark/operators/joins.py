"""Temporal join operators Spark's DataFrame API lacks: as-of join
(most recent right row at or before each left timestamp).  No
reference precedent (the reference joins nothing — SURVEY.md §2.B
joins row); named explicitly by the task brief as a custom-operator
target.

Execution shape — the point is avoiding both the naive theta-join
(``l.ts >= r.ts`` explodes to a cross product per key before the
argmax) and a per-key Python loop: tag and UNION the two inputs,
ONE hash shuffle on the join keys, sort each partition by
``(ts, tag, payload)``, and carry the last non-null right payload
forward with ``last(ignorenulls=True)`` over the running window —
O(n log n) per key, all codegen (Window + UnionExec), no UDF.
Equal-timestamp ties: right rows sort before left rows at the same
``ts`` (tag 0 < 1, "at or before" inclusive semantics), and among
several right rows at the same ``(keys, ts)`` the MAXIMUM payload
struct wins (payload is the tertiary sort key) — deterministic
cross-engine.  Skew note: one hyperactive key serializes that key's
sort; pre-split hot keys by time-bucketing both sides (bounded
staleness at bucket edges) when a key exceeds partition budget.
"""

from __future__ import annotations

import functools
import operator

import re

from pyspark.sql import Column, DataFrame, Window, functions as F

# strict "<amount> <unit>" shape for funnel(max_span=...) — the only
# thing ever spliced into an INTERVAL literal
_INTERVAL_RE = re.compile(
    r"\d+\s+(?:second|minute|hour|day|week|month|year)s?", re.IGNORECASE
)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    prefix: str = "r_",
    tolerance: Column | None = None,
) -> DataFrame:
    """Backward as-of join: every ``left`` row annotated with the
    ``value_cols`` of the ``right`` row sharing ``keys`` that has the
    greatest ``right_ts`` <= ``left_ts`` (NULLs when no such row).
    The matched timestamp lands in ``{prefix}{right_ts}``.

    ``tolerance``: optional max staleness (an INTERVAL Column, e.g.
    ``F.expr("INTERVAL 7 DAYS")``) — matches older than
    ``left_ts - tolerance`` become NULL."""
    payload = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c) for c in value_cols]
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        payload.alias("_payload"),
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
    )
    r = r.withColumn("_row", F.lit(None).cast(l.schema["_row"].dataType))

    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_tag", "_payload")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = F.last("_payload", ignorenulls=True).over(w)
    out = (
        l.unionByName(r.select(*l.columns))
        .withColumn("_m", matched)
        .filter(F.col("_tag") == 1)
    )
    if tolerance is not None:
        out = out.withColumn(
            "_m",
            F.when(F.col("_m._ts") >= F.col("_t") - tolerance, F.col("_m")),
        )
    return out.select(
        *[F.col(f"_row.{c}").alias(c) for c in left.columns],
        F.col("_m._ts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in value_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    keys: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    value_cols: list[str],
    prefix: str = "i_",
    bucket_seconds: int = 60,
) -> DataFrame:
    """Interval-containment join: one output row per (point, interval)
    pair sharing ``keys`` with ``start_ts <= point_ts <= end_ts``.

    Execution shape — Spark would otherwise plan the range predicate
    as a per-key theta join (every point × every interval of the key
    before filtering): intervals are exploded onto the fixed
    ``bucket_seconds`` time grid they overlap, points land on their
    single grid cell, and the join becomes a plain EQUI-join on
    (keys, bucket) + an exact containment filter — each true pair
    meets in exactly one bucket (the point's), so no dedup pass is
    needed.  Cost knob: interval rows duplicate ~(length/bucket) ×,
    candidate pairs shrink by the same factor — size the bucket near
    the median interval length.  All codegen: sequence + explode +
    shuffled hash join, no UDF.

    Intervals with ``start_ts > end_ts`` are dropped (a descending
    ``sequence`` would otherwise fabricate buckets).
    """
    wus = int(bucket_seconds) * 1_000_000

    def _micros(c: Column) -> Column:
        # unix_micros rejects TIMESTAMP_NTZ (parquet default); the
        # session zone is pinned UTC, so the cast is wall-clock identity
        return F.unix_micros(c.cast("timestamp"))

    iv = (
        intervals.filter(F.col(start_ts) <= F.col(end_ts))
        .select(
            *[F.col(k).alias(f"_k_{k}") for k in keys],
            F.col(start_ts).alias("_start"),
            F.col(end_ts).alias("_end"),
            *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
        )
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(_micros(F.col("_start")) / wus),
                    F.floor(_micros(F.col("_end")) / wus),
                )
            ),
        )
    )
    pt = points.withColumn("_b", F.floor(_micros(F.col(point_ts)) / wus))
    cond = (pt["_b"] == iv["_b"])
    for k in keys:
        cond = cond & (pt[k] == iv[f"_k_{k}"])
    return (
        pt.join(iv, cond)
        .filter(
            (F.col(point_ts) >= F.col("_start")) & (F.col(point_ts) <= F.col("_end"))
        )
        .select(
            *points.columns,
            F.col("_start").alias(f"{prefix}{start_ts}"),
            F.col("_end").alias(f"{prefix}{end_ts}"),
            *[F.col(f"{prefix}{c}") for c in value_cols],
        )
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_span: str | None = None,
) -> DataFrame:
    """Sequential funnel analysis: per user, the earliest time each
    ``steps[i]`` event occurs AT OR AFTER the user's step-``i−1``
    time (the classic ordered-conversion query analytics engines ship
    as a primitive; Spark has no builtin).  Returns one row per user
    with ``t_<step>`` timestamps (NULL once the chain breaks) and
    ``depth`` = number of steps completed; ``max_span`` (e.g.
    ``'1 hour'``) additionally requires the LAST completed step to
    fall within that interval of the first.

    Execution shape: one conditional-min aggregation per step, each a
    map-side-combined groupBy on the user key; after the first, every
    aggregation and join is co-partitioned on that key, so AQE
    coalesces the chain into len(steps) shuffle-free stages after ONE
    user-key shuffle.  No collect_list of per-user event arrays — the
    state per user is len(steps) timestamps, not the event history,
    so a power user with millions of events costs the same as anyone
    else (skew-immune by construction).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    if max_span is not None and not _INTERVAL_RE.fullmatch(max_span.strip()):
        # max_span is interpolated into an INTERVAL literal; reject
        # anything but "<amount> <unit>" up front so a malformed or
        # untrusted value is a clear ValueError, not a SQL parse error
        # (or a smuggled expression)
        raise ValueError(
            f"max_span must look like '30 minutes' / '1 hour', got {max_span!r}"
        )
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    ).filter(F.col("etype").isin(steps))

    out = ev.filter(F.col("etype") == steps[0]).groupBy("user_id").agg(
        F.min("ts").alias(f"t_{steps[0]}")
    )
    for prev, step in zip(steps, steps[1:]):
        nxt = (
            ev.filter(F.col("etype") == step)
            .join(out.select("user_id", f"t_{prev}"), "user_id")
            .filter(F.col("ts") >= F.col(f"t_{prev}"))
            .groupBy("user_id")
            .agg(F.min("ts").alias(f"t_{step}"))
        )
        out = out.join(nxt, "user_id", "left")

    depth = functools.reduce(
        operator.add,
        [F.col(f"t_{s}").isNotNull().cast("int") for s in steps],
    )
    out = out.withColumn("depth", depth)
    if max_span is not None:
        last_t = F.coalesce(*[F.col(f"t_{s}") for s in reversed(steps)])
        within = last_t <= F.col(f"t_{steps[0]}") + F.expr(f"INTERVAL {max_span}")
        out = out.withColumn("within_span", F.coalesce(within, F.lit(False)))
    return out.orderBy("user_id")


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of
    their FIRST event; each (cohort, offset) row counts the cohort's
    users active ``offset`` periods later — the classic retention
    triangle (analytics-engine primitive Spark lacks).

    Returns (cohort, offset, n_active, cohort_size, retention) with
    retention 6-dp rounded, ordered by (cohort, offset); offset 0 rows
    have retention 1.0 by construction.

    Execution shape: first-seen is ONE min() aggregation on the user
    key; activity is a distinct (user, period) projection joined back
    co-partitioned on the user key (AQE reuses the exchange); the
    final (cohort, offset) count is map-side combined.  Two shuffles
    total — user key, then the tiny cohort-offset key.
    """
    from fences_spark.operators import round6

    if period not in ("day", "week", "month"):
        raise ValueError(f"period must be day/week/month, got {period!r}")
    per = F.date_trunc(period, F.col(ts_col)).cast("date")
    ev = events.select(F.col(user_col).alias("user_id"), per.alias("p"))
    first = ev.groupBy("user_id").agg(F.min("p").alias("cohort"))
    active = ev.distinct().join(first, "user_id")
    if period == "month":
        # month lengths vary; measure the offset in whole months
        offset = F.months_between(F.col("p"), F.col("cohort")).cast("int")
    else:
        days = {"week": 7, "day": 1}[period]
        offset = (F.datediff(F.col("p"), F.col("cohort")) / days).cast("int")
    counts = active.groupBy("cohort", offset.alias("offset")).agg(
        F.count_distinct("user_id").alias("n_active")
    )
    sizes = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        counts.join(sizes, "cohort")
        .select(
            "cohort", "offset", "n_active", "cohort_size",
            round6(F.col("n_active") / F.col("cohort_size")).alias("retention"),
        )
        .orderBy("cohort", "offset")
    )
