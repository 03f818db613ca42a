"""Per-column statistics — the cluster analog of the reference's
ConfusionMatrix-style hand-rolled partial aggregation
(/root/reference/fences/core/util.py:114-137), generalized to the
north-rule profile (BASELINE.json:6): null rate, distinct count via
HyperLogLog sketches, min/max/quantiles via compact quantile
sketches.

One ``groupBy().agg()`` pass over the table: every statistic is a
map-side-combinable aggregate, so the only shuffle is #partitions ×
one partial-agg row — no per-row data moves.  ``approx_count_distinct``
is Spark's HLL++ (relativeSD tunable); ``percentile_approx`` is
Spark's GK/KLL-family quantile sketch with a tunable accuracy knob —
the same sketch-partial/merge design a hand-rolled t-digest would
have, already fused into whole-stage codegen.  An ``applyInPandas``
t-digest would add an Arrow hop for no accuracy win at these
accuracies, so we deliberately stay builtin (SURVEY.md §2.B
aggregations row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

_NUMERIC = (T.DoubleType, T.FloatType, T.LongType, T.IntegerType, T.ShortType,
            T.ByteType, T.DecimalType)


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    hll_rsd: float = 0.01,
    quantile_accuracy: int = 10_000,
    exact: bool = False,
) -> DataFrame:
    """Single-pass profile.  Output: one row per column with
    (column, n_rows, n_null, null_rate, n_distinct, min, max, q_*).

    ``exact=True`` swaps HLL → countDistinct and sketch → exact
    percentile (for oracle comparison at small scale; never use at
    10^12 rows)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        dtype = df.schema[c].dataType
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nnull"))
        if exact:
            aggs.append(F.countDistinct(c).alias(f"{c}__nd"))
        else:
            aggs.append(F.approx_count_distinct(c, rsd=hll_rsd).alias(f"{c}__nd"))
        if isinstance(dtype, _NUMERIC):
            aggs.append(F.min(F.col(c).cast("double")).alias(f"{c}__min"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"{c}__max"))
            for q in quantiles:
                if exact:
                    e = F.expr(f"percentile({c}, {q})").cast("double")
                else:
                    e = F.percentile_approx(
                        F.col(c).cast("double"), F.lit(q), F.lit(quantile_accuracy)
                    ).cast("double")
                aggs.append(e.alias(f"{c}__q{int(q * 100)}"))
        else:
            aggs.append(F.min(F.length(F.col(c).cast("string")).cast("double")).alias(f"{c}__min"))
            aggs.append(F.max(F.length(F.col(c).cast("string")).cast("double")).alias(f"{c}__max"))
            for q in quantiles:
                aggs.append(F.lit(None).cast("double").alias(f"{c}__q{int(q * 100)}"))

    wide = df.groupBy().agg(*aggs)

    # unpivot to one row per column (driver-sized: #cols rows)
    qcols = [f"q{int(q * 100)}" for q in quantiles]
    parts = []
    for c in cols:
        fields = ", ".join(
            [f"'{c}' AS column", "n_rows", f"{c}__nnull AS n_null",
             f"CAST({c}__nnull AS DOUBLE)/n_rows AS null_rate",
             f"{c}__nd AS n_distinct", f"{c}__min AS min_value", f"{c}__max AS max_value"]
            + [f"{c}__q{qq[1:]} AS {qq}" for qq in qcols]
        )
        parts.append(f"STRUCT({fields})")
    return wide.selectExpr(f"explode(array({', '.join(parts)})) AS s").select("s.*")


def robust_outliers(
    df: DataFrame, column: str, *, k: float = 3.0, exact: bool = True
) -> DataFrame:
    """Median/MAD outlier gate for a numeric column: a value is an
    outlier when |x − median| > k · MAD (the robust z-score — immune
    to the outliers themselves, unlike mean/stddev).  Returns ONE row:
    (median, mad, lo, hi, n_rows, n_outliers, outlier_rate 6-dp).

    Execution shape: two global aggregates (median pass, then MAD of
    the residuals against the broadcast median) + one counting pass —
    exact ``percentile``/``median`` for the oracle; at 100 TB swap
    ``exact=False`` for the `percentile_approx` sketch (the gate is a
    heuristic; sketch error is immaterial)."""
    from fences_spark.operators import round6

    med_fn = (lambda c: F.percentile(c, F.lit(0.5))) if exact else (
        lambda c: F.percentile_approx(c, F.lit(0.5)))
    x = F.col(column).cast("double")
    med = df.agg(med_fn(x).alias("median"))
    resid = df.crossJoin(F.broadcast(med)).select(
        x.alias("x"), "median", F.abs(x - F.col("median")).alias("r")
    )
    mad = resid.groupBy("median").agg(med_fn(F.col("r")).alias("mad"))
    return (
        resid.join(F.broadcast(mad), "median")
        .select(
            "median", "mad", "x",
            (F.col("median") - k * F.col("mad")).alias("lo"),
            (F.col("median") + k * F.col("mad")).alias("hi"),
        )
        .groupBy("median", "mad", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(((F.col("x") < F.col("lo")) | (F.col("x") > F.col("hi"))).cast("long")).alias("n_outliers"),
        )
        .select(
            "median", "mad", "lo", "hi", "n_rows", "n_outliers",
            round6(F.col("n_outliers") / F.col("n_rows")).alias("outlier_rate"),
        )
    )
