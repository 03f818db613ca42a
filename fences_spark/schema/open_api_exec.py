"""Live-request execution of OpenAPI request rows against a real HTTP
server — the behavior the reference reaches through its generator
(fences/open_api/generate.py:58-84 builds concrete requests;
examples/opcua_nodeset/main.py:73-106 fires them at a running service
and tallies the accept/reject confusion).

Spark-first shape: the request table is a DataFrame; the HTTP calls
happen ON THE EXECUTORS via Arrow-batched ``mapInPandas`` (stdlib
``urllib``, one Python batch per Arrow chunk — the sanctioned slow
path, since no builtin can open a socket), so a million-request replay
spreads across the cluster and the driver never proxies a byte.  The
confusion between the engine's verdict (``row_valid`` from
:class:`~fences_spark.schema.open_api.OpenApiValidator`) and the
server's actual acceptance is ONE distributed aggregation emitting the
reference's four-counter vocabulary (valid_accepted / valid_rejected /
invalid_accepted / invalid_rejected — core/util.py ConfusionMatrix),
consumable by :mod:`fences_spark.report`.

Scale notes: requests within one Arrow batch are issued sequentially
(HTTP keep-alive per executor worker is the OS's business); throughput
scales with partitions — ``df.repartition(n)`` is the concurrency
knob.  A dead server surfaces as status 0 + error text per row, never
a task failure, so one bad endpoint cannot kill a replay stage.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_EXEC_COLS = "status int, resp_body string, error string"


def execute_requests(
    df: DataFrame,
    base_url: str,
    *,
    method_col: str = "method",
    path_col: str = "path",
    query_col: str = "query",
    body_col: str = "body",
    timeout_s: float = 10.0,
) -> DataFrame:
    """Fire each request row at ``base_url`` and append
    ``status`` (HTTP status; 0 on transport error), ``resp_body``
    and ``error``.  Column order of the input is preserved."""
    base = base_url.rstrip("/")
    have_query = query_col in df.columns
    have_body = body_col in df.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + _EXEC_COLS

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.error
        import urllib.parse
        import urllib.request

        for pdf in batches:
            statuses, bodies, errors = [], [], []
            for _, row in pdf.iterrows():
                url = base + str(row[path_col])
                q = row[query_col] if have_query else None
                if q:
                    url += "?" + urllib.parse.urlencode(dict(q))
                data = None
                headers = {}
                b = row[body_col] if have_body else None
                if b is not None and not (isinstance(b, float) and pd.isna(b)):
                    data = str(b).encode()
                    headers["Content-Type"] = "application/json"
                req = urllib.request.Request(
                    url, data=data, headers=headers,
                    method=str(row[method_col]).upper(),
                )
                try:
                    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                        statuses.append(int(resp.status))
                        bodies.append(resp.read().decode("utf-8", "replace"))
                        errors.append(None)
                except urllib.error.HTTPError as e:  # non-2xx IS a response
                    statuses.append(int(e.code))
                    bodies.append(e.read().decode("utf-8", "replace"))
                    errors.append(None)
                except Exception as e:  # transport failure: row-level, not task-level
                    statuses.append(0)
                    bodies.append(None)
                    errors.append(f"{type(e).__name__}: {e}")
            out = pdf.copy()
            out["status"] = pd.array(statuses, dtype="Int32")
            out["resp_body"] = bodies
            out["error"] = errors
            yield out

    return df.mapInPandas(op, schema=out_schema)


def server_confusion(
    executed: DataFrame,
    *,
    valid_col: str = "row_valid",
    status_col: str = "status",
    accept_below: int = 400,
) -> DataFrame:
    """Engine verdict × server acceptance as the reference's four
    confusion counters (accepted = 2xx/3xx status): one distributed
    aggregation, no collect.  Feed the single row to
    ``fences_spark.report.ConfusionCounts.from_row``."""
    v = F.col(valid_col)
    a = (F.col(status_col) >= 200) & (F.col(status_col) < accept_below)
    return executed.agg(
        F.sum((v & a).cast("long")).alias("valid_accepted"),
        F.sum((v & ~a).cast("long")).alias("valid_rejected"),
        F.sum((~v & a).cast("long")).alias("invalid_accepted"),
        F.sum((~v & ~a).cast("long")).alias("invalid_rejected"),
    )


def replay_report(
    requests: DataFrame,
    validator,
    base_url: str,
    **exec_kwargs,
) -> tuple[DataFrame, DataFrame]:
    """Convenience composition: validate → execute → confusion.
    Returns (executed_with_verdicts, confusion_1row)."""
    validated = validator.validate(requests)
    executed = execute_requests(validated, base_url, **exec_kwargs)
    return executed, server_confusion(executed)
