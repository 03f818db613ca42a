"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship validation over sf0.001; ``queries()`` /
``oracle_sql()`` expose each implemented operator over the driver
testdata tables, checked against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: compile the testdata ruleset (typed builtin tier),
    validate documents at sf0.001, return per-verdict rule summary."""
    from fences_spark.flagship import flagship_entry

    return flagship_entry(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fences_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from fences_spark.entry_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
