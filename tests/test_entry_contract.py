"""Pin the __spark_entry__ driver contract.

The driver's correctness gate compares ``queries()`` against
``oracle_sql()`` per key; a key present in ``queries()`` but missing
from ``oracle_sql()`` silently downgrades that entry to a weaker
rows-only check.  These tests make that downgrade impossible to do by
accident: the rows-only set is pinned explicitly, every oracle SQL
must parse AND execute on DuckDB over the real testdata views, and
the surface types are checked without starting Spark (fast — the
value-level Spark-vs-DuckDB comparison lives in
scripts/check_oracle.py and the driver's own sweep).
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

# Entries deliberately WITHOUT an oracle (documented next to ORACLE_SQL
# in fences_spark/entry_queries.py): non-SQL-expressible generation /
# decode surfaces and the scale smoke.  Growing this set is a
# deliberate act — add the key here AND document why there.
ROWS_ONLY = {
    "generate_confusion_fixtures",
    "generate_cover_fixtures",
    "multimodal_real_decode",
    "validate_files_200k",
}

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF_DIR = os.environ.get("SPARK_GRAFT_CONTRACT_SF", "/root/testdata/sf0.001")


def test_surface_shape() -> None:
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    assert all(isinstance(k, str) and callable(v) for k, v in qs.items())
    assert all(
        isinstance(k, str) and isinstance(v, str) and v.strip() for k, v in oracles.items()
    )


def test_every_query_is_oracle_gated_or_documented_rows_only() -> None:
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert oracles <= qs, f"orphan oracles without a query: {sorted(oracles - qs)}"
    assert qs - oracles == ROWS_ONLY, (
        "queries()/oracle_sql() key drift — a new entry without an oracle "
        "silently weakens the driver gate to rows-only; either add the "
        f"oracle SQL or pin the key in ROWS_ONLY: {sorted((qs - oracles) ^ ROWS_ONLY)}"
    )
    assert ROWS_ONLY <= qs, f"stale ROWS_ONLY keys: {sorted(ROWS_ONLY - qs)}"


def test_bench_headline_keys_exist() -> None:
    """bench.py silently skips a HEADLINE name missing from QUERIES
    (`if fn is None: continue`) — a rename would quietly shrink the
    driver's BENCH suite instead of failing."""
    import bench

    missing = set(bench.HEADLINE) - set(entrymod.queries())
    assert not missing, f"bench HEADLINE names not in queries(): {sorted(missing)}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE)), "duplicate HEADLINE entries"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata not present")
def test_every_oracle_sql_executes_on_duckdb() -> None:
    """Each oracle must run on DuckDB over the registered views — a
    typo'd column or dialect slip should fail here in milliseconds,
    not in the driver's round sweep.  Values are compared elsewhere
    (scripts/check_oracle.py at sf0.01); this executes at sf0.001 so
    even the O(N^2) exact-baseline oracles stay sub-second."""
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        assert os.path.exists(path), f"missing driver table {path}"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    bad: list[str] = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            res = con.execute(sql)
            cols = [d[0] for d in res.description]
            res.fetchall()
            assert cols, name
            assert len(cols) == len(set(cols)), f"{name}: duplicate result columns {cols}"
        except Exception as exc:  # noqa: BLE001 - collect all failures
            bad.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not bad, "oracle SQL failed on DuckDB:\n" + "\n".join(bad)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata not present")
def test_full_oracle_sweep_values(spark) -> None:
    """The FULL Spark-vs-DuckDB value comparison over every oracle-gated
    entry at sf0.001, every pytest run.  The driver's per-round
    CORRECTNESS file samples only ~50 of the entries and the sample
    rotates (r02 silently dropped simhash_docs/embedding_vector_stats),
    so the in-suite sweep is what guarantees 73/73 — no reliance on
    driver sampling.  The heavier sf0.01 sweep stays available as
    `python scripts/check_oracle.py`."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from check_oracle import sweep

    failures = sweep(spark, SF_DIR, verbose=False)
    assert not failures, f"{len(failures)} entries diverge:\n" + "\n\n".join(failures)
