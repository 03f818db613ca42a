"""Self-check harness mimicking the driver's correctness gate: run
each __spark_entry__.queries() entry on Spark and its oracle_sql() on
DuckDB at sf0.01, compare row count, column-name set, and an
order-insensitive value comparison (columns sorted by name, rows
sorted)."""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:]) if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main() -> int:
    import __spark_entry__ as e
    from fences_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name}: rows-only check, {len(srows)} rows")
            continue
        dres = con.execute(oracles[name])
        dcols = [d[0] for d in dres.description]
        drows = dres.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = canon(srows, scols) == canon(drows, dcols) if ok_cols else False
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"{name}: {status} cols={ok_cols} count={ok_count}({len(srows)}/{len(drows)}) vals={ok_vals}")
            if ok_cols and not ok_vals:
                a, b = canon(srows, scols), canon(drows, dcols)
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diff:
                    print("   spark:", x)
                    print("   duck :", y)
        else:
            print(f"{name}: OK ({len(srows)} rows)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
