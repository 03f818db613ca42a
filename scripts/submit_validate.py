"""spark-submit entry for the scaling bench (north rule: the full run
launches via ``spark-submit --py-files`` at two cluster sizes).

Phase 0 (untimed, once): materialize the deterministic files table to
parquet at --data-dir if absent — both cluster sizes then read the
byte-identical input.
Timed phase: parquet scan → flagship RuleSet → sha256 row invariant →
per-bucket verdict aggregation (the validation hot path).  Prints one
JSON line with rows/s.

Master/parallelism come from spark-submit (--master local[N]); the
job is identical at every size — the scaling-efficiency precondition.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--data-dir", default="/tmp/fences_scale_data")
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    ap.add_argument("--label", default="run")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--generate-only", action="store_true",
                    help="materialize the input table and exit (untimed phase)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.appName(f"fences_spark_scale_{args.label}")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # one split per ~54MB gen file (each is a single parquet row
        # group — smaller split targets only create empty splits that
        # add scheduling noise at the task tail)
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # defaultParallelism undercounts in local-cluster mode if read
    # before the executors register — derive from the master URL
    master = spark.sparkContext.master
    m = re.match(r"local\[(\d+)\]", master)
    mc = re.match(r"local-cluster\[(\d+),(\d+),\d+\]", master)
    if m:
        cores = int(m.group(1))
    elif mc:
        cores = int(mc.group(1)) * int(mc.group(2))
    else:
        cores = spark.sparkContext.defaultParallelism

    from fences_spark.flagship import files_ruleset
    from fences_spark.synth import files_table

    data = os.path.join(args.data_dir, f"files_{args.rows}")
    if not os.path.exists(os.path.join(data, "_SUCCESS")):
        # untimed, deterministic; 128 output files so any core count
        # gets balanced input splits
        # 512 output files (~22MB each at 100M rows): 16 full waves at
        # 32 cores, 64 at 8 — fine-grained enough that the straggler
        # tail (content lengths are log-spread) stays well under one
        # wave at either level
        files_table(spark, args.rows).repartition(512).write.mode("overwrite").parquet(data)
    if args.generate_only:
        print(json.dumps({"label": args.label, "generated": args.rows}))
        spark.stop()
        return

    def build_final():
        # Fresh plan per run: reusing one DataFrame object across
        # repeats lets Spark reuse the previous run's shuffle map
        # outputs, so only the final reduce would re-execute.  A fresh
        # lineage forces the whole scan→validate→aggregate pipeline;
        # codegen stays warm via Janino's cache (same query shape).
        fl = spark.read.parquet(data)
        res = files_ruleset().apply(fl)
        annotated = res.df.withColumn("content_sha256", F.sha2(F.col("content"), 256))
        bucket = F.pmod(F.xxhash64("repo", "path"), F.lit(64)).cast("int")
        agg = annotated.groupBy(bucket.alias("bucket")).agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((~F.col("row_valid")).cast("long")).alias("rows_invalid"),
            F.max(F.length("content_sha256")).alias("sha_len"),
        )
        return agg.agg(F.sum("rows").alias("rows"), F.sum("rows_invalid").alias("invalid"))

    # warm-up (JIT/codegen/heap commit), excluded from timing: run the
    # exact pipeline once end-to-end
    build_final().collect()

    def run_once() -> tuple[float, int, int]:
        t0 = time.time()
        stats = build_final().collect()[0]
        return time.time() - t0, int(stats["rows"]), int(stats["invalid"])

    best = None
    for _ in range(args.repeats):
        secs, n_rows, n_inv = run_once()
        if best is None or secs < best[0]:
            best = (secs, n_rows, n_inv)
    secs, n_rows, n_inv = best
    print(
        json.dumps(
            {
                "label": args.label,
                "cores": cores,
                "rows": n_rows,
                "invalid": n_inv,
                "secs": round(secs, 3),
                "rows_per_sec": round(n_rows / secs, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
