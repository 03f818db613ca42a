"""Diagnose scaling: time sub-phases of the validation job at the
given core count (pinned externally with taskset).  Prints one JSON
line per phase."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("SCALE_ROWS", "10000000"))
CORES = int(os.environ.get("DIAG_CORES", "32"))
DATA = os.path.join(os.environ.get("SCALE_DATA_DIR", "/tmp/fences_scale_data"), f"files_{ROWS}")


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CORES}]")
        .appName("diag")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from fences_spark.flagship import files_ruleset
    from fences_spark.synth import files_table

    if not os.path.exists(os.path.join(DATA, "_SUCCESS")):
        files_table(spark, ROWS).repartition(128).write.mode("overwrite").parquet(DATA)

    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def timed(label, fn, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(json.dumps({"cores": CORES, "phase": label, "secs": round(best, 3)}))

    fl = spark.read.parquet(DATA)
    timed("scan_count", lambda: fl.count())
    timed("scan_content_len", lambda: fl.select(F.sum(F.length("content"))).collect())
    timed("scan_sha256", lambda: fl.select(F.sum(F.length(F.sha2(F.col("content"), 256)))).collect())

    def ruleset_only():
        res = files_ruleset().apply(fl)
        res.df.select(F.sum((~F.col("row_valid")).cast("long"))).collect()

    timed("ruleset", ruleset_only)

    def full():
        res = files_ruleset().apply(fl)
        annotated = res.df.withColumn("content_sha256", F.sha2(F.col("content"), 256))
        bucket = F.pmod(F.xxhash64("repo", "path"), F.lit(64)).cast("int")
        agg = annotated.groupBy(bucket.alias("bucket")).agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((~F.col("row_valid")).cast("long")).alias("rows_invalid"),
            F.max(F.length("content_sha256")).alias("sha_len"),
        )
        agg.agg(F.sum("rows"), F.sum("rows_invalid")).collect()

    timed("full_pipeline", full)
    spark.stop()


if __name__ == "__main__":
    main()
