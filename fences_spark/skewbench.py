"""Skew-stress harness: the same skew-sensitive jobs on a uniform
and a deliberately skewed input of identical size, reporting the
wall-clock ratio per job.

The north rule calls out explicit skew handling (AQE skew-join,
salted uniqueness dedup).  At 100 TB a single hot key — one repo
owning half the corpus, one license-boilerplate document duplicated
across 30% of rows — is the difference between a balanced stage and
one reducer running for hours.  This harness is the regression gate
for those paths: every job below is implemented in its skew-bounded
form, and the criterion is wall(skewed) <= 2x wall(uniform) on the
same row count (a naive plan is 5-20x here and degrades linearly
with scale; the bounded plans stay flat).

Skew profile of the synthetic (n rows, deterministic):
  * ``repo-hot`` owns 50% of rows (hot aggregation / join key);
  * one (repo, path, commit) triple owns 10% of rows (hot
    uniqueness key — the salted-dedup stress);
  * 30% of rows share one boilerplate content (hot fingerprint).

Jobs (identical plans at both inputs, AQE + skew-join on):
  1. salted exact dedup on (repo, path, commit)
     (operators/integrity.dedup_exact — two-phase min_by, reducer
     bounded at rows/salt_buckets);
  2. duplicate-key counting groupBy (map-side partial aggregation
     absorbs the hot key before the shuffle);
  3. per-repo stats via sort-merge join (broadcast disabled by plan
     hint — AQE splits the hot partition: skewJoin handling);
  4. per-repo aggregation over the hot grouping key;
  5. exact content-fingerprint dedup groups (hot md5 key);
  6. per-stratum quality quota top-k (sampling.quality_quota_sample
     — two-phase salted window, stratum = the 50%-hot repo);
  7. per-stratum exact quality percentile
     (sampling.quality_percentiles — bucket-offset rank, same hot
     stratum).  Texts get a per-row suffix so quality varies: these
     two rows stress STRATUM skew; identical-text tie skew is the
     exact-dedup rows' job (dedup runs before mixture in the
     pipeline, run/pipeline.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


def uniform_files(spark: SparkSession, n: int) -> DataFrame:
    """Balanced synthetic: keys spread evenly, every content unique."""
    i = F.col("id")
    return spark.range(n).select(
        F.concat(F.lit("repo-"), F.pmod(F.xxhash64(i, F.lit(1)), F.lit(997)).cast("string")).alias("repo"),
        F.concat(F.lit("src/f"), F.floor(i / 4).cast("string"), F.lit(".py")).alias("path"),
        F.lower(F.hex(F.xxhash64(i, F.lit(2)))).alias("commit"),
        F.concat(F.lit("def f():\n    return "), i.cast("string")).alias("content"),
    )


def skewed_files(spark: SparkSession, n: int) -> DataFrame:
    """Same schema and row count, pathological key distribution."""
    i = F.col("id")
    hot_repo = F.pmod(i, F.lit(2)) == 0          # 50% one repo
    hot_key = F.pmod(i, F.lit(10)) == 1          # 10% one (repo,path,commit)
    hot_content = F.pmod(i, F.lit(10)) < 3       # 30% one boilerplate
    return spark.range(n).select(
        F.when(hot_key, F.lit("repo-hot"))
        .when(hot_repo, F.lit("repo-hot"))
        .otherwise(
            F.concat(F.lit("repo-"), F.pmod(F.xxhash64(i, F.lit(1)), F.lit(997)).cast("string"))
        ).alias("repo"),
        F.when(hot_key, F.lit("README.md"))
        .otherwise(F.concat(F.lit("src/f"), F.floor(i / 4).cast("string"), F.lit(".py")))
        .alias("path"),
        F.when(hot_key, F.lit("c0ffee")).otherwise(F.lower(F.hex(F.xxhash64(i, F.lit(2)))))
        .alias("commit"),
        F.when(
            hot_content,
            F.lit("Permission is hereby granted, free of charge, to any person"),
        )
        .otherwise(F.concat(F.lit("def f():\n    return "), i.cast("string")))
        .alias("content"),
    )


def _job_salted_dedup(df: DataFrame) -> int:
    from fences_spark.operators.integrity import dedup_exact

    return dedup_exact(df, ["repo", "path", "commit"]).count()


def _job_dup_key_count(df: DataFrame) -> int:
    return (
        df.groupBy("repo", "path", "commit")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )


def _job_skew_join(df: DataFrame, dim: DataFrame) -> int:
    # per-repo dim treated as beyond the broadcast threshold: force
    # sort-merge so AQE's skew-join split is the mechanism under test.
    # The dim is a MATERIALIZED table (not an inline aggregate):
    # OptimizeSkewedJoin only fires on SMJ(Sort(Shuffle), Sort(Shuffle))
    # — an aggregate between shuffle and sort defeats the pattern, the
    # same reason a production pipeline stages its dims.
    joined = df.hint("merge").join(dim.hint("merge"), "repo")
    return joined.filter(F.length("content") > F.col("repo_rows") % 7).count()


def _job_hot_groupby(df: DataFrame) -> int:
    return (
        df.groupBy("repo")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.length("content")).alias("mean_len"),
            F.countDistinct("commit").alias("n_commits"),
        )
        .count()
    )


def _job_content_dedup_groups(df: DataFrame) -> int:
    fp = F.md5(F.col("content"))
    return (
        df.groupBy(fp.alias("fp"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("path").alias("exemplar"))
        .filter(F.col("n") > 1)
        .count()
    )


def _stratum_docs(df: DataFrame) -> DataFrame:
    # unique id + per-row text suffix: the axis under stress here is
    # the 50%-hot stratum, not identical-text ties (those belong to
    # the dedup rows — dedup precedes mixture in the pipeline)
    rid = F.monotonically_increasing_id().cast("string")
    return df.select(
        rid.alias("doc"),
        F.col("repo"),
        F.concat_ws(" ", F.col("content"), rid).alias("text"),
    )


def _job_quota_topk(df: DataFrame) -> int:
    from fences_spark.operators.sampling import quality_quota_sample

    return quality_quota_sample(_stratum_docs(df), "doc", "text", "repo", quota=50).count()


def _job_stratum_percentile(df: DataFrame) -> int:
    from fences_spark.operators.sampling import quality_percentiles

    return quality_percentiles(_stratum_docs(df), "doc", "text", "repo").count()



def _job_token_surprisal(df: DataFrame) -> int:
    """Corpus-relative unigram surprisal (operators.text) — the token
    join is THE Zipf-skew stress: hot tokens (the 30% boilerplate's
    words, every template keyword) land whole-corpus-sized partitions
    on the vocab join unless partial aggregation + AQE absorb them.
    Text = commit + content so the uniform side's vocabulary is
    per-row-unique-heavy while the skewed side concentrates mass in a
    handful of boilerplate tokens."""
    from fences_spark.operators.text import token_surprisal_documents

    # deterministic 25% sample: the surprisal chain (explode + vocab
    # agg + token join + re-agg) is the harness's heaviest job and the
    # skew RATIO is scale-free — the sample keeps the whole harness
    # inside the driver bench budget while the hot tokens stay hot
    docs = df.sample(0.25, seed=7).select(
        F.monotonically_increasing_id().alias("doc"),
        F.concat_ws(" ", F.col("commit"), F.col("content")).alias("text"),
    )
    out = token_surprisal_documents(docs, "doc", "text")
    # count(mean_surprisal), not count(*): the aggregate's doc_id key is
    # provably unique, so Catalyst ELIMINATES the left join under a bare
    # count(*) and the job would time a metadata scan (observed 0.19s
    # for 8M docs — nothing ran)
    return int(out.selectExpr("count(mean_surprisal)").first()[0])


JOBS = [
    ("salted_dedup", lambda df, dim: _job_salted_dedup(df)),
    ("dup_key_count", lambda df, dim: _job_dup_key_count(df)),
    ("skew_merge_join", _job_skew_join),
    ("hot_groupby", lambda df, dim: _job_hot_groupby(df)),
    ("content_dedup_groups", lambda df, dim: _job_content_dedup_groups(df)),
    ("quota_topk", lambda df, dim: _job_quota_topk(df)),
    ("stratum_percentile", lambda df, dim: _job_stratum_percentile(df)),
    ("token_surprisal", lambda df, dim: _job_token_surprisal(df)),
]


@dataclass
class SkewResult:
    rows: int
    ops: dict  # name -> {"uniform": s, "skewed": s, "ratio": r}
    skew_split_fired: bool = False

    @property
    def max_ratio(self) -> float:
        return max(v["ratio"] for v in self.ops.values())

    def as_dict(self) -> dict:
        return {
            "rows": self.rows,
            "ops": self.ops,
            "skew_split_fired": self.skew_split_fired,
            "max_ratio": round(self.max_ratio, 3),
            "target_ratio": 2.0,
            "pass": self.max_ratio <= 2.0,
        }


def skew_split_fired(spark: SparkSession, df: DataFrame, dim: DataFrame) -> bool:
    """Execute the merge join once and read the final adaptive plan:
    True iff AQE actually split the hot partition
    (``SortMergeJoin(skew=true)``) — the evidence, not the conf."""
    out = df.hint("merge").join(dim.hint("merge"), "repo").filter(
        F.length("content") > F.col("repo_rows") % 7
    )
    cnt = out.groupBy().count()
    cnt.collect()
    plan = cnt._jdf.queryExecution().executedPlan().toString()
    return "skew=true" in plan


def run_skew_stress(
    spark: SparkSession,
    n: int = 2_000_000,
    repeats: int = 2,
    skew_threshold: str = "4MB",
    advisory_size: str = "2MB",
    skew_factor: str = "5.0",
) -> SkewResult:
    """Materialize both inputs (untimed), then time each job on each.

    Inputs are written to parquet first so both sides pay identical,
    realistic scan costs (a skew test over an in-lineage range()
    would measure codegen of the generator, not shuffle balance)."""
    import os
    import tempfile

    # AQE's skew split triggers at skewedPartitionThresholdInBytes
    # (default 256MB) — sized for production shuffles.  The harness
    # input is MBs, so scale the trigger down proportionally; this
    # emulates at-scale behavior (where the hot partition is far past
    # 256MB), it does not relax anything.  Restored after the run.
    saved = {}
    scaled = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": skew_threshold,
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": advisory_size,
        # at production scale the hot partition dwarfs the median in
        # compressed bytes too; at harness scale lz4 crushes the
        # repeated hot rows, hiding part of the row-count skew — the
        # factor is part of the scaled-down trigger, not a relaxation
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": skew_factor,
    }
    for k, v in scaled.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)

    try:
        base = tempfile.mkdtemp(prefix="fences_skew_")
        paths, dim_paths = {}, {}
        for label, gen in (("uniform", uniform_files), ("skewed", skewed_files)):
            p = os.path.join(base, label)
            gen(spark, n).write.mode("overwrite").parquet(p)
            paths[label] = p
            dp = os.path.join(base, label + "_dim")
            (
                spark.read.parquet(p)
                .groupBy("repo")
                .agg(F.count(F.lit(1)).alias("repo_rows"))
                .write.mode("overwrite")
                .parquet(dp)
            )
            dim_paths[label] = dp

        ops: dict[str, dict] = {}
        for name, job in JOBS:
            walls = {}
            for label in ("uniform", "skewed"):
                df = spark.read.parquet(paths[label])
                dim = spark.read.parquet(dim_paths[label])
                job(df, dim)  # warm-up: JIT/codegen + page cache
                best = float("inf")
                for _ in range(repeats):
                    df = spark.read.parquet(paths[label])  # fresh lineage
                    dim = spark.read.parquet(dim_paths[label])
                    t0 = time.time()
                    job(df, dim)
                    best = min(best, time.time() - t0)
                walls[label] = round(best, 3)
            ops[name] = {
                "uniform": walls["uniform"],
                "skewed": walls["skewed"],
                "ratio": round(walls["skewed"] / max(walls["uniform"], 1e-9), 3),
            }
        fired = skew_split_fired(
            spark, spark.read.parquet(paths["skewed"]), spark.read.parquet(dim_paths["skewed"])
        )
    finally:
        # restore even when a timed job throws — leaking the MB-scale
        # AQE thresholds would poison every later query in the session
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return SkewResult(rows=n, ops=ops, skew_split_fired=fired)
