"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — exact brute-force top-k: the correctness
  baseline.  Cosine is a ``zip_with`` + ``aggregate`` builtin tree
  (JVM, codegen) — no UDF.  The corpus side is broadcast when small;
  at 10^12 scale brute force is O(Q×N) and exists only to measure the
  approximate paths.
- :func:`lsh_bucket` / :func:`ann_topk_lsh` — random-hyperplane LSH:
  sign-bit sketches from deterministic hash-derived hyperplanes
  (portable, seedable, no stored model).  Queries probe their own
  bucket (+ optional multi-probe neighbors at Hamming distance 1);
  candidates are re-ranked by exact cosine.  The join is an equi-join
  on bucket id — shuffle keyed by bucket, AQE handles hot buckets.
Embedding dim and hyperplane count are compile-time constants, so all
loops unroll into the expression tree.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    broadcast_corpus: bool = True,
) -> DataFrame:
    """(query_id, neighbor_id, cos, rank) — exact brute force.
    Deterministic tie-break on neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    if broadcast_corpus:
        c = F.broadcast(c)
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# hash-derived random hyperplanes
# ---------------------------------------------------------------------------


def _plane_weight(plane: int, i: int, seed: str) -> float:
    """Deterministic ±1 weight for hyperplane ``plane``, dim ``i`` —
    derived from a hash so executors and tests agree with no stored
    model.  (Python-side constant: baked into the plan as a literal.)"""
    import hashlib

    h = hashlib.md5(f"{seed}:{plane}:{i}".encode()).digest()[0]
    return 1.0 if h % 2 == 0 else -1.0


def lsh_bucket(vec: Column, dim: int, n_planes: int, seed: str = "lsh") -> Column:
    """Integer bucket id: bit p = sign(v · h_p) with h_p ∈ {±1}^dim."""
    bucket = F.lit(0)
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(_plane_weight(p, i, seed)) for i in range(dim)]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def _neighbor_buckets(bucket: Column, n_planes: int) -> Column:
    """Multi-probe: the bucket itself plus all Hamming-1 neighbors."""
    return F.array(bucket, *[bucket.bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)])


def ann_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 8,
    multiprobe: bool = True,
    seed: str = "lsh",
) -> DataFrame:
    """Approximate top-k: the standard multi-table LSH construction —
    ``n_tables`` independent sign-sketches of ``n_planes`` bits; a
    pair is a candidate if it collides in ANY table (union recall:
    1−(1−r)^T).  Optional Hamming-1 multiprobe on the query side.
    Candidates are re-ranked by exact cosine.  The join key is
    (table, bucket) — one shuffle; candidate volume ≈ rows²/2^planes
    per table, tuned via n_planes."""
    def sketch(df: DataFrame, out_id: str) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        buckets = F.array(*[
            lsh_bucket(v, dim, n_planes, f"{seed}:{t}") for t in range(n_tables)
        ])
        return df.select(
            F.col(id_col).alias(out_id),
            v.alias("_v"),
            F.posexplode(buckets).alias("tbl", "bucket"),
        )

    c = sketch(corpus, "neighbor_id").withColumnRenamed("_v", "cv")
    q = sketch(queries, "query_id").withColumnRenamed("_v", "qv")
    if multiprobe:
        q = q.select(
            "query_id", "qv", "tbl",
            F.explode(_neighbor_buckets(F.col("bucket"), n_planes)).alias("bucket"),
        )
    cand = (
        q.join(c, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .distinct()
    )
    scored = cand.select(
        "query_id", "neighbor_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def recall_at_k(exact: DataFrame, approx: DataFrame, k: int) -> float:
    """Fraction of exact top-k pairs recovered by the approximate
    result (driver-side scalar)."""
    e = exact.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    a = approx.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    hit = e.join(a, ["query_id", "neighbor_id"], "left_semi").count()
    total = e.count()
    return hit / total if total else math.nan
