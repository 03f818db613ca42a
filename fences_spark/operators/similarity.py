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

from fences_spark.operators import round6


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
    # norms are per-row, not per-pair: compute them once before the
    # O(Q×N) join (same expression shape as cosine(), so the result is
    # bit-identical — only the evaluation count changes)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    if broadcast_corpus:
        c = F.broadcast(c)
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            round6(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
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


def _dbl(x: float) -> str:
    """Exact SQL double literal: shortest-repr decimal parses back to
    the identical IEEE double in both Spark and DuckDB."""
    return f"CAST('{x!r}' AS DOUBLE)"


def lsh_bucket(vec_sql: str, dim: int, n_planes: int, seed: str = "lsh") -> Column:
    """Integer bucket id: bit p = sign(v · h_p) with h_p ∈ {±1}^dim.

    Takes the vector as a SQL expression string and builds ONE
    F.expr — the Column-by-Column construction it replaces issued a
    py4j round-trip per literal (n_planes × dim of them), which
    dominated wall time: plan BUILD was 2-4x the plan EXECUTION at
    sf0.1.  Arithmetic (zip_with product, left-fold sum) is unchanged,
    so buckets stay bit-identical."""
    return F.expr(lsh_bucket_sql(vec_sql, dim, n_planes, seed))


def lsh_bucket_sql(vec_sql: str, dim: int, n_planes: int, seed: str = "lsh") -> str:
    terms = []
    for p in range(n_planes):
        ws = ",".join(f"{_plane_weight(p, i, seed):.1f}D" for i in range(dim))
        proj = (
            f"aggregate(zip_with({vec_sql}, array({ws}), (x, w) -> x * w), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def lsh_all_buckets_sql(
    vec_sql: str, dim: int, n_planes: int, n_tables: int, seed: str
) -> str:
    """All ``n_tables`` bucket ids in ONE expression: the per-table
    per-plane ±1 weights sit in a single nested array literal and the
    sign-bit fold runs through higher-order functions.  Buckets are
    BIT-IDENTICAL to ``lsh_bucket_sql`` per table (same left-fold dot
    product, same ``> 0`` sign, same bit weights — pinned by
    tests/test_training_ops.py::test_lsh_matrix_form_bit_identical);
    what changes is plan size: one array literal instead of
    tables × planes separate aggregate subtrees, which cuts Catalyst
    parse+analysis from seconds to milliseconds at 8×8×64."""
    w = "array(" + ",".join(
        "array(" + ",".join(
            "array(" + ",".join(
                f"{_plane_weight(p, i, f'{seed}:{t}'):.1f}D" for i in range(dim)
            ) + ")"
            for p in range(n_planes)
        ) + ")"
        for t in range(n_tables)
    ) + ")"
    return (
        f"transform({w}, wt -> aggregate("
        f"zip_with(wt, sequence(0, {n_planes - 1}), "
        f"(wp, p) -> CASE WHEN aggregate(zip_with({vec_sql}, wp, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) > 0 "
        f"THEN shiftleft(1, p) ELSE 0 END), "
        f"0, (acc, v) -> acc + v))"
    )


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
        vec_sql = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
        buckets = F.expr(
            "array("
            + ",".join(lsh_bucket_sql(vec_sql, dim, n_planes, f"{seed}:{t}") for t in range(n_tables))
            + ")"
        )
        return df.select(
            F.col(id_col).alias(out_id),
            v.alias("_v"),
            # per-row norm before the explode/join: never per-pair
            norm(v).alias("_n"),
            F.posexplode(buckets).alias("tbl", "bucket"),
        )

    c = (sketch(corpus, "neighbor_id")
         .withColumnRenamed("_v", "cv").withColumnRenamed("_n", "cn"))
    q = (sketch(queries, "query_id")
         .withColumnRenamed("_v", "qv").withColumnRenamed("_n", "qn"))
    if multiprobe:
        q = q.select(
            "query_id", "qv", "qn", "tbl",
            F.explode(_neighbor_buckets(F.col("bucket"), n_planes)).alias("bucket"),
        )
    cand = q.join(c, ["tbl", "bucket"]).filter(F.col("query_id") != F.col("neighbor_id"))
    # score BEFORE the dedup: a multi-table collision duplicate costs
    # one extra 64-FLOP dot product, while deduping first would key the
    # shuffle on four 64-dim double arrays instead of three scalars
    scored = cand.select(
        "query_id",
        "neighbor_id",
        round6(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
    ).distinct()
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int | None = None,
    use_lsh_prefilter: bool = True,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: str = "neardup",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos) with
    cos ≥ threshold and id_a < id_b.

    Default (``use_lsh_prefilter=True``) is the 100 TB scale path:
    candidates are restricted to sign-sketch collisions (any of
    ``n_tables`` tables), turning the cross join into an equi-join on
    (table, bucket); the re-rank by exact cosine keeps precision 1.0
    (recall < 1 is the standard LSH trade-off, measured against exact
    mode by tests and scripts/recall_report.py).  ``dim`` is inferred
    with a one-row probe when omitted (array columns carry no length
    in the schema); pass it explicitly to keep plan construction
    job-free.

    ``use_lsh_prefilter=False`` is the exact O(N²/2) self-join —
    correct at any threshold, the recall baseline, and fine when one
    side broadcasts — but a cartesian at scale: never the default."""
    if use_lsh_prefilter:
        if dim is None:
            probe = df.select(F.size(F.col(vec_col)).alias("d")).first()
            if probe is None or probe["d"] is None:
                raise ValueError(
                    "dim could not be inferred (empty input); pass dim="
                )
            dim = int(probe["d"])

        # sketch ONCE and self-join the aliased relation: both join
        # sides share the identical child plan, so the (tbl, bucket)-
        # keyed shuffle exchange is computed once and REUSED
        # (ReusedExchange) — the two-subtree version paid the sketch
        # projection (tables × planes dot products per row) twice
        v = F.col(vec_col).cast("array<double>")
        sk = df.select(
            F.col(id_col).alias("sid"),
            v.alias("sv"),
            norm(v).alias("sn"),
            F.posexplode(
                F.expr(lsh_all_buckets_sql(
                    f"CAST({vec_col} AS ARRAY<DOUBLE>)", dim, n_planes, n_tables, seed
                ))
            ).alias("tbl", "bucket"),
        )
        # sort-merge, not broadcast: the sketch relation is the FULL
        # corpus exploded n_tables× — at scale it can never broadcast,
        # and even at bench scale the merge join wins 2× because the
        # sorted (tbl, bucket) runs pair up without re-probing the
        # 64-dim array payloads (AQE would pick broadcast from the
        # tiny-input size estimate alone)
        cand = (
            sk.alias("a").hint("merge")
            .join(sk.alias("b"), ["tbl", "bucket"])
            .filter(F.col("a.sid") < F.col("b.sid"))
        )
        # score before dedup: scalar-keyed distinct, not array-keyed
        return (
            cand.select(
                F.col("a.sid").alias("id_a"),
                F.col("b.sid").alias("id_b"),
                round6(
                    dot(F.col("a.sv"), F.col("b.sv")) / (F.col("a.sn") * F.col("b.sn"))
                ).alias("cos"),
            )
            .distinct()
            .filter(F.col("cos") >= threshold)
        )
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("va")
    ).withColumn("na", norm(F.col("va")))
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("vb")
    ).withColumn("nb", norm(F.col("vb")))
    cand = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    return (
        cand.select(
            "id_a",
            "id_b",
            round6(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + per-cell search
# ---------------------------------------------------------------------------


def ivf_fit_centroids(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 7,
    max_iter: int = 10,
) -> list[list[float]]:
    """Train the coarse quantizer with Spark MLlib KMeans (distributed
    Lloyd iterations; the model is tiny — n_cells × dim doubles — and
    is returned driver-side to be baked into the search plan as
    literals, i.e. broadcast-by-plan)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(train)
    return [list(map(float, c)) for c in model.clusterCenters()]


def ivf_fit_centroids_det(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_cells: int = 8,
    iters: int = 1,
    decimals: int = 6,
) -> list[list[float]]:
    """Deterministic Lloyd fit, cross-engine reproducible: seed
    centroids are the vectors with the ``n_cells`` smallest ids (cell
    id = rank in that order); each iteration assigns every vector to
    its nearest centroid (squared L2, ties to the lowest cell) and
    recenters to the element-wise mean ROUNDED to ``decimals`` —
    the rounding pins the model across engines whose float summation
    order differs (Spark partial aggregation vs DuckDB), so the SQL
    oracle re-derives the identical quantizer from the same table.
    A cell that loses all members keeps its previous centroid.  The
    model is tiny (n_cells × dim) and collected driver-side per
    iteration — the standard k-means fit shape; all per-row work is
    distributed Column algebra."""
    v = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("e")
    )
    seed_rows = v.orderBy("vid").limit(n_cells).collect()
    cents = [list(map(float, r["e"])) for r in seed_rows]
    for _ in range(iters):
        assigned = v.withColumn("cell", _nearest_cells("e", cents, 1)[0])
        means = (
            assigned.groupBy("cell")
            .agg(*[
                F.round(F.avg(F.col("e").getItem(i)), decimals).alias(f"m{i}")
                for i in range(dim)
            ])
            .collect()
        )
        by_cell = {r["cell"]: [float(r[f"m{i}"]) for i in range(dim)] for r in means}
        cents = [by_cell.get(c, cents[c]) for c in range(n_cells)]
    return cents


def _nearest_cells(vec_sql: str, centroids: list[list[float]], nprobe: int) -> Column:
    """Array of the ``nprobe`` nearest centroid ids (squared-L2),
    fully unrolled into the expression tree — no UDF.  Built as one
    SQL string for the same plan-build-cost reason as lsh_bucket
    (centroid literals: n_cells × dim py4j calls otherwise); the
    array_sort on (d, cell) structs keeps ties resolved to the lowest
    cell id, and _dbl literals reparse to bit-identical doubles."""
    dists = ",".join(
        f"aggregate(zip_with({vec_sql}, array({','.join(_dbl(x) for x in c)}), "
        f"(a, b) -> (a - b) * (a - b)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        for c in centroids
    )
    return F.expr(
        f"slice(transform(array_sort(transform(array({dists}), "
        f"(d, i) -> named_struct('d', d, 'cell', i))), s -> s.cell), 1, {nprobe})"
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 3,
) -> DataFrame:
    """IVF search: corpus rows are assigned to their nearest cell
    (partitioning the index); each query probes its ``nprobe`` nearest
    cells and re-ranks candidates by exact cosine.  The join is an
    equi-join on cell id — shuffle keyed by cell; cell population is
    balanced by k-means, residual skew handled by AQE."""
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .withColumn("cn", norm(F.col("cv")))
        .withColumn("cell", _nearest_cells("cv", centroids, 1)[0])
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .withColumn("qn", norm(F.col("qv")))
        .withColumn("cell", F.explode(_nearest_cells("qv", centroids, nprobe)))
    )
    scored = (
        q.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            round6(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
        .distinct()
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
