"""Recall REGRESSION GATE for the approximate similarity paths
(VERDICT r3 item 6): BENCH/RECALL.md reports recall, this test FAILS
when it regresses.  Corpora are the same seeded generators the report
uses (numpy PCG64, fixed seeds) so the floors are stable and
environment-independent; floors are measured-value minus a safety
margin (measured values noted inline).  Precision is 1.0 by
construction on every path (exact-cosine re-rank), so recall is the
only number that can silently rot.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fences_spark.operators import similarity as S

K = 3


@pytest.fixture(scope="module")
def planted(spark):
    """40 planted near-dup pairs (cos ~ 0.97) + 1000 random decoys —
    seed 424242, identical to scripts/recall_report.py."""
    rng = np.random.Generator(np.random.PCG64(424242))
    n_pairs, n_decoy, dim = 40, 1000, 64
    rows = []
    vid = 0
    for _ in range(n_pairs):
        base = rng.normal(size=dim)
        base /= np.linalg.norm(base)
        pert = base + rng.normal(scale=0.03, size=dim)
        rows.append((vid, [float(x) for x in base])); vid += 1
        rows.append((vid, [float(x) for x in pert])); vid += 1
    for _ in range(n_decoy):
        rows.append((vid, [float(x) for x in rng.normal(size=dim)])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df.persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def clustered(spark):
    """Mixture of 16 well-separated Gaussians, Zipf sizes — seed
    171717, same generator as the report's clustered corpus (smaller
    sizes for test wall: max(12, 400/(i+1)))."""
    n_comp, dim = 16, 64
    crng = np.random.Generator(np.random.PCG64(171717))
    comp_sizes = [max(12, int(400 / (i + 1))) for i in range(n_comp)]
    rows = []
    cid = 0
    for ci in range(n_comp):
        mean = crng.normal(size=dim)
        mean /= np.linalg.norm(mean)
        for _ in range(comp_sizes[ci]):
            v = mean + crng.normal(scale=0.08, size=dim)
            rows.append((cid, [float(x) for x in v]))
            cid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df.persist()
    df.count()
    yield df
    df.unpersist()


def test_planted_near_dup_lsh_recall_floor(planted):
    """Operating-regime near-dup recall: measured 1.000 (40/40) at the
    entry config (planes=5, tables=6); floor 0.95 (>=38/40)."""
    from fences_spark.entry_queries import _NEARDUP_PLANES, _NEARDUP_TABLES

    exact = S.embedding_near_dup_pairs(
        planted, threshold=0.9, use_lsh_prefilter=False
    ).count()
    lsh = S.embedding_near_dup_pairs(
        planted, threshold=0.9, dim=64,
        n_planes=_NEARDUP_PLANES, n_tables=_NEARDUP_TABLES,
    ).count()
    assert exact == 40  # the generator really plants 40 pairs over 0.9
    assert lsh / exact >= 0.95, f"LSH near-dup recall regressed: {lsh}/{exact}"


def test_ann_lsh_multiprobe_recall_floor(planted, spark):
    """Multiprobe sign-LSH top-k on the planted corpus: recall@3 vs
    brute force, 20 queries; measured 1.000 on this seed, floor 0.85
    (multiprobe is stochastic across plane draws only via the seeded
    corpus, so regressions below the floor are code changes)."""
    queries = planted.filter(F.col("vec_id") < 20)
    exact = S.cosine_topk(queries, planted, k=K).persist()
    mp = S.ann_topk_lsh(
        queries, planted, dim=64, k=K, n_planes=4, n_tables=4, multiprobe=True
    )
    r = S.recall_at_k(exact, mp, K)
    exact.unpersist()
    assert r >= 0.85, f"multiprobe LSH recall@{K} regressed: {r:.3f}"


def test_ivf_clustered_recall_floor(clustered):
    """IVF on the clustered corpus — the fit-quality regime.  Measured
    on this seed at cells=16, nprobe=4: det-Lloyd (oracle config) 0.983,
    k-means|| (seed 7) 1.000; floors 0.85 / 0.90."""
    from fences_spark.entry_queries import _IVF_ITERS

    n_comp = 16
    queries = clustered.filter(F.col("vec_id") % 53 == 0).limit(20)
    exact = S.cosine_topk(queries, clustered, k=K).persist()

    cents_det = S.ivf_fit_centroids_det(
        clustered, dim=64, n_cells=n_comp, iters=_IVF_ITERS
    )
    r_det = S.recall_at_k(
        exact, S.ivf_topk(queries, clustered, cents_det, k=K, nprobe=4), K
    )
    try:
        cents_kmpp = S.ivf_fit_centroids(clustered, n_cells=n_comp, seed=7)
        r_kmpp = S.recall_at_k(
            exact, S.ivf_topk(queries, clustered, cents_kmpp, k=K, nprobe=4), K
        )
    except Exception:  # pragma: no cover - MLlib unavailable
        r_kmpp = None
    exact.unpersist()
    assert r_det >= 0.85, f"det-Lloyd IVF recall@{K} nprobe=4 regressed: {r_det:.3f}"
    if r_kmpp is not None:
        assert r_kmpp >= 0.90, (
            f"k-means|| IVF recall@{K} nprobe=4 regressed: {r_kmpp:.3f}"
        )


def test_ivf_clustered_cell_balance_floor(clustered):
    """The quantizer must FILL its cells on clustered input (a fit that
    collapses clusters wrecks recall-per-probe at scale): >= 14/16
    nonempty for both fits; largest-cell caps measured-plus-margin per
    fit (det-Lloyd 0.370 on this corpus — its 1-iter oracle fit seeds on
    the lowest vec_ids; k-means|| balances mass-proportionally)."""
    from fences_spark.entry_queries import _IVF_ITERS

    n = clustered.count()
    for cents, cap in (
        (S.ivf_fit_centroids_det(clustered, dim=64, n_cells=16, iters=_IVF_ITERS),
         0.45),
        (S.ivf_fit_centroids(clustered, n_cells=16, seed=7), 0.35),
    ):
        sizes = [
            r["cnt"]
            for r in clustered.withColumn(
                "cell", S._nearest_cells("embedding", cents, 1)[0]
            ).groupBy("cell").agg(F.count("*").alias("cnt")).collect()
        ]
        assert len(sizes) >= 14, f"quantizer collapsed: {len(sizes)} cells"
        assert max(sizes) / n <= cap, f"giant cell: {max(sizes) / n:.3f} > {cap}"
