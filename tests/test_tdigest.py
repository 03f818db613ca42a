"""t-digest distributed quantile sketch (operators.tdigest)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fences_spark.operators.tdigest import TDigest, tdigest_partials, tdigest_quantiles

SF = "/root/testdata/sf0.01"


class TestLocalDigest:
    def test_exact_on_small_input(self):
        vals = np.arange(1, 101, dtype=float)
        d = TDigest.of(vals, delta=100)
        assert d.quantile(0.0) == pytest.approx(1.0, abs=1.0)
        assert d.quantile(1.0) == pytest.approx(100.0, abs=1.0)
        assert d.quantile(0.5) == pytest.approx(50.5, abs=1.5)

    def test_merge_associative_accuracy(self):
        rng = np.random.RandomState(7)
        a, b, c = (rng.lognormal(0, 1, 20_000) for _ in range(3))
        d_all = TDigest.of(np.concatenate([a, b, c]))
        d_merged = TDigest.of(a).merge(TDigest.of(b)).merge(TDigest.of(c))
        allv = np.sort(np.concatenate([a, b, c]))
        for q in (0.1, 0.5, 0.9, 0.99):
            exact = float(np.quantile(allv, q))
            for d in (d_all, d_merged):
                got = d.quantile(q)
                # rank error, not value error: locate got in the sorted data
                rank = np.searchsorted(allv, got) / allv.size
                assert abs(rank - q) < 0.02, (q, got, exact, rank)

    def test_empty_and_singleton(self):
        assert np.isnan(TDigest.of(np.array([])).quantile(0.5))
        assert TDigest.of(np.array([42.0])).quantile(0.5) == 42.0


class TestDistributed:
    def test_partials_schema_and_size(self, spark):
        li = spark.read.parquet(f"{SF}/lineitem.parquet").repartition(8)
        parts = tdigest_partials(li, "l_quantity").collect()
        assert 1 <= len(parts) <= 8
        for r in parts:
            assert len(r["means"]) == len(r["weights"]) <= 220  # ~2*delta
            assert r["n"] > 0

    def test_quantiles_match_exact_within_rank_eps(self, spark):
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        got = tdigest_quantiles(li, "l_extendedprice", (0.5, 0.95, 0.99))
        vals = np.sort(
            np.array(
                [r[0] for r in li.select(F.col("l_extendedprice").cast("double")).collect()],
                dtype=float,
            )
        )
        for q, est in got.items():
            rank = np.searchsorted(vals, est) / vals.size
            assert abs(rank - q) < 0.02, (q, est, rank)
