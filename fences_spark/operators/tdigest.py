"""t-digest quantile sketch as a distributed partial/merge aggregate.

The north rule names t-digest for quantiles (BASELINE.json north_star).
Spark's builtin ``percentile_approx`` (GK/KLL-family) covers the same
accuracy class inside codegen and is what :mod:`fences_spark.operators.
stats` uses by default; this module provides the real thing for users
who need mergeable digests persisted across runs (e.g. drift baselines
over quantile sketches) — and demonstrates the engine's custom-UDAF
pattern: **Arrow-batched partials via mapInPandas, associative merge,
no per-row Python** (BASELINE.json:15).

Design (Dunning & Ertl, "Computing extremely accurate quantiles using
t-digests", arXiv:1902.04023 — public paper):

- each input partition folds its values into a bounded set of
  (mean, weight) centroids using the k1 scale function's size bound
  ``w ≤ 4 n δ q(1-q)`` approximated via the merging-digest pass;
- partial digests are tiny (≤ ~2δ centroids) and merge by
  concatenation + re-compression — associative and order-insensitive
  to within the usual t-digest approximation;
- the final digest interpolates quantiles between centroid means.

Scale shape: one narrow Arrow pass over the data (per-partition
partials), then a single-row reduce — identical dataflow to Spark's
own sketch aggregates; shuffle volume is #partitions × digest size.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _k1(q: float, delta: int) -> float:
    """The k1 scale function: k(q) = δ/(2π)·asin(2q−1).  A cluster may
    span [q0, q1] only while k(q1) − k(q0) ≤ 1, which bounds the digest
    at ≤ k(1) − k(0) = δ/2 clusters (+ numerical slack) with fine
    resolution at the tails."""
    return delta / (2.0 * math.pi) * math.asin(max(-1.0, min(1.0, 2.0 * q - 1.0)))


def _compress(means: np.ndarray, weights: np.ndarray, delta: int) -> tuple[np.ndarray, np.ndarray]:
    """Merging-digest compression (Dunning & Ertl §3): sort by mean,
    then greedily merge adjacent centroids while the k1 span bound
    holds."""
    if means.size == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cum = 0.0  # weight strictly before the current accumulated cluster
    acc_m, acc_w = float(means[0]), float(weights[0])
    k_start = _k1(0.0, delta)
    for m, w in zip(means[1:], weights[1:]):
        q_end = (cum + acc_w + float(w)) / total
        if _k1(q_end, delta) - k_start <= 1.0:
            acc_m = (acc_m * acc_w + float(m) * float(w)) / (acc_w + float(w))
            acc_w += float(w)
        else:
            out_m.append(acc_m)
            out_w.append(acc_w)
            cum += acc_w
            acc_m, acc_w = float(m), float(w)
            k_start = _k1(cum / total, delta)
    out_m.append(acc_m)
    out_w.append(acc_w)
    return np.asarray(out_m), np.asarray(out_w)


class TDigest:
    """Driver-side digest object (tiny): centroids + min/max."""

    def __init__(self, means: np.ndarray, weights: np.ndarray,
                 vmin: float, vmax: float, delta: int = 100):
        self.means = means
        self.weights = weights
        self.vmin = vmin
        self.vmax = vmax
        self.delta = delta

    @classmethod
    def of(cls, values: np.ndarray, delta: int = 100) -> "TDigest":
        values = values[~np.isnan(values)]
        if values.size == 0:
            return cls(np.array([]), np.array([]), math.nan, math.nan, delta)
        m, w = _compress(values.astype(float), np.ones(values.size), delta)
        return cls(m, w, float(values.min()), float(values.max()), delta)

    def merge(self, other: "TDigest") -> "TDigest":
        if self.means.size == 0:
            return other
        if other.means.size == 0:
            return self
        m = np.concatenate([self.means, other.means])
        w = np.concatenate([self.weights, other.weights])
        m, w = _compress(m, w, self.delta)
        return TDigest(m, w, min(self.vmin, other.vmin), max(self.vmax, other.vmax), self.delta)

    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return math.nan
        if self.means.size == 1:
            return float(self.means[0])
        total = float(self.weights.sum())
        target = q * total
        # cumulative weight at each centroid's center
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return self.vmin + (float(self.means[0]) - self.vmin) * max(target, 0.0) / max(cum[0], 1e-12)
        if target >= cum[-1]:
            span = total - cum[-1]
            return float(self.means[-1]) + (self.vmax - float(self.means[-1])) * (
                (target - cum[-1]) / span if span > 0 else 0.0
            )
        idx = int(np.searchsorted(cum, target) - 1)
        frac = (target - cum[idx]) / (cum[idx + 1] - cum[idx])
        return float(self.means[idx] + frac * (self.means[idx + 1] - self.means[idx]))


def tdigest_partials(df: DataFrame, column: str, *, delta: int = 100) -> DataFrame:
    """Per-Arrow-batch partial digests: (means, weights, vmin, vmax,
    n).  One narrow pass; output is a few rows per partition."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: TDigest | None = None
        n = 0
        for pdf in batches:
            vals = pd.to_numeric(pdf[column], errors="coerce").to_numpy(dtype=float)
            vals = vals[~np.isnan(vals)]
            if vals.size == 0:
                continue
            n += int(vals.size)
            d = TDigest.of(vals, delta)
            acc = d if acc is None else acc.merge(d)
        if acc is not None:
            yield pd.DataFrame(
                {
                    "means": [acc.means.tolist()],
                    "weights": [acc.weights.tolist()],
                    "vmin": [acc.vmin],
                    "vmax": [acc.vmax],
                    "n": [n],
                }
            )

    schema = "means array<double>, weights array<double>, vmin double, vmax double, n long"
    return df.select(F.col(column)).mapInPandas(fold, schema=schema)


def tdigest_quantiles(
    df: DataFrame, column: str, quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    *, delta: int = 100,
) -> dict[float, float]:
    """Distributed t-digest quantiles: Arrow partials → driver merge
    (partials are ~#partitions rows of ≤δ centroids — trivially
    driver-sized even at 10^12 input rows)."""
    rows = tdigest_partials(df, column, delta=delta).collect()
    acc: TDigest | None = None
    for r in rows:
        d = TDigest(np.asarray(r["means"]), np.asarray(r["weights"]), r["vmin"], r["vmax"], delta)
        acc = d if acc is None else acc.merge(d)
    if acc is None:
        return {q: math.nan for q in quantiles}
    return {q: acc.quantile(q) for q in quantiles}
