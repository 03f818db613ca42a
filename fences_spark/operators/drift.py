"""Distribution-drift detection (north rule, BASELINE.json:6):
lang / path-depth histograms vs a baseline snapshot, scored with
chi-square and two-sample Kolmogorov–Smirnov tests.

Histograms are computed distributed (one groupBy per dimension —
map-side combined, output is #buckets rows); the χ²/KS statistics and
p-values run driver-side on the collected histograms, which are tiny
by construction.  The regularized incomplete gamma (χ² CDF) and the
KS asymptotic Q-function are implemented closed-form (scipy-free,
standard series/continued-fraction evaluation per Numerical Recipes'
published formulas).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from fences_spark.operators import round6


# ---------------------------------------------------------------------------
# histogram builders
# ---------------------------------------------------------------------------


def categorical_histogram(df: DataFrame, col: str, dim_name: str | None = None) -> DataFrame:
    """(dim, bucket, cnt) for a categorical column."""
    return (
        df.groupBy(F.coalesce(F.col(col).cast("string"), F.lit("<null>")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit(dim_name or col).alias("dim"), "bucket", "cnt")
    )


def path_depth_histogram(df: DataFrame, col: str = "path") -> DataFrame:
    """Histogram of path depth (number of '/'-separated segments - 1)."""
    depth = F.size(F.split(F.col(col), "/")) - 1
    return (
        df.groupBy(depth.cast("string").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("path_depth").alias("dim"), "bucket", "cnt")
    )


def files_histograms(files: DataFrame) -> DataFrame:
    """The two north-rule dimensions in one pass each."""
    return categorical_histogram(files, "lang").unionByName(path_depth_histogram(files))


# ---------------------------------------------------------------------------
# scipy-free special functions
# ---------------------------------------------------------------------------


def _gammainc_p(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x) — series for x<a+1,
    continued fraction otherwise."""
    if x <= 0:
        return 0.0
    lg = math.lgamma(a)
    if x < a + 1:
        term = 1.0 / a
        total = term
        n = a
        for _ in range(500):
            n += 1
            term *= x / n
            total += term
            if abs(term) < abs(total) * 1e-14:
                break
        return total * math.exp(-x + a * math.log(x) - lg)
    # Lentz continued fraction for Q(a,x)
    tiny = 1e-300
    b = x + 1 - a
    c = 1 / tiny
    d = 1 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1 / d
        delta = d * c
        h *= delta
        if abs(delta - 1) < 1e-14:
            break
    q = math.exp(-x + a * math.log(x) - lg) * h
    return 1.0 - q


def chi2_sf(stat: float, dof: int) -> float:
    """Survival function of χ²(dof) — p-value of the test."""
    if dof <= 0:
        return 1.0
    return max(0.0, min(1.0, 1.0 - _gammainc_p(dof / 2.0, stat / 2.0)))


def ks_sf(stat: float, n_eff: float) -> float:
    """Asymptotic two-sample KS p-value: Q_KS((sqrt(ne)+0.12+0.11/
    sqrt(ne)) * D)."""
    if stat <= 0:
        return 1.0
    sq = math.sqrt(n_eff)
    lam = (sq + 0.12 + 0.11 / sq) * stat
    total = 0.0
    for j in range(1, 101):
        term = 2 * (-1) ** (j - 1) * math.exp(-2 * j * j * lam * lam)
        total += term
        if abs(term) < 1e-12:
            break
    return max(0.0, min(1.0, total))


# ---------------------------------------------------------------------------
# drift scoring
# ---------------------------------------------------------------------------


@dataclass
class DriftResult:
    dim: str
    chi2_stat: float
    chi2_dof: int
    chi2_pvalue: float
    ks_stat: float
    ks_pvalue: float
    n_current: int
    n_baseline: int

    def drifted(self, alpha: float = 0.001) -> bool:
        return self.chi2_pvalue < alpha or self.ks_pvalue < alpha


def score_drift(current_hist: DataFrame, baseline_hist: DataFrame) -> list[DriftResult]:
    """Compare (dim, bucket, cnt) histograms.  χ² uses baseline-
    proportion expected counts; KS compares bucket-CDFs (buckets
    ordered numerically when possible, else lexically)."""
    cur = {}
    for r in current_hist.collect():
        cur.setdefault(r["dim"], {})[r["bucket"]] = r["cnt"]
    base = {}
    for r in baseline_hist.collect():
        base.setdefault(r["dim"], {})[r["bucket"]] = r["cnt"]

    out: list[DriftResult] = []
    for dim in sorted(set(cur) | set(base)):
        c = cur.get(dim, {})
        b = base.get(dim, {})
        buckets = sorted(set(c) | set(b), key=_bucket_key)
        n_c = sum(c.values())
        n_b = sum(b.values())
        if n_c == 0 or n_b == 0:
            out.append(DriftResult(dim, math.inf, max(len(buckets) - 1, 1), 0.0, 1.0, 0.0, n_c, n_b))
            continue
        # chi-square with expected = baseline proportion × current total
        stat = 0.0
        dof = -1
        for k in buckets:
            exp = n_c * (b.get(k, 0) / n_b)
            obs = c.get(k, 0)
            if exp == 0:
                if obs > 0:
                    stat = math.inf  # bucket impossible under baseline
                continue
            stat += (obs - exp) ** 2 / exp
            dof += 1
        dof = max(dof, 1)
        # two-sample KS on bucket CDFs
        cdf_c = cdf_b = 0.0
        ks = 0.0
        for k in buckets:
            cdf_c += c.get(k, 0) / n_c
            cdf_b += b.get(k, 0) / n_b
            ks = max(ks, abs(cdf_c - cdf_b))
        n_eff = n_c * n_b / (n_c + n_b)
        out.append(
            DriftResult(
                dim=dim,
                chi2_stat=stat,
                chi2_dof=dof,
                chi2_pvalue=0.0 if math.isinf(stat) else chi2_sf(stat, dof),
                ks_stat=ks,
                ks_pvalue=ks_sf(ks, n_eff),
                n_current=n_c,
                n_baseline=n_b,
            )
        )
    return out


def _bucket_key(b: str):
    try:
        return (0, float(b), "")
    except (TypeError, ValueError):
        return (1, 0.0, str(b))


# ---------------------------------------------------------------------------
# fully-distributed drift statistics
# ---------------------------------------------------------------------------


def drift_stats_distributed(cur_hist: DataFrame, base_hist: DataFrame) -> DataFrame:
    """χ² and KS statistics computed entirely in Spark — no driver
    collect, so it composes into pipelines whose histograms are NOT
    driver-sized (e.g. high-cardinality buckets at 10^12 rows).

    Input: two (dim, bucket, cnt) histograms.  Output one row per dim:
    (dim, chi2_stat, dof, n_impossible, ks_stat, n_current,
    n_baseline).  χ² uses expected = baseline proportion × current
    total over buckets present in the baseline; buckets impossible
    under the baseline (cnt>0 with baseline 0) are counted separately
    rather than folded into an infinite statistic.  KS compares
    cumulative distributions with buckets in lexical order (cast
    numeric buckets upstream if numeric order is wanted).  Per-bucket
    χ² terms go through DECIMAL so the sum is order-independent
    (exact reproducibility vs the SQL oracle)."""
    from pyspark.sql import Window as W

    c = cur_hist.select("dim", "bucket", F.col("cnt").alias("c_cnt"))
    b = base_hist.select("dim", "bucket", F.col("cnt").alias("b_cnt"))
    j = (
        c.join(b, ["dim", "bucket"], "full_outer")
        .fillna(0, ["c_cnt", "b_cnt"])
    )
    wd = W.partitionBy("dim")
    wcum = W.partitionBy("dim").orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    tot = (
        j.withColumn("n_c", F.sum("c_cnt").over(wd))
        .withColumn("n_b", F.sum("b_cnt").over(wd))
        .withColumn("cdf_c", F.sum("c_cnt").over(wcum) / F.col("n_c"))
        .withColumn("cdf_b", F.sum("b_cnt").over(wcum) / F.col("n_b"))
    )
    exp = F.col("n_c") * F.col("b_cnt") / F.col("n_b")
    diff = F.col("c_cnt") - exp
    term = F.when(F.col("b_cnt") > 0, (diff * diff) / exp).otherwise(F.lit(None))
    return (
        tot.groupBy("dim")
        .agg(
            F.sum(term.cast("decimal(28,10)")).cast("double").alias("chi2_stat"),
            (F.count(term) - F.lit(1)).cast("int").alias("dof"),
            F.sum(((F.col("b_cnt") == 0) & (F.col("c_cnt") > 0)).cast("long")).alias("n_impossible"),
            round6(F.max(F.abs(F.col("cdf_c") - F.col("cdf_b")))).alias("ks_stat"),
            F.max("n_c").alias("n_current"),
            F.max("n_b").alias("n_baseline"),
        )
        .withColumn("chi2_stat", round6(F.col("chi2_stat")))
    )


def divergence_stats_distributed(
    cur_hist: DataFrame, base_hist: DataFrame, eps: float = 1e-6
) -> DataFrame:
    """PSI / total-variation / Hellinger drift scores, entirely in
    Spark (same composition contract as drift_stats_distributed: no
    driver collect, histograms may be arbitrarily wide).

    Input: two (dim, bucket, cnt) histograms.  Output one row per dim:
    (dim, psi, tvd, hellinger, n_current, n_baseline).

      * PSI  = Σ (p'_c − p'_b)·ln(p'_c / p'_b), proportions clipped at
        ``eps`` (the standard zero-bucket smoothing; industry rule of
        thumb: <0.1 stable, 0.1–0.25 moderate, >0.25 major shift).
      * TVD  = ½ Σ |p_c − p_b| — no smoothing needed, exact arithmetic.
      * Hellinger = √(1 − Σ √(p_c·p_b)) ∈ [0, 1].

    Cross-engine reproducibility: per-bucket terms are pure IEEE
    arithmetic (division, sqrt are correctly rounded; ln agrees on
    both engines' libm for these magnitudes), summed through DECIMAL
    so the total is order-independent, then 6-dp rounded via round6.
    (No reference precedent — fences has no drift notion; north-rule
    component, BASELINE.json:6.)"""
    c = cur_hist.select("dim", "bucket", F.col("cnt").alias("c_cnt"))
    b = base_hist.select("dim", "bucket", F.col("cnt").alias("b_cnt"))
    j = c.join(b, ["dim", "bucket"], "full_outer").fillna(0, ["c_cnt", "b_cnt"])
    from pyspark.sql import Window as W

    wd = W.partitionBy("dim")
    t = (
        j.withColumn("n_c", F.sum("c_cnt").over(wd))
        .withColumn("n_b", F.sum("b_cnt").over(wd))
        .withColumn("p_c", F.col("c_cnt") / F.col("n_c"))
        .withColumn("p_b", F.col("b_cnt") / F.col("n_b"))
    )
    pc = F.greatest(F.col("p_c"), F.lit(eps))
    pb = F.greatest(F.col("p_b"), F.lit(eps))
    psi_term = (pc - pb) * F.log(pc / pb)
    dec = "decimal(28,18)"
    return (
        t.groupBy("dim")
        .agg(
            round6(F.sum(psi_term.cast(dec)).cast("double")).alias("psi"),
            round6(
                (F.sum(F.abs(F.col("p_c") - F.col("p_b")).cast(dec)) / 2).cast("double")
            ).alias("tvd"),
            round6(
                F.sqrt(
                    F.greatest(
                        F.lit(0.0),
                        F.lit(1.0)
                        - F.sum(F.sqrt(F.col("p_c") * F.col("p_b")).cast(dec)).cast("double"),
                    )
                )
            ).alias("hellinger"),
            F.max("n_c").alias("n_current"),
            F.max("n_b").alias("n_baseline"),
        )
    )
