"""Engine operators beyond predicate evaluation: column statistics,
uniqueness/referential integrity, distribution drift, dedup/
similarity/text suites for training-data pipelines."""

from pyspark.sql import Column, functions as F

_SCALE6 = 1_000_000


def round6(c: Column) -> Column:
    """Round to 6 dp with semantics BIT-IDENTICAL to DuckDB's
    ``round(x, 6)`` (std::round(x·10⁶)/10⁶ — half away from zero on
    the SCALED DOUBLE).

    Spark's own ``F.round`` converts the binary double to exact
    decimal and applies HALF_UP on the TRUE value, so the two engines
    disagree whenever x·10⁶ lands on (or crosses) a half-integer
    during the scaling multiply — observed on composed quality scores
    (6-dp-rounded inputs × 1.25 systematically produce 7th-digit
    halves: 0.8762625 → Spark 0.876262, DuckDB 0.876263).

    Construction notes, each load-bearing:

    - The input is BOUND ONCE via a 1-element ``transform`` lambda:
      ``round6`` wraps heavy expressions (regex-count quality scores),
      and every syntactic reference to ``c`` in a plain when/otherwise
      tree re-evaluates it — a previous 5-reference version cost +50%
      wall on the quality queries.  A lambda variable is a slot read.
    - ``std::round`` is emulated from the EXACT fraction
      (``v % 1.0``, IEEE-exact): the folkloric ``floor(v + 0.5)``
      mis-rounds once ulp(v) ≥ 1, where the ``+ 0.5`` add itself
      ties-to-even across an integer (x ≈ -6.6e9 was caught by the
      wide-magnitude property test).
    - Everything stays in the DOUBLE domain: ``F.floor`` returns LONG
      and overflows under ANSI for |v| near 2⁶³ (unbounded sums);
      ``v - v % 1`` never leaves double and passes huge magnitudes
      through unchanged, exactly like DuckDB (ulp ≫ 1e-6 there).

    Equivalence to DuckDB is property-tested over random doubles
    across 18 magnitude decades in tests/test_training_ops.py."""
    if isinstance(c, str):  # a bare column name would hit str.__mul__
        c = F.col(c)

    def inner(x: Column) -> Column:
        v = x * _SCALE6
        m = v % F.lit(1.0)  # remainder sign follows the dividend
        away = (
            F.when(m >= 0.5, F.lit(1.0))
            .when(m <= -0.5, F.lit(-1.0))
            .otherwise(F.lit(0.0))
        )
        # NaN remainder ⇒ v = x·10⁶ is ±inf or NaN.  That covers not
        # just ±inf/NaN INPUT but also finite |x| > ~1.8e302 whose
        # scaling multiply overflows — DuckDB returns x itself there
        # (ulp(x) ≫ 1e-6, round is the identity), so return the
        # UNSCALED input, never v/10⁶ (= ±inf).
        return F.when(F.isnan(m), x).otherwise(
            (v - m + away) / F.lit(float(_SCALE6))
        )

    return F.element_at(F.transform(F.array(c.cast("double")), inner), 1)
