"""Engine operators beyond predicate evaluation: column statistics,
uniqueness/referential integrity, distribution drift, dedup/
similarity/text suites for training-data pipelines."""

from pyspark.sql import Column, functions as F

_SCALE6 = 1_000_000
# floor(x·10⁶ + 0.5) returns LONG, which overflows (ANSI runtime
# error) once |x|·10⁶ nears 2⁶³; above this bound a double's ulp is
# already ≫ 10⁻⁶, so there is no 6-dp fraction to round — pass the
# value through unchanged (DuckDB's round is likewise an identity
# there).  9e12 leaves two decades of headroom below 2⁶³/10⁶.
_ROUND6_MAX = 9.0e12


def round6(c: Column) -> Column:
    """Round to 6 dp with semantics BIT-IDENTICAL to DuckDB's
    ``round(x, 6)`` (std::round(x·10⁶)/10⁶ — half away from zero on
    the SCALED DOUBLE): ``±floor(|x|·10⁶ + 0.5)/10⁶``.

    Spark's own ``F.round`` converts the binary double to exact
    decimal and applies HALF_UP on the TRUE value, so the two engines
    disagree whenever x·10⁶ lands on (or crosses) a half-integer
    during the scaling multiply — observed on composed quality scores
    (6-dp-rounded inputs × 1.25 systematically produce 7th-digit
    halves: 0.8762625 → Spark 0.876262, DuckDB 0.876263).  Every
    value-compared 6-dp column therefore rounds through this helper;
    equivalence to DuckDB is property-tested over random doubles in
    tests/test_training_ops.py."""
    if isinstance(c, str):  # a bare column name would hit str.__mul__
        c = F.col(c)
    pos = F.floor(c * _SCALE6 + F.lit(0.5)) / F.lit(float(_SCALE6))
    neg = -(F.floor(-c * _SCALE6 + F.lit(0.5)) / F.lit(float(_SCALE6)))
    return F.when(
        F.abs(c) >= F.lit(_ROUND6_MAX), c
    ).otherwise(F.when(c >= 0, pos).otherwise(neg))
