"""fences_spark — a from-scratch, PySpark-native schema + constraint
validation engine with the query/data-processing capabilities of the
reference ``ifak/fences`` (a single-process test-data generator whose
dual is a validator; see /root/reference/README.md:4-12).

Where fences *generates* boundary samples from a declarative constraint
spec (JSON Schema draft-2020-12 dialect), this engine *evaluates* the
same dialect at cluster scale: specs compile to ``pyspark.sql.Column``
predicate trees (JVM-side, whole-stage-codegen'd), with an
Arrow-vectorized pandas-UDF fallback for the residue (deep/recursive
JSON values).  No per-row Python anywhere in the hot path.

Public surface:

- :mod:`fences_spark.schema.evaluator` — pure-Python reference
  evaluator of the dialect (driver-side oracle + UDF fallback body).
- :mod:`fences_spark.schema.normalize` — DNF normalizer mirroring the
  reference's semantics (fences/json_schema/normalize.py:557-579).
- :mod:`fences_spark.schema.generate` — boundary-sample generator
  (fixture oracle; the analog of fences' decision-graph enumeration,
  fences/core/node.py:220-264, re-derived as direct recursive
  boundary synthesis — not a port).
- :mod:`fences_spark.compiler` — spec → Column compilers (typed
  columns and JSON-string cells) and the :class:`RuleSet` API.
- :mod:`fences_spark.operators` — column stats, uniqueness,
  referential integrity, drift, dedup/similarity/text suites.
- :mod:`fences_spark.run` — partition-grain validation runner with
  checkpoint/resume and lineage.
"""

from fences_spark.compiler.ruleset import Rule, RuleSet, ValidationResult

__all__ = ["Rule", "RuleSet", "ValidationResult"]
__version__ = "0.1.0"
