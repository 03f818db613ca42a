"""Spec → Spark predicate compilers.

- :mod:`fences_spark.compiler.typed` — schema over a *typed* column
  (string/number/bool/array/struct/map): pure built-in Column tree,
  whole-stage codegen, zero Python at runtime.  The production path
  for the north-rule table (repo/path/commit/lang/content are all
  strings).
- :mod:`fences_spark.compiler.jsonvalue` — schema over a JSON-string
  cell: VariantType built-ins for the flat subset, Arrow-vectorized
  pandas UDF wrapping the reference evaluator for the residue.
- :mod:`fences_spark.compiler.ruleset` — the user-facing RuleSet API.
"""


class CompileError(Exception):
    """Raised when a schema cannot be expressed with built-in Columns;
    callers fall back to the Arrow-vectorized evaluator UDF."""
