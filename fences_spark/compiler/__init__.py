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


# in-place applicators whose subschema annotations feed unevaluated*;
# their presence in the SAME schema object makes the lowering unsound
# ($dynamicRef merges annotations exactly like $ref, evaluator.py)
_INPLACE_FOR_PROPS = frozenset(
    {"$ref", "$dynamicRef", "allOf", "anyOf", "oneOf", "if", "then", "else",
     "dependentSchemas"}
)
# contains additionally marks matched ITEMS evaluated (2020-12)
_INPLACE_FOR_ITEMS = _INPLACE_FOR_PROPS | {"contains"}

# keywords whose value is a JSON literal, not a subschema
_VALUE_KEYWORDS = frozenset(
    {"enum", "const", "NOT_enum", "NOT_const", "default", "example", "examples"}
)


def lower_unevaluated(schema):
    """Compile-time lowering of ``unevaluatedProperties``/``Items`` to
    their annotation-free equivalents, sound exactly when the schema
    object carries no in-place applicator (then the only annotation
    sources are the cousin keywords, whose coverage
    ``additionalProperties`` / post-prefix ``items`` already encode —
    equivalence pinned against jsonschema in
    tests/test_unevaluated_content.py):

    - ``unevaluatedProperties: S`` → ``additionalProperties: S``
      (dropped when additionalProperties is present: it already
      evaluates every remaining key);
    - ``unevaluatedItems: S`` → ``items: S`` after ``prefixItems``
      (dropped when items is present).

    Ancestor applicators are irrelevant — annotations flow upward,
    never into a branch.  Raises :class:`CompileError` when an
    in-place applicator shares the object; callers fall back to the
    annotation-tracking Arrow evaluator."""
    if isinstance(schema, list):
        return [lower_unevaluated(x) for x in schema]
    if not isinstance(schema, dict):
        return schema
    out = {
        # literal-value keywords hold JSON values, not schemas — a
        # dict literal with an "unevaluatedProperties" KEY must pass
        # through untouched
        k: (v if k in _VALUE_KEYWORDS else lower_unevaluated(v))
        for k, v in schema.items()
    }
    if "unevaluatedProperties" in out:
        if _INPLACE_FOR_PROPS & out.keys():
            raise CompileError(
                "unevaluatedProperties beside an in-place applicator needs annotation tracking"
            )
        up = out.pop("unevaluatedProperties")
        if "additionalProperties" not in out:
            out["additionalProperties"] = up
    if "unevaluatedItems" in out:
        if _INPLACE_FOR_ITEMS & out.keys():
            raise CompileError(
                "unevaluatedItems beside an in-place applicator needs annotation tracking"
            )
        ui = out.pop("unevaluatedItems")
        if "items" not in out:
            out["items"] = ui
    return out
