"""RuleSet — the user-facing validation API.

A :class:`Rule` binds one fences-dialect schema to one column; a
:class:`RuleSet` compiles all rules into a single ``select`` (one
boolean Column per rule — the Spark analog of the reference's
per-leaf validity tags, /root/reference/fences/core/node.py:8-12) and
derives:

- ``row_valid``     — AND of all rule verdicts,
- ``violations``    — array of failed rule ids per row (exact
  violation rows, the north-rule criterion BASELINE.json:2),
- ``verdicts()``    — per-(partition, rule) pass/fail counts, the
  cluster analog of the reference's ConfusionMatrix partial+final
  merge (fences/core/util.py:114-137),
- ``confusion()``   — valid/invalid × accepted/rejected counts
  against a ground-truth column (fences/core/util.py:86-153).

Everything is one narrow projection over the input — no shuffle is
introduced until an aggregation is requested, and the aggregations
are map-side-combinable ``groupBy().agg(count)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

from fences_spark.compiler import CompileError
from fences_spark.compiler.jsonvalue import compile_json, compile_json_udf
from fences_spark.compiler.typed import TypedCompiler
from fences_spark.schema.evaluator import SchemaType


@dataclass
class Rule:
    """One constraint: ``schema`` applied to ``column``.

    mode:
      - "typed": the column's Spark type carries the structure
        (strings, numbers, arrays, structs, maps);
      - "json":  the column holds a JSON document as text;
      - "xml":   the column holds an XML document as text (XSD-subset
        dialect, fences_spark.schema.xsd).
    """

    rule_id: str
    column: str
    schema: SchemaType
    mode: str = "typed"
    # pre-registered external schema documents (URI → document) for
    # cross-document $ref/$dynamicRef — see schema.evaluator.Evaluator;
    # shipped to executors inside the Arrow UDF closure
    resources: dict | None = None

    def compile(self, df: DataFrame) -> tuple[Column, str]:
        col = df[self.column]
        if self.mode == "json":
            return compile_json(self.schema, col, self.resources)
        if self.mode == "xml":
            from fences_spark.schema.xsd import compile_xml

            return compile_xml(self.schema, col)
        dtype = df.schema[self.column].dataType
        if self.resources:
            # registry refs resolve only on the Arrow tier; skip the
            # typed attempt (its evaluator would lack the registry)
            return self._typed_arrow_fallback(col, dtype)
        try:
            return TypedCompiler(self.schema).compile(col, dtype), "typed"
        except CompileError:
            return self._typed_arrow_fallback(col, dtype)

    def compile_pointers(
        self, df: DataFrame, gate: Column | None = None
    ) -> tuple[Column, str]:
        """Violation-pointer column (``array<struct<pointer,keyword>>``)
        for this rule — the instance-side JSON-pointer diagnostics of
        fences_spark.schema.pointers (vocabulary arbitrated against
        jsonschema error paths; reference path model
        fences/json_schema/json_pointer.py:5-57).  Tiering mirrors
        :meth:`compile`: typed builtin first, Arrow fallback.

        ``gate`` (a boolean Column): rows where it is false don't need
        this rule's pointers — the Arrow tiers ship them across the
        batch boundary as NULLs and short-circuit Python-side, so the
        UDF cost tracks the gate's selectivity even in projections
        that cannot pre-filter (streaming).  Entries on gated-off rows
        are unspecified; the typed tier ignores the gate (its ``when``
        branches are already conditional in codegen)."""
        from pyspark.sql import types as T

        from fences_spark.compiler.pointers import (
            compile_typed_pointers,
            pointer_udf,
        )

        def _gated(json_col: Column) -> Column:
            if gate is None:
                return json_col
            # NULL now means "gated off"; a legitimate SQL-NULL cell
            # (JSON null instance) becomes the JSON text "null"
            return F.when(gate, F.coalesce(json_col, F.lit("null")))

        col = df[self.column]
        if self.mode == "json":
            return (
                pointer_udf(self.schema, self.resources, gated=gate is not None)(
                    _gated(col)
                ),
                "arrow_udf",
            )
        if self.mode == "xml":
            raise CompileError(
                "XML diagnostics use compile_xml_paths (XPath vocabulary)"
            )
        dtype = df.schema[self.column].dataType

        def _arrow(c: Column, dt: Any) -> Column:
            # same JSON-lift as _typed_arrow_fallback; entries come
            # back rooted at the 1-element wrapper array — re-root
            # "#/0…" → "#…"
            g = gate is not None
            if isinstance(dt, T.StringType):
                lifted = {"prefixItems": [self.schema]}
                raw = pointer_udf(lifted, self.resources, gated=g)(
                    _gated(F.to_json(F.array(c)))
                )
                return F.transform(
                    raw,
                    lambda e: F.struct(
                        F.concat(
                            F.lit("#"), F.substring(e.getField("pointer"), 4, 1 << 30)
                        ).alias("pointer"),
                        e.getField("keyword").alias("keyword"),
                    ),
                )
            return pointer_udf(self.schema, self.resources, gated=g)(
                _gated(F.to_json(c))
            )

        if self.resources:
            return _arrow(col, dtype), "arrow_udf"
        try:
            return compile_typed_pointers(self.schema, col, dtype), "typed"
        except CompileError:
            return _arrow(col, dtype), "arrow_udf"

    def _typed_arrow_fallback(self, col: Column, dtype: Any) -> tuple[Column, str]:
        # fall back: serialize the cell to JSON text and run the
        # Arrow-vectorized evaluator (still no per-row Python).
        # to_json(named_struct) would drop null fields, so encode
        # the cell itself: strings via to_json of a one-element
        # array (then the schema is lifted over prefixItems).
        from pyspark.sql import types as T

        if isinstance(dtype, T.StringType):
            jcol = F.to_json(F.array(col))
            lifted = {"prefixItems": [self.schema]}
            # null cell → "[null]" → prefixItems applies schema to null
            return compile_json_udf(lifted, jcol, self.resources), "arrow_udf"
        return compile_json_udf(self.schema, F.to_json(col), self.resources), "arrow_udf"


@dataclass
class ValidationResult:
    """Annotated DataFrame plus rule metadata."""

    df: DataFrame  # input columns + one boolean per rule + row_valid + violations
    rule_ids: list[str]
    tiers: dict[str, str]  # rule_id -> {"typed", "variant", "arrow_udf"}

    def violations(self, *keep: str) -> DataFrame:
        """Exact violation rows: one row per (row, failed rule)."""
        cols = list(keep) if keep else [
            c for c in self.df.columns
            if c not in self.rule_ids and c not in ("row_valid", "violations")
        ]
        return (
            self.df.filter(~F.col("row_valid"))
            .select(*cols, F.explode("violations").alias("rule_id"))
        )

    def verdicts(self) -> DataFrame:
        """Per-(partition, rule) pass/fail counts — map-side combined,
        output is #partitions × #rules rows."""
        agg_exprs = []
        for rid in self.rule_ids:
            agg_exprs.append(F.sum(F.col(rid).cast("long")).alias(f"{rid}__pass"))
            agg_exprs.append(F.sum((~F.col(rid)).cast("long")).alias(f"{rid}__fail"))
        per_part = (
            self.df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"), *agg_exprs)
        )
        # unpivot to (partition_id, rule_id, n_pass, n_fail, passed)
        stack_expr = ", ".join(
            f"'{rid}', {rid}__pass, {rid}__fail" for rid in self.rule_ids
        )
        n = len(self.rule_ids)
        return per_part.selectExpr(
            "partition_id",
            "rows",
            f"stack({n}, {stack_expr}) as (rule_id, n_pass, n_fail)",
        ).withColumn("passed", F.col("n_fail") == 0)

    def confusion(self, truth_col: str) -> DataFrame:
        """ConfusionMatrix analog: expected (truth) × observed
        (row_valid) counts.  Diagonality == exact reproduction of the
        reference oracle."""
        return (
            self.df.groupBy()
            .agg(
                F.sum((F.col(truth_col) & F.col("row_valid")).cast("long")).alias("valid_accepted"),
                F.sum((F.col(truth_col) & ~F.col("row_valid")).cast("long")).alias("valid_rejected"),
                F.sum((~F.col(truth_col) & F.col("row_valid")).cast("long")).alias("invalid_accepted"),
                F.sum((~F.col(truth_col) & ~F.col("row_valid")).cast("long")).alias("invalid_rejected"),
            )
        )


@dataclass
class RuleSet:
    rules: list[Rule] = field(default_factory=list)

    def add(
        self,
        rule_id: str,
        column: str,
        schema: SchemaType,
        mode: str = "typed",
        resources: dict | None = None,
    ) -> "RuleSet":
        if mode in ("typed", "json"):
            # $vocabulary refusal semantics (draft 2020-12): a
            # resolvable custom meta-schema requiring a vocabulary we
            # don't implement fails HERE, loudly, not as a silent
            # keyword drop at evaluation time
            from fences_spark.schema.vocabulary import check_vocabularies

            check_vocabularies(schema, resources)
        self.rules.append(Rule(rule_id, column, schema, mode, resources))
        return self

    def apply(self, df: DataFrame) -> ValidationResult:
        """One projection: input columns + per-rule booleans +
        row_valid + violations array.  Narrow (no shuffle)."""
        preds: dict[str, Column] = {}
        tiers: dict[str, str] = {}
        for r in self.rules:
            pred, tier = r.compile(df)
            preds[r.rule_id] = F.coalesce(pred, F.lit(False))
            tiers[r.rule_id] = tier
        out = df.select(
            "*", *[preds[rid].alias(rid) for rid in preds]
        )
        rule_ids = [r.rule_id for r in self.rules]
        all_ok = F.lit(True)
        for rid in rule_ids:
            all_ok = all_ok & F.col(rid)
        failed = F.filter(
            F.array(*[
                F.when(~F.col(rid), F.lit(rid)).otherwise(F.lit(None)) for rid in rule_ids
            ]),
            lambda x: x.isNotNull(),
        )
        out = out.withColumn("row_valid", all_ok).withColumn("violations", failed)
        return ValidationResult(out, rule_ids, tiers)

    def pointer_entries_per_rule(self, df: DataFrame) -> Column:
        """``array<struct<rule_id, pointers>>`` with one element per
        FAILING rule (requires the per-rule boolean columns of
        :meth:`apply` to be present), each carrying that rule's
        pointer entries — empty array if the pointer tier yields no
        location for a failing rule, so cardinality always equals the
        ``violations`` array.  Shared by the batch runner's
        diagnostics sink and the streaming annotate path.

        A rule whose mode has no JSON-pointer vocabulary (XML — its
        diagnostics are XPath-shaped, schema/xsd.py) contributes its
        failing-rule element with an EMPTY pointers array rather than
        aborting the run: the flag is a sink enrichment, never a new
        failure mode."""
        empty = F.array().cast("array<struct<pointer:string,keyword:string>>")
        tagged = []
        for r in self.rules:
            try:
                # gate each rule's pointer evaluation on ITS OWN
                # failure: Arrow-tier rules then do Python work only
                # for rows failing that rule, even when the caller
                # cannot pre-filter (streaming projections)
                entries, _tier = r.compile_pointers(df, gate=~F.col(r.rule_id))
            except CompileError:
                entries = empty
            tagged.append(
                F.when(
                    ~F.col(r.rule_id),
                    F.struct(
                        F.lit(r.rule_id).alias("rule_id"),
                        F.coalesce(
                            entries,
                            F.array().cast(
                                "array<struct<pointer:string,keyword:string>>"
                            ),
                        ).alias("pointers"),
                    ),
                )
            )
        return F.filter(F.array(*tagged), lambda x: x.isNotNull())

    def pointers(self, df: DataFrame, *keep: str) -> DataFrame:
        """Instance-side violation diagnostics: one row per (input
        row, rule, violation location) — columns ``keep...`` +
        ``rule_id`` + ``pointer`` (RFC 6901, ``#/a/b/0`` style) +
        ``keyword`` (the failing constraint).  One narrow projection
        + explode; rows with no violations vanish (inner explode)."""
        cols = list(keep) if keep else df.columns

        def _tag(rid: str):
            # single-arg lambda factory: a 2-arg lambda (even with a
            # default) would be treated as transform's (element, index)
            # form, binding the array INDEX to the second parameter
            return lambda e: F.struct(
                F.lit(rid).alias("rule_id"),
                e.getField("pointer").alias("pointer"),
                e.getField("keyword").alias("keyword"),
            )

        per_rule = []
        for r in self.rules:
            entries, _tier = r.compile_pointers(df)
            per_rule.append(F.transform(entries, _tag(r.rule_id)))
        flat = F.flatten(F.array(*per_rule)) if per_rule else F.array()
        return (
            df.select(*cols, F.explode(flat).alias("_v"))
            .select(*cols, "_v.rule_id", "_v.pointer", "_v.keyword")
        )

    def describe(self) -> list[dict[str, Any]]:
        return [
            {"rule_id": r.rule_id, "column": r.column, "mode": r.mode, "schema": r.schema}
            for r in self.rules
        ]
