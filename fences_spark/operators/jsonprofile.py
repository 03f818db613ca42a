"""JSON schema discovery: depth-bounded path/type profiling of a JSON
column — the inverse direction of the validation engine (data →
schema instead of schema → verdict).  A profile row per (path, type)
observed in the corpus is exactly what an operator writes a
constraint spec FROM: conflicting types at one path (``$.id`` seen as
both number and string) surface as two rows, array elements collapse
to one ``[]`` step, and JSON nulls are first-class.

Execution shape: one ``try_parse_json`` per row into a VariantType
value, then ``max_depth`` chained ``LATERAL variant_explode`` levels
(each level's row count is bounded by the document's own node count —
the corpus-level explosion is Σ nodes, linear in input bytes), a
per-row ``schema_of_variant`` canonicalized to the six JSON type
names, and one (path, jtype) shuffle-aggregate whose key cardinality
is the schema size, not the data size; ``count(distinct doc_id)``
adds the standard two-phase distinct aggregate.  Everything is
JVM-side (variant machinery is native); zero Python.

No reference precedent (the reference consumes schemas, it never
infers them) — SURVEY.md §2.F.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame

# Spark-side canonicalization of schema_of_variant output to JSON
# type vocabulary (DECIMAL/BIGINT/DOUBLE/... all mean "number").
_CANON = (
    "CASE WHEN {st} LIKE 'OBJECT%' THEN 'object' "
    "WHEN {st} LIKE 'ARRAY%' THEN 'array' "
    "WHEN {st} = 'STRING' THEN 'string' "
    "WHEN {st} = 'BOOLEAN' THEN 'boolean' "
    "WHEN {st} = 'VOID' THEN 'null' "
    "ELSE 'number' END"
)


def json_path_profile(
    df: DataFrame, id_col: str, json_col: str, *, max_depth: int = 3
) -> DataFrame:
    """(path, jtype, n, n_docs) — one row per distinct (JSON path,
    canonical type) observed in ``json_col`` down to ``max_depth``
    levels below the root.  Paths render object steps as ``.key`` and
    collapse every array index to ``[]``; ``jtype`` ∈ {object, array,
    string, number, boolean, null}; ``n`` counts occurrences (array
    elements individually), ``n_docs`` distinct documents.  Malformed
    JSON rows are excluded (they are the validators' concern)."""
    spark = df.sparkSession
    view = f"_jpp_{uuid.uuid4().hex[:10]}"
    df.selectExpr(f"{id_col} AS doc_id", f"{json_col} AS j").createOrReplaceTempView(view)

    def level(prev: str) -> str:
        return (
            "SELECT doc_id, CASE WHEN e.key IS NOT NULL "
            "THEN concat(path, '.', e.key) ELSE concat(path, '[]') END AS path, "
            f"e.value AS val FROM {prev}, LATERAL variant_explode(val) AS e"
        )

    # parse ONCE: the filter sits above the projection so each row pays
    # a single try_parse_json (in one SELECT block the WHERE clause
    # would re-evaluate the parse per row)
    ctes = ["l0 AS (SELECT doc_id, '$' AS path, val FROM "
            f"(SELECT doc_id, try_parse_json(j) AS val FROM {view}) "
            "WHERE val IS NOT NULL)"]
    names = ["l0"]
    for d in range(1, max_depth + 1):
        ctes.append(f"l{d} AS ({level(f'l{d - 1}')})")
        names.append(f"l{d}")
    union = " UNION ALL ".join(f"SELECT * FROM {n}" for n in names)
    canon = _CANON.format(st="schema_of_variant(val)")
    out = spark.sql(
        f"WITH {', '.join(ctes)}, allp AS ({union}) "
        f"SELECT path, {canon} AS jtype, "
        "count(*) AS n, count(DISTINCT doc_id) AS n_docs "
        "FROM allp GROUP BY path, jtype ORDER BY path, jtype"
    )
    spark.catalog.dropTempView(view)  # plan already resolved; safe
    return out


def json_value_profile(
    df: DataFrame, id_col: str, json_col: str, *, max_depth: int = 3, top_k: int = 16
) -> DataFrame:
    """(path, jtype, value, n, rk) — the VALUE-level companion of
    :func:`json_path_profile`: for every scalar leaf path, the top
    ``top_k`` observed values (rendered as canonical JSON text, so
    strings keep their quotes and the key stays engine-portable) by
    descending count with value as the tie-break.  This is the relation
    enum inference reads (``schema.infer.infer_schema(values=...)``)
    and the per-field "top values" panel of a data-profiling report.

    Execution shape: same depth-bounded variant-explode chain as the
    path profile, filtered to scalar nodes, one (path, jtype, value)
    aggregate, then a per-(path, jtype) window rank — the window's key
    cardinality is the number of distinct FIELD VALUES, bounded by the
    aggregate, never the corpus; a genuinely high-cardinality field
    costs one extra shuffle of its distinct values only."""
    spark = df.sparkSession
    view = f"_jvp_{uuid.uuid4().hex[:10]}"
    df.selectExpr(f"{id_col} AS doc_id", f"{json_col} AS j").createOrReplaceTempView(view)

    def level(prev: str) -> str:
        return (
            "SELECT doc_id, CASE WHEN e.key IS NOT NULL "
            "THEN concat(path, '.', e.key) ELSE concat(path, '[]') END AS path, "
            f"e.value AS val FROM {prev}, LATERAL variant_explode(val) AS e"
        )

    ctes = ["l0 AS (SELECT doc_id, '$' AS path, val FROM "
            f"(SELECT doc_id, try_parse_json(j) AS val FROM {view}) "
            "WHERE val IS NOT NULL)"]
    names = ["l0"]
    for d in range(1, max_depth + 1):
        ctes.append(f"l{d} AS ({level(f'l{d - 1}')})")
        names.append(f"l{d}")
    union = " UNION ALL ".join(f"SELECT * FROM {n}" for n in names)
    canon = _CANON.format(st="schema_of_variant(val)")
    out = spark.sql(
        f"WITH {', '.join(ctes)}, allp AS ({union}), "
        f"scal AS (SELECT path, {canon} AS jtype, to_json(val) AS value "
        f"FROM allp WHERE {canon} NOT IN ('object', 'array')), "
        "agg AS (SELECT path, jtype, value, count(*) AS n "
        "FROM scal GROUP BY path, jtype, value), "
        "ranked AS (SELECT *, row_number() OVER "
        "(PARTITION BY path, jtype ORDER BY n DESC, value) AS rk FROM agg) "
        f"SELECT path, jtype, value, n, rk FROM ranked WHERE rk <= {int(top_k)} "
        "ORDER BY path, jtype, rk"
    )
    spark.catalog.dropTempView(view)  # plan already resolved; safe
    return out
