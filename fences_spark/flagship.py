"""The flagship validation: north-rule column bindings (FIXTURES.md
§B "Column-rule bindings") compiled over the files table, plus an
equivalent binding for the driver testdata tables used by the smoke
entry point.

Rules (all compile to the "typed" builtin tier — pure codegen):
  repo    → pattern ^[-\\w.]+/[-\\w.]+$
  path    → minLength 1 + pattern
  commit  → pattern ^[0-9a-f]{40}$
  lang    → enum [python java c go rust js other]
  content → type string + minLength 1
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fences_spark.compiler.ruleset import RuleSet, ValidationResult
from fences_spark.synth import LANGS


def files_ruleset() -> RuleSet:
    rs = RuleSet()
    rs.add("repo_format", "repo", {"type": "string", "pattern": "^[-\\w.]+/[-\\w.]+$"})
    rs.add("path_nonempty", "path", {"type": "string", "minLength": 1, "pattern": "^[-\\w./]+$"})
    rs.add("commit_sha", "commit", {"type": "string", "pattern": "^[0-9a-f]{40}$"})
    rs.add("lang_enum", "lang", {"type": "string", "enum": LANGS})
    rs.add("content_present", "content", {"type": "string", "minLength": 1})
    return rs


def validate_files(files: DataFrame) -> ValidationResult:
    """Annotate the files table with verdicts + the sha256 row
    invariant (BASELINE.json:15: per-row content sha256 equality vs
    the reference — computed JVM-side with the built-in sha2)."""
    res = files_ruleset().apply(files)
    res.df = res.df.withColumn("content_sha256", F.sha2(F.col("content"), 256))
    return res


def files_from_documents(docs: DataFrame) -> DataFrame:
    """Project the driver's ``documents`` parquet into the north-rule
    files shape (repo, path, commit, lang, content) with planted
    defects — every column a PURE function of ``doc_id``/``text``, so
    the DuckDB oracle re-derives the byte-identical table and the
    flagship verdict/violation pipeline becomes value-hash gated
    (``files_table`` synthesizes in Python and is rows-only).

    Planted defects (co-prime moduli so they overlap rarely but do
    overlap — doc_id 0 breaks several rules at once, pinning the
    multi-violation explode):
      doc_id %41==0 → repo gains a space   (repo_format)
      doc_id %43==0 → path empty           (path_nonempty)
      doc_id %47==0 → commit uppercased    (commit_sha)
      doc_id %53==0 → lang 'cobol'         (lang_enum)
      doc_id %59==0 → content empty        (content_present)
    """
    i = F.col("doc_id")
    s = i.cast("string")
    repo = F.when(
        F.pmod(i, 41) == 0, F.concat(F.lit("bad org "), s)
    ).otherwise(
        F.concat(F.lit("org"), F.pmod(i, 97).cast("string"),
                 F.lit("/repo"), F.pmod(i, 13).cast("string"))
    )
    path = F.when(F.pmod(i, 43) == 0, F.lit("")).otherwise(
        F.concat(F.lit("src/f"), s, F.lit(".txt"))
    )
    sha40 = F.substring(F.sha2(s, 256), 1, 40)
    commit = F.when(F.pmod(i, 47) == 0, F.upper(sha40)).otherwise(sha40)
    lang = F.when(F.pmod(i, 53) == 0, F.lit("cobol")).otherwise(
        F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                     (F.pmod(i, len(LANGS)) + 1).cast("int"))
    )
    content = F.when(F.pmod(i, 59) == 0, F.lit("")).otherwise(F.col("text"))
    return docs.select(
        i.alias("file_id"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


# ---------------------------------------------------------------------------
# smoke flagship over driver testdata (documents + events), used by
# __spark_entry__.entry — validates real tables shipped with the
# sandbox and returns a per-rule verdict summary.
# ---------------------------------------------------------------------------

def testdata_ruleset() -> RuleSet:
    rs = RuleSet()
    rs.add("doc_text_present", "text", {"type": "string", "minLength": 1})
    rs.add("doc_lang_format", "lang", {"type": "string", "pattern": "^[a-z]{2}$"})
    rs.add("doc_nchars_nonneg", "n_chars", {"type": "integer", "minimum": 0})
    return rs


def flagship_entry(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = testdata_ruleset().apply(docs)
    return (
        res.df.groupBy("row_valid")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum((~F.col(rid)).cast("long")).alias(f"fail_{rid}")
                for rid in res.rule_ids
            ],
        )
        .orderBy("row_valid")
    )
