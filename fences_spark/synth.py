"""Deterministic synthesis of the north-rule target table
(FIXTURES.md §A): ``files(repo, path, commit, lang, content)`` plus
the ``commits`` referential dim and the ``baseline_hist`` drift
snapshot.

Everything is generated **distributed** with ``spark.range(n)`` and
pure JVM column expressions — no driver-side loops, no Python RNG —
so the same ``n_rows`` always produces byte-identical tables at any
parallelism (the scaling-bench requirement) and the generator itself
scales to the bench sizes (~10^6 rows locally, arbitrarily more on a
cluster).

Planted defects (exact, formula-derived — FIXTURES.md A1):
- duplicate (repo,path,commit) keys:      rows with  i % 1000 == 7 are
  emitted twice (second copy gets a different content suffix so dedup
  must key on the triple, not the payload);
- orphan (repo,commit) pairs:             commit-groups g with
  g % 97 == 13 are omitted from ``commits``;
- null / empty content:                   i % 701 == 3 → NULL,
  i % 701 == 5 → '' ;
- lang outside the enum:                  i % 509 == 11 → 'klingon';
- one shifted-lang partition (drift):     i // 10_000 == 2 →
  lang forced to 'go' where i % 3 == 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

LANGS = ["python", "java", "c", "go", "rust", "js", "other"]
# fixed categorical probabilities over a 0-99 bucket (drift baseline)
_LANG_CUTS = [(30, "python"), (50, "java"), (60, "c"), (70, "go"), (75, "rust"), (90, "js"), (100, "other")]
_EXT = {"python": "py", "java": "java", "c": "c", "go": "go", "rust": "rs", "js": "js", "other": "txt"}


def _lang_col(i):
    """Deterministic categorical from a 0-99 hash bucket."""
    bucket = F.pmod(F.xxhash64(F.concat(F.lit("lang"), i.cast("string"))), F.lit(100))
    expr = None
    for cut, lang in _LANG_CUTS:
        cond = bucket < cut
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr


def _clean_files(spark: SparkSession, n_rows: int) -> DataFrame:
    """The defect-free base table (drift baseline is computed on this)."""
    df = spark.range(n_rows).withColumnRenamed("id", "i")
    i = F.col("i")
    istr = i.cast("string")

    # Zipf-ish skew: every 5th row lands in the one hot repo (~20%)
    repo = F.when(
        F.pmod(i, 5) == 0, F.lit("org0/repo0")
    ).otherwise(F.concat(F.lit("org"), F.pmod(i, 7).cast("string"),
                         F.lit("/repo"), F.pmod(i, 101).cast("string")))

    lang = _lang_col(i)
    ext = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(k) for k in _EXT]),
            F.array(*[F.lit(v) for v in _EXT.values()]),
        ),
        lang,
    )

    # path depth 2..7: "src/pkg{a}/pkg{b}/.../file{i}.{ext}"
    depth = F.pmod(i, 6)  # 0..5 extra levels
    levels = F.slice(
        F.array(*[F.concat(F.lit(f"pkg"), F.pmod(i + k, 13).cast("string")) for k in range(5)]),
        1,
        depth.cast("int"),
    )
    path = F.concat_ws(
        "/",
        F.concat(F.lit("src")),
        F.concat_ws("/", levels),
        F.concat(F.lit("file"), istr, F.lit("."), ext),
    )
    # concat_ws skips empty strings? It does NOT skip '' — normalize '//'
    path = F.regexp_replace(path, "//", "/")

    # ~50 files per commit; 40-hex via sha1
    commit = F.sha1(F.concat(F.lit("c"), F.floor(i / 50).cast("string")).cast("binary"))

    # content: deterministic printable text, length log-spread 10..10^4
    u = F.pmod(F.xxhash64(F.concat(F.lit("len"), istr)), F.lit(10000)) / F.lit(10000.0)
    length = F.floor(F.exp(F.log(F.lit(10.0)) + u * (F.log(F.lit(10000.0)) - F.log(F.lit(10.0))))).cast("int")
    seed_chunk = F.sha2(F.concat(F.lit("s"), istr).cast("binary"), 256)  # 64 hex chars
    content = F.substring(F.repeat(seed_chunk, F.ceil(length / 64).cast("int") + 1), 1, length)

    return df.select(
        i.alias("i"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def files_table(spark: SparkSession, n_rows: int, with_defects: bool = True) -> DataFrame:
    """The target table, with planted defects unless disabled.
    Column set matches the north-rule input hint exactly:
    (repo, path, commit, lang, content) — plus the synthesis index
    ``i`` is dropped."""
    base = _clean_files(spark, n_rows)
    if not with_defects:
        return base.drop("i")
    i = F.col("i")
    df = (
        base
        .withColumn(
            "content",
            F.when(F.pmod(i, 701) == 3, F.lit(None).cast("string"))
            .when(F.pmod(i, 701) == 5, F.lit(""))
            .otherwise(F.col("content")),
        )
        .withColumn(
            "lang",
            F.when(F.pmod(i, 509) == 11, F.lit("klingon"))
            .when((F.floor(i / 10000) == 2) & (F.pmod(i, 3) == 0), F.lit("go"))
            .otherwise(F.col("lang")),
        )
    )
    dups = df.filter(F.pmod(i, 1000) == 7).withColumn(
        "content", F.concat(F.coalesce(F.col("content"), F.lit("")), F.lit("-dup"))
    )
    return df.unionByName(dups).drop("i")


def expected_defect_counts(n_rows: int) -> dict[str, int]:
    """Exact planted-defect counts for assertions (pure formulas)."""
    dup_keys = len([x for x in range(7, n_rows, 1000)])
    null_content = len([x for x in range(3, n_rows, 701)])
    empty_content = len([x for x in range(5, n_rows, 701)])
    bad_lang = len([x for x in range(11, n_rows, 509)])
    n_commit_groups = (n_rows + 49) // 50
    orphan_groups = len([g for g in range(n_commit_groups) if g % 97 == 13])
    return {
        "dup_keys": dup_keys,
        "null_content": null_content,
        "empty_content": empty_content,
        "bad_lang": bad_lang,
        "orphan_commit_groups": orphan_groups,
    }


def commits_table(spark: SparkSession, n_rows: int) -> DataFrame:
    """Referential dim: every (repo, commit) pair used by ``files``
    except planted-orphan commit groups (g % 97 == 13).  Built from
    the same formulas, so it is consistent with files_table(n_rows)."""
    base = _clean_files(spark, n_rows).select("i", "repo", "commit")
    g = F.floor(F.col("i") / 50)
    return (
        base.filter(F.pmod(g, 97) != 13)
        .select(
            "repo",
            "commit",
            F.to_timestamp(
                F.from_unixtime(F.lit(1600000000) + g * 3600)
            ).alias("committed_at"),
        )
        .distinct()
    )


def baseline_hist(spark: SparkSession, n_rows: int) -> DataFrame:
    """Drift baseline: lang and path-depth histograms of the *clean*
    table (FIXTURES.md A3). Schema: (dim, bucket, cnt)."""
    clean = _clean_files(spark, n_rows)
    lang_h = (
        clean.groupBy(F.col("lang").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("lang").alias("dim"), "bucket", "cnt")
    )
    depth_h = (
        clean.select((F.size(F.split(F.col("path"), "/")) - 1).alias("d"))
        .groupBy(F.col("d").cast("string").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("path_depth").alias("dim"), "bucket", "cnt")
    )
    return lang_h.unionByName(depth_h)


# ---------------------------------------------------------------------------
# synthetic documents corpus (composite-pipeline bench)
# ---------------------------------------------------------------------------

DOC_VOCAB = (
    # ~20% common stopwords so the synthetic corpus's quality_score
    # lands in a realistic band (not pinned to the 0.8 keep threshold)
    "the the a and of to in is that it for "
    "quick brown fox jumps over lazy dog data spark table query "
    "plan stage shuffle join scan filter merge sort hash bucket salt "
    "skew probe build column row batch stream window state commit "
    "schema type string number array object valid check rule corpus "
    "token chunk pack shard sample quality span gram model train"
).split()

_DOC_BOILERPLATE = (
    "all rights reserved terms of service privacy policy cookie "
    "notice subscribe to our newsletter follow us on social media"
)


def documents_table(spark: SparkSession, n_rows: int) -> DataFrame:
    """Deterministic synthetic curation corpus at any scale —
    (doc_id, text, lang, source, n_chars), same shape as the driver's
    ``documents`` table.  Generated entirely with JVM expressions
    (``spark.range`` + hash-seeded token picks): byte-identical at any
    parallelism, no driver loops, no Python.

    Planted content classes by a 0-99 hash bucket so the composite
    pipeline has real work at every stage:

    - cls < 10   exact duplicates: 16-row groups share one text
    - 10-19      near duplicates: group text + one unique tail token
    - 20-24      boilerplate-heavy: shared legal footer + unique tail
    - 25-29      low quality: one token repeated 3..40 times
    - 30         empty text (degenerate row for validate/curate)
    - else       unique 15..45-token documents
    """
    V = len(DOC_VOCAB)
    vocab_arr = F.array(*[F.lit(w) for w in DOC_VOCAB])
    df = spark.range(n_rows).withColumnRenamed("id", "i")
    i = F.col("i")
    istr = i.cast("string")
    cls = F.pmod(F.xxhash64(F.concat(F.lit("cls"), istr)), F.lit(100))

    group_head = (i - F.pmod(i, F.lit(16))).cast("string")
    seed = F.when(cls < 20, group_head).otherwise(istr)
    n_tok = (F.pmod(F.xxhash64(F.concat(F.lit("ntok"), seed)), F.lit(31)) + 15).cast("int")
    base = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), n_tok - 1),
            lambda j: F.element_at(
                vocab_arr,
                (F.pmod(F.xxhash64(seed, j.cast("string")), F.lit(V)) + 1).cast("int"),
            ),
        ),
    )
    uniq_word = F.element_at(
        vocab_arr, (F.pmod(F.xxhash64(F.concat(F.lit("u"), istr)), F.lit(V)) + 1).cast("int")
    )
    rep_n = (F.pmod(F.xxhash64(F.concat(F.lit("rep"), istr)), F.lit(38)) + 3).cast("int")
    text = (
        F.when(cls < 10, base)                                        # exact dup group
        .when(cls < 20, F.concat(base, F.lit(" tail"), istr))         # near dup
        .when(cls < 25, F.concat(F.lit(_DOC_BOILERPLATE), F.lit(" "), uniq_word, F.lit(" "), istr))
        .when(cls < 30, F.concat_ws(" ", F.array_repeat(uniq_word, rep_n)))
        .when(cls == 30, F.lit(""))
        .otherwise(base)
    )
    lang = (
        F.when(F.pmod(i, 10) < 6, F.lit("en"))
        .when(F.pmod(i, 10) < 8, F.lit("de"))
        .when(F.pmod(i, 10) < 9, F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return df.select(
        i.alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        F.concat(F.lit("src"), F.pmod(i, 10).cast("string")).alias("source"),
        F.length(text).alias("n_chars"),
    )
