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
