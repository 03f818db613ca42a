"""End-to-end training-data curation verdicts: compose the quality,
intra-doc repetition, cross-doc duplicate-span, and exact-dedup
signals into one keep/drop decision (+ machine-readable reasons) per
document — the composed filter a 100 TB curation pipeline actually
runs.  No reference precedent (the reference validates single
samples, not corpora); required by the task brief, SURVEY.md §2.F.

Execution shape: four per-doc signal relations, every one keyed on
doc_id after its first aggregation, so the final assembly is a chain
of co-partitioned joins (AQE merges the exchanges).  All thresholds
compare 6-dp-rounded doubles, so the keep verdict is bit-identical
across engines (the DuckDB oracle mirrors the full formula).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fences_spark.operators import round6

from fences_spark.operators.dedup import (
    dup_span_stats,
    ensure_parallelism,
    tokens,
    word_shingles,
)
from fences_spark.operators.text import doc_fingerprint, quality_score


def _base_signals(base: DataFrame, *, span_k: int = 5) -> DataFrame:
    """(doc_id, quality, rep3, span_ratio, is_canonical) — the four
    per-document content signals shared by the composed verdicts."""
    q = base.select(
        "doc_id",
        quality_score(F.col("text")).alias("quality"),
        doc_fingerprint(F.col("text")).alias("fp"),
    )
    keepers = q.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))

    g3 = base.select(
        "doc_id",
        F.explode(word_shingles(tokens(F.col("text")), 3)).alias("gram"),
    )
    c3 = g3.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    rep = c3.groupBy("doc_id").agg(
        round6(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
            / F.sum("c")
        ).alias("rep3")
    )

    span = dup_span_stats(base, "doc_id", "text", k=span_k).select(
        "doc_id", "dup_ratio"
    )

    return (
        q.join(keepers, "fp")
        .join(rep, "doc_id", "left")
        .join(span, "doc_id", "left")
        .select(
            "doc_id",
            "quality",
            F.coalesce(F.col("rep3"), F.lit(0.0)).alias("rep3"),
            F.coalesce(F.col("dup_ratio"), F.lit(0.0)).alias("span_ratio"),
            (F.col("doc_id") == F.col("keep_id")).alias("is_canonical"),
        )
    )


def _verdict(j: DataFrame, flags: list) -> DataFrame:
    """(doc_id, keep, reasons) from a signal frame + ordered
    (name, fired-condition) flags; concat_ws skips nulls so un-fired
    flags vanish from the reasons list."""
    reasons = F.concat_ws(",", *[F.when(cond, F.lit(name)) for name, cond in flags])
    keep = F.lit(True)
    for _name, cond in flags:
        keep = keep & ~cond
    return j.select("doc_id", keep.alias("keep"), reasons.alias("reasons")).orderBy(
        "doc_id"
    )


def curate_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_quality: float = 0.8,
    max_dup3gram: float = 0.1,
    max_dup_span: float = 0.5,
    span_k: int = 5,
    persist_base: bool = True,
) -> DataFrame:
    """(doc_id, keep, reasons) — keep=false iff any filter fires;
    reasons is the comma-joined ordered list of fired filter names
    (``low_quality``, ``repetitive``, ``dup_spans``, ``exact_dup``),
    empty string when kept.

    - ``low_quality``: :func:`quality_score` < ``min_quality``.
    - ``repetitive``: duplicate word-3-gram position fraction
      (Gopher-style) > ``max_dup3gram``.
    - ``dup_spans``: cross-document duplicated ``span_k``-gram
      position fraction (Lee-et-al-style) > ``max_dup_span``.
    - ``exact_dup``: not the canonical (minimum-id) document of its
      normalized-content fingerprint group.
    """
    base = ensure_parallelism(df, id_col).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    if persist_base:
        # one scan per signal subtree otherwise; MEMORY_ONLY for the
        # same no-unpersist-leak reason as curate_documents_full
        from pyspark import StorageLevel

        base = base.persist(StorageLevel.MEMORY_ONLY)
    j = _base_signals(base, span_k=span_k)

    flags = [
        ("low_quality", F.col("quality") < F.lit(min_quality)),
        ("repetitive", F.col("rep3") > F.lit(max_dup3gram)),
        ("dup_spans", F.col("span_ratio") > F.lit(max_dup_span)),
        ("exact_dup", ~F.col("is_canonical")),
    ]
    return _verdict(j, flags)


# ---------------------------------------------------------------------------
# benchmark decontamination (train ∩ eval k-gram overlap)
# ---------------------------------------------------------------------------


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 5,
) -> DataFrame:
    """Per-train-document benchmark-contamination signal: for each
    training document, how many of its distinct word ``k``-grams also
    appear anywhere in the held-out ``eval_set`` corpus — the
    decontamination filter every pretraining pipeline runs before
    training (drop/flag documents that leak evaluation data; see e.g.
    the n-gram overlap checks of GPT-3 appx. C / PaLM / Llama).  No
    reference precedent (SURVEY.md §2.F).

    Returns (doc_id, total_grams, hit_grams, contaminated), one row
    per train document, ordered by id.

    Execution shape: both corpora shingle through the same one-pass
    regex shingler (`dedup.word_shingles`) and carry grams as 60-bit
    md5 longs.  The eval gram set is DISTINCT'd then **broadcast** —
    benchmarks are fixed-size (MBs) while the train corpus is the
    100 TB side, so the probe is a map-side hash lookup with zero
    shuffle of train grams; the only shuffle is the final
    groupBy(doc_id) fold, map-side combined.  If the eval side ever
    outgrows the broadcast threshold, drop the hint and AQE plans a
    shuffled hash join on the 8-byte gram key.
    """
    from fences_spark.operators.dedup import _token_hash, exploded_shingles

    tg = exploded_shingles(train, id_col, text_col, k).select(
        "doc_id", _token_hash(F.col("shingle")).alias("h")
    )
    eg = (
        exploded_shingles(eval_set, id_col, text_col, k)
        .select(_token_hash(F.col("shingle")).alias("h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        tg.join(F.broadcast(eg), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("total_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("hit_grams"),
        )
        .select(
            "doc_id",
            "total_grams",
            "hit_grams",
            (F.col("hit_grams") > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# URL domain extraction + blocklist filter
# ---------------------------------------------------------------------------

_URL_DOMAIN_RE = r"https?://([a-z0-9.-]+)"


def url_domains(text: Column) -> Column:
    """Sorted distinct lowercase domains of every http(s) URL in the
    text — one `regexp_extract_all` capture pass, pure JVM (regex
    subset parses identically under Java regex and RE2)."""
    return F.array_sort(
        F.array_distinct(F.regexp_extract_all(F.lower(text), F.lit(_URL_DOMAIN_RE), 1))
    )


def blocklist_filter(
    df: DataFrame, id_col: str, text_col: str, blocked: list[str]
) -> DataFrame:
    """(doc_id, n_domains, blocked, matched_domain) — the
    domain-blocklist gate of a web-corpus curation pipeline (the
    C4/RefinedWeb "bad-domain" filter): a document is blocked when any
    of its URL domains equals a blocklist entry or is a subdomain of
    one (dot-suffix match).  No reference precedent (SURVEY.md §2.F).

    Execution shape: the blocklist is a pipeline constant (thousands
    of entries at most), so membership folds into the projection as an
    `exists` over the per-row domain array against literal entries —
    zero shuffles, zero joins, whole-stage codegen; `matched_domain`
    is the lexicographically first offender (deterministic).  If the
    blocklist ever outgrows literal folding, switch to an exploded
    broadcast join on domain.
    """
    if not blocked:
        raise ValueError("blocked must be a non-empty domain list")
    blocked = sorted({b.lower() for b in blocked})

    def _hits(d: Column) -> Column:
        hit = F.lit(False)
        for b in blocked:
            hit = hit | (d == b) | d.endswith("." + b)
        return hit

    doms = url_domains(F.col(text_col))
    matches = F.filter(doms, _hits)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(doms).alias("n_domains"),
        (F.size(matches) > 0).alias("blocked"),
        F.try_element_at(matches, F.lit(1)).alias("matched_domain"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# corpus-quantile length-band filter
# ---------------------------------------------------------------------------


def length_band_filter(
    df: DataFrame, id_col: str, text_col: str, *,
    p_lo: float = 0.05, p_hi: float = 0.95, approx: bool = False,
) -> DataFrame:
    """(doc_id, n_tokens, lo, hi, keep) — drop documents whose token
    count falls outside the corpus's [p_lo, p_hi] quantile band: the
    too-short/too-long outlier gate of a curation pipeline, with the
    thresholds DERIVED FROM THE CORPUS rather than hand-tuned.  No
    reference precedent (SURVEY.md §2.F).

    Execution shape: token counts are one narrow projection; the two
    quantiles are ONE global aggregate reduced to a single row that
    Catalyst turns into a broadcast nested-loop join of a 1-row
    relation (no shuffle of the corpus side); the verdict is then a
    codegen'd comparison.  ``approx=True`` swaps exact ``percentile``
    for the `percentile_approx` sketch — the 100 TB path, where an
    exact global sort-based quantile is needless (the band edges are
    heuristic); exact mode exists for the cross-engine oracle.
    Quantiles are 6-dp rounded so the keep verdict is bit-identical
    across engines."""
    fn = F.percentile_approx if approx else F.percentile
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    band = toks.agg(
        round6(fn("n_tokens", F.lit(p_lo))).alias("lo"),
        round6(fn("n_tokens", F.lit(p_hi))).alias("hi"),
    )
    return (
        toks.crossJoin(F.broadcast(band))
        .select(
            "doc_id", "n_tokens", "lo", "hi",
            ((F.col("n_tokens") >= F.col("lo"))
             & (F.col("n_tokens") <= F.col("hi"))).alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# full composed curation verdict (all engine signals)
# ---------------------------------------------------------------------------


def curate_documents_full(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_quality: float = 0.8,
    max_dup3gram: float = 0.1,
    max_dup_span: float = 0.5,
    span_k: int = 5,
    eval_frac: float = 0.05,
    blocked_domains: list[str] | None = None,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    persist_base: bool = True,
    staging_path: str | None = None,
) -> DataFrame:
    """(doc_id, keep, reasons) — the END-TO-END keep/drop verdict
    composing every curation signal the engine implements, in one
    plan: eval holdout exclusion, benchmark decontamination, domain
    blocklist, corpus-quantile length band, quality floor, Gopher
    repetition, Lee duplicate spans, exact-dedup canonicalization.
    Reason order (machine-readable, comma-joined): ``eval_holdout,
    contaminated, blocked_domain, out_of_band, low_quality,
    repetitive, dup_spans, exact_dup``.

    Execution shape: every signal reduces to a doc_id-keyed relation
    — the assembly is a chain of co-partitioned left joins (AQE
    coalesces the exchanges); the eval gram set broadcasts
    (decontaminate); the length band broadcasts as a 1-row relation;
    the blocklist folds into the projection.  All thresholds compare
    6-dp-rounded doubles (bit-identical cross-engine).

    Scale note: the signal subtrees are independent, so Catalyst
    plans one SCAN PER SIGNAL (~8 passes over (doc_id, text)).  At
    small scale the OS page cache absorbs this; at 100 TB pass
    ``staging_path`` — the two-column projection is materialized to
    parquet there in ONE scan of the raw table, and every signal
    subtree then reads the narrow staging table (tests/
    test_curate_staging.py pins that the final plan scans only the
    staging location).  ``persist_base`` (executor-memory cache) is
    the zero-setup middle ground when no staging location exists;
    staging wins at scale because disk-backed parquet survives
    executor loss and memory pressure, and the staging scan decodes
    2 columns instead of the raw table's full width.
    """
    from fences_spark.operators.sampling import hash_bucket, threshold_hex

    base = ensure_parallelism(df, id_col).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    if staging_path is not None:
        # ONE scan of the raw table; all ~8 signal subtrees re-read
        # the 2-column staging parquet instead.  Eager by design —
        # the write is the scan-dedup point.
        spark = df.sparkSession
        base.write.mode("overwrite").parquet(staging_path)
        base = spark.read.parquet(staging_path)
        persist_base = False
    if persist_base:
        # the signal subtrees are independent, so Catalyst plans one
        # scan per signal (~8 passes); persisting the two-column
        # projection converts them into columnar-cache reads (30%
        # wall at sf0.1 with a WARM page cache; at 100 TB it removes
        # 7 full parquet decodes).  MEMORY_ONLY on purpose: this
        # lazy-returning function cannot know when to unpersist, and
        # un-unpersisted MEMORY_AND_DISK blocks leak scratch disk
        # across repeated calls in a long session — memory blocks are
        # simply LRU-evicted (falling back to recompute).  A pipeline
        # that CAN unpersist (run/pipeline.py) manages its own
        # disk-backed persists instead.
        from pyspark import StorageLevel

        base = base.persist(StorageLevel.MEMORY_ONLY)
    sig = _base_signals(base, span_k=span_k)

    is_eval_col = hash_bucket(F.col("doc_id")) < F.lit(threshold_hex(eval_frac))
    split = base.withColumn("is_eval", is_eval_col)
    decon = decontaminate(
        split.filter(~F.col("is_eval")),
        split.filter(F.col("is_eval")),
        "doc_id",
        "text",
        k=span_k,
    ).select("doc_id", "contaminated")

    band = length_band_filter(base, "doc_id", "text", p_lo=p_lo, p_hi=p_hi).select(
        "doc_id", F.col("keep").alias("in_band")
    )

    # no blocklist given → the signal is OFF (never silently block
    # against some default domain list)
    if blocked_domains:
        blk = blocklist_filter(base, "doc_id", "text", blocked_domains).select(
            "doc_id", "blocked"
        )
    else:
        blk = base.select("doc_id", F.lit(False).alias("blocked"))

    j = (
        sig.join(split.select("doc_id", "is_eval"), "doc_id")
        .join(decon, "doc_id", "left")
        .join(band, "doc_id")
        .join(blk, "doc_id")
        .select(
            "doc_id", "quality", "rep3", "span_ratio", "is_canonical",
            "is_eval",
            F.coalesce(F.col("contaminated"), F.lit(False)).alias("contaminated"),
            "in_band", "blocked",
        )
    )

    flags = [
        ("eval_holdout", F.col("is_eval")),
        ("contaminated", F.col("contaminated")),
        ("blocked_domain", F.col("blocked")),
        ("out_of_band", ~F.col("in_band")),
        ("low_quality", F.col("quality") < F.lit(min_quality)),
        ("repetitive", F.col("rep3") > F.lit(max_dup3gram)),
        ("dup_spans", F.col("span_ratio") > F.lit(max_dup_span)),
        ("exact_dup", ~F.col("is_canonical")),
    ]
    return _verdict(j, flags)
