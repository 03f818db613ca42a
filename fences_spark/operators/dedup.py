"""Deduplication suite for training-data pipelines: exact
(hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard — pure built-in
Column algebra (no UDFs).

Execution-shape rationale (learned from .explain + thread dumps, and
the reason these are NOT written as per-row array folds): Spark's
higher-order functions (transform/aggregate/zip_with) evaluate
*interpreted*, outside whole-stage codegen, and a column referenced N
times re-evaluates its subtree N times.  A per-row "array of 12
minhashes" formulation costs 12 interpreted shingle constructions per
document on one core.  The formulations below instead **explode
shingles/tokens once** and express every signature as **codegen'd
min()/sum() aggregates** — map-side combined, shuffled once per doc,
parallel across all cores, and linear in corpus size at 10^12 docs.

Hashes are md5 built-ins keyed with explicit seed strings, so the
DuckDB oracles compute identical signatures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from fences_spark.operators import round6


# ---------------------------------------------------------------------------
# tokenization / shingling
# ---------------------------------------------------------------------------


def ensure_parallelism(df: DataFrame, key: str) -> DataFrame:
    """Spread CPU-bound shingling/hashing across the cluster when the
    source scan has fewer partitions than cores (a small parquet file
    arrives as ONE task, serializing every downstream md5 on one core
    — observed 30s vs 2s at sf0.1).  At 10^12-doc scale the scan
    already has >= defaultParallelism partitions and this is a no-op,
    so the big-data path pays zero extra shuffle.

    The partition probe (``df.rdd.getNumPartitions()``) forces a
    plan→RDD conversion per call — cheap but not free, and pointless
    on a production cluster where scans are always wide.  The session
    conf ``spark.fences_spark.ensureParallelism`` gates it:
    ``auto`` (default) probes; ``off`` trusts the scan (the 10^12
    setting — zero probe, zero shuffle); ``force`` always
    repartitions (tiny replay inputs, no probe either)."""
    spark = df.sparkSession
    mode = spark.conf.get("spark.fences_spark.ensureParallelism", "auto")
    if mode == "off":
        return df
    target = spark.sparkContext.defaultParallelism
    if mode == "force":
        return df.repartition(target, F.col(key))
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(key))
    return df


def tokens(col: Column) -> Column:
    """Lowercased word tokens (alnum runs)."""
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda x: x != "")


def word_shingles(toks: Column, k: int) -> Column:
    """k-word shingles as strings; a doc shorter than k words yields
    its single joined token string; a doc with NO tokens yields NO
    shingles.  (The zero-token fallback used to be the ``''`` shingle,
    which is both semantically wrong — an empty document has no spans
    to be duplicated — and a corpus-wide hot key at scale: every
    empty/whitespace-only document in a 100 TB corpus would collide on
    one gram in every downstream groupBy/join.  Found by the seeded
    pathological-corpus oracle fuzz, tests/test_fuzz_corpora.py.)

    Execution shape: higher-order lambdas re-evaluate non-lambda-var
    subtrees once PER ELEMENT, so the naive ``transform(sequence, i ->
    concat_ws(slice(toks, i, k)))`` re-tokenizes the document per
    shingle — O(n²) interpreted work per row (measured 2× wall on the
    sf0.1 dedup queries).  Instead join the tokens once and capture
    every k-word run in ONE regex pass: a consumed leading space per
    position plus a zero-width lookahead capture, O(n·k) total."""
    joined = F.concat_ws(" ", toks)
    # tokens never contain spaces (any tokenizer splitting on them),
    # so [^ ]+ words in the single-space-joined string are the tokens
    pattern = f" (?=([^ ]+(?: [^ ]+){{{k - 1}}}))"
    full = F.regexp_extract_all(F.concat(F.lit(" "), joined), F.lit(pattern), 1)
    return (
        F.when(F.size(toks) >= k, full)
        .when(F.size(toks) > 0, F.array(joined))
        .otherwise(F.array().cast("array<string>"))
    )


def exploded_shingles(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(doc_id, shingle) — distinct per doc; the shingle array is
    built exactly once per row and immediately exploded."""
    df = ensure_parallelism(df, id_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_shingles(tokens(F.col(text_col)), k))).alias("shingle"),
    )


def exploded_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    df = ensure_parallelism(df, id_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Duplicate groups by exact content hash: (text_md5, n_copies,
    keep_id) — the canonical hash-groupBy dedup."""
    return (
        df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("text_md5"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, *, n_hashes: int, shingle_k: int = 3
) -> DataFrame:
    """(doc_id, sig array<string>) via explode + n_hashes codegen'd
    ``min(md5(seed || shingle))`` aggregates (one shuffle, map-side
    combined: the shuffle carries only one partial signature row per
    doc per partition, NOT the exploded shingles).  Each seed is an
    independent pseudo-permutation of shingle space; docs with no
    token produce no shingles, hence NO signature row — an empty
    document is never a near-dup candidate (and never a hot band
    bucket).

    Implementation note: the tempting fully-narrow form —
    ``array(array_min(transform(shingles, x -> md5(seed||x))) for each
    seed)`` over a staged shingle column — MISCOMPILES on Spark 4.1
    (local[32]): observed cross-row contamination (per-row minima
    below the row's own true minimum, nondeterministic across runs)
    once many higher-order transforms share one projected array input.
    A single ``aggregate``+``zip_with`` fold is correct but no faster
    than this explode form, so we keep the explode + partial-agg
    shape, which is deterministic and DuckDB-oracle-exact
    (tests/test_training_ops.py, entry ``minhash_lsh_docs``)."""
    ex = exploded_shingles(df, id_col, text_col, shingle_k)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"h{s}")
        for s in range(n_hashes)
    ]
    sig = ex.groupBy("doc_id").agg(*aggs)
    return sig.select("doc_id", F.array(*[F.col(f"h{s}") for s in range(n_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 12,
    band_size: int = 3,
    shingle_k: int = 3,
    max_band_group: int = 64,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) from banded
    MinHash.  Band hash = md5 of the concatenated signature slice.
    Groups larger than ``max_band_group`` in one band are capped
    (smallest ids kept) so a boilerplate cluster cannot explode
    quadratically."""
    n_bands = n_hashes // band_size
    sig = minhash_signatures(df, id_col, text_col, n_hashes=n_hashes, shingle_k=shingle_k)
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(*[
                F.md5(F.concat_ws("|", *[
                    F.element_at("sig", b * band_size + r + 1) for r in range(band_size)
                ]))
                for b in range(n_bands)
            ])
        ).alias("band_idx", "band_hash"),
    )
    grouped = (
        bands.groupBy("band_idx", "band_hash")
        .agg(F.slice(F.array_sort(F.collect_list("doc_id")), 1, max_band_group).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda a, idx: F.transform(
                        F.slice(F.col("ids"), idx + 2, F.size(F.col("ids"))),
                        lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b").distinct()
    return pairs


def minhash_jaccard_estimate(
    df: DataFrame, pairs: DataFrame, id_col: str, text_col: str,
    *, n_hashes: int = 24, shingle_k: int = 3,
) -> DataFrame:
    """Refine candidate pairs with the fraction-of-equal-minhashes
    Jaccard estimator (signatures computed once, joined twice)."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes=n_hashes, shingle_k=shingle_k)
    return _score_pairs(pairs, sigs, n_hashes)


def _score_pairs(pairs: DataFrame, sigs: DataFrame, n_hashes: int) -> DataFrame:
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    eq = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return joined.select("id_a", "id_b", (eq / F.lit(n_hashes)).alias("jaccard_est"))


def _bands_to_pairs(sig_prefix: DataFrame, n_band_hashes: int, band_size: int,
                    max_band_group: int) -> DataFrame:
    """sig_prefix(doc_id, sig) → candidate pairs via banding (shared
    by minhash_lsh_pairs and minhash_near_dup_scored)."""
    n_bands = n_band_hashes // band_size
    bands = sig_prefix.select(
        "doc_id",
        F.posexplode(
            F.array(*[
                F.md5(F.concat_ws("|", *[
                    F.element_at("sig", b * band_size + r + 1) for r in range(band_size)
                ]))
                for b in range(n_bands)
            ])
        ).alias("band_idx", "band_hash"),
    )
    grouped = (
        bands.groupBy("band_idx", "band_hash")
        .agg(F.slice(F.array_sort(F.collect_list("doc_id")), 1, max_band_group).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda a, idx: F.transform(
                        F.slice(F.col("ids"), idx + 2, F.size(F.col("ids"))),
                        lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b").distinct()


def minhash_near_dup_scored(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 24,
    band_hashes: int = 12,
    band_size: int = 3,
    shingle_k: int = 3,
    max_band_group: int = 64,
) -> DataFrame:
    """Candidates + Jaccard estimate from ONE signature pass: the
    full ``n_hashes`` signature is computed once; banding uses its
    first ``band_hashes`` entries (seeds 0..band_hashes-1, identical
    to minhash_lsh_pairs at that size) and scoring uses all of it.
    The corpus is shingled exactly once — the signature aggregate's
    shuffle is reused (ReusedExchange) by the banding branch and both
    join sides, vs 3 full re-shingles when pairing and scoring are
    composed naively.  This is the shape to run at 10^12 docs."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes=n_hashes, shingle_k=shingle_k)
    # Stage the signature relation: three consumers read it (banding,
    # both join sides) and Catalyst does NOT de-duplicate the aggregate
    # subtree (lambda-bearing shingle expressions defeat plan
    # canonicalization → no ReusedExchange), so without staging the
    # corpus would be re-shingled three times.  The signature relation
    # is ~30 bytes/hash/doc — orders of magnitude smaller than the
    # corpus — so MEMORY_AND_DISK staging is the right call at every
    # scale; at 10^12 docs the same pattern writes sigs to a table
    # first (runner-style) instead of the block cache.
    from pyspark import StorageLevel

    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    prefix = sigs.select("doc_id", F.slice("sig", 1, band_hashes).alias("sig"))
    pairs = _bands_to_pairs(prefix, band_hashes, band_size, max_band_group)
    return _score_pairs(pairs, sigs, n_hashes)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over distinct word shingles for every colliding
    pair: (id_a, id_b, jaccard).  Shingle sets are exploded once;
    per-doc sizes come from the same exploded relation (no second
    array construction)."""
    ex = exploded_shingles(df, id_col, text_col, shingle_k)
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    exs = ex.join(sizes, "doc_id")
    a = exs.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("na"), "shingle")
    b = exs.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("nb"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.select("id_a", "id_b", round6(jac).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _token_hash(tok: Column) -> Column:
    """60-bit integer hash of a token, engine-portable: first 15 hex
    chars of md5, base-16 → base-10."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def simhash_table(df: DataFrame, id_col: str, text_col: str, *, bits: int = 32) -> DataFrame:
    """(doc_id, sim) — SimHash over word tokens: bit b of the
    signature is the sign of Σ_tokens (2·bit_b(hash(token)) − 1).
    Explode + ``bits`` codegen'd sum() aggregates (one shuffle),
    then one select assembles the integer.  Docs with zero tokens
    get signature 0."""
    ex = exploded_tokens(df, id_col, text_col)
    h = _token_hash(F.col("token"))
    votes = [
        F.sum(F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("long") * 2 - 1).alias(f"v{b}")
        for b in range(bits)
    ]
    per_doc = ex.groupBy("doc_id").agg(*votes)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    with_sig = per_doc.select("doc_id", sim.alias("sim"))
    # left join back so token-less docs appear with sim = 0
    all_ids = df.select(F.col(id_col).alias("doc_id")).distinct()
    return all_ids.join(with_sig, "doc_id", "left").select(
        "doc_id", F.coalesce("sim", F.lit(0).cast("long")).alias("sim")
    )


def simhash_dup_groups(df: DataFrame, id_col: str, text_col: str, *, bits: int = 32) -> DataFrame:
    """Groups sharing an identical SimHash signature (near-dup
    candidates at Hamming distance 0)."""
    return (
        simhash_table(df, id_col, text_col, bits=bits)
        .groupBy("sim")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str, *,
                       bits: int = 32, n_tables: int = 4) -> DataFrame:
    """Near-dup candidates within Hamming distance: block on
    ``n_tables`` disjoint bit-bands of the signature (a pair within
    distance < n_tables collides in ≥1 band), verify by popcount."""
    sigs = simhash_table(df, id_col, text_col, bits=bits)
    band_w = bits // n_tables
    bands = sigs.select(
        "doc_id", "sim",
        F.posexplode(F.array(*[
            F.shiftright(F.col("sim"), t * band_w).bitwiseAND(F.lit((1 << band_w) - 1))
            for t in range(n_tables)
        ])).alias("band_idx", "band_val"),
    )
    a = bands.select(F.col("doc_id").alias("id_a"), F.col("sim").alias("sim_a"), "band_idx", "band_val")
    b = bands.select(F.col("doc_id").alias("id_b"), F.col("sim").alias("sim_b"), "band_idx", "band_val")
    cand = a.join(b, ["band_idx", "band_val"]).filter(F.col("id_a") < F.col("id_b"))
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") < n_tables)
    )


def simhash(text: Column, bits: int = 32) -> Column:
    """Per-row SimHash as a single Column (interpreted higher-order
    fold — fine for ad-hoc use on small data; use
    :func:`simhash_table` in pipelines)."""
    h = F.transform(tokens(text), _token_hash)
    # bit masks are driver-side literals: shiftright/shiftleft take a
    # plain int shift amount, not a Column, so the per-bit expressions
    # are unrolled in Python (bits is a compile-time constant anyway)
    votes = F.aggregate(
        h,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, x: F.zip_with(
            acc,
            F.array(*[
                (F.when(x.bitwiseAND(F.lit(1 << b)) != 0, F.lit(1))
                  .otherwise(F.lit(-1))).cast("long")
                for b in range(bits)
            ]),
            lambda a, v: a + v,
        ),
    )
    weights = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    return F.aggregate(
        F.zip_with(votes, weights, lambda v, w: F.when(v > 0, w).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


# ---------------------------------------------------------------------------
# connected components over near-dup pairs (cluster assignment)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Cluster ids for the undirected graph of near-dup pairs:
    (node, cluster_id) with cluster_id = min node id in the component.

    Hash-min label propagation — the standard distributed CC for
    dedup graphs (each iteration: join labels to the symmetric edge
    list, take min over neighborhood, converge when no label moves).
    Iterations needed = graph diameter; near-dup graphs are
    short-diameter (clusters of copies), so this converges in a
    handful of rounds even at 10^12 docs.  Each round is one shuffle
    join + one groupBy; ``localCheckpoint`` truncates the growing
    lineage so round N does not replay rounds 1..N-1.

    The reference has no graph operator; this is the cluster-scale
    completion of its duplicate-id detection (core/node.py:63-67) —
    pairs in, one exemplar per duplicate *group* out.
    """
    sym = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("cluster_id", F.col("node"))
    )
    sym = sym.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
                (F.col("nbr_min") < F.col("cluster_id")).alias("_moved"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        moved = updated.filter(F.col("_moved")).limit(1).count()
        labels = updated.drop("_moved")
        if moved == 0:
            return labels
    # falling through would silently return WRONG labels for any
    # component whose diameter exceeds max_iter (e.g. a 30-doc chain):
    # the caller's oracle computes the exact transitive closure, so
    # non-convergence must be loud, not approximate
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        "(component diameter too large); raise max_iter"
    )


def cluster_summary(components: DataFrame) -> DataFrame:
    """(cluster_id, size, keep_id): one row per duplicate cluster;
    keep_id = cluster representative (min node = cluster_id)."""
    return (
        components.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("size"), F.min("node").alias("keep_id"))
    )


# ---------------------------------------------------------------------------
# exact duplicate-span detection (cross-document k-gram overlap)
# ---------------------------------------------------------------------------


def dup_span_stats(df: DataFrame, id_col: str, text_col: str, *, k: int = 5) -> DataFrame:
    """Per-document exact duplicate-span signal: the fraction of word
    k-gram *positions* whose gram also occurs in at least one other
    document ("Deduplicating Training Data Makes Language Models
    Better", Lee et al. 2022 — gram-granular variant of its exact
    substring dedup; no reference precedent, see SURVEY.md §2.F).

    Returns (doc_id, total_grams, dup_grams, dup_ratio) for documents
    with at least one cross-document duplicated span, ordered by id.

    Execution shape: positional grams are exploded once and carried
    as 60-bit md5 longs (8-byte shuffle keys, not gram strings); the
    gram→distinct-doc-count aggregate and the gram↔count equi-join
    both hash-partition on that long, so AQE coalesces them into
    adjacent stages with map-side combine — two shuffles total plus
    the final per-doc fold keyed on doc_id.  Linear in corpus size;
    no UDFs, all codegen'd builtins."""
    g = ensure_parallelism(df, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.transform(word_shingles(tokens(F.col(text_col)), k), _token_hash)
        ).alias("h"),
    )
    counts = g.groupBy("h").agg(F.count_distinct("doc_id").alias("nd"))
    return (
        g.join(counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("total_grams"),
            F.sum((F.col("nd") > 1).cast("long")).alias("dup_grams"),
        )
        .filter(F.col("dup_grams") > 0)
        .select(
            "doc_id",
            "total_grams",
            "dup_grams",
            round6(F.col("dup_grams") / F.col("total_grams")).alias("dup_ratio"),
        )
        .orderBy("doc_id")
    )


def paragraph_dedup(
    df: DataFrame, id_col: str, text_col: str, *, sep: str = "\n\n"
) -> DataFrame:
    """Corpus-wide PARAGRAPH-level exact dedup (CCNet/Gopher-style
    boilerplate removal; no reference precedent — SURVEY.md §2.F):
    every paragraph keeps only its globally FIRST occurrence, ordered
    by (doc_id, paragraph index), and each document is reassembled
    from its surviving paragraphs in original order.

    Returns (doc_id, n_pars, n_kept, clean_text) for EVERY input doc —
    a fully-boilerplate document survives with n_kept = 0 and an empty
    clean_text.

    Execution shape: one posexplode projection (narrow), one
    map-side-combinable ``min(struct(doc_id, idx))`` aggregate per
    paragraph hash, one equi-join back on the hash (sort-merge at
    corpus scale; a hot boilerplate paragraph is ONE group in the
    combiner and AQE splits any residual join skew), and one groupBy
    to reassemble — no windows, no driver state."""
    pars = df.select(
        F.col(id_col).alias("doc_id"),
        # \Q..\E: the separator is a literal, not a regex
        F.posexplode(F.split(F.col(text_col), "\\Q" + sep + "\\E")).alias("idx", "par"),
    )
    h = pars.withColumn("h", F.md5(F.col("par").cast("binary")))
    firsts = h.groupBy("h").agg(F.min(F.struct("doc_id", "idx")).alias("first"))
    kept = (
        h.join(firsts, "h")
        .withColumn(
            "keep",
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("idx") == F.col("first.idx")),
        )
    )
    surviving = F.filter(
        F.array_sort(F.collect_list(F.struct("idx", "keep", "par"))),
        lambda s: s.getField("keep"),
    )
    return kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pars"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(surviving, lambda s: s.getField("par")), sep
        ).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# Cross-batch incremental dedup (round 5): dedup a NEW batch against
# every previously processed batch without rescanning old text.
# ---------------------------------------------------------------------------


def incremental_exact_dedup(
    spark,
    state_root: str,
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
):
    """Exact dedup of ``new_docs`` against all PRIOR batches: drop a
    new document when its content hash was seen in any earlier batch
    (or earlier in this batch — within-batch keep = min id), then
    commit the batch's surviving fingerprints as a new snapshot of the
    snaplog state table at ``state_root``.

    Returns ``(survivors, snapshot_id)`` — survivors is the deduped
    slice of ``new_docs``; snapshot_id is None when the batch
    contributed nothing new.

    Scale notes (100 TB): the state table holds ONE (fingerprint,
    keep_id) row per distinct document ever kept — orders of magnitude
    smaller than the corpus, scanned column-pruned; the anti-join
    shuffles on the fingerprint (uniform by construction — md5), and
    snaplog's write-data-then-commit ordering means a crash between
    dedup and commit re-runs the batch idempotently (same
    fingerprints → deterministic same snapshot id).  The reference has
    no incremental analog — SURVEY.md §2.F."""
    from fences_spark.sources import snaplog

    fp = new_docs.select(
        F.col(id_col).alias("_id"),
        F.md5(F.col(text_col).cast("binary")).alias("fp"),
    )
    # within-batch canonical: min id per fingerprint
    batch_keep = fp.groupBy("fp").agg(F.min("_id").alias("keep_id"))
    if snaplog.current_snapshot_id(state_root) is not None:
        seen = snaplog.read(spark, state_root).select("fp")
        fresh = batch_keep.join(seen, "fp", "left_anti")
    else:
        fresh = batch_keep
    survivors = new_docs.join(
        fresh.select(F.col("keep_id").alias(id_col)), id_col
    )
    new_state = fresh.select("fp", "keep_id")
    if new_state.isEmpty():
        return survivors, None
    snap_id = snaplog.append(spark, state_root, new_state)
    return survivors, snap_id


def incremental_minhash_dedup(
    spark,
    state_root: str,
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 24,
    band_hashes: int = 12,
    band_size: int = 3,
    shingle_k: int = 3,
    threshold: float = 0.7,
    max_band_group: int = 64,
):
    """NEAR-dup dedup of a new batch against every prior batch's KEPT
    documents — the incremental companion of
    :func:`minhash_near_dup_scored`, with a snaplog state table
    instead of a corpus rescan.

    State layout: one row per kept doc — ``(doc_id, sig
    array<string>, bands array<string>)`` (signature + its band
    hashes; the seeds are deterministic, so signatures are comparable
    across batches forever).  Per batch:

    1. signature pass over the new batch (one shingle explode);
    2. WITHIN-batch near-dups: banded candidates scored by the
       fraction-of-equal-minhashes estimator, connected components,
       non-canonical members dropped (same semantics as the batch
       operator);
    3. CROSS-batch: the batch's band hashes join the state's exploded
       bands (shuffle on the uniform band hash), candidate (new, old)
       pairs scored against the state's stored signatures, and any new
       doc scoring ≥ ``threshold`` against ANY prior kept doc drops;
    4. survivors' state rows append as the batch's snapshot (nothing
       commits when every doc was a duplicate — replaying a committed
       batch is a no-op, so crash-retry is idempotent).

    Scale notes: the state carries ~(n_hashes + n_bands) md5 strings
    per kept doc — orders of magnitude under the corpus — and both
    joins key on md5-uniform hashes (no skew); zero-shingle docs have
    no signature and are never near-dup candidates, mirroring the
    batch operator.  Returns ``(survivors, snapshot_id_or_None)``."""
    from pyspark import StorageLevel

    from fences_spark.sources import snaplog

    n_bands = band_hashes // band_size
    sigs = minhash_signatures(
        new_docs, id_col, text_col, n_hashes=n_hashes, shingle_k=shingle_k
    ).persist(StorageLevel.MEMORY_AND_DISK)
    band_arr = F.array(*[
        F.md5(F.concat_ws("|", *[
            F.element_at("sig", b * band_size + r + 1) for r in range(band_size)
        ]))
        for b in range(n_bands)
    ])
    staged = sigs.select("doc_id", "sig", band_arr.alias("bands")).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    # 2. within-batch: candidates → score → connected components
    prefix = staged.select("doc_id", F.slice("sig", 1, band_hashes).alias("sig"))
    pairs = _bands_to_pairs(prefix, band_hashes, band_size, max_band_group)
    scored = _score_pairs(pairs, sigs, n_hashes).filter(
        F.col("jaccard_est") >= threshold
    )
    comp = connected_components(scored)
    non_canonical = comp.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )

    # 3. cross-batch: batch bands ⋈ state bands → pairs → score
    cross_dropped = None
    if snaplog.current_snapshot_id(state_root) is not None:
        state = snaplog.read(spark, state_root)
        new_bands = staged.select(
            F.col("doc_id").alias("new_id"),
            F.posexplode("bands").alias("band_idx", "band_hash"),
        )
        old_bands = state.select(
            F.col("doc_id").alias("old_id"),
            F.col("sig").alias("old_sig"),
            F.posexplode("bands").alias("band_idx", "band_hash"),
        )
        cand = (
            new_bands.join(old_bands, ["band_idx", "band_hash"])
            .select("new_id", "old_id", "old_sig")
            .distinct()
        )
        eq = F.aggregate(
            F.zip_with("sig", "old_sig", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        cross_dropped = (
            cand.join(staged.select(F.col("doc_id").alias("new_id"), "sig"), "new_id")
            .select("new_id", (eq / F.lit(n_hashes)).alias("est"))
            .filter(F.col("est") >= threshold)
            .select(F.col("new_id").alias("doc_id"))
            .distinct()
        )

    dropped = non_canonical
    if cross_dropped is not None:
        dropped = dropped.unionByName(cross_dropped).distinct()
    survivors = new_docs.join(
        dropped.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    )

    # 4. commit survivors' state
    new_state = staged.join(dropped, "doc_id", "left_anti")
    snap_id = None
    if not new_state.isEmpty():
        snap_id = snaplog.append(spark, state_root, new_state)
    sigs.unpersist()
    staged.unpersist()
    return survivors, snap_id
