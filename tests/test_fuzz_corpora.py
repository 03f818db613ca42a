"""Randomized-corpus oracle fuzz for the §2.F operator families
(round-4 verdict item 7).

The in-suite oracle sweep (tests/test_entry_contract.py) runs one
fixed dataset per scale; a dedup/curate/percentile entry could agree
with its DuckDB oracle on the driver corpus yet diverge on a
pathological one (empty documents, all-boilerplate hot keys, unicode
separators, a single stratum).  This module synthesizes seeded
pathological corpora at tiny scale, re-derives the oracle per corpus
by running the SAME ``oracle_sql()`` strings on the synthesized
parquet, and asserts value-hash agreement through the same
``scripts/check_oracle.sweep`` comparator the driver gate mimics.

Corpus generation is deterministic (``random.Random(seed)``); no
wall-clock or external data.  Each corpus targets the entries whose
semantics it actually stresses, keeping the whole module sub-minute.
"""

from __future__ import annotations

import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from check_oracle import TABLES, sweep  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_CONTRACT_SF", "/root/testdata/sf0.001")

WORDS = (
    "the fast key order sort table scan merge part window small hash "
    "join batch stream spark dup filter plan stage shuffle row column "
    "bucket salt skew probe build"
).split()


def _write_documents(dirpath: str, rows: list[tuple[int, str, str, str]]) -> None:
    """rows = (doc_id, text, lang, source); n_chars derived, matching
    the driver tables' schema exactly."""
    os.makedirs(dirpath, exist_ok=True)
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(dirpath, "documents.parquet"))
    # the sweep registers a DuckDB view per driver table; entries under
    # test read only documents, the rest just need to resolve
    for t in TABLES:
        if t == "documents":
            continue
        link = os.path.join(dirpath, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SF_DIR, f"{t}.parquet"), link)


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


# ---------------------------------------------------------------- corpora
def corpus_empty_docs(rng: random.Random) -> list[tuple[int, str, str, str]]:
    """Empty and whitespace-only texts mixed with short normal ones —
    stresses zero-token quality ratios, zero-paragraph dedup, empty
    chunking, and pack budgets of zero-length members."""
    rows = []
    for i in range(120):
        kind = rng.random()
        if kind < 0.35:
            text = ""
        elif kind < 0.55:
            text = rng.choice(["   ", "\n\n", "\t", " \n \t ", "\n"])
        elif kind < 0.65:
            text = rng.choice(WORDS)  # single token
        else:
            text = _sentence(rng, rng.randint(3, 25))
        lang = rng.choice(["en", "de", "es"])
        rows.append((i, text, lang, f"src{rng.randint(0, 2)}"))
    return rows


def corpus_all_boilerplate(rng: random.Random) -> list[tuple[int, str, str, str]]:
    """Near-total duplication: one hot text shared by 70% of the corpus
    (the pathological hot key for exact dedup / LSH banding), the rest
    permutations of three shared paragraphs — every paragraph is
    boilerplate, every pair is a near-dup candidate."""
    hot = _sentence(rng, 40)
    paras = [_sentence(rng, 12) for _ in range(3)]
    rows = []
    for i in range(150):
        r = rng.random()
        if r < 0.70:
            text = hot
        elif r < 0.95:
            order = rng.sample(range(3), 3)
            text = "\n\n".join(paras[j] for j in order)
        else:
            text = _sentence(rng, rng.randint(10, 30))
        rows.append((i, text, rng.choice(["en", "de"]), f"src{rng.randint(0, 1)}"))
    return rows


def corpus_unicode_separators(rng: random.Random) -> list[tuple[int, str, str, str]]:
    """Unicode line/paragraph separators, NBSP, CJK, emoji (astral
    plane), combining marks, RTL — stresses the tokenizer regex,
    punctuation ratios, codepoint-vs-UTF16 length semantics, and
    shingling over non-ASCII boundaries."""
    exotica = [
        "café́ naïve résumé",
        "漢字テスト 日本語",
        "\U0001f600\U0001f680 emoji‍zwj",
        "العربية rtl text",
        "line sep and para",
        "non breaking space",
        "tab　ideographic　space",
    ]
    rows = []
    for i in range(120):
        parts = []
        for _ in range(rng.randint(1, 4)):
            parts.append(
                rng.choice(exotica) if rng.random() < 0.6 else _sentence(rng, rng.randint(4, 15))
            )
        sep = rng.choice([" ", " ", " ", "\n\n", "　"])
        lang = rng.choice(["zh", "ar", "en", "ja"])
        rows.append((i, sep.join(parts), lang, f"src{rng.randint(0, 2)}"))
    return rows


def corpus_single_stratum(rng: random.Random) -> list[tuple[int, str, str, str]]:
    """Every document in ONE stratum (lang='en', one source for 90%) —
    the degenerate case for per-stratum percentile (one global rank),
    quota sampling (single hot quota group), and interleave weights;
    quality values carry heavy ties to stress exact-rank semantics."""
    tie_sentences = [_sentence(rng, n) for n in (5, 5, 5, 12, 12, 30)]
    rows = []
    for i in range(140):
        if rng.random() < 0.75:
            text = rng.choice(tie_sentences)  # massive quality ties
        else:
            text = _sentence(rng, rng.randint(3, 40))
        src = "src0" if rng.random() < 0.9 else "src1"
        rows.append((i, text, "en", src))
    return rows


# entries each corpus actually stresses (all read only documents)
DEDUP_FAMILY = [
    "dedup_exact_documents",
    "dedup_key_count",
    "dup_key_exemplars",
    "paragraph_dedup_docs",
    "minhash_lsh_docs",
    "near_dup_jaccard",
    "near_dup_clusters",
    "ngram_jaccard_docs",
    "simhash_docs",
    "dup_span_docs",
    "winnow_docs",
]
CURATE_FAMILY = [
    "quality_docs",
    "lexdiv_docs",
    "repetition_docs",
    "text_profile_docs",
    "curate_documents",
    "langid_docs",
    "length_band_docs",
]
TEXT_FAMILY = [
    "text_profile_docs",
    "token_topk_docs",
    "langid_docs",
    "redact_docs",
    "tfidf_topterms_docs",
    "quality_docs",
    "chunk_docs",
    "winnow_docs",
]
PERCENTILE_FAMILY = [
    "quality_pct_docs",
    "mix_quota_docs",
    "mix_interleave_docs",
    "shuffle_shard_docs",
    "sample_documents",
    "pack_docs",
    "length_band_docs",
]

CORPORA = {
    "empty_docs": (
        corpus_empty_docs,
        7041,
        sorted(
            set(CURATE_FAMILY)
            | {"dedup_exact_documents", "paragraph_dedup_docs", "pack_docs",
               "quality_pct_docs", "chunk_docs"}
        ),
    ),
    "all_boilerplate": (corpus_all_boilerplate, 7042, DEDUP_FAMILY),
    "unicode_separators": (corpus_unicode_separators, 7043, TEXT_FAMILY),
    "single_stratum": (corpus_single_stratum, 7044, PERCENTILE_FAMILY),
}


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata not present")
@pytest.mark.parametrize("name", sorted(CORPORA))
def test_fuzz_corpus_oracle_parity(spark, tmp_path_factory, name) -> None:
    gen, seed, entries = CORPORA[name]
    rows = gen(random.Random(seed))
    d = str(tmp_path_factory.mktemp(f"fuzz_{name}"))
    _write_documents(d, rows)
    failures = sweep(spark, d, only=set(entries), verbose=False)
    assert not failures, (
        f"corpus {name!r} (seed {seed}): {len(failures)} entries diverge "
        "from their re-derived DuckDB oracle:\n" + "\n\n".join(failures)
    )
