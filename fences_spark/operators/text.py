"""Text-analysis operators for training-data pipelines: language ID
(stopword n-gram heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), document fingerprinting (winnowing over
rolling k-gram hashes).  All built-in Column algebra — the per-token
loops unroll into the expression tree, nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from fences_spark.operators.dedup import _token_hash, tokens

# compact stopword lists (public common-word sets; heuristic only)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "las", "y", "de", "un", "una", "es", "que"],
}


def whitespace_token_count(text: Column) -> Column:
    """Number of alnum word tokens."""
    return F.size(tokens(text))


# GPT-ish pre-tokenizer classes: letter runs, single digits,
# punctuation runs (a regex approximation of BPE pre-splitting)
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


def bpeish_token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def _in_set(words: list[str]):
    # arity-1 lambda factory (an extra lambda param would be bound to
    # the array index by pyspark's higher-order functions)
    return lambda x: x.isin(words)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, _in_set(STOPWORDS[lang])))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def language_id(text: Column) -> Column:
    """Best-scoring language by stopword hit ratio; 'und'
    (undetermined) when nothing hits."""
    toks = tokens(text)
    n = F.size(toks)
    scores = [
        (lang, F.size(F.filter(toks, _in_set(sw))))
        for lang, sw in STOPWORDS.items()
    ]
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # first language (in insertion order) achieving the max, like a
    # stable argmax; vacuous when no stopword hit at all
    for lang, s in reversed(scores):
        out = F.when((n > 0) & (best_score > 0) & (s == best_score), F.lit(lang)).otherwise(out)
    return out


def quality_features(text: Column) -> dict[str, Column]:
    """The classic cheap quality signals."""
    n_chars = F.length(text)
    toks = tokens(text)
    n_tokens = F.size(toks)
    mean_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / n_tokens,
    ).otherwise(F.lit(0.0))
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}]", ""))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "mean_token_len": F.round(mean_tok_len.cast("double"), 6),
        "alpha_ratio": F.round(
            F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0)).cast("double"), 6
        ),
        "punct_ratio": F.round(
            F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0)).cast("double"), 6
        ),
        "stopword_ratio_en": F.round(stopword_ratio(text, "en").cast("double"), 6),
    }


def quality_score(text: Column) -> Column:
    """[0,1] heuristic: reward sane token length, letters, stopwords;
    penalize punctuation soup and empty docs.  The exact formula is a
    documented convention (both engines compute it identically)."""
    f = quality_features(text)
    length_ok = F.when((f["n_tokens"] >= 5) & (f["n_tokens"] <= 100000), 0.25).otherwise(0.0)
    toklen_ok = F.when((f["mean_token_len"] >= 2.5) & (f["mean_token_len"] <= 12), 0.25).otherwise(0.0)
    alpha_part = F.least(f["alpha_ratio"] / F.lit(0.7), F.lit(1.0)) * 0.25
    stop_part = F.least(f["stopword_ratio_en"] / F.lit(0.2), F.lit(1.0)) * 0.25
    return F.round(length_ok + toklen_ok + alpha_part + stop_part, 6)


# ---------------------------------------------------------------------------
# fingerprinting: winnowing over rolling k-gram hashes
# ---------------------------------------------------------------------------


def winnow_fingerprints(text: Column, *, k: int = 8, window: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken
    scheme): hash every k-char gram of the normalized text, slide a
    window of ``window`` hashes, keep each window's minimum; the
    distinct minima are the fingerprint set."""
    norm = F.regexp_replace(F.lower(text), "[^a-z0-9]+", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1))),
        lambda i: norm.substr(i, F.lit(k)),
    )
    hashes = F.transform(grams, _token_hash)
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(hashes) - (window - 1), F.lit(1))),
        lambda i: F.array_min(F.slice(hashes, i, window)),
    )
    return F.array_sort(F.array_distinct(mins))


def doc_fingerprint(text: Column) -> Column:
    """Whole-document fingerprint: md5 of the normalized text."""
    norm = F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))
    return F.md5(norm.cast("binary"))


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per doc with all text-analysis columns."""
    t = F.col(text_col)
    f = quality_features(t)
    return df.select(
        F.col(id_col),
        whitespace_token_count(t).alias("n_tokens"),
        bpeish_token_count(t).alias("n_bpeish_tokens"),
        language_id(t).alias("lang_pred"),
        *[v.alias(k) for k, v in f.items() if k != "n_tokens"],
        quality_score(t).alias("quality"),
        doc_fingerprint(t).alias("fingerprint"),
    )
