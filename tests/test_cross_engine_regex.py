"""Cross-engine regex conformance fuzz: the PII patterns and the URL
domain extractor must behave byte-identically under Spark's Java
regex and DuckDB's RE2 — the property the oracle gate relies on.
Seeded random corpus of adversarial strings (pattern fragments glued
with unicode, digits, boundary punctuation), compared engine-to-
engine in ONE round trip per engine."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from fences_spark.operators.curate import _URL_DOMAIN_RE, url_domains
from fences_spark.operators.text import PII_PATTERNS, pii_counts, redact

FRAGMENTS = [
    "a@b.co", "x.y+z@mail.example.org", "@nodomain", "user@", "a@b.c",
    "@@", "a@b..co", "A@B.CO", "user@10.0.0.7", "u@x.museum",
    "1.2.3.4", "255.255.255.255", "256.300.1.2", "1.2.3", "1.2.3.4.5",
    "01.02.03.04", "v1.2.3.4x", ".1.2.3.4.",
    "deadbeef" * 4, "DEADBEEF" * 4, "deadbeef" * 3 + "dead",
    "0" * 32, "0" * 31, "0" * 33, "g" + "0" * 31,
    "https://ok.example.org/page", "http://ads.tracker.net/x?q=1",
    "HTTPS://UPPER.CASE/path", "https://", "http://.", "ftp://no.match",
    "https://a.b.c.d/e https://a.b.c.d/f", "http://trail.dot./x",
    "täst@ümlaut.de", "дом@тест.рф", "数字123", "٣٤٥.1.2.3",
    " ", "", "#", "\t", "\n", "-", ".", "..", "a-b", "_",
]
# glue is never "" : a match candidate directly abutting a non-ASCII
# WORD character is the documented Java/RE2 \b divergence (see the
# PII_PATTERNS comment + test_unicode_boundary_divergence_is_known);
# every glue below is whitespace or ASCII/Unicode punctuation, on
# which both engines agree.
GLUE = [" ", ".", ",", ";", "|", "\n", " und ", "»", "🚀", "--"]


def _divergence_prone(s: str) -> bool:
    """True when an ASCII word char directly abuts a NON-ASCII word
    character — the documented Java/RE2 \\b divergence domain.  The
    glue choice alone does not prevent this: fragment EDGES can meet
    through word-transparent glue (e.g. '数字123' + '.' + '1.2.3'
    puts 数 and 1 inside one \\b-relevant run), so composites are
    filtered on the final string, not on the glue."""
    for a, b in zip(s, s[1:]):
        aw, bw = (a.isalnum() or a == "_"), (b.isalnum() or b == "_")
        if aw and bw and (a.isascii() != b.isascii()):
            return True
    # digits separated only by '.' can also fuse into one candidate
    # run whose edge chars differ in ASCII-ness (the ipv4 pattern
    # consumes dots), so scan dot-joined neighbours too
    for i in range(1, len(s) - 1):
        if s[i] == ".":
            a, b = s[i - 1], s[i + 1]
            if (a.isalnum() and b.isalnum()) and (a.isascii() != b.isascii()):
                return True
    return False


def _corpus(n: int = 400, seed: int = 20260818) -> list[str]:
    rng = random.Random(seed)
    rows = [f for f in FRAGMENTS if not _divergence_prone(f)]
    while len(rows) < n:
        k = rng.randint(1, 5)
        cand = rng.choice(GLUE).join(rng.choice(FRAGMENTS) for _ in range(k))
        if not _divergence_prone(cand):
            rows.append(cand)
    return rows


@pytest.fixture(scope="module")
def engines(spark):
    rows = _corpus()
    sdf = spark.createDataFrame(list(enumerate(rows)), "i long, t string")
    con = duckdb.connect()
    con.execute("CREATE TABLE c (i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", list(enumerate(rows)))
    return sdf, con


def test_pii_counts_and_redaction_match(engines):
    sdf, con = engines
    c = pii_counts(F.col("t"))
    got = {
        r["i"]: (r["e"], r["p"], r["h"], r["red"])
        for r in sdf.select(
            "i", c["email"].alias("e"), c["ipv4"].alias("p"),
            c["hex_secret"].alias("h"), redact(F.col("t")).alias("red"),
        ).collect()
    }
    pats = {name: pat for name, pat, _ in PII_PATTERNS}
    sql = f"""
      SELECT i,
             len(regexp_extract_all(t, '{pats["email"]}'))::INT,
             len(regexp_extract_all(t, '{pats["ipv4"]}'))::INT,
             len(regexp_extract_all(t, '{pats["hex_secret"]}'))::INT,
             regexp_replace(regexp_replace(regexp_replace(t,
                 '{pats["email"]}', '<EMAIL>', 'g'),
                 '{pats["ipv4"]}', '<IP>', 'g'),
                 '{pats["hex_secret"]}', '<SECRET>', 'g')
      FROM c
    """
    for i, e, p, h, red in con.sql(sql).fetchall():
        assert got[i] == (e, p, h, red), (i, got[i], (e, p, h, red))


def test_url_domains_match(engines):
    sdf, con = engines
    got = {r["i"]: list(r["d"]) for r in sdf.select("i", url_domains(F.col("t")).alias("d")).collect()}
    sql = f"""
      SELECT i, list_sort(list_distinct(regexp_extract_all(lower(t), '{_URL_DOMAIN_RE}', 1)))
      FROM c
    """
    for i, d in con.sql(sql).fetchall():
        assert got[i] == d, (i, got[i], d)


def test_unicode_boundary_divergence_is_known(spark):
    """Pin the ONE known Java/RE2 divergence so a silent behavior
    change in either engine surfaces here: Java's \\b is
    Unicode-aware (no boundary between '4' and 'д'), RE2's is
    ASCII-only (boundary, hence a match)."""
    pat = r"\b\d{1,3}(?:\.\d{1,3}){3}\b"
    s = "1.2.3.4дом"
    n_java = spark.createDataFrame([(s,)], "t string").select(
        F.regexp_count("t", F.lit(pat)).alias("n")).first()["n"]
    n_re2 = duckdb.sql(
        f"SELECT len(regexp_extract_all('{s}', '{pat}'))").fetchone()[0]
    assert n_java == 0 and n_re2 == 1
