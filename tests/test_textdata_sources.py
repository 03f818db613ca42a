"""JSONL/CSV ingest edge: explicit-schema reads with corrupt-record
quarantine (sources/textdata.py)."""

from __future__ import annotations

import pytest

from fences_spark.sources.textdata import quarantine_split, read_csv, read_jsonl

JSONL = """\
{"doc_id": 1, "text": "hello world", "lang": "en"}
{"doc_id": 2, "text": "guten tag", "lang": "de"}
this line is not json at all
{"doc_id": 3, "text": "ok", "lang": "en"
{"doc_id": 4, "text": "fine", "lang": "fr"}
"""

CSV = """\
doc_id,text,lang
1,hello world,en
2,"guten tag",de
3,"unterminated quote,en
4,fine,fr
"""

SCHEMA = "doc_id long, text string, lang string"


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("textdata")
    (root / "part1.jsonl").write_text(JSONL)
    (root / "part1.csv").write_text(CSV)
    return root


class TestJsonl:
    def test_quarantine_split(self, spark, corpus_dir):
        df = read_jsonl(spark, str(corpus_dir / "part1.jsonl"), SCHEMA)
        clean, bad = quarantine_split(df)
        rows = {r["doc_id"]: r["lang"] for r in clean.collect()}
        assert rows == {1: "en", 2: "de", 4: "fr"}
        assert "_corrupt_record" not in clean.columns
        raws = sorted(r["raw_record"] for r in bad.collect())
        assert raws[0] == "this line is not json at all"
        assert raws[1].startswith('{"doc_id": 3')   # truncated JSON line

    def test_schema_not_inferred(self, spark, corpus_dir):
        # explicit schema: even an all-corrupt file yields the declared shape
        df = read_jsonl(spark, str(corpus_dir / "part1.jsonl"), SCHEMA)
        assert [f.name for f in df.schema.fields] == [
            "doc_id", "text", "lang", "_corrupt_record",
        ]


class TestCsv:
    def test_quarantine_split(self, spark, corpus_dir):
        df = read_csv(spark, str(corpus_dir / "part1.csv"), SCHEMA)
        clean, bad = quarantine_split(df)
        rows = {r["doc_id"]: r["text"] for r in clean.collect()}
        assert rows == {1: "hello world", 2: "guten tag", 4: "fine"}
        assert bad.count() == 1
