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


class TestColumnarAndBinarySources:
    def test_orc_roundtrip_matches_parquet(self, spark, tmp_path):
        from fences_spark.sources import read_path

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        orc_dir = str(tmp_path / "docs_orc")
        docs.write.orc(orc_dir)
        via_orc = read_path(spark, orc_dir, fmt="orc")
        assert via_orc.count() == docs.count()
        assert set(via_orc.columns) == set(docs.columns)
        a = {r["doc_id"]: r["text"] for r in via_orc.select("doc_id", "text").collect()}
        b = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
        assert a == b
        import pytest as _pt
        with _pt.raises(ValueError):
            read_path(spark, orc_dir, fmt="csv")

    def test_binary_file_ingest_feeds_multimodal(self, spark, tmp_path):
        import hashlib

        from pyspark.sql import functions as F

        from fences_spark.sources import read_binary_files

        media_dir = tmp_path / "media"
        media_dir.mkdir()
        payloads = {f"m{i}.bin": bytes([i]) * (10 + i) for i in range(5)}
        (media_dir / "skip.txt").write_text("not media")
        for name, payload in payloads.items():
            (media_dir / name).write_bytes(payload)

        df = read_binary_files(spark, str(media_dir), glob="*.bin")
        rows = df.select(
            F.element_at(F.split("path", "/"), -1).alias("name"),
            "length",
            F.sha2("content", 256).alias("sha"),
        ).collect()
        assert {r["name"] for r in rows} == set(payloads)
        for r in rows:
            want = payloads[r["name"]]
            assert r["length"] == len(want)
            assert r["sha"] == hashlib.sha256(want).hexdigest()
