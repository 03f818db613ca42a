"""Streaming schema-drift monitor (round 5): new paths / new types vs
a baseline profile, per-epoch idempotent sink."""

from __future__ import annotations

import os

import pytest

from fences_spark.operators.jsonprofile import json_path_profile
from fences_spark.streaming.schemadrift import (
    SchemaDriftConfig,
    start_schema_drift_stream,
)

BASE_DOCS = [
    (i, '{"id": %d, "cust": {"key": %d}, "tags": ["a"]}' % (i, i % 5))
    for i in range(20)
]


def _drain(spark, src, baseline, cfg):
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = start_schema_drift_stream(
        stream, baseline, cfg, id_col="doc_id", json_col="j"
    )
    q.awaitTermination(120)
    assert not q.isActive


@pytest.fixture()
def baseline(spark):
    df = spark.createDataFrame(BASE_DOCS, "doc_id int, j string")
    return json_path_profile(df, "doc_id", "j")


def test_conforming_stream_emits_nothing(spark, tmp_path_factory, baseline):
    root = tmp_path_factory.mktemp("sdrift_ok")
    src = str(root / "src")
    spark.createDataFrame(BASE_DOCS, "doc_id int, j string").coalesce(1).write.parquet(src)
    cfg = SchemaDriftConfig(output_dir=str(root / "out"))
    _drain(spark, src, baseline, cfg)
    assert spark.read.parquet(cfg.sink_path).count() == 0


def test_new_path_and_new_type_flagged(spark, tmp_path_factory, baseline):
    root = tmp_path_factory.mktemp("sdrift_anom")
    src = str(root / "src")
    anomalous = BASE_DOCS + [
        (100, '{"id": "oops", "cust": {"key": 1}, "tags": ["a"]}'),  # id: string
        (101, '{"id": 1, "cust": {"key": 2, "region": "EU"}, "tags": ["a"]}'),  # new path
        (102, '{"id": 2, "cust": {"key": 3}, "tags": [7]}'),  # tag element type
    ]
    spark.createDataFrame(anomalous, "doc_id int, j string").coalesce(1).write.parquet(src)
    cfg = SchemaDriftConfig(output_dir=str(root / "out"))
    _drain(spark, src, baseline, cfg)
    got = {(r["path"], r["jtype"]): (r["status"], r["n"], r["n_docs"])
           for r in spark.read.parquet(cfg.sink_path).collect()}
    assert got[("$.id", "string")] == ("new_type", 1, 1)
    assert got[("$.cust.region", "string")] == ("new_path", 1, 1)
    assert got[("$.tags[]", "number")] == ("new_type", 1, 1)
    assert len(got) == 3  # nothing else flagged


def test_incremental_resume_and_idempotent_epochs(spark, tmp_path_factory, baseline):
    import pyspark.sql.functions as F  # noqa: F401

    root = tmp_path_factory.mktemp("sdrift_resume")
    src = str(root / "src")
    spark.createDataFrame(BASE_DOCS, "doc_id int, j string").coalesce(1).write.parquet(src)
    cfg = SchemaDriftConfig(output_dir=str(root / "out"))
    _drain(spark, src, baseline, cfg)
    assert spark.read.parquet(cfg.sink_path).count() == 0

    # append anomalous docs -> only the NEW file is profiled on resume
    extra = [(200, '{"id": 1, "cust": {"key": 2}, "tags": ["a"], "v2": true}')]
    spark.createDataFrame(extra, "doc_id int, j string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drain(spark, src, baseline, cfg)
    rows = spark.read.parquet(cfg.sink_path).collect()
    assert {(r["path"], r["status"]) for r in rows} == {("$.v2", "new_path")}
    # second no-new-input drain leaves the sink unchanged
    _drain(spark, src, baseline, cfg)
    assert spark.read.parquet(cfg.sink_path).count() == len(rows)
