"""Scheme-agnostic filesystem helpers through the Hadoop FileSystem
API (local, hdfs://, s3a://, ... — whatever scheme the sinks use).

The runner/pipeline write their sinks with Spark writers, which
resolve paths through Hadoop; any driver-side existence/listing/
deletion on those SAME paths must go through the same API, or a
remote output_dir silently breaks the logic (os.path.isdir on an
``s3a://`` URI is always False).  Round-4 review finding.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())  # noqa: SLF001
    return fs, jpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.exists(jpath))


def list_dirs(spark: SparkSession, path: str, glob: str) -> list[str]:
    """Names of entries under ``path`` matching ``glob`` (e.g.
    ``epoch_id=*``); empty if ``path`` does not exist."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    pattern = jvm.org.apache.hadoop.fs.Path(path, glob)
    return [st.getPath().toString() for st in fs.globStatus(pattern) or []]


def delete(spark: SparkSession, path: str) -> bool:
    """Recursive delete; False if the path did not exist."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return False
    return bool(fs.delete(jpath, True))


def mkdirs(spark: SparkSession, path: str) -> bool:
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.mkdirs(jpath))


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Atomic-ish move within one filesystem (Hadoop ``rename``); the
    destination's PARENT must already exist.  False on failure (e.g.
    destination exists)."""
    fs, jsrc = _fs_and_path(spark, src)
    _, jdst = _fs_and_path(spark, dst)
    return bool(fs.rename(jsrc, jdst))
