"""Partition-grain validation runner: checkpoint, resume, lineage."""

from fences_spark.run.runner import RunConfig, ValidationRunner

__all__ = ["RunConfig", "ValidationRunner"]
