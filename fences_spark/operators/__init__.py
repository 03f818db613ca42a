"""Engine operators beyond predicate evaluation: column statistics,
uniqueness/referential integrity, distribution drift, dedup/
similarity/text suites for training-data pipelines."""
