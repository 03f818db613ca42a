"""Structured Streaming upgrade path for the validation engine."""
