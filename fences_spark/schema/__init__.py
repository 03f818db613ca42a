"""Constraint-dialect front end: evaluator, normalizer, regex dialect,
boundary-sample generator."""
