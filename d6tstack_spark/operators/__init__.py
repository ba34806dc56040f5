"""Spark-side operators: encode/decode, stacking, dedup, text, similarity."""
