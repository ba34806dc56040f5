"""Structured-streaming encode (continuous ingest path)."""
