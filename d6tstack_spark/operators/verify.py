"""Distributed table equivalence — the reference's golden-equality test
pattern (tests/test_combine_csv.py:103-109 df.equals goldens) as a
first-class, cluster-scale operator: multiset compare via exceptAll
(SURVEY.md §2.3 'decoded-vs-source equivalence check')."""

from __future__ import annotations

from pyspark.sql import DataFrame


def compare_tables(a: DataFrame, b: DataFrame) -> DataFrame:
    """One-row DataFrame (n_a, n_b, n_only_a, n_only_b): multiset diff of two
    tables with identical schemas. Equal ⇔ n_a == n_b and both diffs are 0.

    exceptAll is null-safe multiset difference — distributed, no collect;
    at scale this is two shuffles over the compared columns.
    """
    from pyspark.sql import functions as F

    na = a.agg(F.count("*").alias("k")).select(F.col("k").alias("n_a"))
    nb = b.agg(F.count("*").alias("k")).select(F.col("k").alias("n_b"))
    oa = a.exceptAll(b).agg(F.count("*").alias("n_only_a"))
    ob = b.exceptAll(a).agg(F.count("*").alias("n_only_b"))
    return na.crossJoin(nb).crossJoin(oa).crossJoin(ob)


def roundtrip_ok(src: DataFrame, decoded: DataFrame) -> bool:
    """True iff decoded is multiset-identical to src (the north-rule
    bit-identity gate, order-insensitive)."""
    r = compare_tables(src, decoded).first()
    return r["n_a"] == r["n_b"] and r["n_only_a"] == 0 and r["n_only_b"] == 0
