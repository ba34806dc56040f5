"""Exact merges-table BPE: trainer determinism, tokenizer vs an
independently-written reference, and the Spark pandas-UDF path vs
pure-python counts on real fixture documents."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from d6tstack_spark.operators.text import (
    BPE_TOKEN_PATTERN,
    DEFAULT_BPE_MERGES,
    bpe_tokenize,
    token_count_bpe_exact,
    train_bpe_merges,
)


def ref_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent reference: recompute from scratch each step — walk the
    MERGES LIST in rank order, take the first pair present anywhere in the
    current tokens, merge its leftmost occurrence. O(merges·len) per step but
    algorithmically the same leftmost-lowest-rank semantics via a different
    code path."""
    toks = list(word)
    while True:
        done = True
        for a, b in merges:  # rank order
            for i in range(len(toks) - 1):
                if toks[i] == a and toks[i + 1] == b:
                    toks[i : i + 2] = [a + b]
                    done = False
                    break
            if not done:
                break
        if done:
            return toks


def test_trainer_is_deterministic_and_learns_frequent_pairs():
    texts = ["the cat and the hat and the mat", "the bat and the rat"]
    m1 = train_bpe_merges(texts, 10)
    m2 = train_bpe_merges(texts, 10)
    assert m1 == m2 and len(m1) == 10
    # 'th'+'e' must be learned early: 'the' dominates the corpus
    assert ("t", "h") in m1 and ("th", "e") in m1


def test_bpe_tokenize_matches_independent_reference():
    merges = train_bpe_merges(
        ["aaaa abab banana bandana the then there anthem"], 24
    )
    ranks = {p: i for i, p in enumerate(merges)}
    words = [
        "aaaa", "aaa", "aa", "a", "banana", "bandanas", "anthem",
        "thethethe", "xyz", "b", "", "1234", "zzzz",
    ]
    for w in words:
        if not w:
            continue
        assert bpe_tokenize(w, ranks) == ref_bpe(w, merges), w
    # handcrafted overlap case: merges=[(a,a)] on 'aaa' → leftmost first:
    # [aa, a] (never [a, aa])
    assert bpe_tokenize("aaa", {("a", "a"): 0}) == ["aa", "a"]
    assert bpe_tokenize("aaaa", {("a", "a"): 0, ("aa", "aa"): 1}) == ["aaaa"]


def test_spark_counts_match_pure_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: r["n_tokens_bpe"]
        for r in token_count_bpe_exact(docs).select("doc_id", "n_tokens_bpe").collect()
    }
    ranks = {p: i for i, p in enumerate(DEFAULT_BPE_MERGES)}
    pat = re.compile(BPE_TOKEN_PATTERN)
    for row in docs.select("doc_id", "text").collect():
        want = (
            None
            if row["text"] is None
            else sum(len(bpe_tokenize(w, ranks)) for w in pat.findall(row["text"]))
        )
        assert got[row["doc_id"]] == want, row["doc_id"]


def test_nulls_and_edge_texts(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "the the the"), (5, "a,b.c!")],
        "doc_id long, text string",
    )
    got = dict(
        token_count_bpe_exact(df).select("doc_id", "n_tokens_bpe").collect()
    )
    assert got[1] is None and got[2] == 0 and got[3] == 0
    ranks = {p: i for i, p in enumerate(DEFAULT_BPE_MERGES)}
    assert got[4] == 3 * len(bpe_tokenize("the", ranks))
    # 'a,b.c!' → pretokens a , b . c !  (punct marks are single tokens)
    assert got[5] == sum(
        len(bpe_tokenize(w, ranks)) for w in ["a", ",", "b", ".", "c", "!"]
    )


def test_custom_merges_table(spark):
    df = spark.createDataFrame([(1, "banana")], "doc_id long, text string")
    merges = [("a", "n"), ("an", "an"), ("b", "anan")]
    got = token_count_bpe_exact(df, merges=merges).first()["n_tokens_bpe"]
    # banana → b an an a → b anan a → banan a → 2 tokens
    assert got == 2
