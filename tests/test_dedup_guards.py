"""Scale guards on the dedup operators: cartesian baselines must switch to
candidate-set joins above the brute-force threshold, and LSH must survive a
planted hot bucket (thousands of identical docs) without going quadratic."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from d6tstack_spark.operators.dedup import (
    embedding_neardup_pairs,
    jaccard_pairs,
    minhash_lsh_pairs,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _docs(spark, n=60):
    rows = [(i, f"doc number {i} talks about topic {i % 7} in some detail") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_pairs_routes_through_lsh_above_threshold(spark):
    d = _docs(spark)
    guarded = jaccard_pairs(d, "doc_id", "text", 0.8, max_bruteforce=10)
    p = _plan(guarded)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # below the threshold the exact all-pairs baseline is used
    exact = jaccard_pairs(d, "doc_id", "text", 0.8, max_bruteforce=10_000)
    assert "BroadcastNestedLoopJoin" in _plan(exact) or "CartesianProduct" in _plan(exact)
    # identical docs are found by both paths (same ids mod 7 → same text? no —
    # plant a true duplicate instead)
    dup = d.unionByName(
        d.filter(F.col("doc_id") == 3).withColumn("doc_id", F.lit(1003))
    )
    got = jaccard_pairs(dup, "doc_id", "text", 0.99, max_bruteforce=10).toPandas()
    assert {(3, 1003)} <= set(zip(got["id_a"], got["id_b"]))


def test_embedding_neardup_bucketed_above_threshold(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 16)).astype("float32")
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    # plant a duplicate pair
    rows.append((1000, rows[5][1]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    guarded = embedding_neardup_pairs(df, "vec_id", "embedding", 0.999,
                                      max_bruteforce=10)
    p = _plan(guarded)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    got = guarded.toPandas()
    assert (5, 1000) in set(zip(got["id_a"], got["id_b"]))


def test_knn_join_bucketed_above_threshold(spark):
    import numpy as np

    from d6tstack_spark.operators.similarity import knn_join

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(30, 8)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    guarded = knn_join(df, k=3, max_bruteforce=10, bits=4)
    p = _plan(guarded)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    got = guarded.toPandas()
    assert (got.groupby("id")["rank"].max() <= 3).all()
    # exact path agrees with numpy on the full ranking
    exact = knn_join(df, k=3, max_bruteforce=10_000).toPandas()
    sims = vecs @ vecs.T
    norms = np.linalg.norm(vecs, axis=1)
    sims = sims / np.outer(norms, norms)
    np.fill_diagonal(sims, -np.inf)
    for qid in range(30):
        want = list(np.argsort(-sims[qid], kind="stable")[:3])
        got_n = exact[exact["id"] == qid].sort_values("rank")["neighbor_id"]
        assert list(got_n) == want, qid


def test_connected_components_labels(spark):
    from d6tstack_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(8)], "id long")
    # components: {0,1,2,3} via a chain, {5,6} via one edge, {4},{7} singletons
    pairs = spark.createDataFrame(
        [(1, 0), (1, 2), (3, 2), (5, 6)], "id_a long, id_b long"
    )
    got = dict(
        connected_components(nodes, pairs).orderBy("id").collect()
    )
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 7}


def test_connected_components_raises_on_nonconvergence(spark):
    """Star-contraction needs ~log2(n) rounds; starve it (max_iter=1 on a
    long chain) and it must ERROR, not return a partially-contracted
    (split) clustering."""
    import pytest

    from d6tstack_spark.operators.dedup import connected_components

    n = 64
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, chain, max_iter=1)
    # enough rounds → correct single cluster
    got = dict(
        connected_components(nodes, chain, max_iter=n).orderBy("id").collect()
    )
    assert set(got.values()) == {0}


def test_jaccard_exact_escape_hatch_and_warning(spark):
    """exact=True forces the all-pairs join above max_bruteforce; the
    auto-flip to LSH warns."""
    import warnings

    d = _docs(spark, n=30)
    forced = jaccard_pairs(d, "doc_id", "text", 0.8, max_bruteforce=10, exact=True)
    p = _plan(forced)
    assert "BroadcastNestedLoopJoin" in p or "CartesianProduct" in p
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        jaccard_pairs(d, "doc_id", "text", 0.8, max_bruteforce=10)
        assert any("flipping to MinHash-LSH" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        jaccard_pairs(d, "doc_id", "text", 0.8, max_bruteforce=10, exact=False)
        assert not w  # explicit choice → silent


def test_lsh_hot_bucket_cap_bounds_candidates(spark):
    """A planted block of identical docs (one degenerate band bucket) must
    not explode the candidate join: with the bucket cap those docs produce
    no LSH pairs (exact dedup owns identical docs), and distinct near-dup
    pairs elsewhere still surface."""
    base = [(i, f"unique document {i} with topic {i} and extra words {i * 13}")
            for i in range(50)]
    hot = [(1000 + i, "exactly the same text in every planted duplicate row")
           for i in range(400)]
    near = [(9001, "a very similar pair document about spark encode engines"),
            (9002, "a very similar pair document about spark encode engines")]
    df = spark.createDataFrame(base + hot + near, "doc_id long, text string")
    t0 = time.time()
    got = minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.9, max_bucket=100
    ).toPandas()
    wall = time.time() - t0
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert (9001, 9002) in pairs
    # the 400-identical-doc bucket (79800 potential pairs) was dropped
    assert not any(1000 <= a < 2000 and 1000 <= b < 2000 for a, b in pairs)
    assert len(got) < 1000
    assert wall < 60


def test_connected_components_pathological_chain(spark):
    """A 2000-hop path — the diameter case that broke min-label
    propagation (O(diameter) rounds, then a hard raise at max_iter).
    Star-contraction converges in ~log2(n) rounds: the whole chain must
    collapse to ONE cluster labeled by its minimum id, well within the
    default max_iter."""
    from d6tstack_spark.operators.dedup import connected_components

    n = 2000
    nodes = spark.range(n).select(F.col("id"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    got = connected_components(nodes, pairs).toPandas()
    assert (got["cluster_id"] == 0).all()
    assert len(got) == n


def test_connected_components_mixed_components_and_singletons(spark):
    from d6tstack_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(10)], "id long")
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 4), (7, 7)], "id_a long, id_b long"
    )
    got = dict(
        connected_components(nodes, pairs).orderBy("id").toPandas().values
    )
    assert got == {0: 0, 1: 1, 3: 1, 5: 1, 2: 2, 4: 2,
                   6: 6, 7: 7, 8: 8, 9: 9}
