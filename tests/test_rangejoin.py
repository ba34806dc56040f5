"""Bucketed interval join: hand-checked semantics, no nested-loop in the
plan, and parity with the naive BETWEEN join on a random-ish input."""

from __future__ import annotations

from pyspark.sql import functions as F

from d6tstack_spark.operators.rangejoin import interval_join


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_interval_join_semantics_int_unit(spark):
    pts = spark.createDataFrame(
        [("u1", 5, "a"), ("u1", 100, "b"), ("u2", 5, "c")],
        "k string, t long, pv string",
    )
    iv = spark.createDataFrame(
        [("u1", 0, 10, "i1"), ("u1", 4, 5, "i2"), ("u2", 6, 9, "i3")],
        "k string, s long, e long, iv string",
    )
    out = interval_join(
        pts, iv, point_ts="t", start_col="s", end_col="e", by="k",
        bucket_width=4, ts_unit="long",
    ).toPandas()
    pairs = set(zip(out["pv"], out["iv"]))
    # 'a'(t=5) ∈ [0,10] and ∈ [4,5] (inclusive both ends); 'b' in nothing;
    # 'c'(u2,5) not in [6,9]
    assert pairs == {("a", "i1"), ("a", "i2")}
    p = _plan(
        interval_join(pts, iv, "t", "s", "e", by="k", bucket_width=4,
                      ts_unit="long")
    )
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_interval_join_matches_naive(spark):
    pts = spark.range(300).selectExpr(
        "cast(id % 7 as string) k", "cast(id * 13 % 997 as long) t", "id pid"
    )
    iv = spark.range(60).selectExpr(
        "cast(id % 7 as string) k",
        "cast(id * 31 % 900 as long) s",
        "cast(id * 31 % 900 + id % 50 as long) e",
        "id iid",
    )
    fast = interval_join(
        pts, iv, "t", "s", "e", by="k", bucket_width=16, ts_unit="long"
    ).select("pid", "iid")
    naive = (
        pts.alias("p")
        .join(iv.alias("i"), F.expr("p.k = i.k AND p.t BETWEEN i.s AND i.e"))
        .select("pid", "iid")
    )
    a = {tuple(r) for r in fast.collect()}
    b = {tuple(r) for r in naive.collect()}
    assert a == b and len(a) > 0
