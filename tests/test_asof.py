"""As-of join: hand-checked semantics + plan shape (no range join)."""

from __future__ import annotations

from d6tstack_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("u1", 5, "a"), ("u1", 10, "b"), ("u1", 2, "c"), ("u2", 7, "d"),
         ("u3", 4, "e")],
        "k string, t long, lv string",
    )
    right = spark.createDataFrame(
        [("u1", 3, 30.0), ("u1", 5, 50.0), ("u1", 9, 90.0), ("u2", 8, 80.0)],
        "k string, t long, rv double",
    )
    out = asof_join(left, right, on="t", by="k").toPandas().set_index("lv")
    assert out.loc["a", "rv_r"] == 50.0  # equal ts matches (>= semantics)
    assert out.loc["b", "rv_r"] == 90.0
    assert out.loc["c"].isna()["rv_r"]  # nothing at or before t=2
    assert out.loc["d"].isna()["rv_r"]  # u2 right row is later (8 > 7)
    assert out.loc["e"].isna()["rv_r"]  # key with no right rows at all
    assert len(out) == 5  # every left row survives


def test_asof_join_plan_no_range_join(spark):
    left = spark.range(100).selectExpr("cast(id % 5 as string) k", "id t", "id lv")
    right = spark.range(50).selectExpr("cast(id % 5 as string) k", "id*2 t", "id rv")
    out = asof_join(left, right, on="t", by="k")
    p = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # one window over the union — a single key-shuffle, linear work
    assert "Window" in p
