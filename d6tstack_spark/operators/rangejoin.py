"""Range (interval) join — match point events to enclosing intervals.

Spark compiles ``l.t BETWEEN r.start AND r.end`` to a
BroadcastNestedLoopJoin (quadratic) unless the right side is broadcastable.
The scale formulation here is bucketed: intervals explode into the coarse
time buckets they cover, points map to their single bucket, and the match
becomes an EQUI-join on (key, bucket) refined by the exact predicate —
O(points + intervals·avg_span/bucket) work, shuffle on (key, bucket),
skew bounded by bucket width. The classic Spark interval-join recipe
(same idea as Flink's interval join operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    by: list[str] | str | None = None,
    bucket_width: int = 3600,
    ts_unit: str = "timestamp",
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= point_ts <= end`` (within ``by`` groups), without a
    nested-loop join.

    ``bucket_width`` is in seconds when the columns are timestamps, else in
    the columns' own integer unit. Pick it near the median interval span:
    too small explodes intervals into many buckets, too large widens the
    refine scan."""
    by = [by] if isinstance(by, str) else list(by or [])

    def to_long(c):
        col = F.col(c)
        return F.unix_micros(col.cast("timestamp")) if ts_unit == "timestamp" else col.cast("long")

    width = bucket_width * (1_000_000 if ts_unit == "timestamp" else 1)
    p = points.withColumn("__b", F.floor(to_long(point_ts) / width))
    i = intervals.withColumn(
        "__bs", F.floor(to_long(start_col) / width)
    ).withColumn("__be", F.floor(to_long(end_col) / width))
    # explode each interval into the buckets it covers (inclusive)
    i = i.withColumn(
        "__b", F.explode(F.sequence(F.col("__bs"), F.col("__be")))
    ).drop("__bs", "__be")
    joined = p.join(i, by + ["__b"])
    exact = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
    )
    return joined.filter(exact).drop("__b")
