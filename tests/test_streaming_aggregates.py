"""Streaming: watermarked windowed aggregation (late-data handling) and the
applyInPandasWithState custom stateful operator (state survives batches)."""

from __future__ import annotations

import os

import pandas as pd
import pytest


@pytest.fixture()
def event_files(tmp_path):
    """Two event files: batch0 in hour 10 (+ one late hour-9 row), batch1
    far later (hour 20) so the watermark passes and finalizes hour 9-10."""
    base = pd.Timestamp("2026-01-01 10:00:00")
    b0 = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 2, 2],
            "event_type": ["click", "view", "click", "click"],
            "ts": [
                base,
                base + pd.Timedelta("5 min"),
                base + pd.Timedelta("10 min"),
                base - pd.Timedelta("30 min"),  # hour 9, late-ish
            ],
        }
    )
    b1 = pd.DataFrame(
        {
            "event_id": [5, 6],
            "user_id": [1, 3],
            "event_type": ["view", "click"],
            "ts": [base + pd.Timedelta("10 hours")] * 2,
        }
    )
    d = tmp_path / "in"
    d.mkdir()
    p0 = str(d / "b0.parquet")
    p1 = str(tmp_path / "b1.parquet")  # staged OUTSIDE the watched dir
    # µs timestamps: Spark's streaming parquet reader rejects TIMESTAMP(NANOS)
    b0.assign(ts=b0["ts"].astype("datetime64[us]")).to_parquet(p0)
    b1.assign(ts=b1["ts"].astype("datetime64[us]")).to_parquet(p1)
    return str(d), p1


def test_windowed_counts_with_watermark(spark, event_files, tmp_path):
    from d6tstack_spark.streaming.aggregates import start_windowed_counts

    indir, late_file = event_files
    schema = spark.read.parquet(indir).schema
    outdir = str(tmp_path / "out")
    q = start_windowed_counts(
        spark, indir, outdir, str(tmp_path / "ck"), schema,
        window="1 hour", watermark="2 hours",
    )
    try:
        q.processAllAvailable()
        # advance event time far past the early windows → they finalize
        os.link(late_file, os.path.join(indir, "b1.parquet"))
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.read.parquet(outdir)
        .toPandas()
        .sort_values(["window_start", "event_type"])
    )
    rows = {
        (str(r.window_start), r.event_type): r.n for r in got.itertuples()
    }
    assert rows[("2026-01-01 09:00:00", "click")] == 1
    assert rows[("2026-01-01 10:00:00", "click")] == 2
    assert rows[("2026-01-01 10:00:00", "view")] == 1
    # hour-20 windows are NOT finalized (watermark hasn't passed them)
    assert not any(k[0].startswith("2026-01-01 20") for k in rows)


def test_stateful_user_totals_state_survives_batches(spark, event_files, tmp_path):
    from d6tstack_spark.streaming.aggregates import start_stateful_user_totals

    indir, late_file = event_files
    schema = spark.read.parquet(indir).schema
    q = start_stateful_user_totals(
        spark, indir, str(tmp_path / "ck2"), schema, query_name="ut_test"
    )
    try:
        q.processAllAvailable()
        first = {
            r["user_id"]: r.asDict()
            for r in spark.sql("SELECT * FROM ut_test").collect()
        }
        assert first[1]["total_events"] == 2
        assert first[1]["top_type"] == "click"
        os.link(late_file, os.path.join(indir, "b1.parquet"))
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM ut_test"
        ).collect()
        # update-mode memory sink appends updated rows; take the latest per user
        latest = {}
        for r in rows:
            d = r.asDict()
            if (
                d["user_id"] not in latest
                or d["batches_seen"] > latest[d["user_id"]]["batches_seen"]
            ):
                latest[d["user_id"]] = d
        # user 1: 2 events in batch 0 + 1 in batch 1 — STATE carried over
        assert latest[1]["total_events"] == 3
        assert latest[1]["batches_seen"] == 2
        assert latest[1]["top_type"] in ("click", "view")  # 1 click vs 2 views? 1c+2v
        assert latest[3]["total_events"] == 1
        assert str(latest[1]["last_ts"]).startswith("2026-01-01 20:00")
    finally:
        q.stop()
