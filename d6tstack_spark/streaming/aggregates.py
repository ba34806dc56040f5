"""Streaming analytics over arriving transcript/event files (SURVEY §2.9
widened to the unbounded cases the reference's generator pipeline cannot
express):

- ``start_windowed_counts``: event-time tumbling windows with a WATERMARK —
  late rows inside the allowance are merged, windows finalize and emit
  exactly once (append mode), state is bounded by the watermark. This is
  the canonical late-data pattern for 100 TB/day streams.
- ``start_stateful_user_totals``: a CUSTOM stateful operator via
  ``applyInPandasWithState`` — per-key state (running totals) maintained by
  the engine's checkpoint, batches arrive as Arrow-backed pandas frames
  (vectorized, no per-row Python dispatch).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def start_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int = 16,
) -> StreamingQuery:
    """Tumbling-window counts per key with a late-data watermark; append
    mode writes each window exactly once, when the watermark passes it."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    # watermarks need TIMESTAMP (tz-aware); parquet µs columns read as NTZ.
    # The session TZ is pinned UTC so the cast is exact.
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


_TOTALS_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("total_events", LongType()),
        StructField("batches_seen", LongType()),
        StructField("last_ts", TimestampType()),
        StructField("top_type", StringType()),
    ]
)

_TOTALS_STATE = StructType(
    [
        StructField("total", LongType()),
        StructField("batches", LongType()),
        StructField("last_us", LongType()),
        StructField("type_json", StringType()),
    ]
)


def _update_user_totals(key, pdfs, state: GroupState):
    """Stateful kernel: fold each micro-batch's rows for one user into the
    running (total, batches, last-seen, per-type histogram) state and emit
    the updated summary row. Vectorized per batch — pandas ops only."""
    import json

    total, batches, last_us, type_json = (
        state.get if state.exists else (0, 0, 0, "{}")
    )
    hist = json.loads(type_json)
    for pdf in pdfs:
        total += len(pdf)
        batches += 1
        if len(pdf):
            last_us = max(
                last_us, int(pd.Timestamp(pdf["ts"].max()).value // 1000)
            )
            for t, c in pdf["event_type"].value_counts().items():
                hist[t] = hist.get(t, 0) + int(c)
    state.update((total, batches, last_us, json.dumps(hist, sort_keys=True)))
    top = max(sorted(hist), key=lambda t: hist[t]) if hist else None
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "total_events": [total],
            "batches_seen": [batches],
            "last_ts": [pd.Timestamp(last_us * 1000)],
            "top_type": [top],
        }
    )


def start_stateful_user_totals(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    schema,
    query_name: str = "user_totals",
    max_files_per_trigger: int = 16,
) -> StreamingQuery:
    """Custom stateful streaming operator (applyInPandasWithState): running
    per-user event totals + modal event type, updated every micro-batch.
    Sink = in-memory table ``query_name`` (swap for kafka/parquet in prod)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=_TOTALS_OUT,
        stateStructType=_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
