"""Continuous encode via Structured Streaming.

The reference's signature execution mode is bounded streaming — generator
chunk pipelines that never materialize the table (combine_csv.py:93-106,
SURVEY.md §2.9). Its unbounded generalization: ``readStream`` over an
arriving-files directory → ``foreachBatch`` encode → append blocks.
Each micro-batch is encoded with the same shuffle-free local encoder;
exactly-once lands on Spark's streaming checkpoint (offsets) + deterministic
per-batch block ids.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from d6tstack_spark.operators.encode import encode_table


def start_encode_stream(
    spark: SparkSession,
    input_dir: str,
    blocks_dir: str,
    checkpoint_dir: str,
    schema,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    target_block_rows: int = 65536,
    max_files_per_trigger: int = 16,
) -> StreamingQuery:
    """Start a stream that encodes every arriving parquet file into blocks.

    Returns the StreamingQuery; callers drive it with
    ``q.processAllAvailable()`` (tests) or let it run with a trigger.
    """

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def encode_batch(batch_df, epoch_id: int):
        blocks, _ = encode_table(
            batch_df,
            order_cols=order_cols,
            mode="local",
            target_block_rows=target_block_rows,
        )
        # offset the deterministic (partitionId, seq) block ids by epoch so
        # batches never collide. foreachBatch is at-least-once: a retried
        # epoch re-runs the writer, so each epoch lands in its own
        # OVERWRITTEN subdirectory — the re-commit is idempotent (same
        # epoch → same dir → same deterministic block ids), which upgrades
        # the sink to effectively-once.
        from pyspark.sql import functions as F

        from d6tstack_spark.operators.sinks import write_blocks

        # write_blocks keeps the streaming sink on the same contract as
        # the batch sinks: uncompressed payloads, parquet dictionary off,
        # per-file complete-block guard
        write_blocks(
            blocks.withColumn(
                "block_id", F.col("block_id") + F.lit(int(epoch_id) << 48)
            ),
            f"{blocks_dir}/epoch={int(epoch_id)}",
            mode="overwrite",
        )

    return (
        stream.writeStream.foreachBatch(encode_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
