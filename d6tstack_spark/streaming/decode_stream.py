"""Continuous DECODE via Structured Streaming — the symmetric half of
``encode_stream``: blocks appended by an encode job (batch or streaming)
are decoded as they land, so a downstream consumer reads plain rows with
bounded latency instead of waiting for the corpus.

Design constraints it inherits:

- the blocks sink writes WHOLE blocks into single files (the per-file
  complete-block invariant enforced by ``sinks.write_blocks``), and
  Spark's file stream source emits complete files per micro-batch — so a
  micro-batch always contains complete blocks and ``decode_table`` can
  decode it independently of every other batch;
- ``foreachBatch`` is at-least-once: a retried epoch re-runs the writer,
  so each epoch overwrites its own ``epoch=N`` subdirectory — decode is
  deterministic, so the re-commit is idempotent and the sink is
  effectively-once (same pattern as ``encode_stream``);
- the decode itself is the normal block_id-repartition path per
  micro-batch: payload shuffle bounded by the batch size, never the
  corpus.

Scope: this streams RAW appended blocks from a blocks dir. State-dir
read semantics — pending delete tombstones, snapshot resolution,
retired files — are deliberately NOT applied here (a file stream source
cannot re-evaluate history); read state dirs through
``plans.checkpoint.decode_state`` / ``decode_state_diff``, and point
this stream at append-only block dirs (e.g. an encode_stream sink).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from d6tstack_spark.operators.encode import BLOCKS_SCHEMA, decode_table


def start_decode_stream(
    spark: SparkSession,
    blocks_dir: str,
    manifest: dict,
    out_dir: str,
    checkpoint_dir: str,
    columns: list[str] | None = None,
    max_files_per_trigger: int = 16,
) -> StreamingQuery:
    """Start a stream that decodes every arriving blocks file back to rows.

    ``manifest`` is the encode manifest (``load_manifest`` for checkpoint
    state dirs). ``columns`` decodes a projection only — the column
    pruning rides the parquet filter into the blocks scan exactly as in
    batch decode. Returns the StreamingQuery; drive with
    ``q.processAllAvailable()`` (tests) or a trigger.

    This decodes a raw BLOCKS dir; state-dir predicate tombstones
    (``plans.checkpoint.delete_where``) are a ``decode_state`` concern —
    run ``plans.maintenance.purge_deletes`` before streaming-decoding a
    state dir's blocks, or filter the output with the same keep
    expression.
    """
    stream = (
        spark.readStream.schema(BLOCKS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        # encode_stream writes epoch=N subdirs; plain write_blocks dirs are
        # flat — recursive lookup handles both layouts
        .option("recursiveFileLookup", "true")
        .parquet(blocks_dir)
    )

    def decode_batch(batch_df, epoch_id: int):
        decoded = decode_table(batch_df, manifest, columns=columns)
        decoded.write.mode("overwrite").parquet(
            f"{out_dir}/epoch={int(epoch_id)}"
        )

    return (
        stream.writeStream.foreachBatch(decode_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
