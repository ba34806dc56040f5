"""Continuous MERGE (CDC apply) via Structured Streaming.

The batch layer already has the full upsert lifecycle (delete_keys →
targeted purge → append); this is its unbounded form — the Delta/Iceberg
"streaming MERGE" analog. Each micro-batch of change rows is applied
MERGE-ON-READ: the batch's keys are tombstoned (an equality delete,
sequence-scoped to everything already on disk) and the batch's surviving
rows appended — no physical rewrite in the hot path. Decode applies the
tombstones exactly; a periodic :func:`~d6tstack_spark.plans.maintenance.
purge_deletes` (or ``purge_every=``) folds them into the files.

Batch semantics: every row of a key present in the batch REPLACES that
key's stored rows (whole-key replacement — the natural contract for a
transcript table where a key is a conversation). Rows where
``delete_col`` is true are delete events: their keys are tombstoned and
nothing is re-inserted (unless the same batch also carries data rows for
the key — data wins, since the delete applies to prior state either way).

Crash/retry safety (foreachBatch is at-least-once):
- Applied epochs are recorded in ``<state>/upsert_epochs.json`` AFTER
  the apply; a replayed epoch that finished is skipped outright.
- A replayed epoch that crashed mid-apply re-runs; the apply is
  content-idempotent because any partial append of the failed attempt
  is COMPLETED before the retry's tombstone is recorded (sequence
  scoping covers only files appended before the delete record — the
  same pre-completion step :func:`upsert_files` performs), so the
  retry's tombstone deletes the partial rows and the re-append
  replaces them exactly once.

Reference analog: the reference's streaming mode is bounded chunk
pipelines into a cumulative sink (combine_csv.py chunked apply);
this upgrades the sink contract from append-only to keyed MERGE.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery


def _epochs_path(state_dir: str) -> str:
    return os.path.join(state_dir, "upsert_epochs.json")


def _load_epoch_marker(state_dir: str) -> dict:
    p = _epochs_path(state_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _mark_epoch(state_dir: str, ckpt: str, epoch_id: int) -> None:
    p = _epochs_path(state_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"checkpoint": ckpt, "last_epoch": int(epoch_id)}, f)
    os.replace(tmp, p)


def apply_upsert_batch(
    spark: SparkSession,
    state_dir: str,
    batch_df: DataFrame,
    epoch_id: int,
    checkpoint_dir: str,
    key_cols: tuple[str, ...],
    order_cols: tuple[str, ...],
    delete_col: str | None = None,
    purge_every: int | None = None,
) -> dict:
    """Apply one CDC micro-batch. Factored out of the stream so tests
    (and backfills) can drive epochs directly with the exact semantics
    the stream uses."""
    from d6tstack_spark.plans.checkpoint import (
        _files_path,
        delete_keys,
        encode_resume,
    )
    from d6tstack_spark.plans.maintenance import purge_deletes

    marker = _load_epoch_marker(state_dir)
    if (
        marker.get("checkpoint") == checkpoint_dir
        and int(epoch_id) <= marker.get("last_epoch", -1)
    ):
        return {"skipped": True, "epoch": int(epoch_id)}

    if delete_col is not None:
        dels = batch_df.filter(
            F.coalesce(F.col(delete_col), F.lit(False))
        )
        data = batch_df.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
        del_keys = dels.select(*key_cols).distinct()
    else:
        data = batch_df
        del_keys = None

    # stage the data rows once (source-file-based resume bookkeeping —
    # same contract as upsert_frame; staged files join the lineage)
    import uuid

    from d6tstack_spark.operators.encode import _hadoop_list_files

    recorded: dict = {}
    fp = _files_path(state_dir)
    if os.path.exists(fp):
        with open(fp) as f:
            recorded = json.load(f)
    if recorded:
        # complete any in-flight append of a crashed prior attempt BEFORE
        # recording this epoch's tombstone (see module docstring)
        encode_resume(
            spark, sorted(recorded), state_dir, order_cols=order_cols
        )

    n_data = data.count()
    staged_paths: list[str] = []
    if n_data:
        sub = os.path.join(
            state_dir, "staged",
            f"stream-epoch-{int(epoch_id)}-{uuid.uuid4().hex}",
        )
        data.write.parquet(sub)
        staged_paths = sorted(_hadoop_list_files(spark, sub, ".parquet"))

    # one tombstone for every key the batch touches (delete events AND
    # replaced keys); recorded BEFORE the append so sequence scoping
    # exempts the new rows. A fresh state dir (nothing recorded) has
    # nothing to replace — skip straight to the append.
    touched = data.select(*key_cols).distinct()
    if del_keys is not None:
        touched = touched.unionByName(del_keys).distinct()
    drep = {"n_keys": 0, "recorded": False}
    if recorded and touched.limit(1).count():
        drep = delete_keys(spark, state_dir, touched, key_cols=key_cols)

    arep = {}
    if staged_paths:
        full = sorted(set(recorded) | set(staged_paths))
        arep = encode_resume(
            spark, full, state_dir, order_cols=order_cols
        )

    prep = {}
    if (
        purge_every
        and drep.get("recorded")
        and int(epoch_id) % int(purge_every) == 0
    ):
        prep = purge_deletes(spark, state_dir, order_cols=order_cols)

    _mark_epoch(state_dir, checkpoint_dir, epoch_id)
    return {
        "skipped": False,
        "epoch": int(epoch_id),
        "rows": int(n_data),
        "keys_tombstoned": drep.get("n_keys", 0),
        "appended": arep,
        "purged": prep,
    }


def start_upsert_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema,
    key_cols: tuple[str, ...] = ("conv_id",),
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    delete_col: str | None = None,
    purge_every: int | None = None,
    max_files_per_trigger: int = 16,
) -> StreamingQuery:
    """Start a stream that MERGEs every arriving parquet file of change
    rows into ``state_dir`` by ``key_cols``. Returns the StreamingQuery;
    drive with ``q.processAllAvailable()`` (tests) or a trigger."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        # landing zones are usually fed by Spark jobs, whose "files" are
        # directories of part files
        .option("recursiveFileLookup", "true")
        .parquet(input_dir)
    )

    def _apply(batch_df, epoch_id: int):
        apply_upsert_batch(
            spark,
            state_dir,
            batch_df,
            epoch_id,
            checkpoint_dir,
            key_cols=key_cols,
            order_cols=order_cols,
            delete_col=delete_col,
            purge_every=purge_every,
        )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
