"""Blocks-dir maintenance: small-file compaction.

Streaming epochs (`streaming/encode_stream.py`) and batched resume
commits (`plans/checkpoint.py::encode_resume(checkpoint_every=...)`)
append blocks in many independent jobs — at 100 TB that accretes
thousands of small parquet files, and the shuffle-free bulk decode plans
ONE TASK PER FILE, so file count is task count. Compaction rewrites a
blocks dir into ~target-sized files while preserving the two invariants
the decode paths rely on:

- per-file complete blocks (``repartitionByRange`` on ``block_id`` keeps
  every row of a block in one output partition = one file, and the sink
  re-checks by rejecting ``maxRecordsPerFile``),
- file-level zone-map locality (range partitioning keeps id-adjacent
  blocks together, so the driver's stats-only file pruning stays as
  selective as before).

Safety: takes the same writer lease the resumable encoder uses, writes
the compacted table NEXT TO the live dir, verifies row parity, and only
then swaps — a crash at any point leaves either the original dir intact
or a stale ``.compact`` sibling that the next run clears. The
``_manifest.json`` sidecar (self-describing dirs) survives the rewrite.
This mirrors Iceberg's ``rewrite_data_files`` maintenance action for the
reference's ingest-to-parquet output (d6tstack combine_csv.py writes
one parquet per input CSV — same small-file accretion at scale).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession


def compact_blocks(
    spark: SparkSession,
    blocks_dir: str,
    target_file_bytes: int = 256 << 20,
    dry_run: bool = False,
) -> dict:
    """Rewrite ``blocks_dir`` into ``ceil(total_bytes/target)`` files.

    Returns a report dict: ``files_before/files_after/bytes/compacted``.
    No-op (``compacted=False``) when the dir already has that few files.
    Raises if another writer holds the dir's lease. Concurrent READERS
    of the old listing fail with the decoder's explicit "blocks dir
    changed under the running decode" error rather than silently missing
    data — schedule compaction like any other table maintenance."""
    from d6tstack_spark.operators.encode import _hadoop_list_files
    from d6tstack_spark.operators.sinks import write_blocks
    from d6tstack_spark.plans.checkpoint import (
        _LeaseHeartbeat,
        _acquire_lease,
    )

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()

    def _hpath(p: str):
        return jvm.org.apache.hadoop.fs.Path(p)

    fs = _hpath(blocks_dir).getFileSystem(conf)
    tmp = blocks_dir.rstrip("/") + ".compact"
    if fs.exists(_hpath(tmp)):  # stale sibling from a crashed run
        fs.delete(_hpath(tmp), True)

    # one globStatus call returns paths AND sizes (no per-file RPC loop)
    sts = fs.globStatus(_hpath(blocks_dir.rstrip("/") + "/*.parquet"))
    paths = [s.getPath().toString() for s in (sts or [])]
    total_bytes = sum(s.getLen() for s in (sts or []))
    if not paths:
        raise ValueError(f"no blocks parquet files under {blocks_dir}")
    n_out = max(1, -(-total_bytes // target_file_bytes))
    report = {
        "files_before": len(paths),
        "files_after": min(len(paths), int(n_out)),
        "bytes": int(total_bytes),
        "compacted": len(paths) > n_out,
    }
    if dry_run or not report["compacted"]:
        report["compacted"] = False if dry_run else report["compacted"]
        return report

    # the lease must live OUTSIDE the blocks dir (a stray writer.lock
    # inside would poison plain parquet reads of the dir). A state dir
    # (parent carries format.json) uses the STATE dir lease — the same
    # lock encode_resume takes, so compaction and resume serialize; a
    # plain blocks dir uses a sibling .lease dir.
    parent = os.path.dirname(blocks_dir.rstrip("/"))
    state_like = os.path.exists(os.path.join(parent, "format.json"))
    lease_home = parent if state_like else blocks_dir.rstrip("/") + ".lease"
    lease = _acquire_lease(lease_home)
    hb = _LeaseHeartbeat(lease)
    try:
        blocks = spark.read.parquet(blocks_dir)
        rows_before = blocks.count()
        compacted = blocks.repartitionByRange(int(n_out), "block_id")
        write_blocks(compacted, tmp)
        rows_after = spark.read.parquet(tmp).count()
        if rows_after != rows_before:
            fs.delete(_hpath(tmp), True)
            raise RuntimeError(
                f"compaction row parity check failed ({rows_before} → "
                f"{rows_after}); original dir untouched"
            )
        sidecar = os.path.join(blocks_dir, "_manifest.json")
        manifest_text = None
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                manifest_text = f.read()
        fs.delete(_hpath(blocks_dir), True)
        fs.rename(_hpath(tmp), _hpath(blocks_dir))
        if manifest_text is not None:
            with open(sidecar, "w") as f:
                f.write(manifest_text)
    finally:
        hb.release()
        try:
            os.unlink(lease)
        except FileNotFoundError:
            pass
        if not state_like:
            import shutil

            shutil.rmtree(lease_home, ignore_errors=True)
    report["files_after"] = len(
        _hadoop_list_files(spark, blocks_dir, ".parquet")
    )
    return report
