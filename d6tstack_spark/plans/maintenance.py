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

Safety: takes the writer lease FIRST (the same lock the resumable
encoder uses when the dir belongs to a state dir), then writes the
compacted table NEXT TO the live dir, verifies row parity, and swaps
with a rename-aside (live → ``.old``, new → live, drop ``.old``) — a
crash at any point leaves either the live dir intact or a completed
``.old``/``.compact`` pair that the next run rolls back or clears under
the lease. The ``_manifest.json`` sidecar (self-describing dirs) is
MOVED into the new dir before the swap, so it survives on any
Hadoop-resolvable filesystem. This mirrors Iceberg's
``rewrite_data_files`` maintenance action for the reference's
ingest-to-parquet output (d6tstack combine_csv.py writes one parquet
per input CSV — same small-file accretion at scale).

The writer lease itself (O_EXCL file + pid liveness, shared with
``encode_resume``) assumes the lease home is on a locally-mounted path;
on object stores, front compaction with your scheduler's own mutual
exclusion, as for every other writer in this engine.
"""

from __future__ import annotations

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

    live = blocks_dir.rstrip("/")
    fs = _hpath(live).getFileSystem(conf)
    tmp = live + ".compact"
    aside = live + ".old"

    # the lease must live OUTSIDE the blocks dir (a stray writer.lock
    # inside would poison plain parquet reads of the dir). A state dir
    # (parent carries format.json) uses the STATE dir lease — the same
    # lock encode_resume takes, so compaction and resume serialize; a
    # plain blocks dir uses a sibling .lease dir. Acquired BEFORE any
    # cleanup so two compactors cannot clear each other's tmp dirs.
    parent = os.path.dirname(live)
    state_like = fs.exists(_hpath(parent + "/format.json"))
    lease_home = parent if state_like else live + ".lease"
    lease = _acquire_lease(lease_home)
    hb = _LeaseHeartbeat(lease)
    try:
        # crash recovery, oldest window first: a run that died between
        # rename-aside and rename-in left no live dir — roll the aside
        # copy back (it is the verified original). A completed swap that
        # died before dropping the aside just leaves it to clear.
        if fs.exists(_hpath(aside)):
            if not fs.exists(_hpath(live)):
                fs.rename(_hpath(aside), _hpath(live))
            else:
                fs.delete(_hpath(aside), True)
        if fs.exists(_hpath(tmp)):  # stale sibling from a crashed run
            # a crash between the sidecar move and the swap left the only
            # _manifest.json inside tmp — rescue it before clearing
            tside = _hpath(tmp + "/_manifest.json")
            lside = _hpath(live + "/_manifest.json")
            if (
                fs.exists(_hpath(live))
                and fs.exists(tside)
                and not fs.exists(lside)
            ):
                fs.rename(tside, lside)
            fs.delete(_hpath(tmp), True)

        # one globStatus call returns paths AND sizes (no per-file RPC)
        sts = fs.globStatus(_hpath(live + "/*.parquet"))
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

        blocks = spark.read.parquet(live)
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
        # move the sidecar INTO the new dir pre-swap (Hadoop-FS rename —
        # works on any resolvable scheme, no local-path content read)
        sidecar = _hpath(live + "/_manifest.json")
        if fs.exists(sidecar):
            fs.rename(sidecar, _hpath(tmp + "/_manifest.json"))
        # rename-aside swap: at no instant is the data deleted while it
        # is the only copy
        fs.rename(_hpath(live), _hpath(aside))
        fs.rename(_hpath(tmp), _hpath(live))
        fs.delete(_hpath(aside), True)
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
