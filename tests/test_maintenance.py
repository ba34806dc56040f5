"""compact_blocks: many small block files → few target-sized files,
with the per-file complete-block invariant, zone locality, the manifest
sidecar, and the decoded table all preserved."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from d6tstack_spark.operators.encode import (
    decode_parquet_blocks,
    encode_parquet_files,
)
from d6tstack_spark.operators.sinks import write_blocks
from d6tstack_spark.plans.checkpoint import (
    load_blocks_manifest,
    save_manifest,
)
from d6tstack_spark.plans.maintenance import compact_blocks


@pytest.fixture()
def fragmented(spark, tmp_path):
    """A blocks dir deliberately shattered into ~32 small files (what
    streaming epochs / batched resume commits accrete)."""
    src = str(tmp_path / "src.parquet")
    n = 20_000
    pq.write_table(
        pa.table({
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(np.random.default_rng(3).random(n)),
        }),
        src, row_group_size=1000,
    )
    blocks, man = encode_parquet_files(
        spark, src, order_cols=("k",), row_groups_per_split=1
    )
    bdir = str(tmp_path / "blocks")
    # fragment into many small files but keep each block's rows together
    # (hash-partition on block_id), as streaming epoch appends would
    write_blocks(blocks.repartition(32, "block_id"), bdir)
    save_manifest(man, bdir)
    return src, bdir, man


def test_compact_preserves_everything(spark, fragmented):
    src, bdir, man = fragmented
    before = sorted(
        r.k for r in decode_parquet_blocks(spark, bdir, man).select("k").collect()
    )
    n_before = len(glob.glob(f"{bdir}/*.parquet"))
    assert n_before >= 8
    rep = compact_blocks(spark, bdir, target_file_bytes=1 << 40)
    assert rep["compacted"] and rep["files_before"] == n_before
    n_after = len(glob.glob(f"{bdir}/*.parquet"))
    assert n_after == rep["files_after"] < n_before
    # sidecar survived; decode identical through it
    man2 = load_blocks_manifest(bdir)
    assert man2 == man
    after = sorted(
        r.k for r in decode_parquet_blocks(spark, bdir, man2).select("k").collect()
    )
    assert after == before
    # no lease or tmp residue
    assert not os.path.exists(bdir + ".compact")
    assert not os.path.exists(bdir + ".lease")
    assert not os.path.exists(os.path.join(bdir, "writer.lock"))


def test_compact_keeps_blocks_whole_per_file(spark, fragmented):
    src, bdir, man = fragmented
    compact_blocks(spark, bdir, target_file_bytes=64 << 10)  # several files
    rows = (
        spark.read.parquet(bdir)
        .select("block_id", F.input_file_name().alias("f"))
        .distinct()
        .groupBy("block_id")
        .agg(F.countDistinct("f").alias("nf"))
        .agg(F.max("nf"))
        .first()[0]
    )
    assert rows == 1  # every block's rows live in exactly one file


def test_compact_noop_and_dry_run(spark, fragmented):
    src, bdir, man = fragmented
    rep = compact_blocks(spark, bdir, target_file_bytes=1, dry_run=True)
    assert not rep["compacted"]  # dry_run never rewrites
    assert len(glob.glob(f"{bdir}/*.parquet")) == rep["files_before"]
    compact_blocks(spark, bdir, target_file_bytes=1 << 40)
    rep2 = compact_blocks(spark, bdir, target_file_bytes=1 << 40)
    assert not rep2["compacted"]  # already compact: no rewrite


def test_compact_zone_pruning_still_selective(spark, fragmented):
    """Range partitioning keeps id-adjacent blocks together, so the
    file-level stats pruning decodes a narrow slice from few files."""
    src, bdir, man = fragmented
    compact_blocks(spark, bdir, target_file_bytes=64 << 10)
    dec = decode_parquet_blocks(spark, bdir, man, block_filter=("k", 100, 110))
    assert dec.filter((F.col("k") >= 100) & (F.col("k") <= 110)).count() == 11
    assert dec.count() < 20_000 / 2  # pruning still engages after rewrite


def test_compact_recovers_crashed_swap(spark, fragmented):
    """Crash windows of the rename-aside swap heal on the next run:
    (a) died between rename-aside and rename-in → live dir missing,
    the aside copy rolls back; (b) died between the sidecar move and
    the swap → the only _manifest.json sits inside the stale tmp dir
    and must be rescued, not deleted with it."""
    import shutil

    src, bdir, man = fragmented
    # (a) aside exists, live missing
    os.rename(bdir, bdir + ".old")
    rep = compact_blocks(spark, bdir, target_file_bytes=1 << 40)
    assert rep["compacted"] and not os.path.exists(bdir + ".old")
    dec = decode_parquet_blocks(spark, bdir, load_blocks_manifest(bdir))
    assert dec.count() == 20_000
    # (b) sidecar stranded in a stale .compact sibling
    os.makedirs(bdir + ".compact", exist_ok=True)
    shutil.move(
        os.path.join(bdir, "_manifest.json"),
        os.path.join(bdir + ".compact", "_manifest.json"),
    )
    rep2 = compact_blocks(spark, bdir, target_file_bytes=1 << 40)
    assert not rep2["compacted"]  # already one file — no rewrite needed
    assert os.path.exists(os.path.join(bdir, "_manifest.json"))
    assert not os.path.exists(bdir + ".compact")
    assert load_blocks_manifest(bdir) == man


def test_compact_respects_foreign_lease(spark, fragmented):
    src, bdir, man = fragmented
    lease_home = bdir + ".lease"
    os.makedirs(lease_home, exist_ok=True)
    with open(os.path.join(lease_home, "writer.lock"), "w") as f:
        json.dump({"pid": os.getpid(), "host": __import__("socket").gethostname(),
                   "acquired": 0}, f)
    with pytest.raises(RuntimeError, match="locked by an active writer"):
        compact_blocks(spark, bdir, target_file_bytes=1 << 40)
    os.remove(os.path.join(lease_home, "writer.lock"))
    os.rmdir(lease_home)
