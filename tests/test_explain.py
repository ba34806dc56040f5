"""explain_decode: the dry-run read planner must report exactly the
pruning the real decode performs (snapshot resolution → Bloom sidecar →
zone DNF) plus the tombstone generations it will apply."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from d6tstack_spark.plans.bloomidx import build_bloom_index
from d6tstack_spark.plans.checkpoint import (
    decode_state,
    delete_where,
    encode_resume,
    load_snapshots,
)
from d6tstack_spark.plans.explain import explain_decode


def _mk_files(tmp_path, prefixes=("a", "b", "c"), n=1200):
    """conv_id zones are file-disjoint; tag zones overlap in every file
    (each value lives in exactly one file) — so conv predicates prune by
    zone and tag predicates only by Bloom."""
    os.makedirs(str(tmp_path), exist_ok=True)
    paths = []
    for i, p in enumerate(prefixes):
        tbl = pa.table(
            {
                "conv_id": pa.array([f"{p}{j // 6:04d}" for j in range(n)]),
                "turn_idx": pa.array([j % 6 for j in range(n)], pa.int32()),
                "tag": pa.array(
                    # value exists in exactly ONE row-group split of one
                    # source file, but every block's zone range spans
                    # '00_'..'49_' — only the Bloom can isolate it
                    [f"{j % 50:02d}_{i}_{j // 400}" for j in range(n)]
                ),
            }
        )
        path = str(tmp_path / f"src_{i}.parquet")
        pq.write_table(tbl, path, row_group_size=400)
        paths.append(path)
    return paths


@pytest.fixture()
def state(spark, tmp_path):
    paths = _mk_files(tmp_path)
    sd = str(tmp_path / "state")
    encode_resume(spark, paths, sd, order_cols=("conv_id", "turn_idx"))
    return paths, sd, spark.read.parquet(*paths)


def test_full_scan_plan(spark, state):
    paths, sd, src = state
    rep = explain_decode(spark, sd)
    assert rep["files_after_zone"] == rep["files_total"] > 0
    assert rep["est_rows_scanned"] == src.count()
    assert rep["zone_dnf"] is None
    assert rep["tombstones_visible"] == 0
    assert rep["columns_decoded"] == ["conv_id", "turn_idx", "tag"]


def test_zone_pruned_plan_matches_read(spark, state):
    paths, sd, src = state
    w = "conv_id >= 'b' AND conv_id < 'c'"
    rep = explain_decode(spark, sd, where=w)
    assert rep["zone_dnf"] is not None
    assert 0 < rep["files_after_zone"] < rep["files_total"]
    assert src.filter(w).count() <= rep["est_rows_scanned"] < src.count()
    # the plan is honest: the real read returns the filtered rows
    assert decode_state(spark, sd, where=w).count() == src.filter(w).count()


def test_bloom_layer_reported(spark, state):
    paths, sd, src = state
    rep0 = explain_decode(spark, sd, where="tag = '07_1_1'")
    assert rep0["bloom_columns"] is None
    assert rep0["files_after_bloom"] == rep0["files_total"]
    build_bloom_index(spark, sd, ["tag"])
    rep = explain_decode(spark, sd, where="tag = '07_1_1'")
    assert rep["bloom_columns"] == ["tag"]
    assert rep["files_after_bloom"] == 1 < rep["files_total"]
    assert rep["est_rows_scanned"] < src.count()


def test_tombstones_and_projection(spark, state):
    paths, sd, src = state
    delete_where(spark, sd, "tag = '03_0_0'")
    rep = explain_decode(spark, sd, columns=["turn_idx"])
    assert rep["tombstones_visible"] == 1
    assert rep["tombstone_generations"] >= 1
    # tombstone column is decoded for the filter even when projected out
    assert "tag" in rep["columns_decoded"]
    assert rep["columns_decoded"][0] == "turn_idx"


def test_snapshot_plan(spark, state, tmp_path):
    paths, sd, src = state
    pre = load_snapshots(sd)[-1]["id"]
    extra = _mk_files(tmp_path / "more", prefixes=("d",), n=600)
    encode_resume(spark, paths + extra, sd, order_cols=("conv_id", "turn_idx"))
    live = explain_decode(spark, sd)
    old = explain_decode(spark, sd, snapshot=pre)
    assert old["files_total"] < live["files_total"]
    assert old["est_rows_scanned"] == src.count()
    assert live["est_rows_scanned"] == src.count() + 600
