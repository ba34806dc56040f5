"""Metadata-only / pruned counting (plans.fastcount): the count always
equals the exact decode, and the mode/file-classification report proves
how much payload the stats saved.

Layout under test: three staged appends (one encode_resume per source
file keeps per-file key ranges disjoint — the resume batch job
round-robins splits otherwise), ``seq`` strictly increasing across
files so range predicates can prune AND all-match at file granularity.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from d6tstack_spark.plans.checkpoint import decode_state, encode_resume
from d6tstack_spark.plans.fastcount import fast_count


@pytest.fixture()
def state3(spark, tmp_path):
    """3 files, seq ranges [0,1200) [1200,2400) [2400,3600); val has
    nulls everywhere; tag overlaps every file's zone range."""
    sd = str(tmp_path / "state")
    paths = []
    for i in range(3):
        n = 1200
        tbl = pa.table(
            {
                "conv_id": pa.array(
                    [f"{'abc'[i]}{j // 6:04d}" for j in range(n)]
                ),
                "turn_idx": pa.array([j % 6 for j in range(n)], pa.int32()),
                "seq": pa.array(
                    [i * n + j for j in range(n)], pa.int64()
                ),
                "val": pa.array(
                    [None if j % 7 == 0 else float(j % 100) for j in range(n)],
                    pa.float64(),
                ),
                "tag": pa.array([f"{j % 50:02d}_{i}" for j in range(n)]),
            }
        )
        p = str(tmp_path / f"src_{i}.parquet")
        pq.write_table(tbl, p)
        paths.append(p)
        # resume takes the FULL list each time; already-encoded files skip
        encode_resume(spark, paths, sd, order_cols=("conv_id", "turn_idx"))
    return sd


def test_count_star_is_metadata_only(spark, state3):
    rep = fast_count(spark, state3)
    assert rep["count"] == 3600
    assert rep["mode"] == "metadata"
    assert rep["files_decoded"] == 0
    assert rep["files_metadata_only"] == rep["files_total"] > 0


def test_range_count_prunes_and_proves_allmatch(spark, state3):
    # a boundary in the gap between file ranges proves file 0 all-match
    # and prunes files 1-2 — no payload read at all. (Boundary-exact
    # spellings like "seq <= 1199" decode the file holding the boundary
    # value: the may-match envelopes and the 1-ulp-widened stats are
    # both deliberately inclusive, so the proof is conservative there —
    # the count stays exact either way.)
    rep = fast_count(spark, state3, where="seq <= 1199.5")
    assert rep["count"] == 1200
    assert rep["mode"] == "metadata"
    assert rep["files_pruned"] >= 1
    assert rep["files_decoded"] == 0
    rep = fast_count(spark, state3, where="seq <= 1199")
    assert rep["count"] == 1200
    assert rep["files_decoded"] == 1  # only the boundary-holding file
    # a range splitting a file decodes only the split file
    rep = fast_count(spark, state3, where="seq >= 600 AND seq < 2400")
    assert rep["count"] == 1800
    assert rep["files_decoded"] >= 1
    assert rep["files_decoded"] < rep["files_total"]


def test_null_column_blocks_allmatch_proof(spark, state3):
    # val has nulls in every file: "val >= 0" matches all NON-NULL rows,
    # so no file may be counted from stats alone
    rep = fast_count(spark, state3, where="val >= 0")
    exact = decode_state(spark, state3, where="val >= 0").count()
    assert rep["count"] == exact < 3600
    assert rep["files_metadata_only"] == 0


@pytest.mark.parametrize(
    "where",
    [
        "seq BETWEEN 100 AND 3100",
        "seq < 1200 OR seq >= 2400",
        "NOT (seq >= 1200)",
        "conv_id LIKE 'b%'",
        "val IS NULL",
        "val IS NOT NULL AND seq < 1800",
        "tag = '07_1'",
        "seq < 0",
        "turn_idx IN (0, 5) AND seq >= 2400",
    ],
)
def test_fast_count_matches_decode(spark, state3, where):
    rep = fast_count(spark, state3, where=where)
    exact = decode_state(spark, state3, where=where).count()
    assert rep["count"] == exact, (where, rep)


def test_single_file_prunes_at_block_granularity(spark, tmp_path):
    """One source file → one state file with many blocks: a narrow range
    must decode only the blocks holding it, and a gap-boundary range
    must metadata-count interior blocks."""
    n = 400_000  # 8 row groups, 2 per split -> 4 blocks
    tbl = pa.table(
        {
            "conv_id": pa.array([f"c{j // 50:05d}" for j in range(n)]),
            "turn_idx": pa.array([j % 50 for j in range(n)], pa.int32()),
            "seq": pa.array(list(range(n)), pa.int64()),
        }
    )
    p = str(tmp_path / "src.parquet")
    pq.write_table(tbl, p, row_group_size=50_000)
    sd = str(tmp_path / "state")
    encode_resume(spark, [p], sd, order_cols=("conv_id", "turn_idx"))

    rep = fast_count(spark, sd, where="seq >= 100 AND seq <= 150")
    assert rep["count"] == 51
    assert rep["blocks_total"] > 2
    assert 0 < rep["blocks_decoded"] < rep["blocks_total"]
    assert rep["blocks_kept"] < rep["blocks_total"]  # zone pruning hit
    # wide range with gap-safe boundaries: interior blocks metadata-only
    rep = fast_count(spark, sd, where="seq >= 99.5 AND seq <= 300000.5")
    assert rep["count"] == 299_901
    assert rep["blocks_decoded"] < rep["blocks_kept"]  # all-match proof hit


def test_tombstones_force_exact_fallback(spark, state3):
    from d6tstack_spark.plans.checkpoint import delete_where

    delete_where(spark, state3, "seq >= 3000")
    rep = fast_count(spark, state3)
    assert rep["count"] == 3000
    assert rep["mode"] == "fallback"
    rep = fast_count(spark, state3, where="seq >= 2400")
    assert rep["count"] == 600


def test_snapshot_count(spark, state3):
    from d6tstack_spark.plans.checkpoint import load_snapshots

    recs = load_snapshots(state3)
    first = recs[0]["id"]
    rep = fast_count(spark, state3, snapshot=first)
    assert rep["count"] == 1200
    assert rep["mode"] == "metadata"
