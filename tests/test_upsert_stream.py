"""Continuous MERGE / CDC apply (streaming.upsert_stream): whole-key
replacement per micro-batch, delete events, epoch-marker idempotency,
restart without reprocessing, and the crash-mid-append retry drill that
motivates the pre-completion step in both the stream applier and
upsert_files (a tombstone only covers files appended BEFORE its record —
finishing a failed attempt's splits after the retry's tombstone would
resurrect the old version next to the new one)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from d6tstack_spark.plans.checkpoint import decode_state, encode_resume
from d6tstack_spark.streaming.upsert_stream import (
    apply_upsert_batch,
    start_upsert_stream,
)

_SCHEMA = (
    "conv_id string, turn_idx int, text string"
)


def _rows(prefix, n_conv=3, turns=4, text="v1"):
    return [
        (f"{prefix}{c:03d}", t, f"{text} {prefix}{c}:{t}")
        for c in range(n_conv)
        for t in range(turns)
    ]


def _write_batchfile(path, rows, delete_flags=None):
    cols = list(zip(*rows))
    data = {
        "conv_id": pa.array(cols[0]),
        "turn_idx": pa.array(cols[1], pa.int32()),
        "text": pa.array(cols[2]),
    }
    if delete_flags is not None:
        data["is_delete"] = pa.array(delete_flags, pa.bool_())
    pq.write_table(pa.table(data), path)


def test_stream_merges_arriving_files(spark, tmp_path):
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    sd = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _write_batchfile(f"{inp}/b0.parquet", _rows("a"))
    q = start_upsert_stream(
        spark, inp, sd, ckpt,
        schema=_SCHEMA, key_cols=("conv_id",),
    )
    try:
        q.processAllAvailable()
        assert decode_state(spark, sd).count() == 12
        # second file re-delivers conv a000 with v2 + a new conv
        _write_batchfile(
            f"{inp}/b1.parquet",
            [r for r in _rows("a", text="v2") if r[0] == "a000"]
            + _rows("z", n_conv=1, text="v1"),
        )
        q.processAllAvailable()
        dec = decode_state(spark, sd)
        assert dec.count() == 16
        assert dec.filter("conv_id = 'a000' AND text LIKE 'v2%'").count() == 4
        assert dec.filter("conv_id = 'a000'").count() == 4
        assert dec.filter("conv_id = 'z000'").count() == 4
    finally:
        q.stop()


def test_stream_delete_events_and_restart(spark, tmp_path):
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    sd = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def _start():
        return start_upsert_stream(
            spark, inp, sd, ckpt,
            schema=_SCHEMA + ", is_delete boolean",
            key_cols=("conv_id",), delete_col="is_delete",
        )

    _write_batchfile(
        f"{inp}/b0.parquet", _rows("a"), delete_flags=[False] * 12
    )
    q = _start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n0 = decode_state(spark, sd).count()
    assert n0 == 12
    # restart the stream: delete one conv, replace another
    rows = [("a000", 0, "x"), ("a001", 0, "v2 only-turn")]
    _write_batchfile(
        f"{inp}/b1.parquet", rows, delete_flags=[True, False]
    )
    q = _start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    dec = decode_state(spark, sd)
    assert dec.filter("conv_id = 'a000'").count() == 0
    assert dec.filter("conv_id = 'a001'").count() == 1  # whole-key replace
    assert dec.count() == 4 + 1  # a002 intact + a001 single turn


def test_epoch_marker_skips_replay(spark, tmp_path):
    sd = str(tmp_path / "state")
    ckpt = "ckpt-x"
    batch = spark.createDataFrame(_rows("a"), _SCHEMA)
    rep = apply_upsert_batch(
        spark, sd, batch, 0, ckpt,
        key_cols=("conv_id",), order_cols=("conv_id", "turn_idx"),
    )
    assert not rep["skipped"]
    n = decode_state(spark, sd).count()
    rep2 = apply_upsert_batch(
        spark, sd, batch, 0, ckpt,
        key_cols=("conv_id",), order_cols=("conv_id", "turn_idx"),
    )
    assert rep2["skipped"]
    assert decode_state(spark, sd).count() == n


def test_unmarked_replay_is_content_idempotent(spark, tmp_path):
    """Epoch re-runs whose marker write never landed (crash between
    apply and marker) must converge to the same content."""
    sd = str(tmp_path / "state")
    base = spark.createDataFrame(_rows("a"), _SCHEMA)
    apply_upsert_batch(
        spark, sd, base, 0, "ck",
        key_cols=("conv_id",), order_cols=("conv_id", "turn_idx"),
    )
    batch = spark.createDataFrame(_rows("a", n_conv=1, text="v2"), _SCHEMA)
    for attempt in range(2):
        # same epoch id, marker wiped = the retry path
        os.remove(os.path.join(sd, "upsert_epochs.json"))
        apply_upsert_batch(
            spark, sd, batch, 1, "ck",
            key_cols=("conv_id",), order_cols=("conv_id", "turn_idx"),
        )
    dec = decode_state(spark, sd)
    assert dec.filter("conv_id = 'a000'").count() == 4
    assert dec.filter("conv_id = 'a000' AND text LIKE 'v2%'").count() == 4
    assert dec.count() == 12


def test_purge_every_folds_tombstones(spark, tmp_path):
    from d6tstack_spark.plans.checkpoint import load_deletes

    sd = str(tmp_path / "state")
    base = spark.createDataFrame(_rows("a"), _SCHEMA)
    apply_upsert_batch(
        spark, sd, base, 0, "ck",
        key_cols=("conv_id",), order_cols=("conv_id", "turn_idx"),
    )
    batch = spark.createDataFrame(_rows("a", n_conv=1, text="v2"), _SCHEMA)
    rep = apply_upsert_batch(
        spark, sd, batch, 1, "ck",
        key_cols=("conv_id",), order_cols=("conv_id", "turn_idx"),
        purge_every=1,
    )
    assert rep["purged"]["files_rewritten"] >= 1
    assert load_deletes(sd) == []  # folded, not pending
    dec = decode_state(spark, sd)
    assert dec.filter("conv_id = 'a000' AND text LIKE 'v2%'").count() == 4
    assert dec.count() == 12


def test_crash_mid_append_retry_does_not_duplicate(spark, tmp_path):
    """The drill behind the pre-completion step: attempt 1 recorded its
    staged file but crashed before encoding any split (files.json is
    written at resume start). The retry must NOT let those splits
    complete after its tombstone — that would resurrect v2 next to v2'.
    Simulated by registering a staged path directly, then retrying."""
    from d6tstack_spark.plans.checkpoint import _assign_file_indices
    from d6tstack_spark.plans.maintenance import upsert_files

    srcs = str(tmp_path / "src")
    os.makedirs(srcs)
    _write_batchfile(f"{srcs}/base.parquet", _rows("a"))
    sd = str(tmp_path / "state")
    encode_resume(
        spark, [f"{srcs}/base.parquet"], sd,
        order_cols=("conv_id", "turn_idx"),
    )
    # attempt 1: staged + recorded, zero splits encoded (crashed)
    _write_batchfile(
        f"{srcs}/staged1.parquet",
        [r for r in _rows("a", text="v2") if r[0] == "a000"],
    )
    _assign_file_indices(
        sd, [f"{srcs}/base.parquet", f"{srcs}/staged1.parquet"]
    )
    # attempt 2 (the retry): same rows under a new path
    _write_batchfile(
        f"{srcs}/staged2.parquet",
        [r for r in _rows("a", text="v2") if r[0] == "a000"],
    )
    upsert_files(
        spark, sd, [f"{srcs}/staged2.parquet"],
        key_cols=("conv_id",), order_cols=("conv_id", "turn_idx"),
    )
    dec = decode_state(spark, sd)
    assert dec.filter("conv_id = 'a000'").count() == 4  # not 8
    assert dec.filter("conv_id = 'a000' AND text LIKE 'v2%'").count() == 4
    assert dec.count() == 12
