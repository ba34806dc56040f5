"""State-dir snapshots + time travel: every writer commit records the
visible blocks-file set in snapshots.jsonl (appends add files; physical
rewrites — purge/cluster/compaction — are barriers that reset history,
Iceberg's expire-snapshots semantics applied eagerly). decode_state(
snapshot=N) pins that file set and still rides the shuffle-free bulk
path. The per-file complete-block invariant is what makes a bare file
list a fully consistent table version."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import d6tstack_spark.plans.maintenance as maintenance
from d6tstack_spark.plans.checkpoint import (
    decode_state,
    delete_where,
    encode_resume,
    load_snapshots,
    resolve_snapshot,
)
from d6tstack_spark.plans.maintenance import cluster_blocks, purge_deletes
from d6tstack_spark.plans.metrics import state_info


def _write(tmp_path, name, prefix, n=900):
    tbl = pa.table(
        {
            "conv_id": pa.array([f"{prefix}{j // 6:04d}" for j in range(n)]),
            "turn_idx": pa.array([j % 6 for j in range(n)], pa.int32()),
            "text": pa.array([f"msg {prefix}{j}" for j in range(n)]),
        }
    )
    p = str(tmp_path / name)
    pq.write_table(tbl, p, row_group_size=300)
    return p


def _key(df):
    return sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in df.select("conv_id", "turn_idx", "text").collect()
    )


@pytest.fixture()
def two_appends(spark, tmp_path):
    p1 = _write(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    s1 = encode_resume(spark, [p1], sd, checkpoint_every=0)
    p2 = _write(tmp_path, "b.parquet", "b")
    s2 = encode_resume(spark, [p1, p2], sd, checkpoint_every=0)
    return sd, p1, p2, s1, s2


def test_appends_record_and_time_travel(spark, two_appends):
    sd, p1, p2, s1, s2 = two_appends
    recs = load_snapshots(sd)
    assert [r["id"] for r in recs] == [1, 2]
    assert all(r["op"] == "append" for r in recs)
    assert s1["snapshot"] == 1 and s2["snapshot"] == 2
    old = decode_state(spark, sd, snapshot=1)
    assert _key(old) == _key(spark.read.parquet(p1))
    assert _key(decode_state(spark, sd, snapshot=2)) == _key(
        decode_state(spark, sd)
    )
    # snapshot + where/columns compose; still exact
    sl = decode_state(
        spark, sd, snapshot=1, where="turn_idx < 2", columns=["conv_id"]
    )
    assert sl.columns == ["conv_id"]
    assert sl.count() == spark.read.parquet(p1).filter("turn_idx < 2").count()


def test_unknown_and_missing_log(spark, two_appends, tmp_path):
    sd, *_ = two_appends
    with pytest.raises(ValueError, match="unknown snapshot"):
        decode_state(spark, sd, snapshot=99)
    os.unlink(os.path.join(sd, "snapshots.jsonl"))
    with pytest.raises(ValueError, match="no snapshot log"):
        decode_state(spark, sd, snapshot=1)


def test_rewrite_retires_and_history_stays_readable(spark, two_appends):
    """Retention contract (round 5): a rewrite RETIRES the files it
    replaces, so snapshots before it stay readable — with the delete
    snapshot-scoped (the tombstone applies from its delete record on)."""
    sd, p1, p2, *_ = two_appends
    a = spark.read.parquet(p1)
    ab = a.unionByName(spark.read.parquet(p2))
    delete_where(spark, sd, "conv_id like 'a00%'", count_matches=False)
    # pending tombstone: snapshot 1 predates it → full first-append view
    assert _key(decode_state(spark, sd, snapshot=1)) == _key(a)
    purge_deletes(spark, sd)
    recs = load_snapshots(sd)
    # append, append, delete, rewrite
    assert recs[-1]["op"] == "rewrite" and recs[-1]["id"] == 4
    for old in (1, 2, 3):
        assert resolve_snapshot(sd, old)  # readable across the rewrite
    assert _key(decode_state(spark, sd, snapshot=2)) == _key(ab)
    post = decode_state(spark, sd, snapshot=4)
    assert _key(post) == _key(decode_state(spark, sd))
    info = state_info(spark, sd)
    assert info["snapshots"] == {"n": 4, "latest": 4, "earliest_readable": 1}


def test_cluster_and_append_after_barrier(spark, two_appends, tmp_path):
    sd, p1, p2, *_ = two_appends
    cluster_blocks(spark, sd, cluster_by=("conv_id", "turn_idx"))
    assert load_snapshots(sd)[-1]["op"] == "rewrite"
    full = _key(decode_state(spark, sd))
    assert _key(decode_state(spark, sd, snapshot=3)) == full
    p3 = _write(tmp_path, "c.parquet", "c", n=60)
    s = encode_resume(spark, [p1, p2, p3], sd, checkpoint_every=0)
    assert s["snapshot"] == 4
    assert _key(decode_state(spark, sd, snapshot=3)) == full  # pre-append
    assert len(_key(decode_state(spark, sd, snapshot=4))) == len(full) + 60


def test_crashed_rewrite_records_on_replay(spark, two_appends, monkeypatch):
    sd, *_ = two_appends
    delete_where(spark, sd, "conv_id like 'b00%'", count_matches=False)
    monkeypatch.setattr(maintenance, "_TEST_CRASH_AFTER_ADOPTS", 0)
    with pytest.raises(RuntimeError, match="crash drill"):
        purge_deletes(spark, sd)
    monkeypatch.setattr(maintenance, "_TEST_CRASH_AFTER_ADOPTS", None)
    purge_deletes(spark, sd)  # replays the journal → records the barrier
    recs = load_snapshots(sd)
    assert recs[-1]["op"] == "rewrite"
    assert _key(decode_state(spark, sd, snapshot=recs[-1]["id"])) == _key(
        decode_state(spark, sd)
    )


def test_sweep_heals_missing_append_record(spark, two_appends):
    sd, *_ = two_appends
    sp = os.path.join(sd, "snapshots.jsonl")
    lines = open(sp).read().splitlines(keepends=True)
    with open(sp, "w") as f:  # drop the last append record = the crash
        f.writelines(lines[:-1])  # window between publish and record
    full = _key(decode_state(spark, sd))
    # any writer entry sweeps; an already-complete resume is the cheapest
    import json as _json

    from d6tstack_spark.plans.checkpoint import _files_path

    paths = list(_json.load(open(_files_path(sd))).keys())
    s = encode_resume(spark, paths, sd, checkpoint_every=0)
    assert s["already_complete"] and s["snapshot"] == 2
    assert _key(decode_state(spark, sd, snapshot=2)) == full


def test_snapshot_of_pre_evolution_state(spark, two_appends, tmp_path):
    sd, p1, p2, *_ = two_appends
    p3 = str(tmp_path / "evo.parquet")
    pq.write_table(
        pa.table(
            {
                "conv_id": pa.array(["z0001"]),
                "turn_idx": pa.array([0], pa.int32()),
                "text": pa.array(["zz"]),
                "score": pa.array([1.5], pa.float64()),
            }
        ),
        p3,
    )
    encode_resume(spark, [p1, p2, p3], sd, checkpoint_every=0)
    old = decode_state(spark, sd, snapshot=2)
    # current schema, historical rows: the evolved column reads all-null
    assert "score" in old.columns
    rows = old.collect()
    assert rows and all(r.score is None for r in rows)


def test_incremental_diff(spark, two_appends, tmp_path):
    from d6tstack_spark.plans.checkpoint import decode_state_diff

    sd, p1, p2, *_ = two_appends
    d = decode_state_diff(spark, sd, since=1)
    assert _key(d) == _key(spark.read.parquet(p2))
    assert decode_state_diff(spark, sd, since=2).count() == 0
    assert _key(decode_state_diff(spark, sd, since=0, until=1)) == _key(
        spark.read.parquet(p1)
    )
    sl = decode_state_diff(
        spark, sd, since=1, where="turn_idx = 0", columns=["conv_id"]
    )
    assert sl.columns == ["conv_id"]
    assert sl.count() == (
        spark.read.parquet(p2).filter("turn_idx = 0").count()
    )


def test_incremental_diff_rewrite_window_refused(spark, two_appends, tmp_path):
    from d6tstack_spark.plans.checkpoint import decode_state_diff

    sd, p1, p2, *_ = two_appends
    delete_where(spark, sd, "conv_id like 'a00%'", count_matches=False)
    with pytest.raises(ValueError, match="pending delete tombstones"):
        decode_state_diff(spark, sd, since=1)
    purge_deletes(spark, sd)  # delete record = 3, rewrite barrier = 4
    with pytest.raises(ValueError, match="rewrite"):
        decode_state_diff(spark, sd, since=1)
    # a fresh append AFTER the barrier is consumable incrementally
    p3 = _write(tmp_path, "c.parquet", "c", n=120)
    encode_resume(spark, [p1, p2, p3], sd, checkpoint_every=0)
    d = decode_state_diff(spark, sd, since=4)
    assert _key(d) == _key(spark.read.parquet(p3))


def test_compaction_records_rewrite_barrier(spark, tmp_path):
    from d6tstack_spark.plans.maintenance import compact_blocks

    p1 = _write(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state_c")
    # one commit per split → many small files → compactable
    encode_resume(spark, [p1], sd, checkpoint_every=1)
    full = _key(decode_state(spark, sd))
    rep = compact_blocks(
        spark, os.path.join(sd, "blocks"), target_file_bytes=1 << 30
    )
    assert rep["compacted"]
    recs = load_snapshots(sd)
    assert recs[-1]["op"] == "rewrite"
    assert _key(decode_state(spark, sd, snapshot=recs[-1]["id"])) == full
    # retention: the pre-compaction snapshot reads from retired files and
    # holds exactly the same rows (compaction only re-groups)
    first = decode_state(spark, sd, snapshot=recs[0]["id"])
    assert _key(first) == full


def test_every_snapshot_is_its_prefix(spark, tmp_path):
    """Five appends; snapshot k must decode to exactly the first k files'
    union, and the (k-1, k] diff to exactly file k — the full consistency
    matrix, not just endpoints."""
    from d6tstack_spark.plans.checkpoint import decode_state_diff

    sd = str(tmp_path / "state_m")
    paths, keys = [], []
    for k in range(5):
        paths.append(_write(tmp_path, f"f{k}.parquet", f"p{k}_", n=180))
        keys.append(_key(spark.read.parquet(paths[-1])))
        s = encode_resume(spark, paths, sd, checkpoint_every=0)
        assert s["snapshot"] == k + 1
    for k in range(5):
        want = sorted(t for ks in keys[: k + 1] for t in ks)
        assert _key(decode_state(spark, sd, snapshot=k + 1)) == want
        assert _key(decode_state_diff(spark, sd, since=k, until=k + 1)) == (
            keys[k]
        )


def test_sweep_records_rewrite_when_known_files_vanish(spark, two_appends):
    """Crash window: a rewrite's file swap completed (journal already
    gone) but its snapshot record was never written. The sweep must see
    the disappeared known files and record a REWRITE barrier — an
    'append' of the replacement files would leave vanished files in the
    known set and fail every later resolve_snapshot existence check."""
    import json as _json

    from d6tstack_spark.plans.checkpoint import _files_path

    sd, *_ = two_appends
    delete_where(spark, sd, "conv_id like 'b00%'", count_matches=False)
    purge_deletes(spark, sd)
    full = _key(decode_state(spark, sd))
    sp = os.path.join(sd, "snapshots.jsonl")
    lines = open(sp).read().splitlines(keepends=True)
    assert _json.loads(lines[-1])["op"] == "rewrite"
    with open(sp, "w") as f:  # crash before the rewrite's own record
        f.writelines(lines[:-1])
    paths = list(_json.load(open(_files_path(sd))).keys())
    s = encode_resume(spark, paths, sd, checkpoint_every=0)
    assert s["already_complete"]
    recs = load_snapshots(sd)
    assert recs[-1]["op"] == "rewrite"
    assert resolve_snapshot(sd, recs[-1]["id"])  # existence check passes
    assert _key(decode_state(spark, sd, snapshot=recs[-1]["id"])) == full
