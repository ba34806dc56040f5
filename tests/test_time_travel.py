"""Snapshot-scoped tombstones + snapshot retention + changelog diffs.

Round-5 feature set (the Iceberg retention model over encoded state
dirs): physical rewrites RETIRE replaced files instead of deleting them,
so time travel crosses purge/cluster/compaction; delete_where/delete_keys
record delete snapshots so a time-travel read applies exactly the
tombstones visible at the target snapshot; decode_state_diff(
changelog=True) returns net insert/delete row changes across rewrites;
expire_snapshots reclaims retired storage with a watermark.

Reference analog: d6tstack's idempotent convert loop (convert_xls.py:
238-245) is file-granular versioning; this extends the contract to exact
row-level table versions."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from d6tstack_spark.plans.checkpoint import (
    decode_state,
    decode_state_diff,
    delete_keys,
    delete_where,
    encode_resume,
    load_deletes,
    load_snapshots,
    resolve_snapshot,
)
from d6tstack_spark.plans.maintenance import (
    cluster_blocks,
    compact_blocks,
    expire_snapshots,
    purge_deletes,
)


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
def lifecycle(spark, tmp_path):
    """append a → append b → delete b00% → purge → append c.
    Snapshot ids: 1=append a, 2=append b, 3=delete, 4=rewrite(purge),
    5=append c."""
    p1 = _write(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [p1], sd, checkpoint_every=0)
    p2 = _write(tmp_path, "b.parquet", "b")
    encode_resume(spark, [p1, p2], sd, checkpoint_every=0)
    delete_where(spark, sd, "conv_id LIKE 'b00%'", count_matches=False)
    purge_deletes(spark, sd)
    p3 = _write(tmp_path, "c.parquet", "c", n=300)
    encode_resume(spark, [p1, p2, p3], sd, checkpoint_every=0)
    return sd, p1, p2, p3


def test_snapshot_log_ids(spark, lifecycle):
    sd, *_ = lifecycle
    recs = load_snapshots(sd)
    assert [r["op"] for r in recs] == [
        "append", "append", "delete", "rewrite", "append",
    ]
    assert recs[2]["tombstones"][0]["where"] == "conv_id LIKE 'b00%'"
    assert recs[3]["tombstones"] == [recs[2]["tombstones"][0]["id"]]


def test_snapshot_read_with_pending_tombstone(spark, tmp_path):
    """Time travel while a tombstone PENDS applies exactly the deletes
    visible at the target snapshot — no refusal."""
    p1 = _write(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [p1], sd, checkpoint_every=0)
    delete_where(spark, sd, "conv_id LIKE 'a000%'", count_matches=False)
    assert load_deletes(sd)  # still pending
    src = spark.read.parquet(p1)
    # snapshot 1 = before the delete: full table
    assert _key(decode_state(spark, sd, snapshot=1)) == _key(src)
    # snapshot 2 = the delete record: tombstone applies
    assert _key(decode_state(spark, sd, snapshot=2)) == _key(
        src.filter("conv_id NOT LIKE 'a000%'")
    )
    # live read agrees with the latest snapshot
    assert _key(decode_state(spark, sd)) == _key(
        decode_state(spark, sd, snapshot=2)
    )


def test_snapshot_read_with_pending_keys_tombstone(spark, tmp_path):
    p1 = _write(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [p1], sd, checkpoint_every=0)
    keys = spark.createDataFrame(
        [("a0000",), ("a0003",)], "conv_id string"
    )
    delete_keys(spark, sd, keys, key_cols=("conv_id",))
    src = spark.read.parquet(p1)
    assert _key(decode_state(spark, sd, snapshot=1)) == _key(src)
    assert _key(decode_state(spark, sd, snapshot=2)) == _key(
        src.filter("conv_id NOT IN ('a0000', 'a0003')")
    )


def test_time_travel_across_purge(spark, lifecycle):
    """Retention: snapshots BEFORE the purge stay readable (replaced
    files are retired, not deleted), with the correct tombstone scope at
    each snapshot."""
    sd, p1, p2, p3 = lifecycle
    a = spark.read.parquet(p1)
    ab = a.unionByName(spark.read.parquet(p2))
    # snapshot 2: both appends, no delete yet
    assert _key(decode_state(spark, sd, snapshot=2)) == _key(ab)
    # snapshot 3: tombstone visible (logical delete, pre-purge files)
    assert _key(decode_state(spark, sd, snapshot=3)) == _key(
        ab.filter("conv_id NOT LIKE 'b00%'")
    )
    # snapshot 4: purge rewrote; same rows, physical
    assert _key(decode_state(spark, sd, snapshot=4)) == _key(
        ab.filter("conv_id NOT LIKE 'b00%'")
    )
    # snapshot 1: just the first append
    assert _key(decode_state(spark, sd, snapshot=1)) == _key(a)
    # retired dir holds the replaced files
    assert os.listdir(os.path.join(sd, "retired", "blocks"))


def test_time_travel_across_cluster_and_compact(spark, lifecycle):
    sd, p1, p2, p3 = lifecycle
    want2 = _key(decode_state(spark, sd, snapshot=2))
    want5 = _key(decode_state(spark, sd))
    cluster_blocks(spark, sd, cluster_by=("text",))
    assert _key(decode_state(spark, sd, snapshot=2)) == want2
    assert _key(decode_state(spark, sd)) == want5
    compact_blocks(spark, os.path.join(sd, "blocks"), target_file_bytes=1 << 30)
    assert _key(decode_state(spark, sd, snapshot=2)) == want2
    assert _key(decode_state(spark, sd)) == want5


def test_snapshot_projection_and_where_with_scoped_tombstones(
    spark, lifecycle
):
    sd, p1, p2, _ = lifecycle
    ab = spark.read.parquet(p1).unionByName(spark.read.parquet(p2))
    got = decode_state(
        spark, sd, snapshot=3, columns=["text"], where="turn_idx = 0"
    )
    assert got.columns == ["text"]
    assert got.count() == ab.filter(
        "turn_idx = 0 AND conv_id NOT LIKE 'b00%'"
    ).count()


def test_changelog_diff_across_purge(spark, lifecycle):
    """The VERDICT ask: a window spanning a purge returns exactly the
    appended-minus-deleted rows, as net insert/delete changes."""
    sd, p1, p2, p3 = lifecycle
    ab = spark.read.parquet(p1).unionByName(spark.read.parquet(p2))
    # window (2, 5]: delete of b00% rows + append of c rows
    diff = decode_state_diff(spark, sd, since=2, until=5, changelog=True)
    ins = diff.filter("_change = 'insert'").drop("_change")
    dels = diff.filter("_change = 'delete'").drop("_change")
    assert _key(ins) == _key(spark.read.parquet(p3))
    assert _key(dels) == _key(ab.filter("conv_id LIKE 'b00%'"))
    # window (4, 5]: pure append after the purge
    d2 = decode_state_diff(spark, sd, since=4, until=5, changelog=True)
    assert d2.filter("_change = 'delete'").count() == 0
    assert _key(d2.filter("_change = 'insert'").drop("_change")) == _key(
        spark.read.parquet(p3)
    )
    # window (3, 4]: the physical purge itself is a NET no-op (the rows
    # were already logically deleted at snapshot 3)
    d3 = decode_state_diff(spark, sd, since=3, until=4, changelog=True)
    assert d3.count() == 0
    # window (2, 3]: the logical delete
    d4 = decode_state_diff(spark, sd, since=2, until=3, changelog=True)
    assert d4.filter("_change = 'insert'").count() == 0
    assert _key(d4.filter("_change = 'delete'").drop("_change")) == _key(
        ab.filter("conv_id LIKE 'b00%'")
    )


def test_changelog_diff_with_pending_keys(spark, tmp_path):
    p1 = _write(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [p1], sd, checkpoint_every=0)
    keys = spark.createDataFrame([("a0001",)], "conv_id string")
    delete_keys(spark, sd, keys, key_cols=("conv_id",))
    src = spark.read.parquet(p1)
    d = decode_state_diff(spark, sd, since=1, until=2, changelog=True)
    assert d.filter("_change = 'insert'").count() == 0
    assert _key(d.filter("_change = 'delete'").drop("_change")) == _key(
        src.filter("conv_id = 'a0001'")
    )


def test_changelog_columns_and_where(spark, lifecycle):
    sd, *_ = lifecycle
    d = decode_state_diff(
        spark, sd, since=2, until=5, changelog=True,
        columns=["conv_id"], where="turn_idx = 0",
    )
    assert d.columns == ["conv_id", "_change"]
    assert d.count() > 0


def test_non_changelog_still_refuses_rewrite_window(spark, lifecycle):
    sd, *_ = lifecycle
    with pytest.raises(ValueError, match="rewrite"):
        decode_state_diff(spark, sd, since=2, until=5)


def test_expire_snapshots_reclaims_and_refuses(spark, lifecycle):
    sd, p1, p2, p3 = lifecycle
    want4 = _key(decode_state(spark, sd, snapshot=4))
    retired = os.path.join(sd, "retired", "blocks")
    n_retired_before = len(
        [b for b in os.listdir(retired)
         if b.endswith(".parquet") and not b.startswith(".")]
    )
    assert n_retired_before > 0
    rep = expire_snapshots(spark, sd, keep_from=4)
    assert rep["expired_before"] == 4
    assert rep["retired_files_removed"] == n_retired_before
    # kept snapshots still read (incl. across the later append)
    assert _key(decode_state(spark, sd, snapshot=4)) == want4
    # expired snapshots refuse with a clear error
    with pytest.raises(ValueError, match="expired"):
        decode_state(spark, sd, snapshot=2)
    with pytest.raises(ValueError, match="expired"):
        resolve_snapshot(sd, 1)


def test_expire_keeps_retired_files_a_kept_snapshot_needs(
    spark, tmp_path
):
    """Retired files referenced by a KEPT snapshot survive expiry: after
    append→purge→append→purge, keeping from the middle needs the first
    purge's outputs even if the second purge retired them."""
    p1 = _write(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [p1], sd, checkpoint_every=0)
    delete_where(spark, sd, "conv_id LIKE 'a000%'", count_matches=False)
    purge_deletes(spark, sd)  # snapshot 3 (rewrite)
    delete_where(spark, sd, "conv_id LIKE 'a001%'", count_matches=False)
    purge_deletes(spark, sd)  # snapshot 5 (rewrite)
    src = spark.read.parquet(p1)
    want3 = _key(src.filter("conv_id NOT LIKE 'a000%'"))
    assert _key(decode_state(spark, sd, snapshot=3)) == want3
    rep = expire_snapshots(spark, sd, keep_from=3)
    assert rep["retired_files_kept"] > 0
    # snapshot 3 still resolves from retained retired files
    assert _key(decode_state(spark, sd, snapshot=3)) == want3
    want5 = _key(
        src.filter(
            "conv_id NOT LIKE 'a000%' AND conv_id NOT LIKE 'a001%'"
        )
    )
    assert _key(decode_state(spark, sd)) == want5


def test_retired_keyset_supports_old_snapshot_after_purge(spark, tmp_path):
    """A purge retires the key-set parquet of the keys tombstone it
    applied; a pre-purge snapshot still anti-joins against it."""
    p1 = _write(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [p1], sd, checkpoint_every=0)
    keys = spark.createDataFrame([("a0002",)], "conv_id string")
    delete_keys(spark, sd, keys, key_cols=("conv_id",))
    purge_deletes(spark, sd, order_cols=("conv_id", "turn_idx"))
    src = spark.read.parquet(p1)
    # snapshot 2 = keys delete pending (pre-purge): logical view
    assert _key(decode_state(spark, sd, snapshot=2)) == _key(
        src.filter("conv_id <> 'a0002'")
    )
    # snapshot 1 = before the delete
    assert _key(decode_state(spark, sd, snapshot=1)) == _key(src)


def test_append_while_tombstone_pends_is_sequence_scoped(spark, tmp_path):
    """Iceberg sequence semantics on the state dir (round 5): appends are
    LEGAL while scoped tombstones pend, and a delete never touches rows
    appended after it — even when they match the predicate. The purge
    honors the same scope (appended matching rows survive the physical
    rewrite)."""
    p1 = _write(tmp_path, "a.parquet", "a")          # snapshots: 1
    sd = str(tmp_path / "state")
    encode_resume(spark, [p1], sd, checkpoint_every=0)
    rep = delete_where(spark, sd, "turn_idx = 0")    # 2 (matches EVERY conv)
    a = spark.read.parquet(p1)
    assert rep["matched"] == a.filter("turn_idx = 0").count()
    p2 = _write(tmp_path, "b.parquet", "b")          # 3
    s3 = encode_resume(spark, [p1, p2], sd, checkpoint_every=0)
    assert s3["encoded"] > 0                          # refusal lifted
    b = spark.read.parquet(p2)
    want_live = _key(a.filter("turn_idx <> 0").unionByName(b))
    assert _key(decode_state(spark, sd)) == want_live
    # a second identical delete now matches exactly the appended turn-0
    # rows (the first tombstone's scope excludes them; the count must too)
    rep2 = delete_where(spark, sd, "turn_idx = 0", count_matches=True)
    assert rep2["matched"] == b.filter("turn_idx = 0").count()
    # live view now: both deletes applied, each to its own generation
    want2 = _key(
        a.filter("turn_idx <> 0").unionByName(b.filter("turn_idx <> 0"))
    )
    assert _key(decode_state(spark, sd)) == want2
    # snapshot reads reconstruct each generation exactly
    assert _key(decode_state(spark, sd, snapshot=2)) == _key(
        a.filter("turn_idx <> 0")
    )
    assert _key(decode_state(spark, sd, snapshot=3)) == want_live
    # physical purge applies the same scopes
    prep = purge_deletes(spark, sd)
    assert prep["matched"] == a.filter("turn_idx = 0").count() + b.filter(
        "turn_idx = 0"
    ).count()
    assert _key(decode_state(spark, sd)) == want2
    assert load_deletes(sd) == []


def test_keys_delete_then_reinsert_survives(spark, tmp_path):
    """Equality-delete + re-insert (the upsert hazard): keys deleted from
    generation 1 stay deleted, while the SAME keys re-appended later
    survive both the merge-on-read view and the physical purge — the
    state-dir mirror of Iceberg's seq-scoped equality deletes the engine
    already honors on the read side (sources/table_io.py)."""
    p1 = _write(tmp_path, "a.parquet", "x")
    sd = str(tmp_path / "state")
    encode_resume(spark, [p1], sd, checkpoint_every=0)
    keys = spark.createDataFrame([("x0001",)], "conv_id string")
    delete_keys(spark, sd, keys, key_cols=("conv_id",))
    # re-deliver the same conversation under a new path
    p2 = _write(tmp_path, "b.parquet", "x", n=6)  # x0000 only
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "conv_id": pa.array(["x0001"] * 3),
            "turn_idx": pa.array([0, 1, 2], pa.int32()),
            "text": pa.array(["new 0", "new 1", "new 2"]),
        }
    )
    p3 = str(tmp_path / "c.parquet")
    pq.write_table(tbl, p3)
    encode_resume(spark, [p1, p3], sd, checkpoint_every=0)
    got = decode_state(spark, sd).filter("conv_id = 'x0001'")
    assert sorted(r.text for r in got.collect()) == ["new 0", "new 1", "new 2"]
    purge_deletes(spark, sd, order_cols=("conv_id", "turn_idx"))
    got2 = decode_state(spark, sd).filter("conv_id = 'x0001'")
    assert sorted(r.text for r in got2.collect()) == [
        "new 0", "new 1", "new 2",
    ]
