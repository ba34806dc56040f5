"""rollback_to_snapshot: restore the live table to a past snapshot's
state (Iceberg rollback) — file moves ride the purge commit journal,
tombstones visible at the target are re-added with their original
sequence scope, and history is append-only (roll forward = another
rollback)."""

from __future__ import annotations


import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from d6tstack_spark.plans.checkpoint import (
    decode_state,
    delete_keys,
    delete_where,
    encode_resume,
    load_deletes,
    load_snapshots,
)
from d6tstack_spark.plans.maintenance import (
    expire_snapshots,
    purge_deletes,
    rollback_to_snapshot,
)

ORDER = ("conv_id", "turn_idx")


def _mk(tmp_path, name, pref, n=1200):
    tbl = pa.table(
        {
            "conv_id": pa.array([f"{pref}{j // 6:04d}" for j in range(n)]),
            "turn_idx": pa.array([j % 6 for j in range(n)], pa.int32()),
            "text": pa.array([f"msg {pref}{j}" for j in range(n)]),
        }
    )
    p = str(tmp_path / name)
    pq.write_table(tbl, p, row_group_size=400)
    return p


def _rows(df):
    return sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in df.select("conv_id", "turn_idx", "text").collect()
    )


@pytest.fixture()
def hist(spark, tmp_path):
    """append a → delete (pending) → purge → append b, snapshot per step."""
    a = _mk(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [a], sd, order_cols=ORDER)
    s1 = load_snapshots(sd)[-1]["id"]
    delete_where(spark, sd, "turn_idx = 0")
    s2 = load_snapshots(sd)[-1]["id"]
    purge_deletes(spark, sd, order_cols=ORDER)
    s3 = load_snapshots(sd)[-1]["id"]
    b = _mk(tmp_path, "b.parquet", "b")
    encode_resume(spark, [a, b], sd, order_cols=ORDER)
    s4 = load_snapshots(sd)[-1]["id"]
    src_a = spark.read.parquet(a)
    src_ab = spark.read.parquet(a, b)
    return sd, (s1, s2, s3, s4), src_a, src_ab


def test_rollback_restores_files_and_readds_tombstone(spark, hist):
    sd, (s1, s2, s3, s4), src_a, src_ab = hist
    rep = rollback_to_snapshot(spark, sd, s2)
    assert rep["files_restored"] > 0 and rep["files_retired"] > 0
    assert rep["tombstones_readded"] == 1
    # live state == the target snapshot's state: pre-purge files with the
    # tombstone applied as merge-on-read
    want = _rows(src_a.filter("turn_idx <> 0"))
    assert _rows(decode_state(spark, sd)) == want
    assert _rows(decode_state(spark, sd, snapshot=s2)) == want
    # the re-added tombstone purges cleanly again
    purge_deletes(spark, sd, order_cols=ORDER)
    assert _rows(decode_state(spark, sd)) == want
    assert load_deletes(sd) == []


def test_rollback_preserves_history_and_rolls_forward(spark, hist):
    sd, (s1, s2, s3, s4), src_a, src_ab = hist
    rollback_to_snapshot(spark, sd, s1)
    assert _rows(decode_state(spark, sd)) == _rows(src_a)
    # history is append-only: every earlier snapshot still readable
    assert decode_state(spark, sd, snapshot=s4).count() == src_ab.filter(
        "turn_idx <> 0 OR conv_id LIKE 'b%'"
    ).count()
    # roll FORWARD again — just another rollback
    rep = rollback_to_snapshot(spark, sd, s4)
    assert rep["files_restored"] > 0
    want = _rows(src_ab.filter("turn_idx <> 0 OR conv_id LIKE 'b%'"))
    assert _rows(decode_state(spark, sd)) == want


def test_rollback_readds_keys_tombstone_with_original_scope(
    spark, tmp_path
):
    a = _mk(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [a], sd, order_cols=ORDER)
    delete_keys(
        spark, sd, spark.createDataFrame([("a0001",)], "conv_id string")
    )
    s_del = load_snapshots(sd)[-1]["id"]
    purge_deletes(spark, sd, order_cols=ORDER)
    # a later append exercises the retire leg of the rollback
    late = _mk(tmp_path, "late.parquet", "z", n=6)
    encode_resume(spark, [a, late], sd, order_cols=ORDER)
    rep = rollback_to_snapshot(spark, sd, s_del)
    assert rep["tombstones_readded"] == 1
    src_a = spark.read.parquet(a)
    want = _rows(src_a.filter("conv_id <> 'a0001'"))
    assert _rows(decode_state(spark, sd)) == want
    # the re-added key set purges again
    purge_deletes(spark, sd, order_cols=ORDER)
    assert _rows(decode_state(spark, sd)) == want


def test_rollback_drops_tombstones_recorded_after_target(spark, tmp_path):
    a = _mk(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [a], sd, order_cols=ORDER)
    s1 = load_snapshots(sd)[-1]["id"]
    delete_where(spark, sd, "turn_idx = 0")
    assert decode_state(spark, sd).count() == 1000
    rep = rollback_to_snapshot(spark, sd, s1)
    assert rep["tombstones_dropped"] == 1 and rep["tombstones_readded"] == 0
    assert load_deletes(sd) == []
    assert decode_state(spark, sd).count() == 1200  # delete undone


def test_rollback_crash_after_journal_rolls_forward(
    spark, tmp_path, monkeypatch
):
    """Crash between the journal write and the apply: decode refuses,
    any writer entry replays the journal forward, state lands exactly at
    the target."""
    import d6tstack_spark.plans.checkpoint as cp
    import d6tstack_spark.plans.maintenance as mt

    a = _mk(tmp_path, "a.parquet", "a")
    b = _mk(tmp_path, "b.parquet", "b")
    sd = str(tmp_path / "state")
    encode_resume(spark, [a], sd, order_cols=ORDER)
    s1 = load_snapshots(sd)[-1]["id"]
    encode_resume(spark, [a, b], sd, order_cols=ORDER)

    real = cp._replay_purge_journal
    calls = {"n": 0}

    def dying(spark_, sd_):
        calls["n"] += 1
        if calls["n"] == 2:  # the commit-time replay inside rollback
            raise RuntimeError("rollback crash drill: died at commit")
        return real(spark_, sd_)

    monkeypatch.setattr(cp, "_replay_purge_journal", dying)
    with pytest.raises(RuntimeError, match="crash drill"):
        rollback_to_snapshot(spark, sd, s1)
    monkeypatch.setattr(cp, "_replay_purge_journal", real)
    # journal pends → decode refuses
    with pytest.raises(RuntimeError, match="in-flight purge commit"):
        decode_state(spark, sd).count()
    # any writer entry point replays forward; delete_where is one
    delete_where(spark, sd, "turn_idx = 99", count_matches=False)
    src_a = spark.read.parquet(a)
    got = decode_state(spark, sd).filter("turn_idx <> 99")
    assert _rows(got) == _rows(src_a)


def test_rollback_past_expiry_refuses(spark, tmp_path):
    a = _mk(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [a], sd, order_cols=ORDER)
    s1 = load_snapshots(sd)[-1]["id"]
    delete_where(spark, sd, "turn_idx = 0")
    purge_deletes(spark, sd, order_cols=ORDER)
    s3 = load_snapshots(sd)[-1]["id"]
    expire_snapshots(spark, sd, keep_from=s3)
    with pytest.raises(ValueError, match="expired|expire"):
        rollback_to_snapshot(spark, sd, s1)


def test_rollback_noop_at_latest(spark, tmp_path):
    a = _mk(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [a], sd, order_cols=ORDER)
    s1 = load_snapshots(sd)[-1]["id"]
    rep = rollback_to_snapshot(spark, sd, s1)
    assert rep["files_restored"] == rep["files_retired"] == 0
    assert load_snapshots(sd)[-1]["id"] == s1  # no new records on a no-op


def test_vacuum_reclaims_only_orphans(spark, tmp_path):
    """vacuum_state removes unjournaled staging, stale _temporary, torn
    .tmp files and unreferenced key-set dirs — and nothing a reader or
    snapshot can still reach."""
    import os

    from d6tstack_spark.plans.maintenance import vacuum_state

    a = _mk(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [a], sd, order_cols=ORDER)
    delete_keys(
        spark, sd, spark.createDataFrame([("a0001",)], "conv_id string")
    )
    # plant orphans: unjournaled staging dir, _temporary, torn .tmp,
    # an unreferenced key-set dir
    os.makedirs(os.path.join(sd, "blocks.purge"))
    with open(os.path.join(sd, "blocks.purge", "junk.parquet"), "wb") as f:
        f.write(b"x" * 128)
    os.makedirs(os.path.join(sd, "blocks", "_temporary", "0"))
    with open(os.path.join(sd, "manifest.json.tmp"), "w") as f:
        f.write("{}")
    os.makedirs(os.path.join(sd, "delete_keys", "99"))
    with open(os.path.join(sd, "delete_keys", "99", "part.parquet"), "wb") as f:
        f.write(b"y" * 64)

    rep = vacuum_state(spark, sd)
    assert rep["staging_dirs_removed"] == 1
    assert rep["temporary_removed"] == 1
    assert rep["tmp_files_removed"] == 1
    assert rep["orphan_keysets_removed"] == 1
    assert rep["bytes_reclaimed"] > 0
    # the PENDING tombstone's key set survives, and the table still reads
    assert os.path.isdir(os.path.join(sd, "delete_keys", "1"))
    src = spark.read.parquet(a)
    want = _rows(src.filter("conv_id <> 'a0001'"))
    assert _rows(decode_state(spark, sd)) == want
    # second vacuum is a no-op
    rep2 = vacuum_state(spark, sd)
    assert rep2["bytes_reclaimed"] == 0


def test_clone_state_latest_and_historical(spark, tmp_path):
    """clone_state: an independent copy whose decode equals the source
    at the cloned snapshot, with sequence scoping preserved — a
    tombstone pending at the snapshot binds only to the files it bound
    to in the source (rows appended after the delete survive in the
    clone too), and purging the clone never touches the source."""
    from d6tstack_spark.plans.maintenance import clone_state

    a = _mk(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [a], sd, order_cols=ORDER)
    delete_where(spark, sd, "turn_idx = 0")  # pending, scoped to file a
    b = _mk(tmp_path, "b.parquet", "b")
    encode_resume(spark, [a, b], sd, order_cols=ORDER)
    s3 = load_snapshots(sd)[-1]["id"]
    src_a = spark.read.parquet(a)
    src_b = spark.read.parquet(b)
    # b's turn_idx=0 rows postdate the delete and must survive everywhere
    want = _rows(src_a.filter("turn_idx <> 0")) + _rows(src_b)
    want.sort()

    dst = str(tmp_path / "clone")
    rep = clone_state(spark, sd, dst, snapshot=s3)
    assert rep["files"] > 0 and rep["tombstones_pending"] == 1
    assert _rows(decode_state(spark, dst)) == want
    assert _rows(decode_state(spark, dst)) == _rows(
        decode_state(spark, sd, snapshot=s3)
    )
    # the clone purges independently; the source is untouched
    purge_deletes(spark, dst, order_cols=ORDER)
    assert _rows(decode_state(spark, dst)) == want
    assert load_deletes(dst) == []
    assert len(load_deletes(sd)) == 1
    assert _rows(decode_state(spark, sd)) == want

    # historical clone BEFORE the delete: full table, no tombstones
    dst1 = str(tmp_path / "clone1")
    rep1 = clone_state(spark, sd, dst1, snapshot=1)
    assert rep1["tombstones_pending"] == 0
    assert _rows(decode_state(spark, dst1)) == _rows(src_a)


def test_clone_state_across_purge_uses_retired(spark, tmp_path):
    from d6tstack_spark.plans.maintenance import clone_state

    a = _mk(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [a], sd, order_cols=ORDER)
    s1 = load_snapshots(sd)[-1]["id"]
    delete_where(spark, sd, "turn_idx = 0")
    purge_deletes(spark, sd, order_cols=ORDER)
    # snapshot 1 resolves through retired/ — the clone copies from there
    dst = str(tmp_path / "clone")
    clone_state(spark, sd, dst, snapshot=s1)
    src_a = spark.read.parquet(a)
    assert _rows(decode_state(spark, dst)) == _rows(src_a)


def test_clone_state_refuses_nonempty_dst(spark, tmp_path):
    from d6tstack_spark.plans.maintenance import clone_state

    a = _mk(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [a], sd, order_cols=ORDER)
    dst = str(tmp_path / "clone")
    clone_state(spark, sd, dst)
    with pytest.raises(ValueError, match="not empty"):
        clone_state(spark, sd, dst)


def test_purge_honors_readded_tombstone_seq_scope(spark, tmp_path):
    """Review regression: purge's scope map must honor the explicit seq
    of a rollback-re-added tombstone — keying off the late re-add record
    would pull post-delete files into its scope and physically delete
    rows the tombstone never covered."""
    from d6tstack_spark.plans.maintenance import rollback_to_snapshot

    a = _mk(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [a], sd, order_cols=ORDER)
    delete_where(spark, sd, "turn_idx = 0")  # scoped to file a
    b = _mk(tmp_path, "b.parquet", "b")
    encode_resume(spark, [a, b], sd, order_cols=ORDER)
    s3 = load_snapshots(sd)[-1]["id"]
    c = _mk(tmp_path, "c.parquet", "c")
    encode_resume(spark, [a, b, c], sd, order_cols=ORDER)

    rollback_to_snapshot(spark, sd, s3)  # re-adds the tombstone, seq=2
    src_a = spark.read.parquet(a)
    src_b = spark.read.parquet(b)
    want = _rows(src_a.filter("turn_idx <> 0")) + _rows(src_b)
    want.sort()
    assert _rows(decode_state(spark, sd)) == want  # merge-on-read
    purge_deletes(spark, sd, order_cols=ORDER)
    # b's turn_idx=0 rows postdate the delete: they must SURVIVE the
    # physical purge exactly as they survived merge-on-read
    assert _rows(decode_state(spark, sd)) == want
    assert load_deletes(sd) == []


def test_vacuum_completes_crashed_repair_instead_of_deleting(
    spark, tmp_path
):
    """Review regression: a crash between repair_duplicate_blocks'
    delete(blocks) and rename(.repair -> blocks) leaves .repair holding
    the ONLY copy; vacuum must complete the rename, never rmtree it."""
    import os
    import shutil

    from d6tstack_spark.plans.maintenance import vacuum_state

    a = _mk(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [a], sd, order_cols=ORDER)
    src = spark.read.parquet(a)
    bd = os.path.join(sd, "blocks")
    # simulate the crash window: blocks moved wholesale to .repair
    shutil.move(bd, bd + ".repair")
    rep = vacuum_state(spark, sd)
    assert rep["repairs_completed"] == 1
    assert rep["staging_dirs_removed"] == 0
    assert _rows(decode_state(spark, sd)) == _rows(src)
    # a .repair WITH live blocks present is stale staging: removed
    shutil.copytree(bd, bd + ".repair")
    rep2 = vacuum_state(spark, sd)
    assert rep2["staging_dirs_removed"] == 1
    assert rep2["repairs_completed"] == 0
    assert _rows(decode_state(spark, sd)) == _rows(src)
    # a legally EMPTY blocks dir (fully-purged table) + stale .repair
    # must NOT roll forward — that would resurrect the purged rows
    shutil.copytree(bd, bd + ".repair")
    delete_where(spark, sd, "turn_idx >= 0")
    purge_deletes(spark, sd, order_cols=ORDER)
    assert decode_state(spark, sd).count() == 0
    rep3 = vacuum_state(spark, sd)
    assert rep3["repairs_completed"] == 0
    assert rep3["staging_dirs_removed"] == 1
    assert decode_state(spark, sd).count() == 0  # rows stay gone


def test_clone_refuses_unscoped_tombstones(spark, tmp_path):
    """Review regression: a pending tombstone with no snapshot record
    cannot be placed in the projected log — clone must refuse (as
    decode_state(snapshot=) does), not silently resurrect its rows."""
    import json
    import os

    from d6tstack_spark.plans.maintenance import clone_state

    a = _mk(tmp_path, "a.parquet", "a")
    sd = str(tmp_path / "state")
    encode_resume(spark, [a], sd, order_cols=ORDER)
    with open(os.path.join(sd, "deletes.json"), "w") as f:
        json.dump([{"id": 999, "where": "turn_idx = 0", "ts": 0}], f)
    with pytest.raises(ValueError, match="no snapshot record"):
        clone_state(spark, sd, str(tmp_path / "clone"))


def test_rollback_crash_before_snapshot_record_stays_scoped(
    spark, hist, monkeypatch
):
    """Crash window fix (round 6): rollback writes the re-added tombstones
    into deletes.json and then records their snapshot entry — a crash
    between the two used to leave them unscoped, so LIVE reads applied
    them globally and silently over-deleted rows in post-target files.
    The items carry an explicit ``seq``; _live_visibility now honors it
    even before the snapshot record lands."""
    from d6tstack_spark.plans import checkpoint as ckpt

    sd, (s1, s2, s3, s4), src_a, src_ab = hist
    real = ckpt._record_snapshot

    def boom(state_dir, op, files, tombstones=None):
        if op == "delete":
            raise RuntimeError("injected crash before snapshot record")
        return real(state_dir, op, files, tombstones=tombstones)

    monkeypatch.setattr(ckpt, "_record_snapshot", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        rollback_to_snapshot(spark, sd, s2)
    monkeypatch.undo()

    # crash window: the re-added tombstone pends with seq=s2 but no
    # snapshot record. It must apply ONLY to files first seen before s2 —
    # the post-purge rewrite files (first seen s3) and the appended b file
    # (first seen s4) keep every row, including turn_idx = 0.
    deletes = load_deletes(sd)
    assert any(d.get("seq") == s2 for d in deletes)
    live = _rows(decode_state(spark, sd))
    want_window = sorted(
        _rows(src_a.filter("turn_idx <> 0"))
        + _rows(src_ab.subtract(src_a))
    )
    assert live == want_window  # b's turn_idx=0 rows survive the window

    # re-running the rollback completes and lands on the target state
    rollback_to_snapshot(spark, sd, s2)
    assert _rows(decode_state(spark, sd)) == _rows(
        src_a.filter("turn_idx <> 0")
    )
