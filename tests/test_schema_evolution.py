"""Schema evolution over encoded state dirs: appends may ADD columns
(already-written blocks decode the new column as all-null) and DROP columns
(the fused encoder writes explicit all-null blocks so every new block stays
complete on disk). The reference handles the analogous drift when stacking
CSVs with add/remove columns (combine_csv.py:214-246 col_preview /
is_col_match); here the drift contract extends to an incrementally
APPENDED columnar state dir.

Covers: union manifests on fresh dirs, evolved-marker persistence, both
decode paths (bulk per-file and shuffle), projections including the
all-evolved anchor case, zone pruning semantics on evolved columns
(IS NULL must keep pre-evolution blocks), type-drift refusal, and the
delete/purge lifecycle on an evolved dir."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from d6tstack_spark.operators.encode import decode_table
from d6tstack_spark.plans.checkpoint import (
    decode_state,
    delete_where,
    encode_resume,
    load_manifest,
)
from d6tstack_spark.plans.maintenance import purge_deletes


def _write(path, cols: dict, row_group_size=300):
    pq.write_table(pa.table(cols), str(path), row_group_size=row_group_size)
    return str(path)


def _gen1(tmp_path, n=900):
    return _write(
        tmp_path / "gen1.parquet",
        {
            "conv_id": pa.array([f"a{j // 6:04d}" for j in range(n)]),
            "turn_idx": pa.array([j % 6 for j in range(n)], pa.int32()),
            "text": pa.array([f"msg a{j}" for j in range(n)]),
        },
    )


def _gen2(tmp_path, n=600):
    """Adds ``score``, drops ``text``."""
    return _write(
        tmp_path / "gen2.parquet",
        {
            "conv_id": pa.array([f"b{j // 6:04d}" for j in range(n)]),
            "turn_idx": pa.array([j % 6 for j in range(n)], pa.int32()),
            "score": pa.array(
                [None if j % 7 == 0 else (j % 100) / 100.0 for j in range(n)],
                pa.float64(),
            ),
        },
    )


@pytest.fixture()
def evolved_state(spark, tmp_path):
    p1 = _gen1(tmp_path)
    state = str(tmp_path / "state")
    s1 = encode_resume(spark, [p1], state, checkpoint_every=0)
    assert s1["encoded"] > 0
    p2 = _gen2(tmp_path)
    # resume contract: pass the full cumulative list; old splits skip
    s2 = encode_resume(spark, [p1, p2], state, checkpoint_every=0)
    assert s2["encoded"] > 0 and s2["skipped"] == s1["encoded"]
    return state, p1, p2


def _expected(spark, p1, p2):
    a = spark.read.parquet(p1).withColumn(
        "score", F.lit(None).cast("double")
    )
    b = spark.read.parquet(p2).withColumn(
        "text", F.lit(None).cast("string")
    )
    return a.unionByName(b.select(*a.columns))


def _key(df, cols=("conv_id", "turn_idx", "text", "score")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_manifest_marks_added_column_evolved(evolved_state):
    state, _, _ = evolved_state
    m = load_manifest(state)
    assert list(m) == ["conv_id", "turn_idx", "text", "score"]
    assert m["score"].get("evolved") is True
    assert "evolved" not in m["text"]  # dropped-on-append needs no marker


def test_decode_full_union_with_nulls(spark, evolved_state):
    state, p1, p2 = evolved_state
    got = decode_state(spark, state)
    assert _key(got) == _key(_expected(spark, p1, p2))


def test_shuffle_path_matches_bulk(spark, evolved_state):
    state, p1, p2 = evolved_state
    m = load_manifest(state)
    blocks = spark.read.parquet(os.path.join(state, "blocks"))
    got = decode_table(blocks, m)
    assert _key(got) == _key(decode_state(spark, state))


def test_projection_evolved_only_keeps_old_rows(spark, evolved_state):
    state, p1, p2 = evolved_state
    n1 = spark.read.parquet(p1).count()
    n2 = spark.read.parquet(p2).count()
    got = decode_state(spark, state, columns=["score"])
    assert got.columns == ["score"]
    rows = got.collect()
    assert len(rows) == n1 + n2  # pre-evolution rows must NOT vanish
    assert sum(1 for r in rows if r.score is None) == n1 + sum(
        1
        for r in spark.read.parquet(p2).collect()
        if r.score is None
    )


def test_projection_mixed_and_original(spark, evolved_state):
    state, p1, p2 = evolved_state
    got = decode_state(spark, state, columns=["conv_id", "score"])
    assert got.columns == ["conv_id", "score"]
    exp = _expected(spark, p1, p2).select("conv_id", "score")

    def k(rows):
        return sorted(
            ((r.conv_id, r.score) for r in rows),
            key=lambda t: (t[0], t[1] is not None, t[1] or 0.0),
        )

    assert k(got.collect()) == k(exp.collect())
    t = decode_state(spark, state, columns=["text"])
    assert t.count() == exp.count()


def test_where_is_null_keeps_pre_evolution_blocks(spark, evolved_state):
    state, p1, p2 = evolved_state
    exp = _expected(spark, p1, p2).filter("score IS NULL")
    got = decode_state(spark, state, where="score IS NULL")
    assert _key(got) == _key(exp)
    # range predicate on the evolved column: old blocks prune correctly
    exp2 = _expected(spark, p1, p2).filter("score >= 0.5")
    got2 = decode_state(spark, state, where="score >= 0.5")
    assert _key(got2) == _key(exp2)
    # and on a dropped-on-append column
    exp3 = _expected(spark, p1, p2).filter("text IS NULL")
    got3 = decode_state(spark, state, where="text IS NULL")
    assert _key(got3) == _key(exp3)


def test_type_drift_still_refused(spark, tmp_path):
    p1 = _gen1(tmp_path)
    state = str(tmp_path / "state_t")
    encode_resume(spark, [p1], state, checkpoint_every=0)
    bad = _write(
        tmp_path / "bad.parquet",
        {
            "conv_id": pa.array(["z0001"]),
            "turn_idx": pa.array([1], pa.int32()),
            "text": pa.array([123], pa.int64()),  # retyped column
        },
    )
    # conflict across the input files themselves
    with pytest.raises(ValueError, match="type conflict|schema drift"):
        encode_resume(spark, [p1, bad], state, checkpoint_every=0)
    # conflict vs the stored manifest (single consistent input, retyped)
    with pytest.raises(ValueError, match="schema drift|fresh state dir"):
        encode_resume(spark, [bad], state, checkpoint_every=0)


def test_fresh_dir_union_manifest_no_markers(spark, tmp_path):
    p1 = _gen1(tmp_path)
    p2 = _gen2(tmp_path)
    state = str(tmp_path / "state_u")
    encode_resume(spark, [p1, p2], state, checkpoint_every=0)
    m = load_manifest(state)
    assert set(m) == {"conv_id", "turn_idx", "text", "score"}
    assert not any(v.get("evolved") for v in m.values())
    got = decode_state(spark, state)
    assert _key(got) == _key(_expected(spark, p1, p2))


def test_delete_and_purge_on_evolved_dir(spark, evolved_state):
    state, p1, p2 = evolved_state
    exp = _expected(spark, p1, p2).filter(
        "NOT coalesce(score < 0.3 AND score IS NOT NULL, false)"
    )
    delete_where(spark, state, "score < 0.3 AND score IS NOT NULL")
    assert _key(decode_state(spark, state)) == _key(exp)
    rep = purge_deletes(spark, state)
    assert rep["purged_rows"] > 0
    assert _key(decode_state(spark, state)) == _key(exp)
    # append AFTER purge on the evolved dir still works
    p3 = _write(
        os.path.join(os.path.dirname(state), "gen3.parquet"),
        {
            "conv_id": pa.array(["c0001", "c0001"]),
            "turn_idx": pa.array([0, 1], pa.int32()),
            "text": pa.array(["late c", None]),
            "score": pa.array([0.9, None], pa.float64()),
        },
    )
    encode_resume(spark, [p1, p2, p3], state, checkpoint_every=0)
    got = decode_state(spark, state)
    assert got.filter("conv_id = 'c0001'").count() == 2
    assert _key(got.filter("conv_id <> 'c0001'")) == _key(exp)


def test_resume_skips_complete_splits_across_evolution(spark, tmp_path):
    p1 = _gen1(tmp_path)
    state = str(tmp_path / "state_r")
    encode_resume(spark, [p1], state, checkpoint_every=0)
    p2 = _gen2(tmp_path)
    # re-pass the old path together with the new one: old splits skip
    s = encode_resume(spark, [p1, p2], state, checkpoint_every=0)
    assert s["skipped"] > 0 and s["encoded"] > 0
    got = decode_state(spark, state)
    assert _key(got) == _key(_expected(spark, p1, p2))
    # idempotent second call
    s2 = encode_resume(spark, [p1, p2], state, checkpoint_every=0)
    assert s2["already_complete"]


def test_purge_is_null_on_evolved_column_stays_deleted(spark, evolved_state):
    """Regression: purge's zone targeting must mirror decode's
    _strip_evolved_unprunable. Pre-evolution blocks have no stats row for
    ``score``, so a naive stats-intersection excludes them from the
    rewrite — yet ``score IS NULL`` matches ALL their rows. Clearing the
    tombstone after such a partial purge would resurrect them."""
    state, p1, p2 = evolved_state
    exp = _expected(spark, p1, p2).filter("score IS NOT NULL")
    n_exp = exp.count()
    assert n_exp > 0
    delete_where(spark, state, "score IS NULL")
    assert _key(decode_state(spark, state)) == _key(exp)
    rep = purge_deletes(spark, state)
    # every pre-evolution file holds matching (all-null score) rows — the
    # conservative plan must rewrite ALL files, not just post-evolution ones
    assert rep["files_rewritten"] == rep["files_scanned"]
    got = decode_state(spark, state)  # tombstone now cleared: physical truth
    assert got.count() == n_exp
    assert _key(got) == _key(exp)
