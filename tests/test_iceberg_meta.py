"""Pure-python Iceberg metadata layer: Avro OCF codec, snapshot resolution
(version hint, time travel, DELETED-entry skip), and the encode planner
consuming a snapshot's file list end-to-end."""

from __future__ import annotations

import json
import os

import pytest

from d6tstack_spark.sources.avro_lite import read_avro, write_avro
from d6tstack_spark.sources.iceberg_meta import (
    is_iceberg_dir,
    snapshot_data_files,
    write_iceberg_table_minimal,
)

SF = "/root/testdata/sf0.001"

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": ["null", "long"]},
        {"name": "b", "type": "boolean"},
        {"name": "d", "type": "double"},
        {"name": "raw", "type": "bytes"},
        {"name": "arr", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "double"}},
        {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["A", "B"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "F", "size": 3}},
    ],
}
RECS = [
    {"s": "héllo", "n": None, "b": True, "d": -1.5, "raw": b"\x00\xff",
     "arr": [1, -2, 3], "m": {"x": 1.5, "y": 0.0}, "e": "B", "fx": b"abc"},
    {"s": "", "n": -(2**40), "b": False, "d": 0.0, "raw": b"",
     "arr": [], "m": {}, "e": "A", "fx": b"xyz"},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_roundtrip(tmp_path, codec):
    p = str(tmp_path / "t.avro")
    write_avro(p, RECS, SCHEMA, codec=codec)
    got, schema = read_avro(p)
    assert got == RECS
    assert schema["name"] == "t"


def test_avro_rejects_garbage(tmp_path):
    p = tmp_path / "x.avro"
    p.write_bytes(b"not avro at all")
    with pytest.raises(ValueError, match="container"):
        read_avro(str(p))


def test_snapshot_skips_deleted_and_travels(tmp_path):
    td = str(tmp_path / "tbl")
    write_iceberg_table_minimal(
        td, [f"{SF}/events.parquet"], snapshot_id=1
    )
    # second snapshot adds orders and delete-marks nation
    write_iceberg_table_minimal(
        td,
        [f"{SF}/events.parquet", f"{SF}/orders.parquet"],
        snapshot_id=2,
        deleted_files=[f"{SF}/nation.parquet"],
    )
    # version-hint points at v2; the union of both snapshots is visible to
    # time travel
    assert is_iceberg_dir(td)
    cur = snapshot_data_files(td)
    names = sorted(os.path.basename(f["path"]) for f in cur)
    assert names == ["events.parquet", "orders.parquet"]
    assert all(f["record_count"] > 0 for f in cur)
    old = snapshot_data_files(td, snapshot_id=1)
    assert [os.path.basename(f["path"]) for f in old] == ["events.parquet"]
    with pytest.raises(KeyError):
        snapshot_data_files(td, snapshot_id=99)


def test_version_hint_fallback_to_max_version(tmp_path):
    td = str(tmp_path / "tbl")
    write_iceberg_table_minimal(td, [f"{SF}/events.parquet"], snapshot_id=1)
    write_iceberg_table_minimal(td, [f"{SF}/orders.parquet"], snapshot_id=2)
    os.remove(os.path.join(td, "metadata", "version-hint.text"))
    got = snapshot_data_files(td)
    assert [os.path.basename(f["path"]) for f in got] == ["orders.parquet"]


def test_not_iceberg_dir(tmp_path):
    assert not is_iceberg_dir(str(tmp_path))
    assert not is_iceberg_dir(SF)


def test_table_io_reads_iceberg_dir(spark, tmp_path):
    from d6tstack_spark.sources.table_io import read_table, snapshot_files

    td = str(tmp_path / "tbl")
    write_iceberg_table_minimal(
        td,
        [f"{SF}/events.parquet"],
        deleted_files=[f"{SF}/orders.parquet"],
    )
    files = snapshot_files(spark, td)
    assert [os.path.basename(p) for p in files] == ["events.parquet"]
    assert read_table(spark, td).count() == 1000


def test_encode_from_iceberg_snapshot_roundtrip(spark, tmp_path):
    """The mandate path: Iceberg snapshot → split planning → scan-fused
    encode → decode, bit-identical to the source."""
    import pandas as pd

    from d6tstack_spark.operators.encode import decode_table, encode_parquet_files
    from d6tstack_spark.sources.table_io import snapshot_files

    td = str(tmp_path / "tbl")
    write_iceberg_table_minimal(td, [f"{SF}/events.parquet"])
    blocks, manifest = encode_parquet_files(
        spark, snapshot_files(spark, td), order_cols=("event_id",)
    )
    dec = decode_table(blocks, manifest)
    a = spark.read.parquet(f"{SF}/events.parquet").orderBy("event_id").toPandas()
    b = dec.orderBy("event_id").toPandas()[a.columns.tolist()]
    pd.testing.assert_frame_equal(a, b)


def test_manifest_schema_is_self_describing(tmp_path):
    """Decode is driven by the schema embedded in the FILE (as with real
    Iceberg manifests), not by the fixture writer's schema constant:
    renaming a field in the embedded schema changes the decoded keys."""
    p = str(tmp_path / "t.avro")
    write_avro(p, [{"s": "v", "n": 1, "b": True, "d": 0.0, "raw": b"",
                    "arr": [], "m": {}, "e": "A", "fx": b"zzz"}], SCHEMA)
    raw = open(p, "rb").read()
    swapped = raw.replace(b'"name": "s"', b'"name": "z"', 1)
    assert swapped != raw
    got, _ = read_avro(swapped)
    assert got[0]["z"] == "v" and "s" not in got[0]


def test_position_deletes_merge_on_read(spark, tmp_path):
    """v2 position-delete file (content=1, columns file_path/pos): read_table
    drops exactly the named (file, row-position) rows; snapshot_data_files
    never returns the delete file as data."""
    from d6tstack_spark.sources.iceberg_meta import snapshot_files_detail
    from d6tstack_spark.sources.table_io import read_table

    td = str(tmp_path / "tbl")
    src = f"{SF}/events.parquet"
    write_iceberg_table_minimal(
        td, [src], position_deletes={src: [0, 1, 2, 999]}
    )
    detail = snapshot_files_detail(td)
    assert len(detail["data"]) == 1 and len(detail["position_deletes"]) == 1
    assert all("pos-delete" not in f["path"] for f in snapshot_data_files(td))
    df = read_table(spark, td)
    assert df.count() == 996
    ids = {r[0] for r in df.select("event_id").collect()}
    assert ids.isdisjoint({0, 1, 2, 999})  # events.parquet is id-ordered


def test_equality_deletes_merge_on_read(spark, tmp_path):
    """content=2 delete file whose columns are the equality ids: every data
    row (from an OLDER data sequence) equal on those columns drops; unknown
    delete columns raise. The delete is written at a later sequence than
    the data — the shape a real upsert commit produces."""
    import pyarrow as pa

    from d6tstack_spark.sources.table_io import read_table

    td = str(tmp_path / "tbl")
    src = f"{SF}/events.parquet"
    full = [r["event_type"] for r in
            __import__("pyarrow.parquet", fromlist=["x"]).read_table(
                src, columns=["event_type"]).to_pylist()]
    kind = full[0]
    write_iceberg_table_minimal(
        td, [src],
        equality_deletes=pa.table({"event_type": pa.array([kind])}),
        equality_delete_sequence=2,
    )
    df = read_table(spark, td)
    assert df.count() == len(full) - full.count(kind)
    assert df.filter(df.event_type == kind).count() == 0

    td2 = str(tmp_path / "tbl2")
    write_iceberg_table_minimal(
        td2, [src],
        equality_deletes=pa.table({"no_such_col": pa.array([1])}),
        equality_delete_sequence=2,
    )
    with pytest.raises(ValueError, match="absent from the table"):
        read_table(spark, td2)


def test_equality_delete_sequence_scoping(spark, tmp_path):
    """Spec §delete-semantics: an equality delete applies only to data
    files with data sequence number STRICTLY LESS than its own. A row
    re-inserted AFTER the delete was committed must stay live — before
    sequence scoping the reader silently dropped it (round-3 review
    finding). Same-commit data (seq == delete seq) is likewise untouched:
    that is exactly how an upsert commit (delete old + insert new) works."""
    import pandas as pd
    import pyarrow as pa

    from d6tstack_spark.sources.table_io import read_table

    old = str(tmp_path / "old.parquet")
    new = str(tmp_path / "new.parquet")
    pd.DataFrame({"k": [1, 2, 3], "v": ["old1", "old2", "old3"]}).to_parquet(old)
    pd.DataFrame({"k": [2], "v": ["new2"]}).to_parquet(new)
    td = str(tmp_path / "tbl")
    # commit model: seq1 adds old rows; seq2 deletes k=2 and re-inserts it
    write_iceberg_table_minimal(
        td, [old, new],
        file_sequences={old: 1, new: 2},
        equality_deletes=pa.table({"k": pa.array([2], pa.int64())}),
        equality_delete_sequence=2,
    )
    got = read_table(spark, td).orderBy("k").collect()
    assert [(r["k"], r["v"]) for r in got] == [
        (1, "old1"), (2, "new2"), (3, "old3")
    ]


def test_position_delete_sequence_scoping(spark, tmp_path):
    """A position delete applies to data sequence numbers ≤ its own, never
    to files added after it."""
    import pandas as pd

    from d6tstack_spark.sources.table_io import read_table

    old = str(tmp_path / "old.parquet")
    new = str(tmp_path / "new.parquet")
    pd.DataFrame({"k": [1, 2]}).to_parquet(old)
    pd.DataFrame({"k": [10, 20]}).to_parquet(new)
    td = str(tmp_path / "tbl")
    # delete row 0 of BOTH files, but the delete is at seq 1 and `new`
    # was added at seq 2 → only old's row 0 drops
    write_iceberg_table_minimal(
        td, [old, new],
        file_sequences={old: 1, new: 2},
        position_deletes={old: [0], new: [0]},
        position_delete_sequence=1,
    )
    got = sorted(r["k"] for r in read_table(spark, td).collect())
    assert got == [2, 10, 20]


def test_incremental_encode_from_snapshot_diff(spark, tmp_path):
    """Append-only ingest: snapshot 2 adds a file; the snapshot diff feeds
    encode_resume, which encodes ONLY the appended file's blocks while the
    first snapshot's blocks are reused untouched."""
    from d6tstack_spark.datagen import write_transcripts
    from d6tstack_spark.plans.checkpoint import encode_resume
    from d6tstack_spark.sources.iceberg_meta import snapshot_added_files

    td = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    # append-only table: two same-schema transcript files (different seeds)
    f1 = write_transcripts(str(tmp_path / "d1"), sf=0.001, seed=42)
    f2 = write_transcripts(str(tmp_path / "d2"), sf=0.001, seed=43)
    write_iceberg_table_minimal(td, [f1], snapshot_id=1)
    s1 = encode_resume(spark, [f1], state)
    assert s1["encoded"] > 0

    write_iceberg_table_minimal(td, [f1, f2], snapshot_id=2)
    added = snapshot_added_files(td, from_snapshot_id=1)
    assert added == [f2]
    # resume over the FULL current snapshot: prior file's splits all skip
    all_files = [f["path"] for f in snapshot_data_files(td)]
    s2 = encode_resume(spark, all_files, state)
    assert s2["skipped"] == s1["encoded"] and s2["encoded"] > 0


def test_avro_truncation_never_hangs_or_lies(tmp_path):
    """Any prefix-truncation of a valid OCF raises promptly (ValueError /
    IndexError / struct.error) or returns a strict prefix of the records —
    never hangs, never fabricates values."""
    import struct as _struct

    p = str(tmp_path / "t.avro")
    write_avro(p, RECS * 8, SCHEMA)
    raw = open(p, "rb").read()
    for cut in range(4, len(raw), 7):
        try:
            got, _ = read_avro(raw[:cut])
        except (ValueError, IndexError, KeyError, _struct.error, EOFError):
            continue
        n = len(RECS * 8)
        assert got == (RECS * 8)[: len(got)] and len(got) <= n


def test_encode_iceberg_table_respects_deletes(spark, tmp_path):
    """Encoding a v2 table with position deletes must encode the MERGED
    rows (scan-fused over raw files would bake deleted rows in); a
    delete-free table takes the zero-shuffle scan-fused path."""
    from d6tstack_spark.operators.encode import decode_table
    from d6tstack_spark.sources.table_io import encode_iceberg_table

    src = f"{SF}/events.parquet"
    td = str(tmp_path / "tbl")
    write_iceberg_table_minimal(td, [src], position_deletes={src: [0, 1, 2]})
    blocks, man = encode_iceberg_table(spark, td, order_cols=("event_id",))
    dec = decode_table(blocks, man)
    assert dec.count() == 997
    assert dec.filter(dec.event_id < 3).count() == 0

    td2 = str(tmp_path / "tbl2")
    write_iceberg_table_minimal(td2, [src])
    blocks2, man2 = encode_iceberg_table(spark, td2, order_cols=("event_id",))
    assert decode_table(blocks2, man2).count() == 1000


def test_read_avro_table_distributed(spark, tmp_path):
    """Distributed Avro OCF source: stdlib-encoded files (incl. deflate +
    timestamp-micros logical type + nullable union) read back as a typed
    DataFrame, one task per file, values exact."""
    import datetime as dt

    from d6tstack_spark.sources.avro_lite import (
        avro_to_spark_type,
        read_avro_schema,
        read_avro_table,
        write_avro,
    )

    schema = {
        "type": "record", "name": "ev",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "txt", "type": ["null", "string"]},
            {"name": "score", "type": "double"},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        ],
    }
    epoch = dt.datetime(2026, 1, 1)
    mk = lambda i: {  # noqa: E731
        "id": i,
        "txt": None if i % 3 == 0 else f"row{i}",
        "score": i / 7,
        "ts": int((epoch - dt.datetime(1970, 1, 1)).total_seconds() * 1e6) + i,
    }
    p1, p2 = str(tmp_path / "a.avro"), str(tmp_path / "b.avro")
    write_avro(p1, [mk(i) for i in range(50)], schema, codec="deflate")
    write_avro(p2, [mk(i) for i in range(50, 80)], schema)
    assert read_avro_schema(p1) == schema
    assert avro_to_spark_type("long").simpleString() == "bigint"

    df = read_avro_table(spark, [p1, p2])
    assert df.rdd.getNumPartitions() == 2  # one task per file
    assert dict(df.dtypes) == {
        "id": "bigint", "txt": "string", "score": "double",
        "ts": "timestamp_ntz",
    }
    got = df.orderBy("id").collect()
    assert len(got) == 80
    assert got[0]["txt"] is None and got[1]["txt"] == "row1"
    assert got[79]["score"] == 79 / 7
    assert got[5]["ts"] == epoch + dt.timedelta(microseconds=5)
    # directory form + schema-drift guard
    assert read_avro_table(spark, str(tmp_path)).count() == 80
    drift = {"type": "record", "name": "x",
             "fields": [{"name": "other", "type": "long"}]}
    p3 = str(tmp_path / "c.avro")
    write_avro(p3, [{"other": 1}], drift)
    with pytest.raises(Exception, match="schema drift"):
        read_avro_table(spark, [p1, p3]).collect()


def test_write_avro_table_distributed_roundtrip(spark, tmp_path, sf_dir):
    """Distributed Avro OCF sink: one container per partition, schema
    derived from the DataFrame (nullable unions, timestamp-micros, array
    items), write → read_avro_table round-trip frame-exact on real tables
    including nulls, timestamps and array<float> embeddings."""
    from pyspark.sql import functions as F

    from d6tstack_spark.sources.avro_lite import (
        read_avro_table,
        write_avro_table,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        "event_id < 1000"
    )
    out = str(tmp_path / "ev_avro")
    res = write_avro_table(ev.repartition(4), out, codec="deflate")
    assert res["n_records"] == ev.count() and 1 <= res["n_files"] <= 4

    back = read_avro_table(spark, out)
    assert dict(back.dtypes) == dict(
        (n, t.replace("timestamp", "timestamp_ntz") if t == "timestamp" else t)
        for n, t in ev.dtypes
    )
    a = ev.orderBy("event_id").toPandas()
    b = back.orderBy("event_id").toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        a.reset_index(drop=True),
        b.astype(a.dtypes.to_dict()).reset_index(drop=True),
    )

    # array<float> column (embeddings): element-exact through the union
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out2 = str(tmp_path / "emb_avro")
    write_avro_table(emb.repartition(2), out2)
    back2 = read_avro_table(spark, out2)
    ae = emb.orderBy("vec_id").toPandas()
    be = back2.orderBy("vec_id").toPandas()
    assert list(ae["vec_id"]) == list(be["vec_id"])
    import numpy as np

    for x, y in zip(ae["embedding"], be["embedding"]):
        np.testing.assert_array_equal(
            np.asarray(x, dtype=np.float32), np.asarray(y, dtype=np.float32)
        )
