"""Checkpoint/resume + streaming encode + CSV sniffing + multimodal stubs."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from d6tstack_spark.plans.checkpoint import (
    decode_state,
    encode_resume,
    load_manifest,
)


@pytest.fixture()
def multi_parquet(spark, transcripts_path, tmp_path):
    """Split the transcripts into 3 parquet files (multi-file table)."""
    df = pd.read_parquet(transcripts_path)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"part{i}.parquet")
        df.iloc[i::3].to_parquet(p, row_group_size=512)
        paths.append(p)
    return paths


def test_encode_resume_roundtrip_and_skip(spark, multi_parquet, tmp_path):
    state = str(tmp_path / "state")
    s1 = encode_resume(spark, multi_parquet, state)
    assert s1["encoded"] == s1["planned"] > 0 and s1["skipped"] == 0

    # second run: everything skipped (the left_anti resume join)
    s2 = encode_resume(spark, multi_parquet, state)
    assert s2["already_complete"] and s2["skipped"] == s2["planned"]

    # decode equals the stacked source
    dec = decode_state(spark, state).orderBy("conv_id", "turn_idx").toPandas()
    src = (
        spark.read.parquet(*multi_parquet)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    pd.testing.assert_frame_equal(src, dec)

    # lineage exists with codec map + byte accounting
    lin = spark.read.parquet(os.path.join(state, "lineage")).toPandas()
    assert (lin["enc_bytes"] < lin["raw_bytes"]).all()
    assert all("text" in m for m in lin["codecs"])
    assert load_manifest(state)["ts"]["logical"] in ("ts", "ts_ntz")


def test_encode_resume_partial(spark, multi_parquet, tmp_path):
    """Simulate a crash: encode only file 0 first, then resume with all 3."""
    state = str(tmp_path / "state2")
    s1 = encode_resume(spark, multi_parquet[:1], state)
    s2 = encode_resume(spark, multi_parquet, state)
    assert s2["skipped"] == s1["encoded"] > 0
    assert s2["encoded"] == s2["planned"] - s1["encoded"]
    assert decode_state(spark, state).count() == spark.read.parquet(
        *multi_parquet
    ).count()


def test_encode_resume_added_file_keeps_ids_stable(spark, multi_parquet, tmp_path):
    """A file added between runs must not shift existing block ids: the
    path→file_idx map is persisted in the state dir (files.json), so the
    resume anti-join still targets the right blocks."""
    state = str(tmp_path / "state3")
    # first run sees only the LAST file alphabetically…
    encode_resume(spark, multi_parquet[2:], state)
    # …then earlier-sorting files appear; a positional index would renumber
    s2 = encode_resume(spark, multi_parquet, state)
    assert s2["skipped"] > 0 and s2["encoded"] > 0
    src = spark.read.parquet(*multi_parquet)
    dec = decode_state(spark, state)
    assert dec.count() == src.count()
    pd.testing.assert_frame_equal(
        src.orderBy("conv_id", "turn_idx").toPandas(),
        dec.orderBy("conv_id", "turn_idx").toPandas(),
    )
    # a recorded file missing from the run fails loudly
    with pytest.raises(ValueError, match="not in this run"):
        encode_resume(spark, multi_parquet[:1], state)


def test_fused_encode_normalizes_ns_ms_timestamps(spark, tmp_path):
    """Parquet with ns (pandas default) and ms timestamps must decode to the
    same instants — the fused encoder normalizes units to µs before the
    int64 cast (a bare cast would silently be 1000x off)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from d6tstack_spark.operators.encode import decode_table, encode_parquet_files

    ts = pd.to_datetime(
        ["2026-01-01 00:00:00.123456", "2026-01-02 12:34:56.654321"]
    )
    for unit in ("ns", "ms"):
        t = pa.table(
            {
                "conv_id": pa.array(["a", "b"]),
                "turn_idx": pa.array([0, 1], type=pa.int32()),
                "ts": pa.array(ts).cast(pa.timestamp(unit), safe=False),
            }
        )
        p = str(tmp_path / f"ts_{unit}.parquet")
        pq.write_table(t, p)
        blocks, manifest = encode_parquet_files(spark, p, order_cols=("conv_id",))
        got = (
            decode_table(blocks, manifest)
            .orderBy("conv_id")
            .select(F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
            .toPandas()["us"]
            .tolist()
        )
        want = [v // 1000 * 1000 if unit == "ms" else v
                for v in (ts.asi8 // 1000).tolist()]
        assert got == want, unit


def test_streaming_encode(spark, multi_parquet, tmp_path):
    from d6tstack_spark.operators.encode import decode_table
    from d6tstack_spark.plans.checkpoint import load_manifest
    from d6tstack_spark.streaming.encode_stream import start_encode_stream

    indir = str(tmp_path / "incoming")
    os.makedirs(indir)
    # stage first file, start stream
    os.link(multi_parquet[0], os.path.join(indir, "a.parquet"))
    schema = spark.read.parquet(multi_parquet[0]).schema
    blocks_dir = str(tmp_path / "sblocks")
    q = start_encode_stream(
        spark, indir, blocks_dir, str(tmp_path / "ckpt"), schema,
        target_block_rows=1024,
    )
    try:
        q.processAllAvailable()
        # late-arriving file → incremental micro-batch
        os.link(multi_parquet[1], os.path.join(indir, "b.parquet"))
        q.processAllAvailable()
    finally:
        q.stop()
    from d6tstack_spark.operators.encode import build_manifest

    manifest = build_manifest(schema)
    dec = decode_table(spark.read.parquet(blocks_dir), manifest)
    src = spark.read.parquet(multi_parquet[0], multi_parquet[1])
    assert dec.count() == src.count()
    pd.testing.assert_frame_equal(
        src.orderBy("conv_id", "turn_idx").toPandas(),
        dec.orderBy("conv_id", "turn_idx").toPandas(),
    )
    # the shuffle-free bulk decode walks the epoch=N subdirs too
    from d6tstack_spark.operators.encode import decode_parquet_blocks

    bulk = decode_parquet_blocks(spark, blocks_dir, manifest)
    pd.testing.assert_frame_equal(
        src.orderBy("conv_id", "turn_idx").toPandas(),
        bulk.orderBy("conv_id", "turn_idx").toPandas(),
    )


# ---------------------------------------------------------------- csv sniffer


@pytest.fixture()
def csv_files(tmp_path):
    clean = tmp_path / "jan.csv"
    clean.write_text("date,sales,cost\n2026-01-01,100,-80\n2026-01-02,200,-90\n")
    piped = tmp_path / "feb.psv"
    piped.write_text("date|sales|cost\n2026-02-01|300|-70\n")
    noheader = tmp_path / "mar.csv"
    noheader.write_text("2026-03-01,400,-60\n2026-03-02,500,-50\n")
    preamble = tmp_path / "apr.csv"
    preamble.write_text("report april\ngenerated nightly\ndate,sales,cost\n2026-04-01,600,-40\n")
    return {"clean": str(clean), "piped": str(piped), "noheader": str(noheader),
            "preamble": str(preamble)}


def test_sniff_dialects(spark, csv_files):
    from d6tstack_spark.sources.csv_sniffer import sniff_file, sniff_settings_csv

    s = sniff_file(spark, csv_files["clean"])
    assert {k: v for k, v in s.items() if not k.startswith("_")} == {
        "delim": ",", "skiprows": 0, "has_header": True,
        "n_columns": 3, "consistent_width": True}
    assert sniff_file(spark, csv_files["piped"])["delim"] == "|"
    assert sniff_file(spark, csv_files["noheader"])["has_header"] is False
    assert sniff_file(spark, csv_files["preamble"])["skiprows"] == 2

    with pytest.raises(ValueError, match="inconsistent delim"):
        sniff_settings_csv(spark, [csv_files["clean"], csv_files["piped"]])
    ok = sniff_settings_csv(spark, [csv_files["clean"]])
    assert ok["delim"] == ","


def test_read_csv_stacked(spark, csv_files, tmp_path):
    from d6tstack_spark.sources.csv_sniffer import read_csv_stacked

    other = tmp_path / "may.csv"
    other.write_text("date,sales,profit\n2026-05-01,700,10\n")
    out = read_csv_stacked(spark, [csv_files["clean"], str(other)])
    p = out.orderBy("date").toPandas()
    assert set(p.columns) == {"date", "sales", "cost", "profit", "filename"}
    assert p["cost"].isna().sum() == 1 and p["profit"].isna().sum() == 2
    assert set(p["filename"]) == {"jan.csv", "may.csv"}


def test_read_csv_stacked_skiprows_jvm_only(spark, csv_files):
    """Preamble files parse via a JVM-side bounded head-drop + from_csv —
    values exact, and the plan contains no Python row evaluation and no RDD
    scan (the 100 TB requirement for the one distributed sniffer path)."""
    from d6tstack_spark.sources.csv_sniffer import read_csv_stacked

    out = read_csv_stacked(spark, [csv_files["preamble"]])
    p = out.toPandas()
    assert len(p) == 1
    assert int(p["sales"].iloc[0]) == 600 and int(p["cost"].iloc[0]) == -40
    assert str(p["date"].iloc[0])[:10] == "2026-04-01"
    plan_str = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan_str
    assert "ExistingRDD" not in plan_str


def test_read_csv_stacked_preamble_edge_rows(spark, tmp_path):
    """Data rows that textually repeat the header line or lack the delimiter
    must survive: the head-drop is bounded to the first skiprows+header
    physical lines (the r2 contains(delim)/!=header filters lost such rows)."""
    from d6tstack_spark.sources.csv_sniffer import read_csv_stacked

    import pytest as _pytest

    f = tmp_path / "jun.csv"
    f.write_text("report june\nnightly\nname,note\nalice,hi\nname,note\nbob,yo\n")
    p = read_csv_stacked(spark, [str(f)]).orderBy("name").toPandas()
    assert len(p) == 3  # alice, header-identical row, bob — all data
    assert list(p["name"]) == ["alice", "bob", "name"]
    assert p.loc[p["name"] == "name", "note"].iloc[0] == "note"

    # a delimiter-less (under-length) row is malformed: FAILFAST surfaces it
    # loudly (r2 silently DROPPED it); PERMISSIVE keeps it null-padded
    g = tmp_path / "jul.csv"
    g.write_text("report july\nnightly\nname,note\nalice,hi\nsolo\nbob,yo\n")
    with _pytest.raises(Exception, match="(?i)malformed"):
        read_csv_stacked(spark, [str(g)]).toPandas()
    q = read_csv_stacked(spark, [str(g)], mode="PERMISSIVE").orderBy("name").toPandas()
    assert list(q["name"]) == ["alice", "bob", "solo"]
    assert q.loc[q["name"] == "solo", "note"].isna().all()


def test_read_csv_stacked_failfast_on_type_drift(spark, tmp_path):
    """Schema comes from a 20-line sniff sample, so a later value that does
    not fit the sampled type must ERROR by default (FAILFAST), not silently
    null out; PERMISSIVE is an explicit opt-in."""
    import pytest as _pytest

    from d6tstack_spark.sources.csv_sniffer import read_csv_stacked

    f = tmp_path / "drift.csv"
    body = "\n".join(f"{i},{i * 10}" for i in range(25))
    f.write_text("id,amt\n" + body + "\nnot_a_number,99\n")
    with _pytest.raises(Exception, match="(?i)malformed|failfast"):
        read_csv_stacked(spark, [str(f)]).toPandas()
    p = read_csv_stacked(spark, [str(f)], mode="PERMISSIVE").toPandas()
    assert len(p) == 26 and p["id"].isna().sum() == 1


def test_sniff_quoted_delimiters(spark, tmp_path):
    """Quoted delimiters don't inflate sniffed column counts or break
    sample schema inference (stdlib-csv quote-aware splitting)."""
    from d6tstack_spark.sources.csv_sniffer import read_csv_stacked, sniff_file

    f = tmp_path / "q.csv"
    f.write_text('name,note\n"doe, jane",hello\n"x, y, z",world\n')
    s = sniff_file(spark, str(f))
    assert s["n_columns"] == 2 and s["consistent_width"] is True
    p = read_csv_stacked(spark, [str(f)]).orderBy("name").toPandas()
    assert list(p["name"]) == ["doe, jane", "x, y, z"]


# ----------------------------------------------------------------- multimodal


def test_multimodal_stubs(spark):
    from d6tstack_spark.operators.multimodal import (
        attach_media_metadata,
        decode_media,
        frame_sample,
        media_feature_vector,
    )

    rows = [
        (1, "image", b"\x89PNG fake bytes", "image/png", None, None, None),
        (2, "video", b"\x00\x00ftyp fake", "video/mp4", None, None, 3500),
        (3, "audio", None, "audio/wav", None, None, 100),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary, mime string, "
        "width int, height int, duration_ms int",
    )
    meta = attach_media_metadata(df).toPandas()
    assert meta.loc[meta.media_id == 1, "n_bytes"].iloc[0] == 15
    assert meta["content_sha"].notna().sum() == 2

    dec = decode_media(df).toPandas()
    assert dec.loc[dec.media_id == 1, "dec_width"].notna().all()
    assert dec.loc[dec.media_id == 3, "dec_width"].isna().all()  # null content

    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        decode_media(df, strict=True).collect()

    fr = frame_sample(df.filter("duration_ms is not null"), every_ms=1000).toPandas()
    assert list(fr[fr.media_id == 2]["frame_ts_ms"]) == [0, 1000, 2000, 3000]

    fv = media_feature_vector(df, dim=8).toPandas()
    v = fv.loc[fv.media_id == 1, "features"].iloc[0]
    assert len(v) == 8 and abs(sum(v) - 1.0) < 1e-5
    assert fv.loc[fv.media_id == 3, "features"].iloc[0] is None


def test_real_bmp_wav_png_decode(spark):
    """BMP/WAV/PNG decode is REAL (pure stdlib): exact dimensions, exact
    duration, and feature vectors computed from decoded pixels/samples —
    verified against numpy on the source data, end-to-end through the
    distributed mapInPandas path."""
    import io
    import struct
    import wave as wave_mod

    import numpy as np

    from d6tstack_spark.operators.multimodal import (
        decode_media,
        make_bmp,
        media_feature_vector,
    )

    # BMP with known pixels (3 wide → 9-byte rows exercise 4-byte padding)
    px = bytes(range(3 * 5 * 3))
    bmp = make_bmp(3, 5, px)
    # 16-bit PCM WAV: 440 frames @ 8000 Hz = 55 ms
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        samples = np.arange(-440, 440, dtype=np.int16)
        w.writeframes(samples.tobytes())
    wav = buf.getvalue()
    png = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">IIBBBBB", 640, 480, 8, 2, 0, 0, 0) + b"\x00" * 8
    )
    jpeg_ish = b"\xff\xd8\xff\xe0 not decodable here"
    df = spark.createDataFrame(
        [(1, "image", bmp, "image/bmp", None, None, None),
         (2, "audio", wav, "audio/wav", None, None, None),
         (3, "image", png, "image/png", None, None, None),
         (4, "image", jpeg_ish, "image/jpeg", None, None, None)],
        "media_id long, kind string, content binary, mime string, "
        "width int, height int, duration_ms int",
    )
    dec = decode_media(df).toPandas().set_index("media_id")
    assert (dec.loc[1, "dec_width"], dec.loc[1, "dec_height"]) == (3, 5)
    assert dec.loc[1, "dec_kind"] == "bmp"
    assert dec.loc[2, "dec_duration_ms"] == 55 and dec.loc[2, "dec_kind"] == "wav"
    assert (dec.loc[3, "dec_width"], dec.loc[3, "dec_height"]) == (640, 480)
    assert dec.loc[4, "dec_kind"] == "fake"  # no stdlib JPEG decoder

    # strict mode: decodable formats still pass, only the JPEG row raises
    ok = decode_media(df.filter("media_id < 4"), strict=True).toPandas()
    assert len(ok) == 3

    # features from DECODED pixels (BMP) and |samples| (WAV), not file bytes
    fv = media_feature_vector(df, dim=4).toPandas().set_index("media_id")
    want_px = np.bincount(
        np.frombuffer(px, dtype=np.uint8).astype(np.int64) % 4, minlength=4
    )
    np.testing.assert_allclose(
        fv.loc[1, "features"], want_px / want_px.sum(), rtol=1e-6
    )
    want_s = np.bincount(np.abs(samples.astype(np.int64)) % 4, minlength=4)
    np.testing.assert_allclose(
        fv.loc[2, "features"], want_s / want_s.sum(), rtol=1e-6
    )


def test_real_mp4_webm_metadata(spark):
    """MP4 (ISO BMFF box walk) and WebM (EBML walk) metadata is REAL:
    duration and pixel dimensions parsed from the container, end-to-end
    through the distributed decode path — strict mode no longer raises
    for video containers."""
    from d6tstack_spark.operators.multimodal import (
        decode_media,
        decode_mp4_header,
        decode_webm_header,
        make_mp4_header,
        make_webm_header,
    )

    mp4 = make_mp4_header(640, 360, 12345)
    webm = make_webm_header(1280, 720, 98765)
    assert decode_mp4_header(mp4) == {
        "brand": "isom", "width": 640, "height": 360,
        "duration_ms": 12345, "n_tracks": 1,
    }
    assert decode_webm_header(webm) == {
        "doctype": "webm", "width": 1280, "height": 720,
        "duration_ms": 98765,
    }

    # truncation fuzz: every prefix parses or raises cleanly (no hang/loop)
    for n in range(len(mp4)):
        try:
            decode_mp4_header(mp4[:n])
        except Exception:
            pass
    for n in range(len(webm)):
        try:
            decode_webm_header(webm[:n])
        except Exception:
            pass

    df = spark.createDataFrame(
        [(1, "video", mp4, "video/mp4", None, None, None),
         (2, "video", webm, "video/webm", None, None, None)],
        "media_id long, kind string, content binary, mime string, "
        "width int, height int, duration_ms int",
    )
    dec = decode_media(df, strict=True).toPandas().set_index("media_id")
    assert dec.loc[1, "dec_kind"] == "mp4"
    assert (dec.loc[1, "dec_width"], dec.loc[1, "dec_height"]) == (640, 360)
    assert dec.loc[1, "dec_duration_ms"] == 12345
    assert dec.loc[2, "dec_kind"] == "webm"
    assert (dec.loc[2, "dec_width"], dec.loc[2, "dec_height"]) == (1280, 720)
    assert dec.loc[2, "dec_duration_ms"] == 98765


def test_writer_lease_guards_state_dir(spark, multi_parquet, tmp_path):
    """Single-writer lease: a live holder blocks a second writer fast; a
    dead same-host holder and a stale-TTL foreign holder are broken and
    the run proceeds; a clean run always releases its lease."""
    import json
    import socket
    import subprocess
    import time as time_mod

    from d6tstack_spark.plans import checkpoint as cp

    state = str(tmp_path / "state")
    os.makedirs(state)
    lp = cp._lease_path(state)

    # 1. live holder (our own pid, fresh heartbeat) → refuse
    with open(lp, "w") as f:
        json.dump({"pid": os.getpid(), "host": socket.gethostname(),
                   "acquired": time_mod.time()}, f)
    with pytest.raises(RuntimeError, match="locked by an active writer"):
        encode_resume(spark, multi_parquet, state)

    # 2. dead same-host holder → lease broken, encode proceeds
    child = subprocess.Popen(["true"])
    child.wait()
    with open(lp, "w") as f:
        json.dump({"pid": child.pid, "host": socket.gethostname(),
                   "acquired": time_mod.time()}, f)
    s = encode_resume(spark, multi_parquet, state)
    assert s["encoded"] > 0
    assert not os.path.exists(lp)  # released on success

    # 3. foreign-host holder with stale heartbeat → TTL break
    with open(lp, "w") as f:
        json.dump({"pid": 1, "host": "other-host"}, f)
    old = time_mod.time() - cp.LEASE_TTL_SEC - 5
    os.utime(lp, (old, old))
    s2 = encode_resume(spark, multi_parquet, state)
    assert s2["already_complete"]
    assert not os.path.exists(lp)

    # 4. foreign-host holder with fresh heartbeat → refuse (pid check is
    # same-host only; remote liveness is heartbeat-based)
    with open(lp, "w") as f:
        json.dump({"pid": 1, "host": "other-host"}, f)
    with pytest.raises(RuntimeError, match="locked by an active writer"):
        encode_resume(spark, multi_parquet, state)


def test_stale_temporary_cleaned_and_duplicates_healed(
    spark, multi_parquet, tmp_path
):
    """Crash-drill hazards, reproduced deterministically:
    1. a dead writer's blocks/_temporary must not survive into the next
       run (the v1 committer would publish its orphans alongside the
       re-encode — duplicated blocks);
    2. a state dir already poisoned with duplicate block rows (pre-fix
       crash) heals on the next encode_resume, and decode stays exact."""
    import shutil

    from d6tstack_spark.plans.checkpoint import repair_duplicate_blocks

    state = str(tmp_path / "state")
    s1 = encode_resume(spark, multi_parquet, state, checkpoint_every=2)
    assert s1["encoded"] > 2  # multiple committed batches

    bdir = os.path.join(state, "blocks")
    # 1. stale _temporary with an orphan task file
    orphan = os.path.join(bdir, "_temporary", "0", "task_fake", "part-x.parquet")
    os.makedirs(os.path.dirname(orphan))
    shutil.copy(sorted(glob.glob(os.path.join(bdir, "*.parquet")))[0], orphan)
    s2 = encode_resume(spark, multi_parquet, state, checkpoint_every=2)
    assert s2["already_complete"]
    assert not os.path.exists(os.path.join(bdir, "_temporary"))

    # 2. duplicate block rows published by a pre-fix crash
    victim = sorted(glob.glob(os.path.join(bdir, "*.parquet")))[0]
    shutil.copy(victim, victim.replace("part-", "part-dup-"))
    bl = spark.read.parquet(bdir)
    assert bl.count() > bl.select("block_id", "column").distinct().count()
    s3 = encode_resume(spark, multi_parquet, state, checkpoint_every=2)
    assert s3["already_complete"]
    bl = spark.read.parquet(bdir)
    assert bl.count() == bl.select("block_id", "column").distinct().count()
    assert repair_duplicate_blocks(spark, state) == 0  # idempotent

    dec = decode_state(spark, state)
    src = spark.read.parquet(*multi_parquet)
    assert dec.exceptAll(src).count() + src.exceptAll(dec).count() == 0


def test_decode_state_projection_and_zone_filter(spark, multi_parquet, tmp_path):
    state = str(tmp_path / "state")
    encode_resume(spark, multi_parquet, state)
    src = spark.read.parquet(*multi_parquet)
    lo = src.agg(F.min("conv_id")).first()[0]
    dec = decode_state(
        spark, state, columns=["conv_id", "turn_idx"],
        block_filter=("conv_id", lo, lo),
    )
    assert dec.columns == ["conv_id", "turn_idx"]
    want = src.filter(F.col("conv_id") == lo).count()
    assert dec.filter(F.col("conv_id") == lo).count() == want
    # SQL slice route: where= compiles to zone filters + exact row filter
    w = f"conv_id = '{lo}' OR (conv_id > '{lo}' AND turn_idx = 0)"
    got = decode_state(spark, state, where=w).count()
    assert got == src.filter(w).count()
    got2 = decode_state(spark, state, columns=["turn_idx"], where=w)
    assert got2.columns == ["turn_idx"] and got2.count() == got
    with pytest.raises(ValueError, match="not both"):
        decode_state(
            spark, state, where=w, block_filter=("conv_id", lo, lo)
        )


def test_legacy_state_dir_without_id_scheme_marker_refused(
    spark, multi_parquet, tmp_path
):
    """A state dir with blocks but no format.json (written by a build from
    before id-scheme versioning) must be refused, not guessed at: resuming
    under the wrong block-id layout re-encodes every split under new ids
    and the decoded table silently doubles."""
    state = str(tmp_path / "state")
    encode_resume(spark, multi_parquet, state)
    os.remove(os.path.join(state, "format.json"))
    with pytest.raises(ValueError, match="no format.json id-scheme marker"):
        encode_resume(spark, multi_parquet, state)


def test_mismatched_id_scheme_refused(spark, multi_parquet, tmp_path):
    import json

    state = str(tmp_path / "state")
    encode_resume(spark, multi_parquet, state)
    with open(os.path.join(state, "format.json"), "w") as f:
        json.dump({"id_scheme": "flat64"}, f)
    with pytest.raises(ValueError, match="block-id scheme 'flat64'"):
        encode_resume(spark, multi_parquet, state)


def test_repair_keeps_blocks_complete_per_file(spark, multi_parquet, tmp_path):
    """repair_duplicate_blocks must preserve the per-file complete-block
    invariant WITHOUT relying on AQE coalescing the dedup shuffle into one
    partition (at real scale it won't): after repair, every block's column
    rows live in a single file."""
    import shutil

    import pyarrow.parquet as pq_

    from d6tstack_spark.plans.checkpoint import repair_duplicate_blocks

    state = str(tmp_path / "state")
    encode_resume(spark, multi_parquet, state, checkpoint_every=2)
    bdir = os.path.join(state, "blocks")
    for victim in sorted(glob.glob(os.path.join(bdir, "*.parquet")))[:3]:
        shutil.copy(victim, victim.replace("part-", "part-dup-"))
    # force the many-small-partitions shape AQE would otherwise hide
    old = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        assert repair_duplicate_blocks(spark, state) > 0
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old)
    ncols = len(load_manifest(state))
    seen: dict[int, str] = {}
    for f in sorted(glob.glob(os.path.join(bdir, "*.parquet"))):
        t = pq_.read_table(f, columns=["block_id"])
        for bid in t.column("block_id").to_pylist():
            assert seen.setdefault(bid, f) == f, (
                f"block {bid} split across {seen[bid]} and {f}"
            )
    counts = pd.Series([b for f in sorted(glob.glob(os.path.join(bdir, "*.parquet")))
                        for b in pq_.read_table(f, columns=["block_id"])
                        .column("block_id").to_pylist()]).value_counts()
    assert (counts == ncols).all()
    # and the decode path agrees end-to-end
    dec = decode_state(spark, state)
    src = spark.read.parquet(*multi_parquet)
    assert dec.exceptAll(src).count() + src.exceptAll(dec).count() == 0


def test_jpeg_header_decode(spark):
    """JPEG dimensions are REAL (SOF marker scan): baseline and
    progressive frames, fill bytes, and restart markers all parse; a
    JPEG with no SOF before start-of-scan rejects. decode_media picks the
    jpeg decoder from the magic bytes."""
    from d6tstack_spark.operators.multimodal import (
        decode_jpeg_header,
        decode_media,
        make_jpeg_header,
    )

    d = decode_jpeg_header(make_jpeg_header(640, 480))
    assert (d["width"], d["height"], d["progressive"]) == (640, 480, False)
    d = decode_jpeg_header(make_jpeg_header(31, 1999, progressive=True))
    assert (d["width"], d["height"], d["progressive"]) == (31, 1999, True)
    # fill bytes before a marker are legal
    buf = make_jpeg_header(8, 8)
    padded = buf[:2] + b"\xff" + buf[2:]
    assert decode_jpeg_header(padded)["width"] == 8
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg_header(b"\x89PNG")
    with pytest.raises(ValueError, match="no SOF"):
        # SOI straight to SOS: dimensions are genuinely absent
        decode_jpeg_header(b"\xff\xd8\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00")

    df = spark.createDataFrame(
        [(1, bytearray(make_jpeg_header(320, 200))), (2, None)],
        "media_id int, content binary",
    )
    got = decode_media(df).orderBy("media_id").collect()
    assert (got[0]["dec_kind"], got[0]["dec_width"], got[0]["dec_height"]) == (
        "jpeg", 320, 200,
    )
    assert got[1]["dec_kind"] is None
    # strict mode no longer raises for JPEG — only undecodable formats
    strict = decode_media(
        spark.createDataFrame(
            [(1, bytearray(make_jpeg_header(2, 3)))], "media_id int, content binary"
        ),
        strict=True,
    ).collect()
    assert strict[0]["dec_width"] == 2


def test_streaming_decode(spark, multi_parquet, tmp_path):
    """Continuous decode: blocks appended over time are decoded as they
    land (complete blocks per micro-batch rides the per-file
    complete-block invariant), the decoded stream equals the source, and
    a restart from the same checkpoint reprocesses nothing."""
    from pyspark.sql import functions as F

    from d6tstack_spark.operators.encode import (
        build_manifest,
        encode_parquet_files,
    )
    from d6tstack_spark.operators.sinks import write_blocks
    from d6tstack_spark.streaming.decode_stream import start_decode_stream

    blocks_dir = str(tmp_path / "blocks")
    out_dir = str(tmp_path / "rows")
    ckpt = str(tmp_path / "ckpt")
    b1, manifest = encode_parquet_files(spark, multi_parquet[0])
    write_blocks(b1, blocks_dir)

    q = start_decode_stream(
        spark, blocks_dir, manifest, out_dir, ckpt, max_files_per_trigger=2
    )
    try:
        q.processAllAvailable()
        # late-arriving blocks (an incremental encode appending to the sink)
        b2, _ = encode_parquet_files(spark, multi_parquet[1])
        write_blocks(
            b2.withColumn("block_id", F.col("block_id") + F.lit(1 << 40)),
            blocks_dir, mode="append",
        )
        q.processAllAvailable()
    finally:
        q.stop()

    src = spark.read.parquet(multi_parquet[0], multi_parquet[1])
    got = spark.read.parquet(out_dir).drop("epoch")
    assert got.count() == src.count()
    pd.testing.assert_frame_equal(
        src.orderBy("conv_id", "turn_idx").toPandas(),
        got.orderBy("conv_id", "turn_idx").toPandas()[src.columns],
    )

    # restart from the same checkpoint: offsets are committed, nothing
    # reprocesses, output unchanged
    q2 = start_decode_stream(
        spark, blocks_dir, manifest, out_dir, ckpt, max_files_per_trigger=2
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(out_dir).drop("epoch").count() == src.count()

    # projection variant prunes columns
    out2 = str(tmp_path / "rows2")
    q3 = start_decode_stream(
        spark, blocks_dir, manifest, out2, str(tmp_path / "ckpt2"),
        columns=["conv_id", "turn_idx"],
    )
    try:
        q3.processAllAvailable()
    finally:
        q3.stop()
    cols = [c for c in spark.read.parquet(out2).columns if c != "epoch"]
    assert sorted(cols) == ["conv_id", "turn_idx"]


def test_stale_lease_break_serializes_on_marker(tmp_path):
    """Breaking a stale lease claims an O_EXCL .break marker first: a
    contender that finds a FRESH marker (another breaker mid-flight) must
    wait instead of unlinking — two contenders can no longer both break
    and end up as two live 'single writers'."""
    import json
    import threading
    import time as time_mod

    from d6tstack_spark.plans import checkpoint as cp

    state = str(tmp_path / "s")
    os.makedirs(state)
    lp = cp._lease_path(state)
    with open(lp, "w") as f:
        json.dump({"pid": 1, "host": "other-host"}, f)
    old = time_mod.time() - cp.LEASE_TTL_SEC - 5
    os.utime(lp, (old, old))
    bp = lp + ".break"
    open(bp, "w").close()  # fresh marker: a rival breaker holds the claim
    t0 = time_mod.time()
    t = threading.Thread(target=lambda: (time_mod.sleep(1.0), os.unlink(bp)))
    t.start()
    got = cp._acquire_lease(state)
    t.join()
    assert time_mod.time() - t0 >= 0.9  # waited for the marker holder
    assert got == lp and os.path.exists(lp)
    assert json.load(open(lp))["pid"] == os.getpid()
    os.unlink(lp)


def test_dead_breaker_marker_ages_out(tmp_path):
    """A breaker that died mid-break leaves its marker behind; contenders
    age it out after _BREAK_TTL_SEC instead of deadlocking."""
    import json
    import time as time_mod

    from d6tstack_spark.plans import checkpoint as cp

    state = str(tmp_path / "s")
    os.makedirs(state)
    lp = cp._lease_path(state)
    with open(lp, "w") as f:
        json.dump({"pid": 1, "host": "other-host"}, f)
    old = time_mod.time() - cp.LEASE_TTL_SEC - 5
    os.utime(lp, (old, old))
    bp = lp + ".break"
    open(bp, "w").close()
    bold = time_mod.time() - cp._BREAK_TTL_SEC - 2
    os.utime(bp, (bold, bold))
    got = cp._acquire_lease(state)
    assert got == lp and not os.path.exists(bp)
    assert json.load(open(lp))["pid"] == os.getpid()
    os.unlink(lp)


def test_heartbeat_detects_stolen_lease(tmp_path):
    """If a racing contender swaps the lock out from under a holder, the
    heartbeat flags the loss, check() raises at the next commit point,
    and release() refuses to unlink the thief's lock."""
    import json

    from d6tstack_spark.plans import checkpoint as cp

    state = str(tmp_path / "s")
    os.makedirs(state)
    lp = cp._acquire_lease(state)
    hb = cp._LeaseHeartbeat(lp, interval=3600)  # thread idle; check() drives
    try:
        hb.check()  # still ours — no error
        with open(lp, "w") as f:  # the swap
            json.dump({"pid": 99999, "host": "thief"}, f)
        with pytest.raises(RuntimeError, match="lease .* was lost"):
            hb.check()
    finally:
        hb.release()
    assert os.path.exists(lp)  # never unlink another writer's lock
    os.unlink(lp)
