"""Pure-python Iceberg snapshot-metadata reader (+ fixture writer).

The north rule's input is "Iceberg tables of transcripts". The sandbox has
no iceberg-spark-runtime jar, so the Spark catalog path in ``table_io`` is
dormant; this module reads the TABLE FORMAT itself — public spec
(iceberg.apache.org/spec): a ``metadata/*.metadata.json`` pointer file, a
snapshot's manifest-list Avro, and per-manifest Avro entries naming the
data files. That turns an Iceberg table directory into exactly what the
encode planner needs — the snapshot's data-file list with row counts —
without any JVM dependency (Avro via ``avro_lite``).

What this deliberately does NOT do: write table commits (atomic swap of
the metadata pointer belongs to a catalog), apply delete files (v2
merge-on-read), or evaluate partition-pruning expressions. Reads pick the
current snapshot (or an explicit ``snapshot_id`` — time travel) and skip
entries whose status is DELETED.
"""

from __future__ import annotations

import glob
import json
import os

from d6tstack_spark.sources.avro_lite import read_avro, write_avro

_DELETED = 2  # manifest entry status


def _strip_uri(p: str) -> str:
    if p.startswith("file://"):
        return p[len("file://") :]
    return p


def latest_metadata_path(table_dir: str) -> str:
    """The current ``*.metadata.json``: via ``version-hint.text`` when the
    (HadoopCatalog-style) hint exists, else the highest-versioned file."""
    meta_dir = os.path.join(table_dir, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        v = open(hint).read().strip()
        cand = os.path.join(meta_dir, f"v{v}.metadata.json")
        if os.path.exists(cand):
            return cand
    files = sorted(glob.glob(os.path.join(meta_dir, "*.metadata.json")))
    if not files:
        raise FileNotFoundError(f"no metadata/*.metadata.json under {table_dir}")
    return files[-1]


def table_metadata(table_dir: str) -> dict:
    with open(latest_metadata_path(table_dir)) as f:
        return json.load(f)


def is_iceberg_dir(path: str) -> bool:
    try:
        latest_metadata_path(path)
        return True
    except (FileNotFoundError, NotADirectoryError):
        return False


def snapshot_files_detail(
    table_dir: str, snapshot_id: int | None = None
) -> dict[str, list[dict]]:
    """All live files of a snapshot, keyed by content kind:
    ``{"data": [...], "position_deletes": [...], "equality_deletes": [...]}``
    with ``{path, record_count, file_size, sequence_number}`` per file.

    Follows metadata.json → manifest list → manifests, honoring entry
    status (DELETED entries are dropped) and the v2 ``content`` field
    (0/absent = data, 1 = position deletes, 2 = equality deletes).
    Data sequence numbers follow the spec's inheritance rule: a null
    entry-level ``sequence_number`` inherits the manifest-list entry's;
    v1 trees with no sequence numbers at all read as 0 — delete scoping
    (table_io) then degrades to apply-everywhere, which is the correct
    v1-reading-as-v2 behavior since v1 cannot contain delete files.
    ``snapshot_id=None`` reads the current snapshot; passing an id is time
    travel over retained snapshots."""
    md = table_metadata(table_dir)
    sid = snapshot_id if snapshot_id is not None else md.get("current-snapshot-id")
    snaps = {s["snapshot-id"]: s for s in md.get("snapshots", [])}
    if sid not in snaps:
        raise KeyError(f"snapshot {sid} not in table (have {sorted(snaps)})")
    snap = snaps[sid]
    out: dict[str, list[dict]] = {
        "data": [],
        "position_deletes": [],
        "equality_deletes": [],
    }
    kinds = {0: "data", 1: "position_deletes", 2: "equality_deletes"}
    if "manifest-list" in snap:
        manifests, _ = read_avro(_strip_uri(snap["manifest-list"]))
        manifest_paths = [
            (_strip_uri(m["manifest_path"]), m.get("sequence_number"))
            for m in manifests
        ]
    else:  # pre-manifest-list layout (spec v1 "manifests" inline)
        manifest_paths = [(_strip_uri(p), None) for p in snap.get("manifests", [])]
    for mp, mseq in manifest_paths:
        entries, _ = read_avro(mp)
        for e in entries:
            if e.get("status") == _DELETED:
                continue
            df = e["data_file"]
            seq = e.get("sequence_number")
            if seq is None:  # spec inheritance from the manifest-list entry
                seq = mseq
            out[kinds.get(df.get("content") or 0, "data")].append(
                {
                    "path": _strip_uri(df["file_path"]),
                    "record_count": df.get("record_count"),
                    "file_size": df.get("file_size_in_bytes"),
                    "sequence_number": 0 if seq is None else int(seq),
                }
            )
    return out


def snapshot_data_files(
    table_dir: str, snapshot_id: int | None = None
) -> list[dict]:
    """Data files of a snapshot (see :func:`snapshot_files_detail`)."""
    return snapshot_files_detail(table_dir, snapshot_id)["data"]


def snapshot_added_files(
    table_dir: str, from_snapshot_id: int, to_snapshot_id: int | None = None
) -> list[str]:
    """Data files present in ``to`` but not in ``from`` — the incremental
    ingest set. Feed it to ``plans.checkpoint.encode_resume``: only the
    appended files' blocks encode, and block ids stay stable because the
    checkpoint pins per-file indices."""
    old = {f["path"] for f in snapshot_data_files(table_dir, from_snapshot_id)}
    new = snapshot_data_files(table_dir, to_snapshot_id)
    return sorted(f["path"] for f in new if f["path"] not in old)


# ---------------------------------------------------------------------------
# fixture writer — a real (minimal) Iceberg metadata tree over parquet files
# ---------------------------------------------------------------------------

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"]},
    ],
}

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": ["null", "int"]},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}


def write_iceberg_table_minimal(
    table_dir: str,
    data_files: list[str],
    snapshot_id: int = 1,
    deleted_files: list[str] | None = None,
    position_deletes: dict[str, list[int]] | None = None,
    equality_deletes=None,
    file_sequences: dict[str, int] | None = None,
    position_delete_sequence: int | None = None,
    equality_delete_sequence: int | None = None,
) -> str:
    """Build a spec-shaped Iceberg metadata tree over existing parquet files
    (metadata.json + manifest-list Avro + manifest Avro + version hint).
    ``deleted_files`` become DELETED-status entries — they must be skipped
    by readers, which the tests assert. ``position_deletes`` maps a data
    file path to 0-based row positions: a v2 position-delete parquet
    (columns file_path, pos — spec §position-delete-files) is written and
    manifested with content=1; merge-on-read readers must drop those rows.
    ``equality_deletes`` is an Arrow table of key rows (its column names
    are the equality ids): written as a content=2 delete file — readers
    drop every data row equal to a delete row on those columns.
    ``file_sequences`` overrides the data sequence number per data file
    (default: this snapshot's id); ``*_delete_sequence`` override the
    delete files' sequence numbers — together they let fixtures model
    rows re-inserted AFTER a delete was committed, which spec-correct
    readers must keep (delete scoping by sequence number)."""
    import pyarrow as _pa
    import pyarrow.parquet as pq

    meta_dir = os.path.join(table_dir, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    fseq = {os.path.abspath(k): v for k, v in (file_sequences or {}).items()}
    entries = []
    for p in sorted(data_files):
        pf = pq.ParquetFile(p)
        entries.append(
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "sequence_number": fseq.get(os.path.abspath(p), snapshot_id),
                "data_file": {
                    "content": 0,
                    "file_path": os.path.abspath(p),
                    "file_format": "PARQUET",
                    "record_count": pf.metadata.num_rows,
                    "file_size_in_bytes": os.path.getsize(p),
                },
            }
        )
    for p in sorted(deleted_files or []):
        entries.append(
            {
                "status": _DELETED,
                "snapshot_id": snapshot_id,
                "sequence_number": snapshot_id,
                "data_file": {
                    "content": 0,
                    "file_path": os.path.abspath(p),
                    "file_format": "PARQUET",
                    "record_count": 0,
                    "file_size_in_bytes": 0,
                },
            }
        )
    if position_deletes:
        fp, pos = [], []
        for p in sorted(position_deletes):
            for i in sorted(position_deletes[p]):
                fp.append(os.path.abspath(p))
                pos.append(i)
        dpath = os.path.join(meta_dir, f"pos-delete-{snapshot_id}.parquet")
        pq.write_table(
            _pa.table(
                {
                    "file_path": _pa.array(fp, _pa.string()),
                    "pos": _pa.array(pos, _pa.int64()),
                }
            ),
            dpath,
        )
        entries.append(
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "sequence_number": (
                    position_delete_sequence
                    if position_delete_sequence is not None
                    else snapshot_id
                ),
                "data_file": {
                    "content": 1,
                    "file_path": dpath,
                    "file_format": "PARQUET",
                    "record_count": len(pos),
                    "file_size_in_bytes": os.path.getsize(dpath),
                },
            }
        )
    if equality_deletes is not None:
        epath = os.path.join(meta_dir, f"eq-delete-{snapshot_id}.parquet")
        pq.write_table(equality_deletes, epath)
        entries.append(
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "sequence_number": (
                    equality_delete_sequence
                    if equality_delete_sequence is not None
                    else snapshot_id
                ),
                "data_file": {
                    "content": 2,
                    "file_path": epath,
                    "file_format": "PARQUET",
                    "record_count": equality_deletes.num_rows,
                    "file_size_in_bytes": os.path.getsize(epath),
                },
            }
        )
    manifest = os.path.join(meta_dir, f"manifest-{snapshot_id}.avro")
    write_avro(manifest, entries, _MANIFEST_ENTRY_SCHEMA)
    mlist = os.path.join(meta_dir, f"snap-{snapshot_id}.avro")
    write_avro(
        mlist,
        [
            {
                "manifest_path": manifest,
                "manifest_length": os.path.getsize(manifest),
                "partition_spec_id": 0,
                "added_snapshot_id": snapshot_id,
                "sequence_number": snapshot_id,
            }
        ],
        _MANIFEST_FILE_SCHEMA,
    )
    # retain prior snapshots (time travel) — a real commit appends to the
    # snapshot log the same way
    prior: list[dict] = []
    if is_iceberg_dir(table_dir):
        prior = [
            s
            for s in table_metadata(table_dir).get("snapshots", [])
            if s["snapshot-id"] != snapshot_id
        ]
    md = {
        "format-version": 1,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": os.path.abspath(table_dir),
        "last-updated-ms": 0,
        "current-snapshot-id": snapshot_id,
        "snapshots": prior
        + [
            {
                "snapshot-id": snapshot_id,
                "timestamp-ms": 0,
                "manifest-list": mlist,
            }
        ],
    }
    with open(os.path.join(meta_dir, f"v{snapshot_id}.metadata.json"), "w") as f:
        json.dump(md, f, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(snapshot_id))
    return table_dir
