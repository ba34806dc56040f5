"""Distributed per-column encode/decode over Spark — the engine core.

Pipeline (SURVEY.md §3.2 "Spark lifecycle equivalent" of d6tstack's
to_parquet_combine, reference combine_csv.py:459-504):

    physicalize (ts→µs int64, date→days, bool→i8; Catalyst Cast nodes)
    → assign block_id = pmod(xxhash64(bucket_col), B)·SALT_SPAN + salt
      (salt splits skewed bucket keys by order_col range — explicit skew
       handling; AQE skew-join does not cover mapInArrow stages)
    → repartition(B, block_id) · sortWithinPartitions(block_id, *order_cols)
      (the reference's deterministic np.sort file ordering, combine_csv.py:62,
       re-expressed as a stable per-block sort)
    → mapInArrow(encode): one pass, streaming per-block flush; per column:
      sniff → auto-select codec → encode → block row
    → blocks DataFrame (binary payload + codec manifest columns)

Decode is the exact inverse; every column round-trips bit-identical
(null bitmaps, NaN payloads, µs timestamps). Timestamps are held as int64
µs on the Spark side (F.unix_micros/F.timestamp_micros) so pandas/Arrow
never coerces them (SURVEY.md §7 "hard parts").

All heavy work is vectorized: Arrow batches in, numpy kernels inside, Arrow
batches out — no per-row Python (input_hint).
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F, types as T

from d6tstack_spark.codecs.blocks import Block, decode_block, encode_block

SALT_SPAN = 4096  # max sub-blocks a skewed bucket can split into

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("block_id", T.LongType(), False),
        T.StructField("column", T.StringType(), False),
        T.StructField("codec", T.StringType(), False),
        T.StructField("params", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("null_count", T.LongType(), False),
        T.StructField("raw_bytes", T.LongType(), False),
        T.StructField("enc_bytes", T.LongType(), False),
        T.StructField("crc", T.LongType(), False),
        # zone map: conservative per-block value bounds (null = no stats).
        # Numerics (incl. ts/date/bool physicalized to ints) use the _num
        # pair widened by 1 ulp; strings/binary use the _str pair with a
        # parquet-style truncate-and-increment upper bound.
        T.StructField("vmin_num", T.DoubleType(), True),
        T.StructField("vmax_num", T.DoubleType(), True),
        T.StructField("vmin_str", T.BinaryType(), True),
        T.StructField("vmax_str", T.BinaryType(), True),
    ]
)

_BLOCKS_ARROW = pa.schema(
    [
        ("block_id", pa.int64()),
        ("column", pa.string()),
        ("codec", pa.string()),
        ("params", pa.string()),
        ("payload", pa.binary()),
        ("n_rows", pa.int64()),
        ("null_count", pa.int64()),
        ("raw_bytes", pa.int64()),
        ("enc_bytes", pa.int64()),
        ("crc", pa.int64()),
        ("vmin_num", pa.float64()),
        ("vmax_num", pa.float64()),
        ("vmin_str", pa.binary()),
        ("vmax_str", pa.binary()),
    ]
)

# zone-map string bounds are capped (long text values would bloat the
# metadata table); the upper bound uses truncate-then-increment so it
# remains a true upper bound after the cut
_STAT_STR_CAP = 64


def _stat_upper_bytes(hi: bytes) -> bytes | None:
    """Parquet-style truncated upper bound: short values pass through
    UNCHANGED (this is NOT a prefix bound); longer ones increment the last
    non-0xFF byte of the 64-byte prefix; all-0xFF means unbounded (None)."""
    if len(hi) <= _STAT_STR_CAP:
        return hi
    return _prefix_upper_bytes(hi[:_STAT_STR_CAP])


def _prefix_upper_bytes(p: bytes) -> bytes | None:
    """Strict upper bound for EVERY byte string starting with prefix
    ``p``: increment the last non-0xFF byte and truncate after it
    (``b"g0"`` → ``b"g1"``; any ``"g0..."`` sorts below ``"g1"``).
    All-0xFF prefixes are unbounded above (None)."""
    for i in range(len(p) - 1, -1, -1):
        if p[i] != 0xFF:
            return p[:i] + bytes([p[i] + 1])
    return None


def _block_stats(arr: pa.Array, ptype: str) -> dict:
    """Conservative zone map of one block column — an optimization only:
    any failure or unsupported type degrades to null stats (= never
    pruned), so decode correctness cannot depend on it."""
    import math

    import pyarrow.compute as pc

    out = {"vmin_num": None, "vmax_num": None, "vmin_str": None, "vmax_str": None}
    try:
        if ptype in ("i8", "i16", "i32", "i64", "f32", "f64"):
            nn = arr.drop_null()
            if len(nn) == 0:
                return out
            mm = pc.min_max(nn)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            if lo is None or hi is None:
                return out
            flo, fhi = float(lo), float(hi)
            if math.isnan(flo) or math.isnan(fhi):
                # all-NaN block (min_max skips NaN like parquet stats do;
                # only an all-NaN column yields NaN bounds) — no stats
                return out
            # widen 1 ulp: int64 beyond 2^53 rounds in float64, and a
            # rounded-INWARD bound would wrongly prune boundary values
            out["vmin_num"] = float(np.nextafter(flo, -math.inf))
            out["vmax_num"] = float(np.nextafter(fhi, math.inf))
        elif ptype in ("str", "bin"):
            nn = arr.drop_null()
            if len(nn) == 0:
                return out
            mm = pc.min_max(nn)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            if lo is None or hi is None:
                return out
            if isinstance(lo, str):
                lo, hi = lo.encode(), hi.encode()
            out["vmin_str"] = lo[:_STAT_STR_CAP]
            out["vmax_str"] = _stat_upper_bytes(hi)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        pass
    return out

# ---------------------------------------------------------------------------
# schema physicalization
# ---------------------------------------------------------------------------

_PTYPE_OF_SPARK = {
    "string": "str",
    "binary": "bin",
    "tinyint": "i8",
    "smallint": "i16",
    "int": "i32",
    "bigint": "i64",
    "float": "f32",
    "double": "f64",
}

_PHYS_SPARK_TYPE = {
    "str": T.StringType(),
    "bin": T.BinaryType(),
    "i8": T.ByteType(),
    "i16": T.ShortType(),
    "i32": T.IntegerType(),
    "i64": T.LongType(),
    "f32": T.FloatType(),
    "f64": T.DoubleType(),
    "f32list": T.ArrayType(T.FloatType()),
    "f64list": T.ArrayType(T.DoubleType()),
}

_PHYS_ARROW_TYPE = {
    "str": pa.string(),
    "bin": pa.binary(),
    "i8": pa.int8(),
    "i16": pa.int16(),
    "i32": pa.int32(),
    "i64": pa.int64(),
    "f32": pa.float32(),
    "f64": pa.float64(),
    "f32list": pa.list_(pa.float32()),
    "f64list": pa.list_(pa.float64()),
}


def build_manifest(schema: T.StructType) -> dict:
    """Column → {ptype, logical} map. ``logical`` records how to restore the
    original Spark type after decode; ``ptype='any'`` means the column is
    carried through the Arrow-IPC fallback codec (nested types)."""
    manifest: dict[str, dict] = {}
    for f in schema.fields:
        s = f.dataType.simpleString()
        if s in _PTYPE_OF_SPARK:
            manifest[f.name] = {"ptype": _PTYPE_OF_SPARK[s], "logical": None}
        elif s == "array<float>":
            manifest[f.name] = {"ptype": "f32list", "logical": None}
        elif s == "array<double>":
            manifest[f.name] = {"ptype": "f64list", "logical": None}
        elif s == "timestamp":
            manifest[f.name] = {"ptype": "i64", "logical": "ts"}
        elif s == "timestamp_ntz":
            manifest[f.name] = {"ptype": "i64", "logical": "ts_ntz"}
        elif s == "date":
            manifest[f.name] = {"ptype": "i32", "logical": "date"}
        elif s == "boolean":
            manifest[f.name] = {"ptype": "i8", "logical": "bool"}
        else:
            manifest[f.name] = {"ptype": "any", "logical": s}
    return manifest


def _physicalize(df: DataFrame, manifest: dict) -> DataFrame:
    cols = []
    for name, m in manifest.items():
        c = F.col(name)
        if m["logical"] == "ts":
            c = F.unix_micros(c)
        elif m["logical"] == "ts_ntz":
            # session TZ is pinned UTC (session.py) so this cast is exact
            c = F.unix_micros(c.cast("timestamp"))
        elif m["logical"] == "date":
            c = F.unix_date(c)
        elif m["logical"] == "bool":
            c = c.cast("tinyint")
        cols.append(c.alias(name))
    return df.select(*cols)


def _restore_logical(df: DataFrame, manifest: dict) -> DataFrame:
    cols = []
    for name, m in manifest.items():
        c = F.col(name)
        if m["logical"] == "ts":
            c = F.timestamp_micros(c)
        elif m["logical"] == "ts_ntz":
            c = F.timestamp_micros(c).cast("timestamp_ntz")
        elif m["logical"] == "date":
            c = F.date_from_unix_date(c)
        elif m["logical"] == "bool":
            c = c.cast("boolean")
        cols.append(c.alias(name))
    return df.select(*cols)


# ---------------------------------------------------------------------------
# block assignment (bucketing + skew salting)
# ---------------------------------------------------------------------------


def assign_block_ids(
    df: DataFrame,
    bucket_col: str,
    order_col: str,
    num_blocks: int,
    skew_max_rows: int | None = None,
) -> DataFrame:
    """Add ``__block_id``. Hot bucket keys (> skew_max_rows rows) are salted
    by ``floor(order_col / skew_max_rows)`` so one conversation never pins a
    single task — the explicit skew discipline the north rule requires.

    The hot-key detection is a map-side-combinable count (cheap at any
    scale); the hot list is tiny by construction and ships as an isin()
    literal (broadcast-equivalent)."""
    bid = F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(num_blocks))
    salt = F.lit(0)
    if skew_max_rows:
        hot = [
            r[0]
            for r in df.groupBy(bucket_col)
            .count()
            .filter(F.col("count") > skew_max_rows)
            .select(bucket_col)
            .collect()
        ]
        if hot:
            salt = F.when(
                F.col(bucket_col).isin(hot),
                F.pmod(
                    F.floor(F.col(order_col) / F.lit(skew_max_rows)),
                    F.lit(SALT_SPAN),
                ),
            ).otherwise(F.lit(0))
    return df.withColumn("__block_id", bid * SALT_SPAN + salt)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _extract_values(arr: pa.Array, ptype: str) -> tuple[np.ndarray, np.ndarray | None]:
    """Arrow array → (numpy values with nulls zero/None-filled, validity)."""
    import pyarrow.compute as pc

    valid = None
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
    if ptype in ("str", "bin"):
        values = arr.cast(pa.binary()).to_numpy(zero_copy_only=False)
        if valid is not None:
            values = values.copy()
            values[~valid] = b""
        return values, valid
    fill = 0
    filled = pc.fill_null(arr, fill) if arr.null_count else arr
    return filled.to_numpy(zero_copy_only=False), valid


# per-column payload budget per block: 1 GiB keeps every Arrow int32 string
# offset far below 2^31 (combine_chunks / binary casts raise "offset
# overflow" past that). Module-level so tests can shrink it.
MAX_BLOCK_COL_BYTES = 1 << 30
# low bits of every block id reserved for the oversized-block sub-index
SUB_BLOCK_BITS = 8


def _split_oversized(
    tbl: pa.Table, manifest: dict, budget: int | None = None
) -> list[pa.Table]:
    """Row-slice a block whose largest column exceeds MAX_BLOCK_COL_BYTES —
    transcripts with multi-MB turns can push one column of one block past
    Arrow's int32 offset limit; sub-blocks restore the invariant every codec
    kernel assumes. nbytes works on chunked columns (no combine needed).

    Splits RECURSIVELY: an equal-row-count cut assumes uniform bytes/row,
    but one multi-GB row among small ones leaves a sub-slice still over
    budget — each part is re-checked and re-split until every part fits
    (a single row over budget is irreducible and passes through; Arrow's
    offset limit then surfaces at encode, as it would for any engine)."""
    if budget is None:
        budget = MAX_BLOCK_COL_BYTES

    def _split(t: pa.Table) -> list[pa.Table]:
        worst = max((t.column(n).nbytes for n in manifest), default=0)
        if worst <= budget or t.num_rows <= 1:
            return [t]
        parts = min(-(-worst // budget), t.num_rows)
        step = -(-t.num_rows // parts)
        out: list[pa.Table] = []
        for i in range(0, t.num_rows, step):
            out.extend(_split(t.slice(i, step)))
        return out

    parts = _split(tbl)
    if len(parts) > (1 << SUB_BLOCK_BITS):
        raise ValueError(
            f"block needs {len(parts)} sub-blocks (> {1 << SUB_BLOCK_BITS}): "
            "one scan split carries >256x the per-column byte budget — lower "
            "row_groups_per_split / target_block_rows instead"
        )
    return parts


def _encode_one_block(
    tbl: pa.Table,
    block_id: int,
    manifest: dict,
    codec_overrides: dict,
    budget: int | None = None,
    shared_tables: dict | None = None,
) -> list[dict]:
    """Encode one logical block; oversized blocks are auto-split into
    sub-blocks with ids (block_id << SUB_BLOCK_BITS) | sub — every caller's
    id scheme reserves the low byte for this. ``budget`` is captured into
    encoder closures at plan time (executor workers re-import this module,
    so a module-global override would never reach them)."""
    parts = _split_oversized(tbl, manifest, budget)
    rows: list[dict] = []
    for sub, part in enumerate(parts):
        rows.extend(
            _encode_single(
                part, (block_id << SUB_BLOCK_BITS) | sub, manifest,
                codec_overrides, shared_tables,
            )
        )
    return rows


def _encode_single(
    tbl: pa.Table, block_id: int, manifest: dict, codec_overrides: dict,
    shared_tables: dict | None = None,
) -> list[dict]:
    from d6tstack_spark.codecs.blocks import encode_block_arrow

    rows = []
    for name, m in manifest.items():
        arr = tbl.column(name).combine_chunks()
        ptype = m["ptype"]
        if ptype == "any":
            blk = _encode_arrow_fallback(arr)
        elif ptype in ("f32list", "f64list"):
            from d6tstack_spark.codecs.blocks import encode_block_floatlist

            # null ELEMENTS inside lists are rare enough that the arrow
            # container carries them; null lists ride the validity bitmap
            if len(arr) and arr.flatten().null_count:
                blk = _encode_arrow_fallback(arr)
            else:
                blk = encode_block_floatlist(
                    arr.cast(_PHYS_ARROW_TYPE[ptype]), ptype
                )
        elif ptype in ("str", "bin"):
            # arrow-native fast path: the column never becomes python objects
            blk = encode_block_arrow(
                arr.cast(pa.binary()), ptype, codec_overrides.get(name),
                fsst_table=(shared_tables or {}).get(name),
            )
        else:
            values, valid = _extract_values(arr, ptype)
            blk = encode_block(values, valid, ptype, codec_overrides.get(name))
        rows.append(
            {
                "block_id": block_id,
                "column": name,
                "codec": blk.codec,
                "params": blk.params,
                "payload": blk.payload,
                "n_rows": blk.n_rows,
                "null_count": blk.null_count,
                "raw_bytes": blk.raw_bytes,
                "enc_bytes": blk.enc_bytes,
                "crc": blk.crc,
                **_block_stats(arr, ptype),
            }
        )
    return rows


def _encode_arrow_fallback(arr: pa.Array) -> Block:
    """Container codec for types outside the kernel set (arrays/maps/structs):
    Arrow IPC stream of the single column. Nulls ride the IPC buffers."""
    import io
    import zlib

    sink = io.BytesIO()
    t = pa.table({"v": arr})
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    payload = sink.getvalue()
    return Block(
        codec="arrow",
        params="{}",
        payload=payload,
        n_rows=len(arr),
        null_count=arr.null_count,
        raw_bytes=arr.nbytes,
        enc_bytes=len(payload),
        crc=zlib.crc32(payload),
    )


def _decode_arrow_fallback(payload: bytes) -> pa.Array:
    import io

    with pa.ipc.open_stream(io.BytesIO(payload)) as r:
        t = r.read_all()
    return t.column("v").combine_chunks()


def _make_encoder(
    manifest: dict, codec_overrides: dict | None, budget: int | None = None
):
    codec_overrides = codec_overrides or {}

    def encode_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pa.set_cpu_count(1)  # workers are the parallelism
        out_rows: list[dict] = []
        buf: list[pa.RecordBatch] = []
        cur_id: int | None = None

        def flush():
            nonlocal buf, cur_id
            if cur_id is None or not buf:
                return
            tbl = pa.Table.from_batches(buf)
            out_rows.extend(
                _encode_one_block(tbl, cur_id, manifest, codec_overrides, budget)
            )
            buf = []

        for batch in batches:
            ids = batch.column("__block_id").to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                continue
            # boundaries inside the (block-sorted) batch
            starts = np.flatnonzero(np.diff(ids) != 0) + 1
            bounds = np.concatenate(([0], starts, [len(ids)]))
            for i in range(len(bounds) - 1):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                bid = int(ids[lo])
                if cur_id is not None and bid != cur_id:
                    flush()
                cur_id = bid
                buf.append(batch.slice(lo, hi - lo))
        flush()
        if out_rows:
            cols = {k: [r[k] for r in out_rows] for k in _BLOCKS_ARROW.names}
            yield pa.RecordBatch.from_pydict(cols, schema=_BLOCKS_ARROW)

    return encode_fn


def _make_local_encoder(
    manifest: dict,
    codec_overrides: dict | None,
    order_cols: tuple[str, ...],
    target_rows: int,
    budget: int | None = None,
    shared_tables: dict | None = None,
):
    """Shuffle-free encoder: blocks are carved from the task's own scan
    stream (~target_rows each), sorted by order_cols in-memory, block_id =
    partitionId · 2^32 + seq. This is the 100 TB path: a pure map job over
    Iceberg/parquet splits — no shuffle of the raw data, no skew (a hot
    conversation simply spans consecutive blocks), linear scaling."""
    codec_overrides = codec_overrides or {}
    sort_keys = [(c, "ascending") for c in order_cols]

    def encode_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        pa.set_cpu_count(1)  # workers are the parallelism
        pid = TaskContext.get().partitionId()
        seq = 0
        buf: list[pa.RecordBatch] = []
        buffered = 0

        def flush():
            nonlocal buf, buffered, seq
            if not buf:
                return None
            tbl = pa.Table.from_batches(buf).sort_by(sort_keys)
            rows = _encode_one_block(
                tbl, (pid << 32) | seq, manifest, codec_overrides, budget,
                shared_tables,
            )
            seq += 1
            buf = []
            buffered = 0
            cols = {k: [r[k] for r in rows] for k in _BLOCKS_ARROW.names}
            return pa.RecordBatch.from_pydict(cols, schema=_BLOCKS_ARROW)

        for batch in batches:
            buf.append(batch)
            buffered += batch.num_rows
            if buffered >= target_rows:
                out = flush()
                if out is not None:
                    yield out
        out = flush()
        if out is not None:
            yield out

    return encode_fn


def encode_table(
    df: DataFrame,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    bucket_col: str | None = None,
    num_blocks: int | None = None,
    codec_overrides: dict | None = None,
    skew_max_rows: int | None = 1_000_000,
    mode: str = "local",
    target_block_rows: int = 65536,
    max_block_col_bytes: int | None = None,
    shared_fsst_tables: dict | None = None,
) -> tuple[DataFrame, dict]:
    """Encode every column of ``df`` into a blocks DataFrame.

    ``shared_fsst_tables`` ({column: code-ordered token list}) lets a
    caller reuse the two-pass shared-table FSST scheme on the DataFrame
    path — e.g. pass ``build_shared_fsst_tables(paths, manifest)`` when
    the DataFrame is a parquet scan. The scan-fused
    :func:`encode_parquet_files` builds them automatically; here the
    engine cannot sample the input deterministically (an unordered
    ``limit`` varies run to run, which would break bitwise-deterministic
    blocks), so the sample stays in the caller's hands.

    Returns ``(blocks_df, manifest)``; ``manifest`` is required by
    :func:`decode_table`. Lazy: nothing executes until an action.

    mode="local" (default): shuffle-free — each scan split encodes its own
    blocks (sorted by order_cols within the block). The raw table never
    shuffles; this is the only strategy that survives 100 TB, and skew is a
    non-issue because blocks are size-bounded by construction.

    mode="cluster": repartition by hashed+salted bucket_col so each
    conversation's turns co-locate (maximal run lengths on the bucket
    column), with explicit skew salting. Costs a full shuffle of the raw
    data — use when block/bucket alignment matters more than the shuffle.
    """
    manifest = build_manifest(df.schema)
    phys = _physicalize(df, manifest)
    if mode == "local":
        blocks = phys.mapInArrow(
            _make_local_encoder(
                manifest, codec_overrides, order_cols, target_block_rows,
                max_block_col_bytes, shared_fsst_tables,
            ),
            BLOCKS_SCHEMA,
        )
        return blocks, manifest
    if mode != "cluster":
        raise ValueError(f"unknown mode {mode!r}; valid: 'local', 'cluster'")
    bucket_col = bucket_col or order_cols[0]
    if num_blocks is None:
        num_blocks = max(df.sparkSession.sparkContext.defaultParallelism * 2, 8)
    withid = assign_block_ids(
        phys, bucket_col, order_cols[-1], num_blocks, skew_max_rows
    )
    blocks = (
        withid.repartition(num_blocks, "__block_id")
        .sortWithinPartitions("__block_id", *order_cols)
        .mapInArrow(
            _make_encoder(manifest, codec_overrides, max_block_col_bytes),
            BLOCKS_SCHEMA,
        )
    )
    return blocks, manifest


# ---------------------------------------------------------------------------
# scan-fused encode (the 100 TB fast path)
# ---------------------------------------------------------------------------


def build_manifest_arrow(schema: pa.Schema) -> dict:
    """Arrow-schema variant of :func:`build_manifest`."""
    _MAP = {
        pa.string(): "str",
        pa.large_string(): "str",
        pa.binary(): "bin",
        pa.int8(): "i8",
        pa.int16(): "i16",
        pa.int32(): "i32",
        pa.int64(): "i64",
        pa.float32(): "f32",
        pa.float64(): "f64",
    }
    manifest: dict[str, dict] = {}
    for f in schema:
        if f.type in _MAP:
            manifest[f.name] = {"ptype": _MAP[f.type], "logical": None}
        elif (pa.types.is_list(f.type) or pa.types.is_large_list(f.type)) and (
            pa.types.is_float32(f.type.value_type)
            or pa.types.is_float64(f.type.value_type)
        ):
            ptype = "f32list" if pa.types.is_float32(f.type.value_type) else "f64list"
            manifest[f.name] = {"ptype": ptype, "logical": None}
        elif pa.types.is_timestamp(f.type):
            manifest[f.name] = {
                "ptype": "i64",
                "logical": "ts" if f.type.tz else "ts_ntz",
            }
        elif pa.types.is_date32(f.type) or pa.types.is_date64(f.type):
            manifest[f.name] = {"ptype": "i32", "logical": "date"}
        elif pa.types.is_boolean(f.type):
            manifest[f.name] = {"ptype": "i8", "logical": "bool"}
        else:
            manifest[f.name] = {"ptype": "any", "logical": _spark_type_str(f.type)}
    return manifest


def _spark_type_str(t: pa.DataType) -> str:
    """Spark simpleString for the arrow types the 'any' fallback carries."""
    _S = {
        pa.string(): "string", pa.binary(): "binary", pa.int8(): "tinyint",
        pa.int16(): "smallint", pa.int32(): "int", pa.int64(): "bigint",
        pa.float32(): "float", pa.float64(): "double", pa.bool_(): "boolean",
    }
    if t in _S:
        return _S[t]
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{_spark_type_str(t.value_type)}>"
    if pa.types.is_timestamp(t):
        return "timestamp"
    raise ValueError(f"unsupported arrow type for fused encode: {t}")


def plan_parquet_splits(
    paths: list[str],
    row_groups_per_split: int = 2,
    file_indices: dict[str, int] | None = None,
) -> list[tuple]:
    """Driver-side split planning from parquet footers: deterministic
    (sorted paths — the d6tstack np.sort(fname_list) discipline,
    reference combine_csv.py:62), one split = N row groups. On Iceberg this
    is the snapshot's file+split list instead.

    ``file_indices`` pins each path's file_idx (checkpoint/resume persists
    this map so block ids stay stable when files are added between runs);
    default = position in the sorted path list."""
    import pyarrow.parquet as pq

    splits = []
    for fi, p in enumerate(sorted(paths)):
        if file_indices is not None:
            fi = file_indices[p]
        nrg = pq.ParquetFile(p).metadata.num_row_groups
        for rg in range(0, nrg, row_groups_per_split):
            splits.append((fi, p, rg, min(row_groups_per_split, nrg - rg)))
    return splits


def build_shared_fsst_tables(
    paths: list[str], manifest: dict, sample_rows: int = 16384
) -> dict[str, list[bytes]]:
    """Driver-side pass 0 of the two-pass shared-table FSST scheme: one
    symbol table per string column, built from the first row group of the
    first (sorted) path. Deterministic for a given input set, and stable
    under resume as long as no new file sorts before the original first
    file — and even then only COMPRESSION varies, never correctness:
    blocks embed whichever table encoded them."""
    import pyarrow.parquet as pq

    from d6tstack_spark.codecs.kernels import build_fsst_table

    str_cols = [n for n, m in manifest.items() if m["ptype"] in ("str", "bin")]
    if not str_cols:
        return {}
    f = pq.ParquetFile(sorted(paths)[0])
    present = [c for c in str_cols if c in f.schema_arrow.names]
    if f.metadata.num_row_groups == 0 or not present:
        return {}
    t = f.read_row_group(0, columns=present, use_threads=False)
    out: dict[str, list[bytes]] = {}
    for c in present:
        arr = (
            t.column(c).combine_chunks().drop_null().cast(pa.binary())
        )
        tbl = build_fsst_table(arr.slice(0, sample_rows))
        if tbl:
            out[c] = tbl
    return out


def _make_fused_encoder(manifest: dict, codec_overrides: dict | None,
                        order_cols: tuple[str, ...],
                        budget: int | None = None,
                        shared_tables: dict | None = None):
    codec_overrides = codec_overrides or {}
    sort_keys = [(c, "ascending") for c in order_cols if c in manifest]

    def fused(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.parquet as pq

        # the workers ARE the parallelism: one arrow thread each, or 32
        # workers × 32-thread pools thrash every cache level
        pa.set_cpu_count(1)
        pa.set_io_thread_count(1)
        files: dict[str, pq.ParquetFile] = {}
        for b in batches:
            for row in b.to_pylist():
                f = files.get(row["path"])
                if f is None:
                    f = files.setdefault(row["path"], pq.ParquetFile(row["path"]))
                t = f.read_row_groups(
                    range(row["rg"], row["rg"] + row["nrg"]), use_threads=False
                )
                if sort_keys:
                    sk = [s for s in sort_keys if s[0] in t.column_names]
                    if sk:
                        t = t.sort_by(sk)
                cols = {}
                for name, m in manifest.items():
                    if name not in t.column_names:
                        # schema evolution: this source file predates (or
                        # never had) the column — write an explicit all-null
                        # block so the block stays complete on disk and the
                        # per-file decode invariant holds
                        cols[name] = pa.nulls(len(t), type=_null_arrow_type(m))
                        continue
                    arr = t.column(name)
                    if m["logical"] in ("ts", "ts_ntz"):
                        # normalize the source unit first: parquet files may
                        # carry ns (pandas default) or ms timestamps, and a
                        # bare int64 cast would keep that unit while decode
                        # restores with timestamp_micros — silently 1000x off
                        tz = arr.type.tz if hasattr(arr.type, "tz") else None
                        arr = arr.cast(pa.timestamp("us", tz=tz)).cast(pa.int64())
                    elif m["logical"] == "date":
                        arr = arr.cast(pa.date32()).cast(pa.int32())
                    elif m["logical"] == "bool":
                        arr = arr.cast(pa.int8())
                    cols[name] = arr
                block_id = (int(row["file_idx"]) << 32) | int(row["rg"])
                rows = _encode_one_block(
                    pa.table(cols), block_id, manifest, codec_overrides,
                    budget, shared_tables,
                )
                out = {k: [r[k] for r in rows] for k in _BLOCKS_ARROW.names}
                yield pa.RecordBatch.from_pydict(out, schema=_BLOCKS_ARROW)

    return fused


def encode_parquet_files(
    spark,
    paths: list[str] | str,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    codec_overrides: dict | None = None,
    row_groups_per_split: int = 2,
    output_partitions: int | None = None,
    max_block_col_bytes: int | None = None,
) -> tuple[DataFrame, dict]:
    """Scan-fused encode: the driver plans (file, row-group) splits from
    parquet footers; each task reads its split with pyarrow directly and
    encodes it — the raw table never crosses the JVM↔Python boundary and
    never shuffles. This is the throughput path for bulk encode jobs
    (bench.py uses it); :func:`encode_table` is the DataFrame-native path
    for encoding arbitrary query results.

    Block id = (file_idx<<32 | first_row_group) << SUB_BLOCK_BITS | sub —
    deterministic under retries (sub > 0 only when a block exceeds the
    per-column byte budget and auto-splits).

    At plan time the driver also builds a shared FSST symbol table per
    string column from a bounded sample (first row group of the first
    sorted path — deterministic), so every fsst block maps tokens to
    codes in one hash pass instead of re-deriving a table per block; a
    block whose content drifted from the sample silently falls back to
    the local build (kernels._enc_fsst_shared).
    """
    import pyarrow.parquet as pq

    if isinstance(paths, str):
        paths = [paths]
    manifest = build_manifest_arrow(pq.read_schema(paths[0]))
    shared_tables = build_shared_fsst_tables(paths, manifest)
    splits = plan_parquet_splits(paths, row_groups_per_split)
    sdf = spark.createDataFrame(
        [(fi, p, rg, n) for fi, p, rg, n in splits],
        "file_idx int, path string, rg int, nrg int",
    )
    # repartition to 1 split/partition for balance, then coalesce the narrow
    # pipeline to ~2 tasks/core: each task encodes several splits
    # sequentially, cutting per-task overhead and output-file count (the
    # driver-side commit of thousands of tiny files is a serial cost)
    n_tasks = output_partitions or min(
        len(splits), max(spark.sparkContext.defaultParallelism * 2, 1)
    )
    blocks = (
        sdf.repartition(len(splits))
        .mapInArrow(
            _make_fused_encoder(
                manifest, codec_overrides, order_cols, max_block_col_bytes,
                shared_tables,
            ),
            BLOCKS_SCHEMA,
        )
        .coalesce(n_tasks)
    )
    return blocks, manifest


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _null_arrow_type(m: dict) -> pa.DataType:
    """Arrow type for a null-padded column of manifest entry ``m`` on the
    PHYSICAL side (logical restore happens later, so ts/date/bool pads are
    int columns here)."""
    if m["ptype"] != "any":
        return _PHYS_ARROW_TYPE[m["ptype"]]
    from pyspark.sql.pandas.types import to_arrow_type

    return to_arrow_type(T._parse_datatype_string(m["logical"]))


def _decode_one_block(rows: list[dict], manifest: dict) -> pa.Table:
    """Decode one block's rows into a table with the manifest's columns.

    Schema evolution: a column marked ``evolved`` in the manifest was added
    to the state dir after this block may have been written — if the block
    has no row for it, the column decodes as all-null (the value every
    pre-evolution row logically has). A missing NON-evolved column is
    corruption and raises."""
    from d6tstack_spark.codecs.blocks import decode_block_arrow

    by_col = {r["column"]: r for r in rows}
    arrays = {}
    pad: list[str] = []
    n = None
    for name, m in manifest.items():
        r = by_col.get(name)
        if r is None:
            if not m.get("evolved"):
                bid = rows[0]["block_id"] if rows else "?"
                raise ValueError(
                    f"incomplete block {bid}: column {name!r} missing and "
                    "not marked evolved in the manifest — the blocks data "
                    "is corrupt or the manifest belongs to another dir"
                )
            pad.append(name)
            arrays[name] = None  # placeholder keeps manifest column order
            continue
        ptype = m["ptype"]
        n = r["n_rows"]
        if ptype == "any" or r["codec"] == "arrow":
            arrays[name] = _decode_arrow_fallback(r["payload"])
            continue
        if ptype in ("f32list", "f64list"):
            from d6tstack_spark.codecs.blocks import decode_block_floatlist

            arrays[name] = decode_block_floatlist(
                r["payload"], r["params"], n, r["null_count"], ptype
            )
            continue
        if ptype in ("str", "bin"):
            # arrow-native fast path: no per-row python in string decode
            arr = decode_block_arrow(
                r["payload"], r["params"], r["codec"], n, r["null_count"], ptype
            )
            if ptype == "str":
                arr = arr.cast(pa.string())
        else:
            values, valid = decode_block(
                r["payload"], r["params"], r["codec"], n, r["null_count"], ptype
            )
            mask = None if valid.all() else ~valid
            arr = pa.array(values, type=_PHYS_ARROW_TYPE[ptype], mask=mask)
        arrays[name] = arr
    if pad:
        if n is None:
            raise ValueError(
                "block has only evolved columns missing and no decoded "
                "column to take the row count from"
            )
        for name in pad:
            arrays[name] = pa.nulls(n, type=_null_arrow_type(manifest[name]))
    return pa.table(arrays)


def _make_decoder(manifest: dict, chunk_rows: int = 65536):
    ncols = len(manifest)
    has_evolved = any(m.get("evolved") for m in manifest.values())

    def decode_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pa.set_cpu_count(1)  # workers are the parallelism
        pending: dict[int, list[dict]] = {}
        for batch in batches:
            for row in batch.to_pylist():
                bid = row["block_id"]
                pending.setdefault(bid, []).append(row)
                if len(pending[bid]) == ncols:
                    tbl = _decode_one_block(pending.pop(bid), manifest)
                    for b in tbl.to_batches(max_chunksize=chunk_rows):
                        yield b
        if pending and not has_evolved:
            missing = {k: len(v) for k, v in pending.items()}
            raise ValueError(f"incomplete blocks at decode: {missing}")
        # evolved manifest: blocks written before a column was added can
        # never reach ncols rows — they flush here, null-padded by
        # _decode_one_block (which still raises if a NON-evolved column is
        # missing, keeping the corruption check for the original schema).
        # On the bulk per-file path this adds no memory (the task already
        # holds the whole file); on the shuffle path pre-evolution blocks
        # buffer to partition end.
        for bid in sorted(pending):
            tbl = _decode_one_block(pending[bid], manifest)
            for b in tbl.to_batches(max_chunksize=chunk_rows):
                yield b

    return decode_fn


def _hadoop_list_files(spark, root: str, suffix: str) -> list[str]:
    """Recursive file listing via the JVM Hadoop FileSystem API — resolves
    any scheme the cluster's Hadoop configuration knows (file://, hdfs://,
    s3a://, ...), unlike a driver-side glob which only sees local paths.
    Local file:-scheme results are stripped back to plain paths so pyarrow
    on the executors opens them without URI plumbing; other schemes pass
    through as URIs for pyarrow's filesystem resolution."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(root)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return []
    it = fs.listFiles(path, True)
    out: list[str] = []
    while it.hasNext():
        p = it.next().getPath().toString()
        if p.endswith(suffix):
            if p.startswith("file:"):
                p = p[len("file:"):]
            out.append(p)
    return out


def decode_parquet_blocks(
    spark,
    blocks_dir: str,
    manifest: dict,
    columns: list[str] | None = None,
    block_filter: tuple | list | None = None,
    paths: list[str] | None = None,
) -> DataFrame:
    """Shuffle-free bulk decode — the inverse twin of
    :func:`encode_parquet_files`.

    ``block_filter=(col, lo, hi)`` — or a LIST of such tuples (ANDed),
    or a LIST OF LISTS (DNF: OR of ANDs, see :func:`zone_dnf_from_where`)
    — prunes whole blocks via the zone map
    (see :func:`decode_table`) with NO driver-held id set: the driver only
    decides which FILES contain at least one qualifying block (a stats-only
    scan — payload column never read thanks to parquet column pruning;
    state bounded by file count, not block count), and each task
    re-evaluates the zone condition on its own file's stats rows to pick
    the qualifying blocks locally. Task closures therefore stay O(1)
    regardless of how many of the ~10⁶-10⁷ blocks of a 100 TB table
    qualify.

    :func:`decode_table` must repartition by block_id so each task owns
    complete blocks — a full shuffle of the PAYLOAD bytes. But the blocks
    sink (sinks.write_blocks / checkpoint state) writes whole blocks into
    single files, so a per-FILE task already owns complete blocks: the
    driver plans one task per blocks file, each task reads it with pyarrow
    directly and decodes — zero shuffle, no JVM↔Python payload transfer,
    the 100 TB decode path. ``columns`` prunes at the parquet row level
    (only the selected columns' payload rows are materialized).

    Listing goes through the Hadoop FileSystem API (scheme-agnostic:
    file://, hdfs://, s3a://, ... — whatever the cluster's Hadoop conf can
    resolve), and executors read via pyarrow URI resolution. The per-file
    complete-block invariant is enforced at write time (sinks.write_blocks
    rejects a nonzero spark.sql.files.maxRecordsPerFile) and re-checked at
    decode (incomplete blocks raise)."""
    full_manifest = manifest  # zone filter may target a non-projected column
    final_columns = None
    if columns is not None:
        missing = [c for c in columns if c not in manifest]
        if missing:
            raise ValueError(f"columns not in manifest: {missing}")
        manifest = {k: v for k, v in manifest.items() if k in columns}
        if manifest and all(m.get("evolved") for m in manifest.values()):
            # all-evolved projection: pre-evolution blocks have NO rows for
            # any projected column, so they would silently vanish — decode
            # one original (non-evolved) anchor column too, to carry their
            # row counts, and drop it from the final frame
            anchor = next(
                k for k, m in full_manifest.items() if not m.get("evolved")
            )
            manifest = dict(manifest)
            manifest[anchor] = full_manifest[anchor]
            final_columns = list(columns)
    if paths is None:
        paths = sorted(_hadoop_list_files(spark, blocks_dir, ".parquet"))
    else:
        # caller-pinned file set (snapshot/time-travel reads): same
        # per-file complete-block contract, no listing
        paths = sorted(paths)
    if not paths:
        raise ValueError(f"no blocks parquet files under {blocks_dir}")
    # zone-map pruning, two levels, zero driver-held block-id state:
    #   1. driver keeps only FILES with ≥1 qualifying block (stats-only
    #      scan; result bounded by file count, not block count);
    #   2. each task re-derives its own file's qualifying block ids from
    #      that file's stats rows (the per-file complete-block invariant
    #      means a block's stats and payload always share a file).
    # DNF of per-predicate (col, kind, lo_phys, hi_phys, is_str) tuples
    # for tasks — O(#branches × #preds), independent of block count
    zf: list[list[tuple]] | None = None
    dnf = _strip_evolved_unprunable(
        _normalize_block_filters(block_filter), full_manifest
    )
    if dnf is not None:
        stats = spark.read.parquet(*paths)
        if "vmin_num" in stats.columns:  # pre-zone-map dirs: no pruning
            zf = []
            qual_df = None  # union over branches
            for branch in dnf:
                branch_zf = []
                branch_df = None  # intersection within the branch
                for bf in branch:
                    col, keep = _zone_keep_condition(full_manifest, bf)
                    m = full_manifest[col]
                    if len(bf) == 2:
                        branch_zf.append((col, bf[1], None, None, False))
                    else:
                        branch_zf.append(
                            (
                                col,
                                "range",
                                _normalize_zone_bound(
                                    bf[1], m["ptype"], m["logical"]
                                ),
                                _normalize_zone_bound(
                                    bf[2], m["ptype"], m["logical"]
                                ),
                                m["ptype"] in ("str", "bin"),
                            )
                        )
                    # a file qualifies iff SOME block in it passes SOME
                    # branch's EVERY predicate — intersect per-predicate
                    # (file, block) pairs in-plan within a branch, union
                    # the branches; only the distinct file list reaches
                    # the driver
                    s = (
                        stats.filter(F.col("column") == col)
                        .filter(keep)
                        .select(F.input_file_name().alias("f"), "block_id")
                        .distinct()
                    )
                    branch_df = (
                        s
                        if branch_df is None
                        else branch_df.join(s, ["f", "block_id"], "inner")
                    )
                zf.append(branch_zf)
                qual_df = (
                    branch_df
                    if qual_df is None
                    else qual_df.unionByName(branch_df)
                )
            qual = {
                _norm_file_uri(r[0])
                for r in qual_df.select("f").distinct().collect()
            }
            paths = [p for p in paths if _norm_file_uri(p) in qual]
            if not paths:
                # no block qualifies anywhere: empty frame, right schema
                phys_schema0 = _phys_struct(manifest)
                empty = _restore_logical(
                    spark.createDataFrame([], phys_schema0), manifest
                )
                if final_columns is not None:
                    empty = empty.select(*final_columns)
                return empty
    sdf = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        len(paths)
    )
    col_filter = list(manifest) if columns is not None else None
    decoder = _make_decoder(manifest)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        pa.set_cpu_count(1)
        pa.set_io_thread_count(1)
        for b in batches:
            for p in b.column("path").to_pylist():
                try:
                    keep_ids = None
                    if zf is not None:
                        zcols = sorted(
                            {z[0] for br in zf for z in br}
                        )
                        st = pq.read_table(
                            p,
                            columns=[
                                "column", "block_id", "n_rows",
                                "null_count", "vmin_num", "vmax_num",
                                "vmin_str", "vmax_str",
                            ],
                            filters=[("column", "in", zcols)],
                            use_threads=False,
                        )
                        keep_ids = set()
                        for branch in zf:
                            bids = None
                            for zcol, kind, lo, hi, is_str in branch:
                                sub = st.filter(
                                    pc.equal(st.column("column"), zcol)
                                )
                                ids = _zone_keep_ids_local(
                                    sub, kind, lo, hi, is_str
                                )
                                bids = (
                                    ids if bids is None else bids & ids
                                )
                            keep_ids |= bids
                        if not keep_ids:
                            continue  # planner raced a rewrite; nothing here
                    # the keep-ids ride the parquet read as a filter: row
                    # groups whose block_id stats miss the set never load
                    # their PAYLOAD bytes (blocks are written contiguously,
                    # one record batch per block, so id ranges per row
                    # group are tight) — a selective decode_where reads a
                    # fraction of even the qualifying files
                    flt = []
                    if col_filter:
                        flt.append(("column", "in", col_filter))
                    if keep_ids is not None:
                        flt.append(("block_id", "in", sorted(keep_ids)))
                    t = pq.read_table(
                        p, use_threads=False, filters=flt or None
                    )
                except FileNotFoundError as e:
                    raise RuntimeError(
                        f"blocks dir changed under the running decode: {p} "
                        "was listed at planning time but is gone at task-read "
                        "time — another process deleted or rewrote the sink "
                        "directory mid-job. Each job must own a unique blocks "
                        "dir for its lifetime."
                    ) from e
                yield from decoder(t.to_batches())

    phys_schema = _phys_struct(manifest)
    out = _restore_logical(sdf.mapInArrow(run, phys_schema), manifest)
    if final_columns is not None:
        out = out.select(*final_columns)  # drop the anchor column
    return out


def _phys_struct(manifest: dict) -> T.StructType:
    return T.StructType(
        [
            T.StructField(
                name,
                _PHYS_SPARK_TYPE[m["ptype"]]
                if m["ptype"] != "any"
                else T._parse_datatype_string(m["logical"]),
                True,
            )
            for name, m in manifest.items()
        ]
    )


def _norm_file_uri(p: str) -> str:
    """Normalize a file path/URI for equality tests across APIs that
    disagree on scheme spelling (Hadoop ``file:/a``, Spark
    ``file:///a``, plain ``/a``)."""
    if p.startswith("file:"):
        p = p[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
    return p


def _zone_keep_ids_local(
    stats: "pa.Table", kind: str, lo, hi, is_str: bool
) -> set[int]:
    """Task-side twin of :func:`_zone_keep_condition`: evaluate the
    conservative zone predicate on ONE file's stats rows (already
    filtered to the zone column) and return its qualifying block ids.
    Semantics must match the Column version exactly — blocks without stats
    always qualify; a null vmax_str with vmin_str set means unbounded
    above (0xFF truncation cut)."""
    ids: set[int] = set()
    rows = stats.to_pylist()
    if kind == "is_null":
        return {r["block_id"] for r in rows if r["null_count"] > 0}
    if kind == "not_null":
        return {r["block_id"] for r in rows if r["null_count"] < r["n_rows"]}
    for r in rows:
        vmin = r["vmin_str"] if is_str else r["vmin_num"]
        vmax = r["vmax_str"] if is_str else r["vmax_num"]
        if vmin is None:  # no stats recorded → conservative keep
            ids.add(r["block_id"])
            continue
        ok = True
        if hi is not None and not (vmin <= hi):
            ok = False
        if ok and lo is not None:
            if is_str:
                # null upper bound = unbounded above
                ok = vmax is None or vmax >= lo
            else:
                ok = vmax is not None and vmax >= float(lo)
        if ok:
            ids.add(r["block_id"])
    return ids


def _normalize_zone_bound(v, ptype: str, logical: str | None):
    """User-facing bound → physical value (datetime→µs, date→days,
    bool→int, str→utf-8 bytes)."""
    import datetime as _dt

    if v is None:
        return None
    if logical in ("ts", "ts_ntz") and isinstance(v, _dt.datetime):
        epoch = _dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
        return (v - epoch) // _dt.timedelta(microseconds=1)
    if logical == "date" and isinstance(v, _dt.date):
        return (v - _dt.date(1970, 1, 1)).days
    if logical == "bool" and isinstance(v, bool):
        return int(v)
    if ptype in ("str", "bin"):
        return v.encode() if isinstance(v, str) else bytes(v)
    return v


def _normalize_block_filters(block_filter) -> list[list[tuple]] | None:
    """User-facing ``block_filter`` → DNF: a list of BRANCHES (ORed),
    each branch a list of predicates (ANDed). A block qualifies iff it
    can satisfy SOME branch's EVERY predicate.

    Accepted spellings:

    - ``None`` — no pruning;
    - one predicate ``(col, lo, hi)`` — single branch, single pred;
    - a list of predicates — ONE branch (ANDed; what a conjunctive
      WHERE clause prunes with — backwards compatible);
    - a list of lists of predicates — full DNF (what
      :func:`zone_dnf_from_where` emits for OR expressions).

    Predicate forms:

    - ``(col, lo, hi)`` — inclusive range overlap (None = open end);
    - ``(col, "is_null")`` / ``(col, "not_null")`` — the block's recorded
      ``null_count`` proves it can(not) contain (non-)null rows.

    A single predicate is recognized by its string first element."""
    if block_filter is None:
        return None

    def _is_pred(p) -> bool:
        return (
            isinstance(p, (tuple, list))
            and len(p) in (2, 3)
            and isinstance(p[0], str)
        )

    if _is_pred(block_filter):
        dnf = [[block_filter]]
    else:
        items = list(block_filter)
        if not items:
            return None
        if all(_is_pred(p) for p in items):
            dnf = [items]  # one conjunction branch (backwards compatible)
        elif all(
            isinstance(b, (list, tuple)) and not _is_pred(b) for b in items
        ):
            dnf = [list(b) for b in items]
            if any(not b for b in dnf):
                return None  # an empty branch is TRUE → nothing prunable
        else:
            raise ValueError(
                "block_filter must be a predicate tuple, a list of "
                "predicates (ANDed), or a list of predicate lists "
                f"(DNF) — got mixed forms: {block_filter!r}"
            )
    for branch in dnf:
        for p in branch:
            ok = (
                isinstance(p, (tuple, list))
                and isinstance(p[0], str)
                and (
                    len(p) == 3
                    or (len(p) == 2 and p[1] in ("is_null", "not_null"))
                )
            )
            if not ok:
                raise ValueError(
                    "block_filter predicate must be (column, lo, hi) or "
                    f"(column, 'is_null'|'not_null'): {p!r}"
                )
    return [[tuple(p) for p in branch] for branch in dnf]


def _strip_evolved_unprunable(
    dnf: list[list[tuple]] | None, manifest: dict
) -> list[list[tuple]] | None:
    """Schema evolution × zone maps: blocks written before a column was
    added have NO stats row for it, which the id-set logic reads as "prune".
    That is the CORRECT answer for range/point/IN and ``not_null`` atoms
    (every pre-evolution row is null there, and null never matches), but
    wrong for ``is_null`` — those old blocks are all-null and must be kept.
    Drop ``is_null`` atoms on evolved columns (widening an AND branch is
    always sound); a branch left empty is TRUE, so pruning disables
    entirely (None)."""
    if dnf is None:
        return None
    if not any(m.get("evolved") for m in manifest.values()):
        return dnf
    out = []
    for branch in dnf:
        kept = [
            p
            for p in branch
            if not (
                len(p) == 2
                and p[1] == "is_null"
                and manifest.get(p[0], {}).get("evolved")
            )
        ]
        if not kept:
            return None
        out.append(kept)
    return out


def _zone_keep_condition(manifest: dict, block_filter: tuple):
    """Predicate → (col_name, Column condition over the stats row).
    Conservative: blocks without stats always qualify; bounds are
    inclusive; lo/hi may be None for open ranges. Null predicates use the
    per-block ``null_count`` / ``n_rows`` (always recorded): a block whose
    every row is non-null cannot satisfy IS NULL, and vice versa."""
    col = block_filter[0]
    if col not in manifest:
        raise ValueError(f"block_filter column {col!r} not in manifest")
    if len(block_filter) == 2:
        if block_filter[1] == "is_null":
            return col, F.col("null_count") > 0
        return col, F.col("null_count") < F.col("n_rows")
    _, lo, hi = block_filter
    m = manifest[col]
    lo = _normalize_zone_bound(lo, m["ptype"], m["logical"])
    hi = _normalize_zone_bound(hi, m["ptype"], m["logical"])
    if m["ptype"] in ("str", "bin"):
        keep = F.col("vmin_str").isNull()
        inside = F.lit(True)
        if hi is not None:
            inside = inside & (F.col("vmin_str") <= F.lit(hi))
        if lo is not None:
            # vmax_str null with vmin_str set = unbounded above (0xFF cut)
            inside = inside & F.coalesce(
                F.col("vmax_str") >= F.lit(lo), F.lit(True)
            )
        return col, keep | inside
    keep = F.col("vmin_num").isNull()
    inside = F.lit(True)
    if hi is not None:
        inside = inside & (F.col("vmin_num") <= F.lit(float(hi)))
    if lo is not None:
        inside = inside & (F.col("vmax_num") >= F.lit(float(lo)))
    return col, keep | inside


def decode_table(
    blocks: DataFrame,
    manifest: dict,
    columns: list[str] | None = None,
    block_filter: tuple | list | None = None,
) -> DataFrame:
    """Inverse of :func:`encode_table`: blocks → original logical columns.

    ``columns`` decodes a projection only: the blocks scan is filtered to
    those column names (predicate pushdown into the blocks parquet — the
    column-pruning payoff of the columnar block layout; never touches the
    other columns' payload bytes).

    ``block_filter=(col, lo, hi)`` prunes WHOLE BLOCKS via the zone map
    (per-block min/max recorded at encode): only blocks whose [min, max]
    for ``col`` overlaps the inclusive [lo, hi] range are decoded (None =
    open end). A LIST of such tuples is a conjunction — the block must
    overlap every range (multi-column WHERE pruning); a LIST OF LISTS is
    a disjunction of conjunctions (OR pruning — see
    :func:`zone_dnf_from_where`). Within a branch the per-predicate
    qualifying-id sets are intersected in-plan (inner joins on block_id,
    each side a distinct over the tiny stats projection — no payload
    touched until the final semi join); branches are unioned. Pruning is
    conservative — callers still apply the exact row-level filter to the
    result; blocks written before zone maps (or with unsupported stats)
    always qualify, so results are never wrong.

    Row order is unspecified (Spark semantics); the round-trip invariant is
    asserted under stable (conv_id, turn_idx) ordering by callers."""
    dnf = _strip_evolved_unprunable(
        _normalize_block_filters(block_filter), manifest
    )
    if dnf is not None and "vmin_num" in blocks.columns:
        union_ids = None
        for branch in dnf:
            ids = None
            for bf in branch:
                col, keep = _zone_keep_condition(manifest, bf)
                s = (
                    blocks.filter(F.col("column") == col)
                    .filter(keep)
                    .select("block_id")
                    .distinct()
                )
                ids = s if ids is None else ids.join(s, "block_id", "inner")
            union_ids = (
                ids if union_ids is None else union_ids.unionByName(ids)
            )
        blocks = blocks.join(
            union_ids.distinct(), "block_id", "leftsemi"
        )
    final_columns = None
    if columns is not None:
        if not columns:
            raise ValueError("columns must be non-empty (or None for all)")
        missing = [c for c in columns if c not in manifest]
        if missing:
            raise ValueError(f"columns not in manifest: {missing}")
        proj = {k: v for k, v in manifest.items() if k in columns}
        if proj and all(m.get("evolved") for m in proj.values()):
            # all-evolved projection: keep one original column as the row
            # anchor for pre-evolution blocks (see decode_parquet_blocks)
            anchor = next(
                k for k, m in manifest.items() if not m.get("evolved")
            )
            proj[anchor] = manifest[anchor]
            final_columns = list(columns)
        manifest = proj
        blocks = blocks.filter(F.col("column").isin(list(manifest)))
    phys_schema = T.StructType(
        [
            T.StructField(
                name,
                _PHYS_SPARK_TYPE[m["ptype"]]
                if m["ptype"] != "any"
                else T._parse_datatype_string(m["logical"]),
                True,
            )
            for name, m in manifest.items()
        ]
    )
    dec = (
        blocks.repartition("block_id")
        .mapInArrow(_make_decoder(manifest), phys_schema)
    )
    out = _restore_logical(dec, manifest)
    if final_columns is not None:
        out = out.select(*final_columns)  # drop the anchor column
    return out


# --------------------------------------------------------------------------
# decode_where: SQL predicate → zone pruning + exact row filter
# --------------------------------------------------------------------------

_LIT_RE = (  # self-contained (non-capturing) so it embeds next to | and *
    r"(?:(?:DATE|TIMESTAMP)?\s*'(?:[^']|'')*'"
    r"|-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
)
_IDENT_RE = r"[A-Za-z_][A-Za-z0-9_]*"


def _split_toplevel(where: str, kw: str) -> list[str]:
    """Split a boolean expression on a top-level connective (``AND`` or
    ``OR``) outside parens and string literals; for ``AND``, the AND
    inside ``BETWEEN .. AND ..`` stays attached."""
    kw = kw.upper()
    heads = "AaBb" if kw == "AND" else "Oo"
    word_re = r"(?i)\b(AND|BETWEEN)\b" if kw == "AND" else r"(?i)\b(OR)\b"
    out, buf, depth, i, n = [], [], 0, 0, len(where)
    pending_between = 0
    while i < n:
        ch = where[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if where[j] == "'":
                    if j + 1 < n and where[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            buf.append(where[i : j + 1])
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if depth == 0 and ch in heads:
            word = re.match(word_re, where[i:])
            prev_ok = i == 0 or not (where[i - 1].isalnum() or where[i - 1] == "_")
            if word and prev_ok:
                w = word.group(1).upper()
                if w == "BETWEEN":
                    pending_between += 1
                elif pending_between:
                    pending_between -= 1
                else:
                    out.append("".join(buf))
                    buf = []
                    i += len(w)
                    continue
        buf.append(ch)
        i += 1
    out.append("".join(buf))
    return [c.strip() for c in out if c.strip()]


def _split_conjuncts(where: str) -> list[str]:
    """Split a boolean expression on top-level ANDs (outside parens and
    string literals; the AND inside BETWEEN .. AND .. stays attached)."""
    return _split_toplevel(where, "AND")


def _strip_outer_parens(expr: str) -> str:
    """Remove parens that enclose the WHOLE expression (repeatedly);
    ``(a) AND (b)`` is untouched — its opening paren closes early."""
    expr = expr.strip()
    while expr.startswith("(") and expr.endswith(")"):
        depth = 0
        match_at = -1
        for k, c in enumerate(expr):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    match_at = k
                    break
        if match_at != len(expr) - 1:
            break
        expr = expr[1:-1].strip()
    return expr


def _parse_zone_literal(text: str, m: dict):
    """SQL literal text → python bound compatible with the column's
    manifest entry, or None when the literal cannot express a zone bound
    for this column type (conservative skip)."""
    import datetime as _dt

    text = text.strip()
    logical = m.get("logical")
    is_str_col = m["ptype"] in ("str", "bin")
    kw = re.match(r"(?i)^(DATE|TIMESTAMP)\s*'(.*)'$", text, re.S)
    quoted = re.match(r"^'(.*)'$", text, re.S)
    if kw or quoted:
        raw = (kw.group(2) if kw else quoted.group(1)).replace("''", "'")
        if logical in ("ts", "ts_ntz"):
            try:
                return _dt.datetime.fromisoformat(raw)
            except ValueError:
                return None
        if logical == "date":
            try:
                return _dt.date.fromisoformat(raw)
            except ValueError:
                return None
        return raw if is_str_col else None
    if is_str_col or logical in ("ts", "ts_ntz", "date"):
        return None  # numeric literal on a non-numeric column
    try:
        return int(text)
    except ValueError:
        try:
            return float(text)
        except ValueError:
            return None


def zone_predicates_from_where(where: str, manifest: dict) -> list[tuple]:
    """Extract zone-prunable ``(col, lo, hi)`` predicates from a SQL
    boolean expression. Strictly conservative: only simple top-level
    conjuncts of the forms ``col <op> literal``, ``literal <op> col``,
    ``col BETWEEN a AND b``, ``col IN (lit, ...)`` (the literals' [min,
    max] envelope) and ``col IS [NOT] NULL`` (null-count predicates)
    contribute (op: =, ==, <, <=, >, >=); strict inequalities prune with
    inclusive bounds (a boundary block may survive — the exact row filter
    removes its rows); everything else (ORs, functions, unknown columns)
    contributes nothing and is left to the row filter. Never wrong,
    sometimes less pruning. For OR-aware pruning see
    :func:`zone_dnf_from_where` (what :func:`decode_where` uses)."""
    if "\\" in where:
        # Spark's parser unescapes backslash sequences inside string
        # literals ('a\tb' compares against a TAB) while this compiler
        # reads the raw bytes, and the literal scanner's quote handling
        # differs between escapedStringLiterals modes — a mis-read bound
        # could exclude the block holding the real value. Prune nothing.
        return []
    preds: list[tuple] = []
    for conj in _split_conjuncts(where):
        conj = _strip_outer_parens(conj)
        sub = _split_conjuncts(conj)
        if len(sub) > 1:  # parenthesized conjunction: recurse
            for s in sub:
                preds.extend(zone_predicates_from_where(s, manifest))
            continue
        preds.extend(_compile_atom(conj, manifest))
    return preds


def _compile_atom(conj: str, manifest: dict) -> list[tuple]:
    """One comparison atom (no top-level AND/OR/parens) → zero or one
    zone predicates. Unrecognized forms → [] (prune nothing)."""
    mnull = re.match(rf"(?i)^({_IDENT_RE})\s+IS\s+(NOT\s+)?NULL$", conj)
    if mnull:
        col = mnull.group(1)
        if col in manifest:
            return [(col, "not_null" if mnull.group(2) else "is_null")]
        return []
    min_list = re.match(
        rf"(?i)^({_IDENT_RE})\s+IN\s*\(\s*"
        rf"({_LIT_RE}(?:\s*,\s*(?:{_LIT_RE}))*)\s*\)$",
        conj,
    )
    if min_list:
        # IN-list → conservative [min, max] envelope of its literals
        col = min_list.group(1)
        if col in manifest:
            lits = [
                _parse_zone_literal(t, manifest[col])
                for t in re.findall(_LIT_RE, min_list.group(2))
            ]
            if lits and all(v is not None for v in lits):
                return [(col, min(lits), max(lits))]
        return []
    mbet = re.match(
        rf"(?i)^({_IDENT_RE})\s+BETWEEN\s+({_LIT_RE})\s+AND\s+({_LIT_RE})$",
        conj,
    )
    if mbet:
        col = mbet.group(1)
        if col in manifest:
            lo = _parse_zone_literal(mbet.group(2), manifest[col])
            hi = _parse_zone_literal(mbet.group(3), manifest[col])
            if lo is not None and hi is not None:
                return [(col, lo, hi)]
        return []
    mlike = re.match(
        rf"(?i)^({_IDENT_RE})\s+LIKE\s+'((?:[^']|'')*)'$", conj
    )
    if mlike:
        col = mlike.group(1)
        if col in manifest and manifest[col]["ptype"] in ("str", "bin"):
            pat = mlike.group(2).replace("''", "'")
            if pat.endswith("%") and not re.search(r"[%_\\]", pat[:-1]):
                # prefix match: [prefix, strict-upper-bound(prefix)] — any
                # string starting with the prefix sorts inside this range
                pref = pat[:-1]
                if not pref:
                    return []  # LIKE '%' matches everything
                return [(col, pref, _prefix_upper_bytes(pref.encode()))]
            if not re.search(r"[%_\\]", pat):
                return [(col, pat, pat)]  # no wildcard at all: equality
        return []
    mcmp = re.match(
        rf"^({_IDENT_RE})\s*(>=|<=|==|=|<|>)\s*({_LIT_RE})$", conj
    )
    rev = False
    if not mcmp:
        mcmp = re.match(
            rf"^({_LIT_RE})\s*(>=|<=|==|=|<|>)\s*({_IDENT_RE})$", conj
        )
        rev = True
    if not mcmp:
        return []
    col, lit = (
        (mcmp.group(1), mcmp.group(3))
        if not rev
        else (mcmp.group(3), mcmp.group(1))
    )
    if col not in manifest:
        return []
    v = _parse_zone_literal(lit, manifest[col])
    if v is None:
        return []
    op = mcmp.group(2)
    if rev:  # literal OP col  ≡  col FLIP(OP) literal
        op = {">": "<", "<": ">", ">=": "<=", "<=": ">="}.get(op, op)
    if op in ("=", "=="):
        return [(col, v, v)]
    if op in (">", ">="):
        return [(col, v, None)]
    return [(col, None, v)]


_MAX_DNF_BRANCHES = 64


def zone_dnf_from_where(where: str, manifest: dict) -> list[list[tuple]]:
    """OR-aware zone compiler: SQL boolean expression → disjunction of
    conjunctions of zone predicates (the ``block_filter`` DNF form). A
    block is decoded iff it can satisfy SOME branch's EVERY predicate.

    Strictly conservative, like :func:`zone_predicates_from_where`:
    an unrecognized atom is a TRUE factor inside a conjunction (its
    branch prunes on the other factors) but poisons a disjunction
    (``x OR unknown()`` can match rows anywhere → no pruning). ``NOT``
    is compiled through De Morgan with atom-level negation (flipped
    comparisons, BETWEEN → two outer ranges, IS [NOT] NULL swapped;
    ``NOT col = v`` and ``NOT col IN (...)`` are unprunable). DNF
    distribution is capped at ``_MAX_DNF_BRANCHES`` branches — beyond
    that the expression is left entirely to the row filter. Returns []
    when nothing is prunable. Any backslash in the expression disables
    pruning entirely (see :func:`zone_predicates_from_where`: Spark
    unescapes literals, this compiler reads raw bytes)."""
    if "\\" in where:
        return []
    dnf = _compile_dnf(where, manifest)
    return dnf if dnf else []


def _compile_dnf(expr: str, manifest: dict) -> list[list[tuple]] | None:
    """Recursive DNF compiler; ``None`` means TRUE (prunes nothing)."""
    expr = _strip_outer_parens(expr)
    ors = _split_toplevel(expr, "OR")
    if len(ors) > 1:
        branches: list[list[tuple]] = []
        for b in ors:
            sub = _compile_dnf(b, manifest)
            if not sub:  # one unprunable branch → rows can hide anywhere
                return None
            branches.extend(sub)
        return branches if len(branches) <= _MAX_DNF_BRANCHES else None
    conjs = _split_toplevel(expr, "AND")
    if len(conjs) > 1:
        acc: list[list[tuple]] = [[]]
        for c in conjs:
            sub = _compile_dnf(c, manifest)
            if not sub:
                continue  # TRUE factor: branch prunes on the others
            acc = [a + list(b) for a in acc for b in sub]
            if len(acc) > _MAX_DNF_BRANCHES:
                return None
        return acc if acc != [[]] else None
    mnot = re.match(r"(?i)^NOT\b(.*)$", expr, re.S)
    if mnot:
        return _compile_neg(mnot.group(1).strip(), manifest)
    preds = _compile_atom(expr, manifest)
    return [preds] if preds else None


def _compile_neg(expr: str, manifest: dict) -> list[list[tuple]] | None:
    """DNF of the NEGATION of ``expr`` (De Morgan), or None = unprunable.
    Bounds stay inclusive-conservative: ``NOT k <= 5`` prunes with
    ``[5, ∞)`` — the k=5 boundary block survives for the row filter."""
    expr = _strip_outer_parens(expr)
    ors = _split_toplevel(expr, "OR")
    if len(ors) > 1:  # ¬(a OR b) = ¬a AND ¬b — distribute
        acc: list[list[tuple]] = [[]]
        for b in ors:
            sub = _compile_neg(b, manifest)
            if not sub:
                continue  # unprunable ¬arm is a TRUE factor
            acc = [a + list(s) for a in acc for s in sub]
            if len(acc) > _MAX_DNF_BRANCHES:
                return None
        return acc if acc != [[]] else None
    conjs = _split_toplevel(expr, "AND")
    if len(conjs) > 1:  # ¬(a AND b) = ¬a OR ¬b — any unprunable arm poisons
        branches: list[list[tuple]] = []
        for c in conjs:
            sub = _compile_neg(c, manifest)
            if not sub:
                return None
            branches.extend(sub)
        return branches if len(branches) <= _MAX_DNF_BRANCHES else None
    mnot = re.match(r"(?i)^NOT\b(.*)$", expr, re.S)
    if mnot:  # ¬¬x = x
        return _compile_dnf(mnot.group(1).strip(), manifest)
    return _compile_atom_neg(expr, manifest)


def _compile_atom_neg(conj: str, manifest: dict) -> list[list[tuple]] | None:
    """DNF of the negation of one atom, or None when the complement is
    not range-expressible (``NOT col = v``, IN-lists, unknown forms)."""
    mnull = re.match(rf"(?i)^({_IDENT_RE})\s+IS\s+(NOT\s+)?NULL$", conj)
    if mnull:
        col = mnull.group(1)
        if col in manifest:
            return [[(col, "is_null" if mnull.group(2) else "not_null")]]
        return None
    mbet = re.match(
        rf"(?i)^({_IDENT_RE})\s+BETWEEN\s+({_LIT_RE})\s+AND\s+({_LIT_RE})$",
        conj,
    )
    if mbet:
        col = mbet.group(1)
        if col in manifest:
            lo = _parse_zone_literal(mbet.group(2), manifest[col])
            hi = _parse_zone_literal(mbet.group(3), manifest[col])
            if lo is not None and hi is not None:
                # ¬(lo ≤ col ≤ hi) = col < lo OR col > hi
                return [[(col, None, lo)], [(col, hi, None)]]
        return None
    mcmp = re.match(
        rf"^({_IDENT_RE})\s*(>=|<=|==|=|<|>)\s*({_LIT_RE})$", conj
    )
    rev = False
    if not mcmp:
        mcmp = re.match(
            rf"^({_LIT_RE})\s*(>=|<=|==|=|<|>)\s*({_IDENT_RE})$", conj
        )
        rev = True
    if not mcmp:
        return None
    col, lit = (
        (mcmp.group(1), mcmp.group(3))
        if not rev
        else (mcmp.group(3), mcmp.group(1))
    )
    if col not in manifest:
        return None
    v = _parse_zone_literal(lit, manifest[col])
    if v is None:
        return None
    op = mcmp.group(2)
    if rev:
        op = {">": "<", "<": ">", ">=": "<=", "<=": ">="}.get(op, op)
    if op in ("=", "=="):
        return None  # complement of a point keeps every block anyway
    neg = {"<": ">=", "<=": ">", ">": "<=", ">=": "<"}[op]
    if neg in (">", ">="):
        return [[(col, v, None)]]
    return [[(col, None, v)]]


def decode_where(
    spark,
    blocks,
    manifest: dict,
    where: str,
    columns: list[str] | None = None,
    paths: list[str] | None = None,
) -> DataFrame:
    """The 100 TB slice API: decode only the rows matching a SQL boolean
    expression. Range-expressible predicates become zone-map block filters
    (whole blocks whose min/max cannot overlap are never read) — including
    OR expressions, compiled to a disjunction of conjunctions by
    :func:`zone_dnf_from_where` (each OR branch prunes independently; the
    qualifying block sets are unioned). The FULL expression is then
    applied exactly on the decoded rows, and ``columns`` projects the
    result (the predicate may reference columns outside the projection —
    they are decoded for the filter and dropped after).

    ``blocks`` is a blocks directory (shuffle-free per-file bulk decode)
    or a blocks DataFrame (shuffled :func:`decode_table` path)."""
    preds = zone_dnf_from_where(where, manifest)
    need = columns
    if columns is not None:
        referenced = [
            c
            for c in manifest
            if c not in columns
            # IGNORECASE: Spark resolves columns case-insensitively, so
            # "CONV_ID > 5" must pull conv_id into the decode projection
            and re.search(rf"\b{re.escape(c)}\b", where, re.IGNORECASE)
        ]
        need = list(columns) + referenced
    if isinstance(blocks, str):
        dec = decode_parquet_blocks(
            spark, blocks, manifest, columns=need,
            block_filter=preds or None, paths=paths,
        )
    else:
        dec = decode_table(
            blocks, manifest, columns=need, block_filter=preds or None
        )
    out = dec.filter(F.expr(where))
    if columns is not None:
        out = out.select(*columns)
    return out
