"""Block framing: nullable column slice <-> (payload bytes, params, metadata).

Generalizes d6tstack's per-file sniff manifest (``sniff_results``,
reference combine_csv.py:174-177) from schema metadata to codec metadata:
each encoded block carries its codec id, codec params, null bitmap, row
count and checksum, so decode needs nothing but the block row itself.

Payload layout:  [validity bitmap (ceil(n/8) bytes, only if null_count>0)]
                 [codec payload]
"""

from __future__ import annotations

import json
import zlib
from dataclasses import dataclass

import numpy as np

from d6tstack_spark.codecs import kernels
from d6tstack_spark.codecs.selector import choose_codec


WIRE_VERSION = 2  # bump on any payload-layout change


def _check_version(p: dict):
    if p.get("v", 1) != WIRE_VERSION:
        raise ValueError(
            f"block wire format v{p.get('v', 1)} != engine v{WIRE_VERSION}; "
            "re-encode the state (no cross-version decode)"
        )


@dataclass
class Block:
    codec: str
    params: str  # JSON (codec params + framing)
    payload: bytes
    n_rows: int
    null_count: int
    raw_bytes: int
    enc_bytes: int
    crc: int


def _string_lens(values: np.ndarray) -> np.ndarray:
    return np.fromiter((len(v) for v in values), dtype=np.int64, count=len(values))


def _plain_size_exact(lens: np.ndarray, ptype: str, n: int) -> int:
    """Exact encoded size of the 'plain' codec WITHOUT building it."""
    if not kernels.is_string_ptype(ptype):
        return n * kernels.dtype_of(ptype).itemsize
    if len(lens) == 0:
        return 0
    width = int(int(lens.max()) - int(lens.min())).bit_length()
    return (len(lens) * width + 7) // 8 + int(lens.sum())


def encode_block(
    values: np.ndarray,
    valid: np.ndarray | None,
    ptype: str,
    codec: str | None = None,
) -> Block:
    """Encode one column slice. ``values`` has length n_rows; entries at
    invalid positions are ignored. ``valid`` is a bool array or None (=all valid).
    ``codec=None`` -> auto-select via the cost model."""
    n_rows = len(values)
    if valid is None:
        valid = np.ones(n_rows, dtype=bool)
    null_count = int(n_rows - valid.sum())
    nn = values[valid] if null_count else values
    is_str = kernels.is_string_ptype(ptype)
    lens = _string_lens(nn) if is_str else None
    auto = codec is None
    if auto:
        codec = choose_codec(nn, ptype)
    body, cparams = kernels.encode_values(nn, ptype, codec)
    if auto and codec != "plain":
        # never-worse-than-plain guarantee: the selector estimates from a
        # sample and can be fooled (e.g. saturated cardinality); plain's
        # exact size is computable without encoding it, so the check is free
        # and the re-encode happens only on an actual loss
        if _plain_size_exact(lens, ptype, len(nn)) <= len(body):
            body, cparams = kernels.encode_values(nn, ptype, "plain")
            codec = "plain"
    head = np.packbits(valid).tobytes() if null_count else b""
    payload = head + body
    params = json.dumps(
        {"v": WIRE_VERSION, "c": cparams, "vb": len(head)}, separators=(",", ":")
    )
    raw = (
        int(lens.sum()) + 4 * (n_rows + 1)  # Arrow footprint: offsets + data
        if is_str
        else n_rows * kernels.dtype_of(ptype).itemsize
    )
    return Block(
        codec=codec,
        params=params,
        payload=payload,
        n_rows=n_rows,
        null_count=null_count,
        raw_bytes=raw,
        enc_bytes=len(payload),
        crc=zlib.crc32(payload),
    )


def encode_block_arrow(
    arr, ptype: str, codec: str | None = None,
    fsst_table: list[bytes] | None = None,
) -> Block:
    """Encode one string/binary column slice straight from an Arrow array —
    no python-object materialization (the encode hot path).

    ``fsst_table``: a job-level shared FSST symbol table (see
    kernels.build_fsst_table). When the chosen codec is ``fsst`` the block
    encodes against it in one hash pass instead of building a local table
    (~1.2x the kernel, far less DRAM traffic); if the table fits the block
    badly (content drift) the local build runs as before. Wire format is
    identical either way — blocks stay self-contained.

    Same Block/wire output as :func:`encode_block`."""
    import pyarrow.compute as pc

    from d6tstack_spark.codecs.kernels import encode_values_arrow

    n_rows = len(arr)
    null_count = arr.null_count
    if null_count:
        valid = np.asarray(arr.is_valid())
        nn = arr.drop_null()
    else:
        valid = np.ones(n_rows, dtype=bool)
        nn = arr
    lens = (
        pc.binary_length(nn).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(nn)
        else np.zeros(0, dtype=np.int64)
    )
    auto = codec is None
    if auto:
        # sniff on a small CONTIGUOUS head sample (contiguity preserves run
        # structure; cardinality saturation is handled by the selector's
        # extrapolation). Only ≤4096 values ever become python objects.
        sample = nn.slice(0, 4096)
        sample_np = np.asarray(sample.to_numpy(zero_copy_only=False), dtype=object)
        from d6tstack_spark.codecs.selector import choose_codec, sniff_stats

        stats = sniff_stats(sample_np, ptype, sample_lens=lens[:4096])
        stats["n_total"] = len(nn)
        codec = choose_codec(sample_np, ptype, stats)
    body = None
    if codec == "fsst" and fsst_table:
        shared = kernels._enc_fsst_shared(nn, fsst_table)
        if shared is not None:
            body, cparams = shared
    if body is None:
        body, cparams = encode_values_arrow(nn, ptype, codec)
    if auto and codec != "plain":
        if _plain_size_exact(lens, ptype, len(nn)) <= len(body):
            body, cparams = encode_values_arrow(nn, ptype, "plain")
            codec = "plain"
    head = np.packbits(valid).tobytes() if null_count else b""
    payload = head + body
    params = json.dumps(
        {"v": WIRE_VERSION, "c": cparams, "vb": len(head)}, separators=(",", ":")
    )
    return Block(
        codec=codec,
        params=params,
        payload=payload,
        n_rows=n_rows,
        null_count=null_count,
        raw_bytes=int(lens.sum()) + 4 * (n_rows + 1),
        enc_bytes=len(payload),
        crc=zlib.crc32(payload),
    )


_FLOATLIST_NP = {"f32list": ("f32", np.dtype("<f4")), "f64list": ("f64", np.dtype("<f8"))}


def encode_block_floatlist(arr, ptype: str) -> Block:
    """Encode a list<float32|float64> column (embeddings): list-level
    validity bitmap + FOR-bitpacked lengths + fpsplit over the flat values.

    The flat value stream is where an LLM-data table's bytes live; fpsplit
    (sign/exponent/mantissa field split) compresses it losslessly where
    whole-value zstd gets ~nothing on near-random floats. Lists with null
    ELEMENTS don't take this path (caller falls back to the arrow container).
    """
    scalar_ptype, dt = _FLOATLIST_NP[ptype]
    n_rows = len(arr)
    null_count = arr.null_count
    if null_count:
        valid = np.asarray(arr.is_valid())
        nn = arr.drop_null()
    else:
        valid = np.ones(n_rows, dtype=bool)
        nn = arr
    import pyarrow.compute as pc

    lens = (
        pc.list_value_length(nn).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(nn)
        else np.zeros(0, dtype=np.int64)
    )
    flat = nn.flatten().to_numpy(zero_copy_only=False).astype(dt, copy=False)
    lref = int(lens.min()) if len(lens) else 0
    lw = int(int(lens.max()) - lref).bit_length() if len(lens) else 0
    lens_b = kernels.bitpack((lens - lref).view(np.uint64), lw)
    body, cparams = kernels.encode_values(flat, scalar_ptype, "fpsplit")
    head = np.packbits(valid).tobytes() if null_count else b""
    payload = head + lens_b + body
    params = json.dumps(
        {"v": WIRE_VERSION, "c": cparams, "vb": len(head), "lw": lw,
         "lref": lref, "lb": len(lens_b), "nv": int(lens.sum())},
        separators=(",", ":"),
    )
    raw = len(flat) * dt.itemsize + 4 * (n_rows + 1)  # Arrow: values + offsets
    return Block(
        codec="fplist",
        params=params,
        payload=payload,
        n_rows=n_rows,
        null_count=null_count,
        raw_bytes=raw,
        enc_bytes=len(payload),
        crc=zlib.crc32(payload),
    )


def decode_block_floatlist(
    payload: bytes | memoryview,
    params: str,
    n_rows: int,
    null_count: int,
    ptype: str,
):
    """Inverse of :func:`encode_block_floatlist` → Arrow list array."""
    import pyarrow as pa

    scalar_ptype, dt = _FLOATLIST_NP[ptype]
    p = json.loads(params)
    _check_version(p)
    mv = memoryview(payload)
    vb, lb = p["vb"], p["lb"]
    if null_count:
        valid = np.unpackbits(
            np.frombuffer(mv[:vb], dtype=np.uint8), count=n_rows
        ).astype(bool)
    else:
        valid = np.ones(n_rows, dtype=bool)
    n_valid = n_rows - null_count
    lens = (
        kernels.bitunpack(bytes(mv[vb : vb + lb]), p["lw"], n_valid).view(np.int64)
        + p["lref"]
    )
    flat = kernels.CODECS["fpsplit"][1](mv[vb + lb :], p["c"], p["nv"], scalar_ptype)
    full_lens = np.zeros(n_rows, dtype=np.int64)
    full_lens[valid] = lens
    offsets = np.zeros(n_rows + 1, dtype=np.int32)
    offsets[1:] = np.cumsum(full_lens).astype(np.int32)
    # a null in the offsets array marks that slot's list as null
    off_mask = np.concatenate([~valid, [False]])
    off_arr = pa.array(offsets, type=pa.int32(), mask=off_mask)
    values = pa.array(flat, type=pa.from_numpy_dtype(dt))
    return pa.ListArray.from_arrays(off_arr, values)


def decode_block_arrow(
    payload: bytes | memoryview,
    params: str,
    codec: str,
    n_rows: int,
    null_count: int,
    ptype: str,
):
    """String/binary block → Arrow array directly (C++ decode paths; nulls
    re-inserted via take with null indices). The Spark decode hot path."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from d6tstack_spark.codecs.kernels import decode_values_arrow

    p = json.loads(params)
    _check_version(p)
    mv = memoryview(payload)
    vb = p["vb"]
    if null_count:
        valid = np.unpackbits(
            np.frombuffer(mv[:vb], dtype=np.uint8), count=n_rows
        ).astype(bool)
    else:
        valid = None
    n_valid = n_rows - null_count
    nn = decode_values_arrow(mv[vb:], p["c"], n_valid, ptype, codec)
    if null_count == 0:
        return nn
    idx = np.cumsum(valid, dtype=np.int64) - 1
    idx_pa = pa.array(idx, type=pa.int64(), mask=~valid)
    return pc.take(nn, idx_pa)


def decode_block(
    payload: bytes | memoryview,
    params: str,
    codec: str,
    n_rows: int,
    null_count: int,
    ptype: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_block` -> (values, valid). Invalid positions
    hold zero/empty fillers; callers must apply the validity mask."""
    p = json.loads(params)
    _check_version(p)
    mv = memoryview(payload)
    vb = p["vb"]
    if null_count:
        valid = np.unpackbits(
            np.frombuffer(mv[:vb], dtype=np.uint8), count=n_rows
        ).astype(bool)
    else:
        valid = np.ones(n_rows, dtype=bool)
    nn = kernels.decode_values(mv[vb:], p["c"], int(valid.sum()), ptype, codec)
    if null_count == 0:
        return nn, valid
    if kernels.is_string_ptype(ptype):
        out = np.empty(n_rows, dtype=object)
        out[~valid] = b""
    else:
        out = np.zeros(n_rows, dtype=kernels.dtype_of(ptype))
    out[valid] = nn
    return out, valid
