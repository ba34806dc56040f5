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


def _raw_bytes(values: np.ndarray, ptype: str, n_rows: int) -> int:
    """Uncompressed size estimate: fixed-width for numerics; 4-byte offsets +
    data for strings (the Arrow in-memory footprint, SURVEY.md §6)."""
    if kernels.is_string_ptype(ptype):
        return int(sum(len(v) for v in values)) + 4 * (n_rows + 1)
    return n_rows * kernels.dtype_of(ptype).itemsize


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
    auto = codec is None
    if auto:
        codec = choose_codec(nn, ptype)
    body, cparams = kernels.encode_values(nn, ptype, codec)
    if auto and codec != "plain":
        # never-worse-than-plain guarantee: the selector estimates from a
        # sample and can be fooled (e.g. saturated cardinality); plain's
        # exact size is known, so fall back when the chosen codec loses
        plain_body, plain_params = kernels.encode_values(nn, ptype, "plain")
        if len(plain_body) <= len(body):
            codec, body, cparams = "plain", plain_body, plain_params
    head = np.packbits(valid).tobytes() if null_count else b""
    payload = head + body
    params = json.dumps({"c": cparams, "vb": len(head)}, separators=(",", ":"))
    return Block(
        codec=codec,
        params=params,
        payload=payload,
        n_rows=n_rows,
        null_count=null_count,
        raw_bytes=_raw_bytes(nn, ptype, n_rows),
        enc_bytes=len(payload),
        crc=zlib.crc32(payload),
    )


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
