"""Lightweight per-column compression kernels (pure numpy — no Spark).

The codec set mandated by the north rule: dictionary, run-length, FSST
string compression, bit-packing, frame-of-reference (plus ``plain`` as the
identity fallback and ``delta`` for monotone-ish integer/timestamp columns).

Physical types ("ptype"):
  i8 i16 i32 i64  — little-endian numpy integer arrays
  f32 f64         — numpy float arrays (dict/rle compare bit patterns, so
                    NaNs round-trip bit-identical)
  str bin         — numpy object arrays of python ``bytes`` (utf-8 at the
                    engine boundary)

Every codec implements
  ``enc(values, ptype) -> (payload: bytes, params: dict)``
  ``dec(payload, params, n, ptype) -> values``
over arrays that contain NO nulls — the block layer (blocks.py) strips and
re-inserts the validity bitmap, mirroring how Arrow separates validity from
values.

Design notes vs the reference (d6tstack): the reference's only compression
is whatever pyarrow's ParquetWriter applies (combine_csv.py:469-481); these
kernels replace exactly that layer with explicit, selectable codecs
(SURVEY.md §1.1, §7 step 2). FSST here follows the greedy ≤255-symbol-table
idea of Boncz/Neumann/Leis, "FSST: Fast Random Access String Compression"
(VLDB 2020), adapted to token-granular symbols so that both table build and
encode stay vectorized in numpy/pandas instead of a per-byte scalar loop.
"""

from __future__ import annotations

import numpy as np

_INT_DTYPES = {
    "i8": np.dtype("<i1"),
    "i16": np.dtype("<i2"),
    "i32": np.dtype("<i4"),
    "i64": np.dtype("<i8"),
}
_FLOAT_DTYPES = {"f32": np.dtype("<f4"), "f64": np.dtype("<f8")}
_NUM_DTYPES = {**_INT_DTYPES, **_FLOAT_DTYPES}
_STR_PTYPES = ("str", "bin")


def dtype_of(ptype: str) -> np.dtype:
    return _NUM_DTYPES[ptype]


def is_string_ptype(ptype: str) -> bool:
    return ptype in _STR_PTYPES


def is_int_ptype(ptype: str) -> bool:
    return ptype in _INT_DTYPES


# ---------------------------------------------------------------------------
# bit-level helpers
# ---------------------------------------------------------------------------


def bitpack(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative uint64 values into ``width`` bits each (MSB first)."""
    if width == 0 or len(values) == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1)).tobytes()


def bitunpack(buf: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`bitpack`; returns uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n * width)
    bits = bits.reshape(n, width).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(width - 1, -1, -1, dtype=np.uint64))
    return bits @ weights


def _bit_width(max_value: int) -> int:
    return int(max_value).bit_length()


def zigzag(v: np.ndarray) -> np.ndarray:
    """Map signed int64 to unsigned (0,-1,1,-2 -> 0,1,2,3)."""
    v = v.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)).view(np.int64)) ^ -((u & np.uint64(1)).view(np.int64))


# ---------------------------------------------------------------------------
# string framing helpers
# ---------------------------------------------------------------------------


def _pack_lengths(items: np.ndarray) -> tuple[bytes, dict]:
    """Frame-of-reference pack the per-item byte lengths of an object array."""
    lens = np.fromiter((len(x) for x in items), dtype=np.int64, count=len(items))
    if len(lens) == 0:
        return b"", {"lw": 0, "lref": 0}
    ref = int(lens.min())
    width = _bit_width(int(lens.max()) - ref)
    return bitpack((lens - ref).view(np.uint64), width), {"lw": width, "lref": ref}


def _unpack_lengths(buf: bytes, params: dict, n: int) -> np.ndarray:
    lens = bitunpack(buf, params["lw"], n).view(np.int64) + params["lref"]
    return lens


def _split_by_lengths(data: memoryview, lens: np.ndarray) -> np.ndarray:
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    out = np.empty(len(lens), dtype=object)
    b = bytes(data)
    for i in range(len(lens)):
        out[i] = b[offs[i] : offs[i + 1]]
    return out


# ---------------------------------------------------------------------------
# plain
# ---------------------------------------------------------------------------


def _enc_plain(values: np.ndarray, ptype: str):
    if is_string_ptype(ptype):
        lenbuf, lp = _pack_lengths(values)
        data = b"".join(values.tolist())
        return lenbuf + data, {**lp, "lb": len(lenbuf)}
    return np.ascontiguousarray(values, dtype=_NUM_DTYPES[ptype]).tobytes(), {}


def _dec_plain(payload: memoryview, params: dict, n: int, ptype: str) -> np.ndarray:
    if is_string_ptype(ptype):
        lb = params["lb"]
        lens = _unpack_lengths(bytes(payload[:lb]), params, n)
        return _split_by_lengths(payload[lb:], lens)
    return np.frombuffer(payload, dtype=_NUM_DTYPES[ptype], count=n).copy()


# ---------------------------------------------------------------------------
# dictionary (sorted uniques + bit-packed codes)
# ---------------------------------------------------------------------------


def _sortable_view(values: np.ndarray, ptype: str) -> np.ndarray:
    """Total-order view: floats compared by bit pattern (NaN-safe, exact)."""
    if ptype == "f64":
        return values.view(np.uint64)
    if ptype == "f32":
        return values.view(np.uint32)
    return values


def _enc_dict(values: np.ndarray, ptype: str):
    sv = _sortable_view(values, ptype)
    uniques, codes = np.unique(sv, return_inverse=True)
    width = _bit_width(len(uniques) - 1) if len(uniques) > 1 else 0
    codebuf = bitpack(codes.astype(np.uint64), width)
    if is_string_ptype(ptype):
        dictbuf, dp = _enc_plain(uniques, ptype)
    else:
        # store uniques in the original physical dtype (bit-identical)
        dictbuf = uniques.view(_NUM_DTYPES[ptype]).tobytes()
        dp = {}
    return dictbuf + codebuf, {
        "card": int(len(uniques)),
        "w": width,
        "db": len(dictbuf),
        "dp": dp,
    }


def _dec_dict(payload: memoryview, params: dict, n: int, ptype: str) -> np.ndarray:
    card, width, db = params["card"], params["w"], params["db"]
    if is_string_ptype(ptype):
        uniques = _dec_plain(payload[:db], params["dp"], card, ptype)
    else:
        uniques = np.frombuffer(payload[:db], dtype=_NUM_DTYPES[ptype], count=card)
    codes = bitunpack(bytes(payload[db:]), width, n).astype(np.int64)
    return uniques[codes] if len(uniques) else np.empty(0, dtype=object if is_string_ptype(ptype) else _NUM_DTYPES[ptype])


# ---------------------------------------------------------------------------
# run-length encoding (run values plain + FOR-packed run lengths)
# ---------------------------------------------------------------------------


def run_boundaries(values: np.ndarray, ptype: str) -> np.ndarray:
    """Indices where a new run starts (always includes 0 for non-empty)."""
    n = len(values)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    sv = _sortable_view(values, ptype)
    if is_string_ptype(ptype):
        changed = np.ones(n, dtype=bool)
        changed[1:] = sv[1:] != sv[:-1]
    else:
        changed = np.ones(n, dtype=bool)
        changed[1:] = sv[1:] != sv[:-1]
    return np.flatnonzero(changed).astype(np.int64)


def _enc_rle(values: np.ndarray, ptype: str):
    starts = run_boundaries(values, ptype)
    n = len(values)
    run_values = values[starts]
    run_lens = np.diff(np.append(starts, n)).astype(np.int64)
    vbuf, vp = _enc_plain(run_values, ptype)
    if len(run_lens):
        ref = int(run_lens.min())
        width = _bit_width(int(run_lens.max()) - ref)
    else:
        ref, width = 0, 0
    lbuf = bitpack((run_lens - ref).view(np.uint64), width)
    return vbuf + lbuf, {
        "runs": int(len(starts)),
        "vb": len(vbuf),
        "vp": vp,
        "rw": width,
        "rref": ref,
    }


def _dec_rle(payload: memoryview, params: dict, n: int, ptype: str) -> np.ndarray:
    runs, vb = params["runs"], params["vb"]
    run_values = _dec_plain(payload[:vb], params["vp"], runs, ptype)
    run_lens = (
        bitunpack(bytes(payload[vb:]), params["rw"], runs).view(np.int64)
        + params["rref"]
    )
    return np.repeat(run_values, run_lens)


# ---------------------------------------------------------------------------
# frame-of-reference / bit-pack / delta (integers & timestamps-as-µs)
# ---------------------------------------------------------------------------


def _enc_for(values: np.ndarray, ptype: str):
    v = values.astype(np.int64)
    if len(v) == 0:
        return b"", {"ref": 0, "w": 0}
    ref = int(v.min())
    deltas = (v - ref).view(np.uint64)
    width = _bit_width(int(deltas.max()))
    return bitpack(deltas, width), {"ref": ref, "w": width}


def _dec_for(payload: memoryview, params: dict, n: int, ptype: str) -> np.ndarray:
    v = bitunpack(bytes(payload), params["w"], n).view(np.int64) + params["ref"]
    return v.astype(_NUM_DTYPES[ptype])


def _enc_bitpack(values: np.ndarray, ptype: str):
    """Classic bit-packing: width from max; requires non-negative values."""
    v = values.astype(np.int64)
    if len(v) and int(v.min()) < 0:
        raise ValueError("bitpack requires non-negative values; use for_")
    width = _bit_width(int(v.max())) if len(v) else 0
    return bitpack(v.view(np.uint64), width), {"w": width}


def _dec_bitpack(payload: memoryview, params: dict, n: int, ptype: str) -> np.ndarray:
    v = bitunpack(bytes(payload), params["w"], n).view(np.int64)
    return v.astype(_NUM_DTYPES[ptype])


def _enc_delta(values: np.ndarray, ptype: str):
    v = values.astype(np.int64)
    if len(v) == 0:
        return b"", {"first": 0, "w": 0}
    first = int(v[0])
    zz = zigzag(np.diff(v))
    width = _bit_width(int(zz.max())) if len(zz) else 0
    return bitpack(zz, width), {"first": first, "w": width}


def _dec_delta(payload: memoryview, params: dict, n: int, ptype: str) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=_NUM_DTYPES[ptype])
    deltas = unzigzag(bitunpack(bytes(payload), params["w"], n - 1))
    v = np.empty(n, dtype=np.int64)
    v[0] = params["first"]
    np.cumsum(deltas, out=v[1:])
    v[1:] += params["first"]
    return v.astype(_NUM_DTYPES[ptype])


# ---------------------------------------------------------------------------
# FSST — greedy ≤255-symbol table string compression (VLDB 2020), token-granular
# ---------------------------------------------------------------------------

_FSST_ESCAPE = 0xFF
_FSST_MAX_SYMBOLS = 255  # codes 0..254; 0xFF reserved for literal-run escape
_FSST_SAMPLE_BYTES = 1 << 18  # 256 KiB table-build sample per block
_FSST_MAX_LITERAL = 0xFFFF


def fsst_build_table(sample: list[bytes], max_symbols: int = _FSST_MAX_SYMBOLS) -> list[bytes]:
    """Greedily pick the ≤255 highest-gain symbols from a bounded sample.

    Symbols are space-delimited tokens (the vectorization-friendly adaptation
    of FSST's byte-granular symbols); gain = freq × (len(token)+1) − the +1
    accounts for the separator byte that a coded token also elides.
    Deterministic: ties broken by token bytes.
    """
    from collections import Counter

    counts: Counter = Counter()
    budget = _FSST_SAMPLE_BYTES
    for s in sample:
        if budget <= 0:
            break
        budget -= len(s)
        counts.update(s.split(b" "))
    scored = sorted(
        ((cnt * (len(tok) + 1), tok) for tok, cnt in counts.items() if cnt > 1),
        key=lambda t: (-t[0], t[1]),
    )
    return [tok for _, tok in scored[:max_symbols]]


def _fsst_compress(data_tokens: list[bytes], code_of: dict) -> bytes:
    """Emit one byte per coded token; 0xFF + u16 len + raw bytes per literal.

    A literal chunk of length exactly 0xFFFF is ALWAYS a continuation: the
    encoder terminates every max-length chunk sequence with a final chunk of
    length < 0xFFFF (possibly empty), so framing is unambiguous.
    """
    out: list[bytes] = []
    get = code_of.get
    esc = _FSST_ESCAPE
    for tok in data_tokens:
        c = get(tok)
        if c is not None:
            out.append(c)
        elif len(tok) < _FSST_MAX_LITERAL:
            out.append(bytes((esc, len(tok) & 0xFF, len(tok) >> 8)) + tok)
        else:
            for i in range(0, len(tok), _FSST_MAX_LITERAL):
                part = tok[i : i + _FSST_MAX_LITERAL]
                out.append(bytes((esc, len(part) & 0xFF, len(part) >> 8)) + part)
            if len(tok) % _FSST_MAX_LITERAL == 0:
                out.append(b"\xff\x00\x00")  # empty terminator chunk
    return b"".join(out)


def _fsst_decompress(stream: memoryview, table: list[bytes], n_tokens: int) -> list[bytes]:
    out: list[bytes] = []
    i = 0
    buf = bytes(stream)
    ln = len(buf)
    pending: list[bytes] = []
    while i < ln:
        b = buf[i]
        if b == _FSST_ESCAPE:
            length = buf[i + 1] | (buf[i + 2] << 8)
            piece = buf[i + 3 : i + 3 + length]
            i += 3 + length
            if length == _FSST_MAX_LITERAL:
                pending.append(piece)
            elif pending:
                pending.append(piece)
                out.append(b"".join(pending))
                pending = []
            else:
                out.append(piece)
        else:
            out.append(table[b])
            i += 1
    return out


def _enc_fsst(values: np.ndarray, ptype: str):
    lenbuf, lp = _pack_lengths(values)
    data = b" ".join(values.tolist())
    tokens = data.split(b" ") if len(values) else []
    table = fsst_build_table(list(values), _FSST_MAX_SYMBOLS)
    # restrict table to tokens we actually see benefit from; assign codes 0..k-1
    code_of = {tok: bytes([i]) for i, tok in enumerate(table)}
    stream = _fsst_compress(tokens, code_of)
    tablebuf_items = np.empty(len(table), dtype=object)
    for i, t in enumerate(table):
        tablebuf_items[i] = t
    tablebuf, tp = _enc_plain(tablebuf_items, "bin")
    return lenbuf + tablebuf + stream, {
        **lp,
        "lb": len(lenbuf),
        "tb": len(tablebuf),
        "tp": tp,
        "nsym": len(table),
        "ntok": len(tokens),
    }


def _dec_fsst(payload: memoryview, params: dict, n: int, ptype: str) -> np.ndarray:
    lb, tb = params["lb"], params["tb"]
    lens = _unpack_lengths(bytes(payload[:lb]), params, n)
    table_arr = _dec_plain(payload[lb : lb + tb], params["tp"], params["nsym"], "bin")
    tokens = _fsst_decompress(payload[lb + tb :], list(table_arr), params["ntok"])
    data = b" ".join(tokens)
    # value i starts at cumsum(lens)[:i] + i (one separator byte per boundary)
    out = np.empty(n, dtype=object)
    pos = 0
    for i in range(n):
        out[i] = data[pos : pos + lens[i]]
        pos += int(lens[i]) + 1
    return out


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

CODECS = {
    "plain": (_enc_plain, _dec_plain),
    "dict": (_enc_dict, _dec_dict),
    "rle": (_enc_rle, _dec_rle),
    "for": (_enc_for, _dec_for),
    "bitpack": (_enc_bitpack, _dec_bitpack),
    "delta": (_enc_delta, _dec_delta),
    "fsst": (_enc_fsst, _dec_fsst),
}

_INT_ONLY = {"for", "bitpack", "delta"}
_STR_ONLY = {"fsst"}


def valid_codecs(ptype: str) -> list[str]:
    if is_string_ptype(ptype):
        return ["plain", "dict", "rle", "fsst"]
    if is_int_ptype(ptype):
        return ["plain", "dict", "rle", "for", "bitpack", "delta"]
    return ["plain", "dict", "rle"]  # floats


def encode_values(values: np.ndarray, ptype: str, codec: str) -> tuple[bytes, dict]:
    if codec not in CODECS:
        raise ValueError(f"unknown codec {codec!r}; valid: {sorted(CODECS)}")
    if codec in _INT_ONLY and not is_int_ptype(ptype):
        raise ValueError(f"codec {codec} requires integer ptype, got {ptype}")
    if codec in _STR_ONLY and not is_string_ptype(ptype):
        raise ValueError(f"codec {codec} requires string ptype, got {ptype}")
    enc, _ = CODECS[codec]
    return enc(values, ptype)


def decode_values(
    payload: memoryview | bytes, params: dict, n: int, ptype: str, codec: str
) -> np.ndarray:
    _, dec = CODECS[codec]
    return dec(memoryview(payload), params, n, ptype)
