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


def _dec_plain_arrow(payload: memoryview, params: dict, n: int):
    """Zero-copy-ish arrow decode for plain strings: lengths → offsets →
    BinaryArray.from_buffers over the payload's data region."""
    import pyarrow as pa

    lb = params["lb"]
    lens = _unpack_lengths(bytes(payload[:lb]), params, n)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    return pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(bytes(payload[lb:]))],
    )


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
# FSST — greedy ≤255-symbol-table string compression, token-granular, columnar
# ---------------------------------------------------------------------------
#
# Follows the greedy-symbol-table idea of Boncz/Neumann/Leis, "FSST: Fast
# Random Access String Compression" (VLDB 2020), adapted so encode and decode
# stay fully vectorized (Arrow C++ tokenization + numpy array ops — no
# per-byte scalar loop):
#   1. symbols are whole space-delimited tokens (gain = count × (len+1): the
#      +1 is the separator byte a coded token also elides); the ≤255-entry
#      table is built greedily per block over exact token counts;
#   2. the wire format is columnar: [code-per-token u8 stream, 0xFF = escape]
#      [escaped-token ids, bit-packed][escaped-token dictionary] — FSST's
#      escape+raw-bytes is replaced by escape+dictionary-reference, which
#      both compresses repeated cold tokens and keeps decode a pure take().

_FSST_LITERAL = 0xFF
_FSST_MAX_SYMBOLS = 255


def _enc_fsst(values: np.ndarray, ptype: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    if len(values) == 0:
        return b"", {"tcb": 0, "tw": 0, "tref": 0, "lb": 0, "tb": 0, "tp": {},
                     "nsym": 0, "ntok": 0, "nlit": 0, "nlitu": 0, "ldb": 0,
                     "ldp": {}, "liw": 0}
    va = pa.array(values, type=pa.binary())
    splits = pc.split_pattern(va, pattern=b" ")
    # tokens-per-row (not byte lengths): decode rebuilds each row as a C++
    # binary_join over its token slice — no per-row python
    tpr = pc.list_value_length(splits).to_numpy(zero_copy_only=False).astype(np.int64)
    tref = int(tpr.min())
    tw = _bit_width(int(tpr.max()) - tref)
    tprbuf = bitpack((tpr - tref).view(np.uint64), tw)
    flat = pc.list_flatten(splits)
    denc = flat.dictionary_encode()
    idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dic = denc.dictionary
    counts = np.bincount(idx, minlength=len(dic))
    dlens = pc.binary_length(dic).to_numpy(zero_copy_only=False).astype(np.int64)
    gain = counts * (dlens + 1)
    gain = np.where(counts <= 1, 0, gain)
    order = np.argsort(-gain, kind="stable")
    k = min(_FSST_MAX_SYMBOLS, int((gain[order] > 0).sum()))
    sym = np.full(len(dic), -1, dtype=np.int64)
    sym[order[:k]] = np.arange(k)
    tok_syms = sym[idx]
    code_stream = tok_syms.copy()
    code_stream[code_stream < 0] = _FSST_LITERAL
    code_stream = code_stream.astype(np.uint8)
    # escaped (literal) tokens: per-occurrence reference into a literal dict
    lit_uniq_ids = np.flatnonzero(sym < 0)
    lit_local = np.full(len(dic), -1, dtype=np.int64)
    lit_local[lit_uniq_ids] = np.arange(len(lit_uniq_ids))
    lit_occ = tok_syms < 0
    lit_ids = lit_local[idx[lit_occ]]
    lw = _bit_width(len(lit_uniq_ids) - 1) if len(lit_uniq_ids) > 1 else 0
    lit_ids_buf = bitpack(lit_ids.view(np.uint64), lw)
    table_items = dic.take(pa.array(order[:k])).to_numpy(zero_copy_only=False)
    lit_items = dic.take(pa.array(lit_uniq_ids)).to_numpy(zero_copy_only=False)
    tablebuf, tp = _enc_plain(np.asarray(table_items, dtype=object), "bin")
    litdictbuf, ldp = _enc_plain(np.asarray(lit_items, dtype=object), "bin")
    payload = tprbuf + tablebuf + litdictbuf + code_stream.tobytes() + lit_ids_buf
    return payload, {
        "tcb": len(tprbuf),
        "tw": tw,
        "tref": tref,
        "lb": len(tprbuf),  # kept for layout symmetry with other codecs
        "tb": len(tablebuf),
        "tp": tp,
        "nsym": k,
        "ntok": len(idx),
        "nlit": int(lit_occ.sum()),
        "nlitu": len(lit_uniq_ids),
        "ldb": len(litdictbuf),
        "ldp": ldp,
        "liw": lw,
    }


def _dec_fsst_arrow(payload: memoryview, params: dict, n: int, ptype: str):
    """Arrow-native FSST decode: combined-dictionary take → per-row
    binary_join over token slices. All C++ — no per-row python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ntok = params["ntok"]
    if ntok == 0:
        return pa.array([b""] * n, type=pa.binary())
    pos = params["tcb"]
    tpr = (
        bitunpack(bytes(payload[:pos]), params["tw"], n).view(np.int64)
        + params["tref"]
    )
    tb = params["tb"]
    table_pa = _dec_plain_arrow(payload[pos : pos + tb], params["tp"], params["nsym"])
    pos += tb
    ldb = params["ldb"]
    lit_pa = _dec_plain_arrow(payload[pos : pos + ldb], params["ldp"], params["nlitu"])
    pos += ldb
    code_stream = np.frombuffer(payload[pos : pos + ntok], dtype=np.uint8)
    pos += ntok
    lit_ids = bitunpack(bytes(payload[pos:]), params["liw"], params["nlit"]).astype(
        np.int64
    )
    ids = code_stream.astype(np.int64)
    lit_mask = code_stream == _FSST_LITERAL
    ids[lit_mask] = params["nsym"] + lit_ids
    full = pa.concat_arrays([table_pa, lit_pa]) if len(lit_pa) else table_pa
    tokens = pc.take(full, pa.array(ids, type=pa.int64()))
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(tpr, out=offsets[1:])
    rows = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), tokens)
    return pc.binary_join(rows, pa.scalar(b" ", type=pa.binary()))


def _dec_fsst(payload: memoryview, params: dict, n: int, ptype: str) -> np.ndarray:
    return _dec_fsst_arrow(payload, params, n, ptype).to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------------------
# zstd — OPTIONAL heavy container codec (not in the auto-selector's default
# lightweight set, per the north rule; reachable via codec_overrides for the
# "zstd as stretch comparison" profile, BASELINE.md §targets)
# ---------------------------------------------------------------------------


def _enc_zstd(values: np.ndarray, ptype: str):
    import pyarrow as pa

    inner, ip = _enc_plain(values, ptype)
    buf = pa.Codec("zstd").compress(inner, asbytes=True)
    return buf, {"ip": ip, "dsize": len(inner)}


def _dec_zstd(payload: memoryview, params: dict, n: int, ptype: str) -> np.ndarray:
    import pyarrow as pa

    inner = pa.Codec("zstd").decompress(
        bytes(payload), params["dsize"], asbytes=True
    )
    return _dec_plain(memoryview(inner), params["ip"], n, ptype)


def _enc_zstd_arrow(arr):
    import pyarrow as pa

    inner, ip = _enc_plain_arrow(arr)
    buf = pa.Codec("zstd").compress(inner, asbytes=True)
    return buf, {"ip": ip, "dsize": len(inner)}


def _dec_zstd_arrow(payload: memoryview, params: dict, n: int, ptype: str):
    import pyarrow as pa

    inner = pa.Codec("zstd").decompress(bytes(payload), params["dsize"], asbytes=True)
    return _dec_plain_arrow(memoryview(inner), params["ip"], n)


# ---------------------------------------------------------------------------
# fpsplit: sign / exponent / mantissa field split for float columns
# ---------------------------------------------------------------------------
#
# IEEE floats in real data have near-random mantissas (incompressible) but
# low-entropy exponents and a free-standing sign bit. Splitting the fields
# and encoding each at its own entropy beats whole-value compression:
#   sign      → packbits (1 bit/value, irreducible)
#   exponent  → zstd over the byte/short stream (~2-4 bits/value typical)
#   mantissa  → bitpacked at full field width (exact, no waste from the
#               sign/exponent bits that a plain copy would carry)
# Bit-identical round-trip for every payload including NaN/Inf/-0.0:
# the three fields reassemble the exact original bit pattern.

_FP_LAYOUT = {
    "f32": (np.uint32, 31, 23, 0xFF, np.uint8),
    "f64": (np.uint64, 63, 52, 0x7FF, np.uint16),
}


def _enc_fpsplit(values: np.ndarray, ptype: str):
    import pyarrow as pa

    utype, sign_shift, mant_bits, exp_mask, exp_store = _FP_LAYOUT[ptype]
    u = np.ascontiguousarray(values, dtype=dtype_of(ptype)).view(utype)
    u64 = u.astype(np.uint64)
    sign = (u64 >> np.uint64(sign_shift)).astype(np.uint8)
    exp = ((u64 >> np.uint64(mant_bits)) & np.uint64(exp_mask)).astype(exp_store)
    mant = u64 & np.uint64((1 << mant_bits) - 1)
    sign_b = np.packbits(sign).tobytes()
    exp_raw = exp.tobytes()
    exp_b = pa.Codec("zstd").compress(exp_raw, asbytes=True)
    mant_b = bitpack(mant, mant_bits)
    return sign_b + exp_b + mant_b, {"sb": len(sign_b), "eb": len(exp_b),
                                     "er": len(exp_raw)}


def float_exponent_entropy(values: np.ndarray, ptype: str) -> float:
    """Empirical entropy (bits/value) of the exponent field — the selector's
    size-model input for fpsplit."""
    if len(values) == 0 or ptype not in _FP_LAYOUT:
        return 8.0
    utype, _sign_shift, mant_bits, exp_mask, _store = _FP_LAYOUT[ptype]
    u = np.ascontiguousarray(values, dtype=dtype_of(ptype)).view(utype)
    exp = ((u.astype(np.uint64) >> np.uint64(mant_bits))
           & np.uint64(exp_mask)).astype(np.int64)
    freq = np.bincount(exp)
    p = freq[freq > 0] / len(exp)
    return float(-(p * np.log2(p)).sum())


def _dec_fpsplit(payload: memoryview, params: dict, n: int, ptype: str) -> np.ndarray:
    import pyarrow as pa

    utype, sign_shift, mant_bits, _exp_mask, exp_store = _FP_LAYOUT[ptype]
    sb, eb = params["sb"], params["eb"]
    sign = np.unpackbits(
        np.frombuffer(payload[:sb], dtype=np.uint8), count=n
    ).astype(np.uint64)
    exp_raw = pa.Codec("zstd").decompress(
        bytes(payload[sb : sb + eb]), params["er"], asbytes=True
    )
    exp = np.frombuffer(exp_raw, dtype=exp_store).astype(np.uint64)
    mant = bitunpack(bytes(payload[sb + eb :]), mant_bits, n)
    u64 = (sign << np.uint64(sign_shift)) | (exp << np.uint64(mant_bits)) | mant
    return u64.astype(utype).view(dtype_of(ptype)).copy()


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
    "fsst2": (
        lambda v, t: _enc_fsst_from_arrow(__import__("pyarrow").array(v, type=__import__("pyarrow").binary()), bigrams=True),
        _dec_fsst,
    ),
    "zstd": (_enc_zstd, _dec_zstd),
    "fpsplit": (_enc_fpsplit, _dec_fpsplit),
}

_INT_ONLY = {"for", "bitpack", "delta"}
_STR_ONLY = {"fsst", "fsst2"}
_FLOAT_ONLY = {"fpsplit"}


def valid_codecs(ptype: str) -> list[str]:
    if is_string_ptype(ptype):
        return ["plain", "dict", "rle", "fsst"]
    if is_int_ptype(ptype):
        return ["plain", "dict", "rle", "for", "bitpack", "delta"]
    return ["plain", "dict", "rle", "fpsplit"]  # floats


def encode_values(values: np.ndarray, ptype: str, codec: str) -> tuple[bytes, dict]:
    if codec not in CODECS:
        raise ValueError(f"unknown codec {codec!r}; valid: {sorted(CODECS)}")
    if codec in _INT_ONLY and not is_int_ptype(ptype):
        raise ValueError(f"codec {codec} requires integer ptype, got {ptype}")
    if codec in _STR_ONLY and not is_string_ptype(ptype):
        raise ValueError(f"codec {codec} requires string ptype, got {ptype}")
    if codec in _FLOAT_ONLY and ptype not in _FLOAT_DTYPES:
        raise ValueError(f"codec {codec} requires float ptype, got {ptype}")
    enc, _ = CODECS[codec]
    return enc(values, ptype)


# ---------------------------------------------------------------------------
# arrow-native string encode (no python-object materialization)
# ---------------------------------------------------------------------------


def _arrow_lens_and_data(arr) -> tuple[np.ndarray, bytes]:
    """(byte lengths, contiguous value blob) of a no-null Arrow binary array."""
    import pyarrow.compute as pc

    if len(arr) == 0:
        return np.zeros(0, dtype=np.int64), b""
    lens = pc.binary_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    # offsets buffer accounts for arr.offset; slice the data region exactly
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = arr.buffers()[2]
    blob = bytes(memoryview(data)[int(offsets[0]) : int(offsets[-1])]) if len(arr) else b""
    return lens, blob


def _enc_plain_arrow(arr) -> tuple[bytes, dict]:
    lens, blob = _arrow_lens_and_data(arr)
    if len(lens) == 0:
        return b"", {"lw": 0, "lref": 0, "lb": 0}
    ref = int(lens.min())
    width = _bit_width(int(lens.max()) - ref)
    lenbuf = bitpack((lens - ref).view(np.uint64), width)
    return lenbuf + blob, {"lw": width, "lref": ref, "lb": len(lenbuf)}


def _enc_dict_arrow(arr) -> tuple[bytes, dict]:
    denc = arr.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    dic = denc.dictionary
    width = _bit_width(len(dic) - 1) if len(dic) > 1 else 0
    dictbuf, dp = _enc_plain_arrow(dic)
    return dictbuf + bitpack(codes, width), {
        "card": len(dic),
        "w": width,
        "db": len(dictbuf),
        "dp": dp,
    }


def _enc_rle_arrow(arr) -> tuple[bytes, dict]:
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(arr)
    if n == 0:
        vbuf, vp = _enc_plain_arrow(arr)
        return vbuf, {"runs": 0, "vb": len(vbuf), "vp": vp, "rw": 0, "rref": 0}
    changed = np.ones(n, dtype=bool)
    if n > 1:
        neq = pc.not_equal(arr.slice(1), arr.slice(0, n - 1))
        changed[1:] = neq.to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(changed).astype(np.int64)
    run_values = pc.take(arr, pa.array(starts, type=pa.int64()))
    run_lens = np.diff(np.append(starts, n)).astype(np.int64)
    vbuf, vp = _enc_plain_arrow(run_values)
    ref = int(run_lens.min())
    width = _bit_width(int(run_lens.max()) - ref)
    lbuf = bitpack((run_lens - ref).view(np.uint64), width)
    return vbuf + lbuf, {
        "runs": len(starts),
        "vb": len(vbuf),
        "vp": vp,
        "rw": width,
        "rref": ref,
    }


def build_fsst_table(arr, max_symbols: int | None = None) -> list[bytes]:
    """Build a unigram FSST symbol table (code-ordered token list) from a
    SAMPLE array — the job-level "two-pass shared table" variant: the
    driver builds one table per string column from a bounded sample at
    plan time, and every block encodes against it (see _enc_fsst_shared).
    Deterministic for a given sample (stable argsort, ties by first
    occurrence), so block bytes stay reproducible under task retries and
    resume re-encodes."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if len(arr) == 0:
        return []
    flat = pc.list_flatten(pc.split_pattern(arr, pattern=b" "))
    denc = flat.dictionary_encode()
    idx = denc.indices.to_numpy(zero_copy_only=False)
    dic = denc.dictionary
    counts = np.bincount(idx, minlength=len(dic))
    dlens = pc.binary_length(dic).to_numpy(zero_copy_only=False).astype(np.int64)
    gain = counts * (dlens + 1)
    gain = np.where(counts <= 1, 0, gain)
    order = np.argsort(-gain, kind="stable")
    k = min(max_symbols or _FSST_MAX_SYMBOLS, int((gain[order] > 0).sum()))
    sel = order[:k]
    vals = dic.take(pa.array(sel)).to_pylist()
    return [bytes(v) for v in vals]


def _enc_fsst_shared(arr, table: list[bytes]) -> tuple[bytes, dict] | None:
    """Encode against a pre-built shared symbol table: ONE hash pass
    (pc.index_in) maps every token straight to its code — no per-block
    counting, gain ranking, or greedy selection, and far less DRAM
    traffic than the local-table path (the 32-core scaling ceiling is
    memory bandwidth). Wire format and decoder are IDENTICAL to the
    local-table encoder: each block still carries the (shared) table, so
    blocks stay self-contained.

    Returns None when the table fits the block badly (literal fraction
    above ~25% — content drifted from the sample); the caller then falls
    back to the per-block local-table build. The decision depends only on
    block content + table, so encode stays bitwise-deterministic."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if len(arr) == 0 or not table:
        return None
    table_pa = pa.array(table, type=pa.binary())
    splits = pc.split_pattern(arr, pattern=b" ")
    tpr = pc.list_value_length(splits).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(splits)
    codes_i = pc.index_in(flat, value_set=table_pa)  # null = not in table
    ntok = len(codes_i)
    nlit = codes_i.null_count
    if ntok == 0:
        return None  # degenerate; local path handles it
    if nlit > max(64, ntok // 4):
        return None  # drift: shared table doesn't fit this block
    # stay uint8 end-to-end: table codes are < 255 by construction, so the
    # int32 index array casts down arrow-side — no 4-byte numpy
    # materialization of the million-token stream (DRAM is the ceiling)
    code_stream = pc.fill_null(
        codes_i.cast(pa.uint8()), _FSST_LITERAL
    ).to_numpy(zero_copy_only=False)
    if nlit:
        lit_arr = flat.filter(pc.is_null(codes_i))
        # dictionary_encode ids are first-occurrence-ordered — the same
        # contract as the local path's pd.factorize
        ldenc = lit_arr.dictionary_encode()
        lit_ids = ldenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        lit_uniq = ldenc.dictionary
    else:
        lit_ids = np.zeros(0, dtype=np.int64)
        lit_uniq = pa.array([], type=pa.binary())
    lw = _bit_width(len(lit_uniq) - 1) if len(lit_uniq) > 1 else 0
    lit_ids_buf = bitpack(lit_ids.view(np.uint64), lw)
    tpr64 = tpr.astype(np.int64)
    tref = int(tpr64.min())
    tw = _bit_width(int(tpr64.max()) - tref)
    tprbuf = bitpack((tpr64 - tref).view(np.uint64), tw)
    tablebuf, tp = _enc_plain_arrow(table_pa)
    litdictbuf, ldp = _enc_plain_arrow(lit_uniq)
    payload = tprbuf + tablebuf + litdictbuf + code_stream.tobytes() + lit_ids_buf
    return payload, {
        "tcb": len(tprbuf),
        "tw": tw,
        "tref": tref,
        "lb": len(tprbuf),
        "tb": len(tablebuf),
        "tp": tp,
        "nsym": len(table),
        "ntok": ntok,
        "nlit": nlit,
        "nlitu": len(lit_uniq),
        "ldb": len(litdictbuf),
        "ldp": ldp,
        "liw": lw,
    }


def _enc_fsst_from_arrow(arr, bigrams: bool = False) -> tuple[bytes, dict]:
    """The _enc_fsst body starting from an Arrow binary array (shared by the
    object-API wrapper below and the arrow-native block path).

    bigrams=True ("fsst2") admits adjacent-token pairs into the ≤255-symbol
    table — ~8%% smaller text at ~30%% more encode CPU; same wire format and
    decoder (a bigram entry is just a table value containing the separator).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if len(arr) == 0:
        return b"", {"tcb": 0, "tw": 0, "tref": 0, "lb": 0, "tb": 0, "tp": {},
                     "nsym": 0, "ntok": 0, "nlit": 0, "nlitu": 0, "ldb": 0,
                     "ldp": {}, "liw": 0}
    splits = pc.split_pattern(arr, pattern=b" ")
    # token-stream arrays stay int32: they are the largest allocations in
    # the encode hot path and DRAM bandwidth is the 32-core ceiling — only
    # the pair-key products (which can exceed 2^31) widen to int64, lazily
    tpr = pc.list_value_length(splits).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(splits)
    denc = flat.dictionary_encode()
    idx = denc.indices.to_numpy(zero_copy_only=False)
    dic = denc.dictionary
    U = max(len(dic), 1)
    ntok_in = len(idx)
    counts = np.bincount(idx, minlength=len(dic))
    dlens = pc.binary_length(dic).to_numpy(zero_copy_only=False).astype(np.int64)
    ugain = counts * (dlens + 1)
    ugain = np.where(counts <= 1, 0, ugain)

    # --- bigram symbols (the multi-gram spirit of true FSST): count adjacent
    # same-row token pairs on a bounded sample, admit high-gain pairs to the
    # shared ≤255-entry table as "tokA tokB" values — decode is unchanged
    # because a bigram entry joined into a row reproduces both tokens and
    # their separator exactly.
    # row boundaries instead of a materialized per-token row id: the encode
    # path is DRAM-bound at 32 workers, and row_of was a full token-stream
    # allocation used only for (a) the cross-row pair mask and (b) the
    # per-row keep counts — both derivable from cumsum(tpr)
    row_bounds = np.cumsum(tpr, dtype=np.int64)
    if bigrams and ntok_in > 1:
        # pair (i, i+1) is same-row unless i is the last token of a row
        pair_ok = np.ones(ntok_in - 1, dtype=bool)
        ends = row_bounds[:-1] - 1  # last-token positions of all but last row
        pair_ok[ends[(ends >= 0) & (ends < ntok_in - 1)]] = False
        cap = 262144
        sample_pk = (
            idx[: cap + 1][:-1].astype(np.int64) * U + idx[1 : cap + 1]
        )[pair_ok[:cap]]
        pu, pcnt = np.unique(sample_pk, return_counts=True)
        scale = max(int(pair_ok.sum()), 1) / max(len(sample_pk), 1)
        del sample_pk
        pa_ids, pb_ids = pu // U, pu % U
        # a coded pair replaces two tokens + separator with one code byte
        pgain = (pcnt * scale * (dlens[pa_ids] + dlens[pb_ids] + 2)).astype(np.int64)
        pgain = np.where(pcnt <= 1, 0, pgain)
    else:
        pair_ok = np.zeros(0, dtype=bool)
        pu = np.zeros(0, dtype=np.int64)
        pgain = np.zeros(0, dtype=np.int64)

    # --- unified greedy selection over unigrams + bigrams
    all_gain = np.concatenate([ugain, pgain])
    order = np.argsort(-all_gain, kind="stable")
    k = min(_FSST_MAX_SYMBOLS, int((all_gain[order] > 0).sum()))
    sel = order[:k]
    usym = np.full(len(dic), -1, dtype=np.int32)
    uni_sel = sel[sel < len(dic)]
    usym[uni_sel] = np.flatnonzero(sel < len(dic)).astype(np.int32)
    pair_sel_rows = np.flatnonzero(sel >= len(dic))
    sel_pk = pu[sel[pair_sel_rows] - len(dic)]
    pk_order = np.argsort(sel_pk, kind="stable")
    sel_pk_sorted = sel_pk[pk_order]
    sel_pk_code = pair_sel_rows[pk_order]  # symbol code of each sorted pair

    # --- greedy non-overlapping pair matching. Pre-filter: a pair can only
    # start where the FIRST token is one of the ≤255 selected pairs' first
    # tokens, so the expensive lookups run on a small candidate subset.
    keep = np.zeros(max(ntok_in - 1, 0), dtype=bool)
    pair_code_at: np.ndarray | None = None
    if len(sel_pk_sorted) and ntok_in > 1:
        first_ok = np.zeros(U, dtype=bool)
        first_ok[sel_pk_sorted // U] = True
        cand = np.flatnonzero(first_ok[idx[:-1]] & pair_ok)
        if len(cand):
            pk_cand = idx[cand].astype(np.int64) * U + idx[cand + 1]
            j = np.searchsorted(sel_pk_sorted, pk_cand)
            j_cl = np.minimum(j, len(sel_pk_sorted) - 1)
            hit = sel_pk_sorted[j_cl] == pk_cand
            found_pos = cand[hit]
            found = np.zeros(max(ntok_in - 1, 0), dtype=bool)
            found[found_pos] = True
            keep[:] = found
            keep[1:] &= ~found[:-1]
            pair_code_at = np.zeros(ntok_in - 1, dtype=np.int32)
            pair_code_at[found_pos] = sel_pk_code[j_cl[hit]].astype(np.int32)
    keep_pos = np.flatnonzero(keep)
    emit = np.ones(ntok_in, dtype=bool)
    emit[keep_pos + 1] = False  # token consumed into the pair before it

    # --- per-emitted-position code (codes mutated in place: the full-length
    # np.where copy was one more token-stream allocation)
    codes = usym[idx]
    if len(keep_pos):
        codes[keep_pos] = pair_code_at[keep_pos]
    no_sym = codes < 0
    lit_positions = emit & no_sym
    codes[no_sym] = _FSST_LITERAL
    code_stream = codes[emit].astype(np.uint8)

    # --- literals: emitted positions with no symbol. pd.factorize is the
    # O(n) hash-based uniquing (np.unique sorts — measured 10x slower on
    # the literal stream); first-occurrence order is deterministic given
    # the block content, which is all decode needs (ids are positional).
    lit_occ_ids = idx[lit_positions]
    if len(lit_occ_ids):
        import pandas as _pd

        lit_ids, lit_uniq_ids = _pd.factorize(lit_occ_ids)
        lit_ids = lit_ids.astype(np.int64)
        lit_uniq_ids = np.asarray(lit_uniq_ids, dtype=np.int64)
    else:
        lit_ids = np.zeros(0, dtype=np.int64)
        lit_uniq_ids = np.zeros(0, dtype=np.int64)
    lw = _bit_width(len(lit_uniq_ids) - 1) if len(lit_uniq_ids) > 1 else 0
    lit_ids_buf = bitpack(lit_ids.view(np.uint64), lw)

    # --- emitted tokens per row (pairs reduce their row's count by 1);
    # row id of each kept pair via searchsorted on the row boundaries
    tpr_emit = tpr - np.bincount(
        np.searchsorted(row_bounds, keep_pos, side="right"), minlength=len(tpr)
    )
    tref = int(tpr_emit.min())
    tw = _bit_width(int(tpr_emit.max()) - tref)
    tprbuf = bitpack((tpr_emit - tref).view(np.uint64), tw)

    # --- symbol table in code order (unigram entries + "A B" bigram entries)
    table_items: list[bytes | None] = [None] * k
    uni_vals = dic.take(pa.array(uni_sel)).to_pylist()
    for pos, v in zip(usym[uni_sel], uni_vals):
        table_items[int(pos)] = v
    if len(pair_sel_rows):
        pair_pk_in_code_order = pu[sel[pair_sel_rows] - len(dic)]
        a_vals = dic.take(pa.array(pair_pk_in_code_order // U)).to_pylist()
        b_vals = dic.take(pa.array(pair_pk_in_code_order % U)).to_pylist()
        for pos, a, b in zip(pair_sel_rows, a_vals, b_vals):
            table_items[int(pos)] = a + b" " + b
    tablebuf, tp = _enc_plain_arrow(pa.array(table_items, type=pa.binary()))
    litdictbuf, ldp = _enc_plain_arrow(dic.take(pa.array(lit_uniq_ids)))
    payload = tprbuf + tablebuf + litdictbuf + code_stream.tobytes() + lit_ids_buf
    return payload, {
        "tcb": len(tprbuf),
        "tw": tw,
        "tref": tref,
        "lb": len(tprbuf),
        "tb": len(tablebuf),
        "tp": tp,
        "nsym": k,
        "ntok": int(emit.sum()),
        "nlit": int(lit_positions.sum()),
        "nlitu": len(lit_uniq_ids),
        "ldb": len(litdictbuf),
        "ldp": ldp,
        "liw": lw,
    }


_ARROW_STR_ENCODERS = {
    "plain": _enc_plain_arrow,
    "dict": _enc_dict_arrow,
    "rle": _enc_rle_arrow,
    "fsst": _enc_fsst_from_arrow,
    "fsst2": lambda a: _enc_fsst_from_arrow(a, bigrams=True),
}


def _register_zstd_arrow():
    # registered after definitions below (zstd arrow variants are defined
    # later in the file); called at import bottom
    _ARROW_STR_ENCODERS["zstd"] = _enc_zstd_arrow
    _ARROW_STR_DECODERS["zstd"] = _dec_zstd_arrow


def encode_values_arrow(arr, ptype: str, codec: str) -> tuple[bytes, dict]:
    """Encode a no-null Arrow binary array directly — the encode hot path
    (skips python-object materialization entirely)."""
    if not is_string_ptype(ptype):
        raise ValueError("encode_values_arrow is for str/bin ptypes")
    return _ARROW_STR_ENCODERS[codec](arr)


def _dec_dict_arrow(payload: memoryview, params: dict, n: int, ptype: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    card, width, db = params["card"], params["w"], params["db"]
    uniques = _dec_plain_arrow(payload[:db], params["dp"], card)
    codes = bitunpack(bytes(payload[db:]), width, n).astype(np.int64)
    return pc.take(uniques, pa.array(codes, type=pa.int64()))


def _dec_rle_arrow(payload: memoryview, params: dict, n: int, ptype: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    runs, vb = params["runs"], params["vb"]
    run_values = _dec_plain_arrow(payload[:vb], params["vp"], runs)
    run_lens = (
        bitunpack(bytes(payload[vb:]), params["rw"], runs).view(np.int64)
        + params["rref"]
    )
    idx = np.repeat(np.arange(runs, dtype=np.int64), run_lens)
    return pc.take(run_values, pa.array(idx, type=pa.int64()))


_ARROW_STR_DECODERS = {
    "plain": lambda p, prm, n, t: _dec_plain_arrow(p, prm, n),
    "dict": _dec_dict_arrow,
    "rle": _dec_rle_arrow,
    "fsst": _dec_fsst_arrow,
    "fsst2": _dec_fsst_arrow,
}


def decode_values_arrow(
    payload: memoryview | bytes, params: dict, n: int, ptype: str, codec: str
):
    """String/binary decode straight to an Arrow BinaryArray (C++ take/join
    paths, no per-row python) — the hot path for decode_table."""
    if not is_string_ptype(ptype):
        raise ValueError("decode_values_arrow is for str/bin ptypes")
    return _ARROW_STR_DECODERS[codec](memoryview(payload), params, n, ptype)


def decode_values(
    payload: memoryview | bytes, params: dict, n: int, ptype: str, codec: str
) -> np.ndarray:
    _, dec = CODECS[codec]
    return dec(memoryview(payload), params, n, ptype)


_register_zstd_arrow()
