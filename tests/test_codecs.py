"""Codec kernel round-trip tests — the encode→decode→bit-identical discipline
that replays d6tstack's combine/to_parquet equivalence checks
(reference tests/test_combine_csv.py:434-466) at the codec level.

Adversarial corpus per FIXTURES.md: empty, all-null, single-value, all-distinct,
non-ASCII / embedded NUL+newline strings, int extremes, 1-row blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from d6tstack_spark.codecs import kernels
from d6tstack_spark.codecs.blocks import decode_block, encode_block
from d6tstack_spark.codecs.selector import choose_codec, sniff_stats

RNG = np.random.default_rng(42)


def roundtrip(values, ptype, codec):
    payload, params = kernels.encode_values(values, ptype, codec)
    out = kernels.decode_values(payload, params, len(values), ptype, codec)
    return out, payload


def assert_identical(a, b, ptype):
    assert len(a) == len(b)
    if ptype in ("str", "bin"):
        assert list(a) == list(b)
    elif ptype in ("f32", "f64"):
        # bit-identical, incl. NaN payloads
        av = np.asarray(a).view(np.uint64 if ptype == "f64" else np.uint32)
        bv = np.asarray(b).view(np.uint64 if ptype == "f64" else np.uint32)
        np.testing.assert_array_equal(av, bv)
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.asarray(b).dtype == kernels.dtype_of(ptype)


# ---------------------------------------------------------------- bit helpers


@pytest.mark.parametrize("width", [0, 1, 3, 7, 8, 13, 31, 33, 63, 64])
def test_bitpack_roundtrip(width):
    n = 257
    hi = (1 << width) - 1 if width else 0
    vals = RNG.integers(0, hi + 1, size=n, dtype=np.uint64) if width < 64 else (
        RNG.integers(0, 1 << 62, size=n, dtype=np.uint64) * 4
    )
    buf = kernels.bitpack(vals, width)
    out = kernels.bitunpack(buf, width, n)
    np.testing.assert_array_equal(vals if width else np.zeros(n, np.uint64), out)


def test_zigzag_extremes():
    v = np.array([0, -1, 1, np.iinfo(np.int64).min, np.iinfo(np.int64).max], np.int64)
    np.testing.assert_array_equal(kernels.unzigzag(kernels.zigzag(v)), v)


# ------------------------------------------------------------------- integers

INT_CASES = {
    "empty": np.array([], dtype=np.int64),
    "one": np.array([7], dtype=np.int64),
    "runs": np.repeat(np.array([5, 5, 9, 1, 1, 1], dtype=np.int64), 50),
    "sorted": np.arange(1000, dtype=np.int64) * 3 + 10,
    "random": RNG.integers(-(10**12), 10**12, 2000).astype(np.int64),
    "extremes": np.array(
        [np.iinfo(np.int64).min, -1, 0, 1, np.iinfo(np.int64).max], np.int64
    ),
    "i32_extremes": np.array(
        [np.iinfo(np.int32).min, 0, np.iinfo(np.int32).max], np.int32
    ),
    "all_equal": np.full(500, -42, dtype=np.int64),
}


@pytest.mark.parametrize("codec", ["plain", "dict", "rle", "for", "delta"])
@pytest.mark.parametrize("name", list(INT_CASES))
def test_int_roundtrip(codec, name):
    arr = INT_CASES[name]
    ptype = "i32" if arr.dtype == np.int32 else "i64"
    out, _ = roundtrip(arr, ptype, codec)
    assert_identical(arr, out, ptype)


def test_bitpack_codec_nonneg():
    arr = np.array([0, 5, 1023, 7], dtype=np.int64)
    out, payload = roundtrip(arr, "i64", "bitpack")
    assert_identical(arr, out, "i64")
    assert len(payload) <= 8  # 4 values * 10 bits
    with pytest.raises(ValueError):
        kernels.encode_values(np.array([-1], np.int64), "i64", "bitpack")


def test_for_compresses_small_range():
    arr = RNG.integers(10**9, 10**9 + 128, 4096).astype(np.int64)
    _, payload = roundtrip(arr, "i64", "for")
    assert len(payload) <= 4096  # ≤8 bits/value vs 8 bytes plain


def test_delta_compresses_monotone_timestamps():
    ts = np.cumsum(RNG.integers(1, 120, 4096)).astype(np.int64) * 1_000_000
    out, payload = roundtrip(ts, "i64", "delta")
    assert_identical(ts, out, "i64")
    assert len(payload) < len(ts) * 8 / 2


# --------------------------------------------------------------------- floats

FLOAT_CASES = {
    "empty": np.array([], dtype=np.float64),
    "nan_inf": np.array([np.nan, np.inf, -np.inf, -0.0, 0.0, 1.5], np.float64),
    "repeated": np.repeat(np.array([1.25, 3.5], np.float64), 100),
    "random": RNG.normal(size=1000),
}


@pytest.mark.parametrize("codec", ["plain", "dict", "rle"])
@pytest.mark.parametrize("name", list(FLOAT_CASES))
def test_float_roundtrip(codec, name):
    arr = FLOAT_CASES[name]
    out, _ = roundtrip(arr, "f64", codec)
    assert_identical(arr, out, "f64")


# -------------------------------------------------------------------- strings


def _obj(items):
    a = np.empty(len(items), dtype=object)
    for i, x in enumerate(items):
        a[i] = x
    return a


STR_CASES = {
    "empty": _obj([]),
    "one": _obj([b"hello"]),
    "empties": _obj([b"", b"", b"x", b""]),
    "categorical": _obj([b"user", b"assistant", b"tool", b"user"] * 64),
    "distinct": _obj([f"row-{i:06d}".encode() for i in range(500)]),
    "nonascii": _obj(["héllo wörld".encode(), "日本語 テスト".encode(), b"a\x00b\nc\td"]),
    "spaces": _obj([b" lead", b"trail ", b"  double  spaces  ", b" ", b"  "]),
    "longtext": _obj(
        [
            b" ".join(
                RNG.choice(
                    [b"the", b"quick", b"fox", b"jumps", b"lazy", b"dog", b"tool_call"],
                    size=60,
                )
            )
            for _ in range(200)
        ]
    ),
    "huge_token": _obj([b"A" * 70000, b"B" * 65535, b"C" * 131070, b"short"]),
}


@pytest.mark.parametrize("codec", ["plain", "dict", "rle", "fsst", "fsst2"])
@pytest.mark.parametrize("name", list(STR_CASES))
def test_str_roundtrip(codec, name):
    arr = STR_CASES[name]
    out, _ = roundtrip(arr, "str", codec)
    assert_identical(arr, out, "str")


def test_fsst_actually_compresses():
    arr = STR_CASES["longtext"]
    raw = sum(len(x) for x in arr)
    _, payload = roundtrip(arr, "str", "fsst")
    assert len(payload) < raw * 0.6, (len(payload), raw)


def test_dict_compresses_categorical():
    arr = STR_CASES["categorical"]
    raw = sum(len(x) for x in arr) + 4 * len(arr)
    _, payload = roundtrip(arr, "str", "dict")
    assert len(payload) < raw / 3


# ------------------------------------------------------------------ block API


def test_block_nulls_roundtrip_int():
    n = 1000
    arr = RNG.integers(0, 50, n).astype(np.int64)
    valid = RNG.random(n) > 0.3
    blk = encode_block(arr, valid, "i64")
    out, v2 = decode_block(blk.payload, blk.params, blk.codec, n, blk.null_count, "i64")
    np.testing.assert_array_equal(valid, v2)
    np.testing.assert_array_equal(arr[valid], np.asarray(out)[v2])
    assert blk.null_count == int((~valid).sum())


def test_block_all_null():
    n = 64
    arr = np.zeros(n, dtype=np.int64)
    valid = np.zeros(n, dtype=bool)
    blk = encode_block(arr, valid, "i64")
    out, v2 = decode_block(blk.payload, blk.params, blk.codec, n, blk.null_count, "i64")
    assert not v2.any()
    assert blk.null_count == n


def test_block_string_nulls():
    vals = _obj([b"a", b"", b"bb", b"ccc", b"dddd"] * 20)
    valid = np.arange(100) % 3 != 0
    blk = encode_block(vals, valid, "str")
    out, v2 = decode_block(blk.payload, blk.params, blk.codec, 100, blk.null_count, "str")
    np.testing.assert_array_equal(valid, v2)
    assert [x for x, ok in zip(out, v2) if ok] == [x for x, ok in zip(vals, valid) if ok]


def test_block_single_row():
    blk = encode_block(_obj([b"only"]), None, "str")
    out, v = decode_block(blk.payload, blk.params, blk.codec, 1, 0, "str")
    assert list(out) == [b"only"] and v.all()


# ------------------------------------------------------------------- selector


def test_selector_picks_expected_codecs():
    # categorical strings → dict
    role = _obj([b"user", b"assistant", b"system", b"tool"] * 2000)
    RNG.shuffle(role)
    assert choose_codec(role, "str") == "dict"
    # sorted repeated keys → rle
    conv = _obj([f"conv-{i:06d}".encode() for i in range(50) for _ in range(200)])
    assert choose_codec(conv, "str") == "rle"
    # long high-cardinality text → fsst
    text = STR_CASES["longtext"]
    assert choose_codec(text, "str") == "fsst"
    # small-range ints → for/dict family
    small = RNG.integers(0, 7, 10000).astype(np.int64)
    assert choose_codec(small, "i64") in ("for", "dict")
    # monotone timestamps with small steps → delta
    ts = np.cumsum(RNG.integers(1_000_000, 120_000_000, 10000)).astype(np.int64)
    assert choose_codec(ts, "i64") == "delta"
    # random doubles → fpsplit (sign/exp/mantissa split beats whole-value plain)
    assert choose_codec(RNG.normal(size=5000), "f64") == "fpsplit"


def test_selector_deterministic():
    vals = _obj([f"w{i % 97}".encode() for i in range(5000)])
    assert choose_codec(vals, "str") == choose_codec(vals.copy(), "str")


def test_sniff_stats_shape():
    s = sniff_stats(np.arange(100000, dtype=np.int64), "i64")
    assert s["card"] > 1000 and s["avg_run"] == 1.0 and s["delta_width"] == 2
    assert s["for_width"] >= 17  # range ≈ 100k even from the strided sample


class TestSharedFsstTable:
    """Job-level shared symbol table: build from a sample, encode via one
    hash pass, decode with the unchanged wire decoder."""

    def _corpus(self, n=4000):
        words = ["alpha", "beta", "gamma", "delta", "eps"]
        return pa.array(
            [
                (" ".join(words[(i + j) % 5] for j in range(1 + i % 7))).encode()
                for i in range(n)
            ],
            pa.binary(),
        )

    def test_roundtrip_matches_local_path(self):
        arr = self._corpus()
        table = kernels.build_fsst_table(arr.slice(0, 500))
        assert 0 < len(table) <= 255
        res = kernels._enc_fsst_shared(arr, table)
        assert res is not None
        payload, params = res
        dec = kernels._dec_fsst_arrow(memoryview(payload), params, len(arr), "str")
        assert dec.to_pylist() == arr.to_pylist()
        # same decoder handles the local-table encoding — one wire format
        lp, lpar = kernels._enc_fsst_from_arrow(arr)
        ldec = kernels._dec_fsst_arrow(memoryview(lp), lpar, len(arr), "str")
        assert ldec.to_pylist() == arr.to_pylist()

    def test_drift_falls_back(self):
        arr = self._corpus()
        alien = kernels.build_fsst_table(
            pa.array([b"zz qq ww rr tt uu"] * 50, pa.binary())
        )
        assert kernels._enc_fsst_shared(arr, alien) is None

    def test_literals_and_edges(self):
        table = kernels.build_fsst_table(
            pa.array([b"hot cold hot cold"] * 10, pa.binary())
        )
        vals = [b"hot cold"] * 20 + [b"", b"  ", b"hot rare cold", b"hot"]
        arr = pa.array(vals * 30, pa.binary())
        res = kernels._enc_fsst_shared(arr, table)
        assert res is not None
        payload, params = res
        assert params["nlit"] > 0  # 'rare' survives as a literal
        dec = kernels._dec_fsst_arrow(memoryview(payload), params, len(arr), "str")
        assert dec.to_pylist() == vals * 30
        # a table built from a sample WITH the edge rows keeps them coded
        t2 = kernels.build_fsst_table(arr.slice(0, 48))
        p2, pr2 = kernels._enc_fsst_shared(arr, t2)
        d2 = kernels._dec_fsst_arrow(memoryview(p2), pr2, len(arr), "str")
        assert d2.to_pylist() == vals * 30

    def test_deterministic(self):
        arr = self._corpus()
        t1 = kernels.build_fsst_table(arr)
        t2 = kernels.build_fsst_table(arr)
        assert t1 == t2
        p1, _ = kernels._enc_fsst_shared(arr, t1)
        p2, _ = kernels._enc_fsst_shared(arr, t1)
        assert p1 == p2

    def test_block_encoder_uses_table(self):
        from d6tstack_spark.codecs.blocks import decode_block_arrow, encode_block_arrow

        arr = self._corpus()
        table = kernels.build_fsst_table(arr.slice(0, 500))
        blk = encode_block_arrow(arr, "bin", "fsst", fsst_table=table)
        assert blk.codec == "fsst"
        dec = decode_block_arrow(
            blk.payload, blk.params, blk.codec, blk.n_rows, blk.null_count, "bin"
        )
        assert dec.to_pylist() == arr.to_pylist()
