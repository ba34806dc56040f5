"""Property-based codec round-trips (hypothesis) — beyond the reference's
test strategy (it has no property testing, SURVEY.md §5): any values array
must survive encode→decode bit-identically under every applicable codec and
under auto-selection with nulls."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from d6tstack_spark.codecs import kernels
from d6tstack_spark.codecs.blocks import decode_block, encode_block

ints = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62 - 1), min_size=0, max_size=300
)
texts = st.lists(st.binary(min_size=0, max_size=64), min_size=0, max_size=200)
floats = st.lists(
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    min_size=0,
    max_size=200,
)


def _obj(items):
    a = np.empty(len(items), dtype=object)
    for i, x in enumerate(items):
        a[i] = x
    return a


@settings(max_examples=60, deadline=None)
@given(ints, st.sampled_from(["plain", "dict", "rle", "for", "delta"]))
def test_int_codecs_roundtrip(values, codec):
    arr = np.array(values, dtype=np.int64)
    payload, params = kernels.encode_values(arr, "i64", codec)
    out = kernels.decode_values(payload, params, len(arr), "i64", codec)
    np.testing.assert_array_equal(arr, out)


@settings(max_examples=60, deadline=None)
@given(texts, st.sampled_from(["plain", "dict", "rle", "fsst", "fsst2"]))
def test_str_codecs_roundtrip(values, codec):
    arr = _obj(values)
    payload, params = kernels.encode_values(arr, "str", codec)
    out = kernels.decode_values(payload, params, len(arr), "str", codec)
    assert list(out) == values


@settings(max_examples=40, deadline=None)
@given(floats, st.sampled_from(["plain", "dict", "rle", "fpsplit"]))
def test_float_codecs_bit_identical(values, codec):
    arr = np.array(values, dtype=np.float64)
    payload, params = kernels.encode_values(arr, "f64", codec)
    out = kernels.decode_values(payload, params, len(arr), "f64", codec)
    np.testing.assert_array_equal(arr.view(np.uint64), np.asarray(out).view(np.uint64))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.floats(allow_nan=True, allow_infinity=True, width=32),
                min_size=0, max_size=12,
            ),
        ),
        min_size=0, max_size=60,
    )
)
def test_floatlist_block_bit_identical(lists):
    import pyarrow as pa

    from d6tstack_spark.codecs.blocks import (
        decode_block_floatlist,
        encode_block_floatlist,
    )

    arr = pa.array(lists, type=pa.list_(pa.float32()))
    blk = encode_block_floatlist(arr, "f32list")
    out = decode_block_floatlist(
        blk.payload, blk.params, blk.n_rows, blk.null_count, "f32list"
    )
    # bit-level compare (NaN payloads included) via the uint32 view
    for a, b in zip(arr.to_pylist(), out.to_pylist()):
        if a is None or b is None:
            assert a is None and b is None
            continue
        av = np.array(a, dtype=np.float32).view(np.uint32)
        bv = np.array(b, dtype=np.float32).view(np.uint32)
        np.testing.assert_array_equal(av, bv)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-(2**40), 2**40), st.booleans()),
        min_size=0,
        max_size=200,
    )
)
def test_block_auto_with_nulls(pairs):
    values = np.array([v for v, _ in pairs], dtype=np.int64)
    valid = np.array([ok for _, ok in pairs], dtype=bool)
    blk = encode_block(values, valid if len(pairs) else None, "i64")
    out, v2 = decode_block(
        blk.payload, blk.params, blk.codec, len(values), blk.null_count, "i64"
    )
    np.testing.assert_array_equal(valid if len(pairs) else np.ones(0, bool), v2)
    np.testing.assert_array_equal(values[valid], np.asarray(out)[v2])
    # never-worse-than-plain guarantee holds universally
    assert blk.enc_bytes <= len(values) * 8 + len(np.packbits(valid)) + 64
