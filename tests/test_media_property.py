"""Property-based media container parsing (hypothesis): the stdlib
metadata parsers must (a) round-trip any fixture-built container exactly
and (b) never escape try_decode on arbitrary bytes — a corrupt blob in a
100 TB media column must degrade to None, not kill a stage."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from d6tstack_spark.operators.multimodal import (
    decode_jpeg_header,
    decode_mp4_header,
    decode_webm_header,
    make_jpeg_header,
    make_mp4_header,
    make_webm_header,
    try_decode,
)

dims = st.integers(min_value=1, max_value=65535)
durations = st.integers(min_value=0, max_value=2**31 - 1)


@settings(max_examples=80, deadline=None)
@given(dims, dims, durations)
def test_mp4_roundtrip(w, h, ms):
    d = decode_mp4_header(make_mp4_header(w, h, ms))
    assert (d["width"], d["height"], d["duration_ms"]) == (w, h, ms)


@settings(max_examples=80, deadline=None)
@given(dims, dims, st.integers(min_value=0, max_value=2**48))
def test_webm_roundtrip(w, h, ms):
    d = decode_webm_header(make_webm_header(w, h, ms))
    assert (d["width"], d["height"], d["duration_ms"]) == (w, h, ms)


@settings(max_examples=80, deadline=None)
@given(dims, dims, st.booleans())
def test_jpeg_roundtrip(w, h, progressive):
    d = decode_jpeg_header(make_jpeg_header(w, h, progressive))
    assert (d["width"], d["height"], d["progressive"]) == (w, h, progressive)


magic_prefixes = st.sampled_from(
    [b"", b"BM", b"RIFF", b"\x89PNG\r\n\x1a\n", b"\xff\xd8",
     b"\x00\x00\x00\x18ftyp", b"\x1aE\xdf\xa3"]
)


@settings(max_examples=200, deadline=None)
@given(magic_prefixes, st.binary(min_size=0, max_size=256))
def test_try_decode_never_raises(prefix, junk):
    out = try_decode(prefix + junk)
    assert out is None or isinstance(out, dict)
