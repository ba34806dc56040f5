"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The Spark-side plumbing (schemas, batch shapes, partitioning, UDF
signatures) is real and tested. Decoding:

- REAL (pure stdlib, no media libs needed): uncompressed 24/32-bit BMP
  (header + pixel array), PCM WAV via the stdlib ``wave`` module
  (channels/rate/duration + samples), PNG header (IHDR dimensions only —
  pixel decode would need the full filter pipeline).
- STUBBED for everything else (video: MP4/WebM/...): either raises
  ``NotImplementedError`` (strict mode) or produces a deterministic fake
  derived from the bytes (test mode), clearly marked.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, mime string, "
    "width int, height int, duration_ms int"
)


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap metadata that needs no decoder: byte size + content hash.
    JVM-side only — stays in whole-stage codegen."""
    return df.withColumn("n_bytes", F.length(F.col(content_col))).withColumn(
        "content_sha", F.sha2(F.col(content_col), 256)
    )


def make_bmp(width: int, height: int, pixels: bytes | None = None) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (BITMAPINFOHEADER, BI_RGB,
    bottom-up) — fixture/corpus generator for the real decode path.
    ``pixels``: height*width*3 BGR bytes, row order bottom-up; defaults to a
    deterministic gradient."""
    row_raw = width * 3
    pad = (-row_raw) % 4
    if pixels is None:
        pixels = bytes(
            (x * 7 + y * 13 + c * 29) % 256
            for y in range(height)
            for x in range(width)
            for c in range(3)
        )
    if len(pixels) != height * row_raw:
        raise ValueError("pixels must be height*width*3 bytes")
    body = b"".join(
        pixels[y * row_raw : (y + 1) * row_raw] + b"\x00" * pad
        for y in range(height)
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + body


def decode_bmp(buf: bytes) -> dict:
    """Parse an uncompressed 24/32-bit BI_RGB BMP: returns {width, height,
    channels, pixels} where pixels is an ndarray (height, width, channels)
    in top-down row order, BGR(A) channel order. Pure stdlib + numpy."""
    import numpy as np

    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", buf, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    bpp, compression = struct.unpack_from("<HI", buf, 28)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"only uncompressed 24/32-bit BMP (bpp={bpp})")
    channels = bpp // 8
    bottom_up = height > 0
    height = abs(height)
    stride = (width * channels + 3) & ~3
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=stride * height, offset=offset
    ).reshape(height, stride)[:, : width * channels]
    px = rows.reshape(height, width, channels)
    if bottom_up:
        px = px[::-1]
    return {"width": width, "height": height, "channels": channels, "pixels": px}


def decode_wav(buf: bytes) -> dict:
    """Parse a PCM WAV with the stdlib ``wave`` module: returns {channels,
    sample_rate, n_frames, duration_ms, samples} — samples as an int ndarray
    (n_frames, channels) for 8/16/32-bit PCM."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(buf), "rb") as w:
        nch, sw, rate, nframes = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes(),
        )
        raw = w.readframes(nframes)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise ValueError(f"unsupported PCM sample width {sw}")
    samples = np.frombuffer(raw, dtype=dtype).reshape(-1, nch)
    return {
        "channels": nch,
        "sample_rate": rate,
        "n_frames": nframes,
        "duration_ms": int(round(nframes * 1000 / rate)) if rate else 0,
        "samples": samples,
    }


def decode_png_header(buf: bytes) -> dict:
    """PNG IHDR dimensions (pure struct; pixel decode is out of scope —
    it needs the zlib+filter pipeline)."""
    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    width, height = struct.unpack_from(">II", buf, 16)
    return {"width": width, "height": height}


def decode_jpeg_header(buf: bytes) -> dict:
    """JPEG dimensions via an SOF-marker scan (pure stdlib): walks the
    marker segments from SOI to the first start-of-frame (SOF0 baseline,
    SOF2 progressive, and the other SOFn variants) and reads height/width/
    component count from it. Pixel decode needs a DCT pipeline and stays
    out of scope — but dimensions/metadata for the most common image
    format on the web are real, not faked."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    # SOFn markers are 0xC0-0xCF except DHT (C4), JPG (C8) and DAC (CC)
    sof = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}
    i = 2
    while i + 1 < len(buf):
        if buf[i] != 0xFF:
            raise ValueError(f"JPEG marker expected at offset {i}")
        marker = buf[i + 1]
        i += 2
        if marker == 0xFF:  # fill byte
            i -= 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers carry no length
        if i + 2 > len(buf):
            break
        seglen = int.from_bytes(buf[i : i + 2], "big")
        if marker in sof:
            precision = buf[i + 2]
            height, width = struct.unpack_from(">HH", buf, i + 3)
            return {
                "width": width,
                "height": height,
                "precision": precision,
                "components": buf[i + 7],
                "progressive": marker == 0xC2,
            }
        if marker == 0xDA:  # start of scan — SOF must have come first
            break
        i += seglen
    raise ValueError("no SOF marker before start of scan")


def make_jpeg_header(
    width: int, height: int, progressive: bool = False
) -> bytes:
    """Minimal structurally-valid JPEG prefix (SOI + APP0/JFIF + SOFn +
    SOS + EOI) for fixtures — real enough for any SOF-scanning dimension
    parser, no entropy-coded payload."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00\x01\x00\x01\x00\x00"
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = sof_marker + struct.pack(">HBHHB", 11, 8, height, width, 1) + b"\x01\x11\x00"
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    return b"\xff\xd8" + app0 + sof + sos + b"\xff\xd9"


def try_decode(buf: bytes) -> dict | None:
    """Sniff magic bytes and run the matching REAL decoder. Returns
    {kind, width, height, duration_ms, ...} or None if no real decoder
    matches (caller picks strict-raise vs deterministic fake)."""
    try:
        if buf[:2] == b"BM":
            d = decode_bmp(buf)
            return {"kind": "bmp", "width": d["width"], "height": d["height"],
                    "duration_ms": None, "pixels": d["pixels"]}
        if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
            d = decode_wav(buf)
            return {"kind": "wav", "width": None, "height": None,
                    "duration_ms": d["duration_ms"], "samples": d["samples"]}
        if buf[:8] == b"\x89PNG\r\n\x1a\n":
            d = decode_png_header(buf)
            return {"kind": "png", "width": d["width"], "height": d["height"],
                    "duration_ms": None}
        if buf[:2] == b"\xff\xd8":
            d = decode_jpeg_header(buf)
            return {"kind": "jpeg", "width": d["width"], "height": d["height"],
                    "duration_ms": None}
    except Exception:
        # corrupt/truncated media must degrade (strict-raise or fake), not
        # kill a 100 TB job mid-stage
        return None
    return None


def _fake_decode(buf: bytes) -> tuple[int, int]:
    """Deterministic fake 'decode': pretend dimensions derived from a hash
    of the bytes. STUB — replace with PIL/ffmpeg in a real deployment.

    Uses crc32, not builtin hash(): hash(bytes) is salted per Python process
    (PYTHONHASHSEED) and would differ across executors and retries."""
    import zlib

    h = zlib.crc32(buf) & 0x7FFFFFFF
    return 16 + h % 1024, 16 + (h >> 10) % 1024


def decode_media(
    df: DataFrame, content_col: str = "content", strict: bool = False
) -> DataFrame:
    """Decode media → (…, dec_width, dec_height, dec_duration_ms, dec_kind).
    Arrow-batched mapInPandas; one pandas DataFrame per batch.

    BMP/WAV decode and PNG/JPEG header parse are REAL (pure stdlib — see
    decode_bmp / decode_wav / decode_png_header / decode_jpeg_header; JPEG
    dimensions come from the SOF marker scan). For formats without any
    stdlib parser (video containers — MP4/WebM): strict=True raises
    NotImplementedError — the production integration point for ffmpeg;
    strict=False falls back to the deterministic fake (dec_kind='fake') so
    the distributed plumbing is testable end-to-end."""
    from pyspark.sql import types as T

    # note: StructType.add MUTATES in place — never call it on df.schema
    schema = T.StructType(
        df.schema.fields
        + [T.StructField("dec_width", T.IntegerType()),
           T.StructField("dec_height", T.IntegerType()),
           T.StructField("dec_duration_ms", T.IntegerType()),
           T.StructField("dec_kind", T.StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, ds, ks = [], [], [], []
            for b in pdf[content_col]:
                if b is None:
                    ws.append(None); hs.append(None); ds.append(None)
                    ks.append(None)
                    continue
                dec = try_decode(bytes(b))
                if dec is not None:
                    ws.append(dec["width"]); hs.append(dec["height"])
                    ds.append(dec["duration_ms"]); ks.append(dec["kind"])
                elif strict:
                    raise NotImplementedError(
                        "no stdlib decoder for this format (video needs "
                        "ffmpeg — not in this image); bytes start "
                        f"with {bytes(b)[:8]!r}"
                    )
                else:
                    w, h = _fake_decode(bytes(b))
                    ws.append(w); hs.append(h); ds.append(None)
                    ks.append("fake")
            yield pdf.assign(
                dec_width=pd.array(ws, dtype="Int32"),
                dec_height=pd.array(hs, dtype="Int32"),
                dec_duration_ms=pd.array(ds, dtype="Int32"),
                dec_kind=ks,
            )

    return df.mapInPandas(run, schema)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    content_col: str = "content",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Sample frame timestamps per video: one output row per sampled frame
    (media_id, frame_ts_ms, frame binary-stub). The explode is JVM-side;
    frame EXTRACTION is the stubbed pandas-UDF step."""
    frames = df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(duration_col) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )

    out_schema = "media_id long, frame_ts_ms int, frame binary"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # STUB frame extraction: deterministic 8-byte tag per frame
            frames_bytes = [
                bytes(f"f@{int(ts)}", "ascii") if c is not None else None
                for c, ts in zip(pdf[content_col], pdf["frame_ts_ms"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "frame": frames_bytes,
                }
            )

    return frames.mapInPandas(extract, out_schema)


def media_feature_vector(
    df: DataFrame, content_col: str = "content", dim: int = 16
) -> DataFrame:
    """Fixed-dim feature vector per media item (array<float>), L1-normalized.

    REAL content features where a stdlib decoder exists: BMP → histogram of
    decoded PIXEL values (not file bytes — header/padding excluded); WAV →
    histogram of |sample| magnitudes. Other formats: byte histogram (the
    deterministic stand-in for an embedding model — the real integration
    point). Output feeds operators.similarity directly."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def hist_of(arr) -> list[float]:
            h = np.bincount(arr % dim, minlength=dim).astype(np.float32)
            total = float(h.sum()) or 1.0
            return (h / total).tolist()

        for pdf in batches:
            feats = []
            for b in pdf[content_col]:
                if b is None:
                    feats.append(None)
                    continue
                dec = try_decode(bytes(b))
                if dec is not None and "pixels" in dec:
                    feats.append(hist_of(dec["pixels"].ravel().astype(np.int64)))
                elif dec is not None and "samples" in dec:
                    feats.append(
                        hist_of(np.abs(dec["samples"].ravel().astype(np.int64)))
                    )
                else:
                    feats.append(
                        hist_of(np.frombuffer(b, dtype=np.uint8).astype(np.int64))
                    )
            yield pdf.assign(features=feats)

    return df.mapInPandas(run, out_schema)
