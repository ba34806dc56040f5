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


def _iter_boxes(buf: bytes, start: int, end: int):
    """Walk ISO BMFF boxes in buf[start:end] → (type, body_start, body_end).
    Handles 64-bit largesize (size==1) and to-end-of-file (size==0)."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(buf[i : i + 4], "big")
        btype = buf[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                raise ValueError("truncated largesize box")
            size = int.from_bytes(buf[i + 8 : i + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr:
            raise ValueError(f"bad box size {size} at offset {i}")
        yield btype, i + hdr, min(i + size, end)
        i += size


def decode_mp4_header(buf: bytes) -> dict:
    """MP4/MOV container metadata via a pure-stdlib ISO BMFF box walk:
    ftyp brand, movie duration from mvhd (timescale-normalized to ms), and
    the first video track's pixel dimensions from tkhd (16.16 fixed
    point). Frame decode needs a codec and stays out of scope — but
    duration/dimensions for the dominant video container are real."""
    boxes = dict()
    brand = None
    n_tracks = 0
    width = height = duration_ms = None
    for btype, s, e in _iter_boxes(buf, 0, len(buf)):
        if btype == b"ftyp":
            brand = buf[s : s + 4].decode("latin-1")
        elif btype == b"moov":
            for mtype, ms, me in _iter_boxes(buf, s, e):
                if mtype == b"mvhd":
                    ver = buf[ms]
                    if ver == 1:
                        timescale = int.from_bytes(buf[ms + 20 : ms + 24], "big")
                        duration = int.from_bytes(buf[ms + 24 : ms + 32], "big")
                    else:
                        timescale = int.from_bytes(buf[ms + 12 : ms + 16], "big")
                        duration = int.from_bytes(buf[ms + 16 : ms + 20], "big")
                    if timescale:
                        duration_ms = duration * 1000 // timescale
                elif mtype == b"trak":
                    n_tracks += 1
                    for ttype, ts, te in _iter_boxes(buf, ms, me):
                        if ttype != b"tkhd":
                            continue
                        ver = buf[ts]
                        # tkhd v0: ver/flags(4) created(4) modified(4)
                        # id(4) rsvd(4) dur(4) rsvd(8) layer(2) group(2)
                        # volume(2) rsvd(2) matrix(36) width(4) height(4)
                        off = ts + (88 if ver == 1 else 76)
                        w = int.from_bytes(buf[off : off + 4], "big") >> 16
                        h = int.from_bytes(buf[off + 4 : off + 8], "big") >> 16
                        if w and h and width is None:
                            width, height = w, h
        boxes[btype] = (s, e)
    if b"moov" not in boxes and brand is None:
        raise ValueError("not an ISO BMFF file (no ftyp/moov)")
    return {"brand": brand, "width": width, "height": height,
            "duration_ms": duration_ms, "n_tracks": n_tracks}


def make_mp4_header(width: int, height: int, duration_ms: int,
                    brand: bytes = b"isom") -> bytes:
    """Minimal structurally-valid MP4 (ftyp + moov(mvhd + trak(tkhd)) +
    empty mdat) for fixtures — real enough for any box-walking metadata
    parser, no encoded samples."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    timescale = 1000
    mvhd = box(b"mvhd", struct.pack(">BxxxIIII", 0, 0, 0, timescale,
                                    duration_ms)
               + b"\x00" * 80)
    tkhd = box(b"tkhd", struct.pack(">BxxxIIIxxxxI", 0, 0, 0, 1, duration_ms)
               + b"\x00" * 52
               + struct.pack(">II", width << 16, height << 16))
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    return ftyp + moov + box(b"mdat", b"")


# --- Matroska/WebM: a real (minimal) EBML walk -----------------------------

_EBML_CONTAINERS = {
    0x1A45DFA3,  # EBML header
    0x18538067,  # Segment
    0x1549A966,  # Info
    0x1654AE6B,  # Tracks
    0xAE,        # TrackEntry
    0xE0,        # Video
}


def _ebml_vint(buf: bytes, i: int, keep_marker: bool) -> tuple[int, int]:
    """Read one EBML variable-length integer at offset i → (value, width).
    Element IDs keep the length-marker bit; sizes mask it off."""
    b0 = buf[i]
    if b0 == 0:
        raise ValueError(f"invalid EBML vint at {i}")
    width = 9 - b0.bit_length()
    if i + width > len(buf):
        raise ValueError("truncated EBML vint")
    raw = int.from_bytes(buf[i : i + width], "big")
    return (raw if keep_marker else raw & ((1 << (7 * width)) - 1)), width


def _ebml_walk(buf: bytes, start: int, end: int, out: dict) -> None:
    i = start
    while i < end:
        eid, w = _ebml_vint(buf, i, keep_marker=True)
        i += w
        size, w = _ebml_vint(buf, i, keep_marker=False)
        i += w
        # all-ones size = unknown (streamed Segment): runs to container end
        body_end = end if size == (1 << (7 * w)) - 1 else min(i + size, end)
        if eid in _EBML_CONTAINERS:
            _ebml_walk(buf, i, body_end, out)
        elif eid == 0x4282:  # DocType
            out["doctype"] = buf[i:body_end].rstrip(b"\x00").decode("latin-1")
        elif eid == 0x2AD7B1:  # TimestampScale (ns per tick)
            out["scale_ns"] = int.from_bytes(buf[i:body_end], "big")
        elif eid == 0x4489:  # Duration (float ticks)
            n = body_end - i
            out["duration_ticks"] = struct.unpack_from(
                ">f" if n == 4 else ">d", buf, i
            )[0]
        elif eid == 0xB0:  # PixelWidth
            out["width"] = int.from_bytes(buf[i:body_end], "big")
        elif eid == 0xBA:  # PixelHeight
            out["height"] = int.from_bytes(buf[i:body_end], "big")
        i = body_end


def decode_webm_header(buf: bytes) -> dict:
    """WebM/Matroska metadata via a pure-stdlib EBML walk: DocType,
    duration (TimestampScale-normalized to ms), and the first video
    track's pixel dimensions."""
    if buf[:4] != b"\x1aE\xdf\xa3":
        raise ValueError("not an EBML/Matroska file")
    out: dict = {}
    _ebml_walk(buf, 0, len(buf), out)
    scale_ns = out.get("scale_ns", 1_000_000)
    ticks = out.get("duration_ticks")
    return {
        "doctype": out.get("doctype"),
        "width": out.get("width"),
        "height": out.get("height"),
        # divide the (small) scale first: ticks * scale_ns overflows float64
        # integer precision past 2^53 (hypothesis-found on a 2^48 ms
        # duration), while scale_ns/1e6 is exact for the common ns scales
        "duration_ms": None if ticks is None
        else round(ticks * (scale_ns / 1e6)),
    }


def make_webm_header(width: int, height: int, duration_ms: int,
                     doctype: bytes = b"webm") -> bytes:
    """Minimal structurally-valid Matroska prefix (EBML header +
    Segment(Info + Tracks(TrackEntry(Video)))) for fixtures."""

    def vint(n: int) -> bytes:
        for width_ in range(1, 9):
            if n < (1 << (7 * width_)) - 1:
                return (n | (1 << (7 * width_))).to_bytes(width_, "big")
        raise ValueError(n)

    def elem(eid: int, body: bytes) -> bytes:
        return eid.to_bytes((eid.bit_length() + 7) // 8, "big") + vint(len(body)) + body

    info = elem(0x1549A966,
                elem(0x2AD7B1, (1_000_000).to_bytes(3, "big"))
                + elem(0x4489, struct.pack(">d", float(duration_ms))))
    video = elem(0xE0, elem(0xB0, width.to_bytes(2, "big"))
                 + elem(0xBA, height.to_bytes(2, "big")))
    tracks = elem(0x1654AE6B, elem(0xAE, video))
    header = elem(0x1A45DFA3, elem(0x4282, doctype))
    return header + elem(0x18538067, info + tracks)


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
        if buf[4:8] == b"ftyp":
            d = decode_mp4_header(buf)
            return {"kind": "mp4", "width": d["width"], "height": d["height"],
                    "duration_ms": d["duration_ms"]}
        if buf[:4] == b"\x1aE\xdf\xa3":
            d = decode_webm_header(buf)
            return {"kind": d.get("doctype") or "mkv", "width": d["width"],
                    "height": d["height"], "duration_ms": d["duration_ms"]}
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

    BMP/WAV decode and PNG/JPEG/MP4/WebM metadata parse are REAL (pure
    stdlib — decode_bmp / decode_wav / decode_png_header /
    decode_jpeg_header / decode_mp4_header / decode_webm_header: JPEG
    dimensions from the SOF marker scan, MP4 duration+dimensions from the
    ISO BMFF box walk, WebM from the EBML walk). Frame/pixel decode for
    compressed formats needs a codec (ffmpeg/PIL — not in this image):
    for bytes NO parser recognizes, strict=True raises
    NotImplementedError — the production codec integration point;
    strict=False falls back to the deterministic fake (dec_kind='fake')
    so the distributed plumbing is testable end-to-end."""
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
