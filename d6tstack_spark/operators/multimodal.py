"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The Spark-side plumbing (schemas, batch shapes, partitioning, UDF
signatures) is real and tested; the actual media decoding is STUBBED — the
image/audio libraries are not in this container. Each stub either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
derived from the bytes (test mode), clearly marked.
"""

from __future__ import annotations

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
    """Decode media → (…, dec_width, dec_height). Arrow-batched mapInPandas;
    one pandas DataFrame per batch, vectorized per batch.

    strict=True raises NotImplementedError (no media libs in this image) —
    the production integration point. strict=False uses the deterministic
    fake so the distributed plumbing is testable end-to-end."""
    from pyspark.sql import types as T

    # note: StructType.add MUTATES in place — never call it on df.schema
    schema = T.StructType(
        df.schema.fields
        + [T.StructField("dec_width", T.IntegerType()),
           T.StructField("dec_height", T.IntegerType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media decoding requires PIL/ffmpeg — not in this image; "
                    "swap _fake_decode for a real decoder"
                )
            dims = [
                _fake_decode(b) if b is not None else (None, None)
                for b in pdf[content_col]
            ]
            pdf = pdf.assign(
                dec_width=pd.array([d[0] for d in dims], dtype="Int32"),
                dec_height=pd.array([d[1] for d in dims], dtype="Int32"),
            )
            yield pdf

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
    """Fixed-dim feature vector per media item (array<float>). STUB features
    = seeded bytes histogram (deterministic, vectorized via numpy) — the
    real integration point for an embedding model. Output feeds
    operators.similarity directly."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for b in pdf[content_col]:
                if b is None:
                    feats.append(None)
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
                total = float(hist.sum()) or 1.0
                feats.append((hist / total).tolist())
            yield pdf.assign(features=feats)

    return df.mapInPandas(run, out_schema)
