"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partitioning — while the actual
codec step is stubbed: the runtime has no image/audio libraries, so
``decode=\"real\"`` raises ``NotImplementedError`` at the exact seam
where PIL/ffmpeg would plug in, and ``decode=\"fake\"`` derives
deterministic pseudo-features from the bytes (md5-seeded) so the
distributed pipeline is exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, n_channels int, "
    "duration_ms long, codec string"
)

FEATURE_SCHEMA = "key string, feature array<float>, meta struct<" + MEDIA_META_SCHEMA + ">"


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata struct next to the opaque binary column."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_channels"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ),
    ).withColumn("payload_size", F.octet_length(payload_col))


def _fake_decode(payload: bytes, feat_dim: int) -> tuple[np.ndarray, dict]:
    """Deterministic stand-in for a real decode: md5-seeded features
    + plausible metadata derived from the byte length."""
    digest = hashlib.md5(payload).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    feat = rng.standard_normal(feat_dim).astype(np.float32)
    meta = {
        "media_type": "image",
        "width": 64 + (digest[8] % 64),
        "height": 64 + (digest[9] % 64),
        "n_channels": 3,
        "duration_ms": None,
        "codec": "fake",
    }
    return feat, meta


def decode_features(
    df: DataFrame,
    key_col: str = "key",
    payload_col: str = "payload",
    feat_dim: int = 16,
    decode: str = "fake",
) -> DataFrame:
    """Distributed decode + feature extraction over binary payloads.

    ``mapInPandas`` so each Arrow batch is decoded in one vectorized
    pass; repartition upstream to balance byte volume, not row count.
    """
    if decode not in ("fake", "real"):
        raise ValueError(decode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                # seam for PIL/torchvision/ffmpeg — not available in
                # this runtime by design
                raise NotImplementedError(
                    "real media decoding requires image/audio libs; "
                    "use decode='fake' for pipeline testing"
                )
            feats, metas = [], []
            for payload in pdf[payload_col]:
                f, m = _fake_decode(bytes(payload), feat_dim)
                feats.append(f.tolist())
                metas.append(m)
            yield pd.DataFrame(
                {
                    "key": pdf[key_col].astype(str),
                    "feature": feats,
                    "meta": metas,
                }
            )

    return df.select(key_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = "key string, width int, height int, payload binary"


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resample: tile the payload's
    md5 hex digest to exactly ``width*height*3`` bytes (one RGB pixel
    buffer), so the output is byte-reproducible by a SQL oracle
    (``repeat(md5(x), k)`` truncated)."""
    hexd = hashlib.md5(payload).hexdigest()
    n = width * height * 3
    return (hexd * (n // len(hexd) + 1))[:n].encode()


def resize_images(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    key_col: str = "key",
    payload_col: str = "payload",
    decode: str = "fake",
) -> DataFrame:
    """Distributed image resize over binary payloads: ``mapInPandas``
    batches, one fixed-size output buffer per row. ``decode="real"``
    is the PIL/torchvision seam (NotImplementedError in this runtime);
    ``decode="fake"`` produces deterministic buffers of the exact
    target size so schema, batch shape and byte volume are real."""
    if decode not in ("fake", "real"):
        raise ValueError(decode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real media decoding requires image/audio libs; "
                    "use decode='fake' for pipeline testing"
                )
            yield pd.DataFrame(
                {
                    "key": pdf[key_col].astype(str),
                    "width": width,
                    "height": height,
                    "payload": [
                        _fake_resize(bytes(p), width, height)
                        for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(key_col, payload_col).mapInPandas(run, RESIZED_SCHEMA)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    key_col: str = "key",
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled
    frame offset (deterministic from payload size; real extraction is
    the same NotImplementedError seam)."""
    n_frames = F.least(
        F.greatest((F.octet_length(payload_col) / F.lit(1000)).cast("int"), F.lit(1)),
        F.lit(16),
    )
    return (
        df.withColumn("n_frames", n_frames)
        .select(
            key_col,
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
        .withColumn("offset_ms", F.col("frame_idx") * F.lit(every_ms))
    )
