"""Multimodal column handling (engine extension).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (schemas.MEDIA_SCHEMA). The Spark-side plumbing — schema,
partition-friendly batch iteration, Arrow batch shapes, UDF
signatures — is real and tested; the actual codecs are NOT available
in this container, so the decode step is stubbed: by default it
raises ``NotImplementedError``, and with ``fake=True`` it produces a
deterministic fake decode (payload-hash-seeded) so downstream
operators (feature extract, resize bookkeeping, frame sampling) can
be exercised end-to-end.

Design: all media transforms run through ``mapInPandas`` so each Arrow
batch is handled once per partition with no per-row Python overhead,
and payloads never transit the driver.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "asset_id string, media_type string, ok boolean, width int, "
    "height int, n_frames int, feature array<float>"
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in for a real codec: dimensions and a
    feature vector derived from the payload hash."""
    h = hashlib.md5(payload or b"").digest()
    rng = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    feat = np.resize(rng, FEATURE_DIM) / 255.0
    return {
        "ok": True,
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "n_frames": 1 if media_type == "image" else 1 + h[2] % 30,
        "feature": feat.tolist(),
    }


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas.

    Real decoding requires image/audio libraries not present in this
    environment — STUB: raises NotImplementedError unless fake=True.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "pass fake=True for the deterministic test decode"
                )
            out = []
            for _, row in pdf.iterrows():
                d = _fake_decode(row["payload"], row["media_type"])
                out.append(
                    {
                        "asset_id": row["asset_id"],
                        "media_type": row["media_type"],
                        **d,
                    }
                )
            yield pd.DataFrame(out)

    return df.select("asset_id", "media_type", "payload").mapInPandas(
        run, schema=DECODE_SCHEMA
    )


def sample_frames(
    decoded: DataFrame, every_nth: int = 5
) -> DataFrame:
    """Frame-sampling bookkeeping: one row per sampled frame index
    (video/audio assets only). Pure DataFrame fan-out — the actual
    frame bytes would come from the codec in a real deployment."""
    return (
        decoded.where(F.col("n_frames") > 1)
        .select(
            "asset_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(every_nth)
                )
            ).alias("frame_index"),
        )
    )


def resize_plan(
    decoded: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Resize bookkeeping: scale factors + letterbox padding for each
    asset (the arithmetic a real resize kernel needs, testable without
    the kernel)."""
    scale = F.least(
        F.lit(target_w) / F.col("width"), F.lit(target_h) / F.col("height")
    )
    new_w = F.round(F.col("width") * scale).cast("int")
    new_h = F.round(F.col("height") * scale).cast("int")
    return decoded.select(
        "asset_id",
        F.round(scale, 6).alias("scale"),
        new_w.alias("new_width"),
        new_h.alias("new_height"),
        ((F.lit(target_w) - new_w) / 2).cast("int").alias("pad_x"),
        ((F.lit(target_h) - new_h) / 2).cast("int").alias("pad_y"),
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Per-type corpus stats over the raw binary column (no decode):
    count, total/mean payload bytes."""
    return (
        df.groupBy("media_type")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.round(F.avg(F.octet_length("payload")), 2).alias("mean_bytes"),
        )
    )
