"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` operators. The actual codecs (PIL/ffmpeg/…) are
not available in this container, so the decode step is STUBBED: a
deterministic fake codec handles payloads produced by ``synth_media`` and a
clearly marked NotImplementedError is raised for real formats. The
Spark-side plumbing — schema, batch shapes, partitioning, UDF signatures —
is real and tested; swapping in a real codec is a one-function change.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, width int, height int, "
    "n_frames int, sample_rate int"
)

_FAKE_MAGIC = b"FAKE"


def synth_media(spark: SparkSession, n_rows: int, seed: int = 42,
                partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (payload = FAKE header + seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                kind = ["image", "audio", "video"][int(i) % 3]
                w, h = 16 + int(i) % 8, 16 + int(i) % 5
                nf = 1 if kind == "image" else 8 + int(i) % 4
                body = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
                payload = _FAKE_MAGIC + struct.pack("<iii", w, h, nf) + body
                rows.append(
                    (f"m{int(i):08d}", kind, payload, w, h, nf,
                     16000 if kind != "image" else 0)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "width", "height",
                         "n_frames", "sample_rate"],
            )

    return spark.range(0, n_rows, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_payload(payload: bytes) -> np.ndarray:
    """STUB decode: real codecs unavailable in this environment."""
    if payload[:4] == _FAKE_MAGIC:
        w, h, nf = struct.unpack("<iii", payload[4:16])
        body = np.frombuffer(payload[16:], dtype=np.uint8)
        need = w * h
        reps = int(np.ceil(need / len(body)))
        return np.tile(body, reps)[:need].reshape(h, w)
    raise NotImplementedError(
        "real media decoding requires an image/audio codec library "
        "(not present in this container); only FAKE payloads are supported"
    )


def extract_features(df: DataFrame, n_features: int = 8) -> DataFrame:
    """Decode + pooled feature extraction per media row (Arrow-batched).

    Output schema is the plumbing contract: (media_id, kind, features).
    """
    schema = f"media_id string, kind string, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                px = _decode_payload(bytes(payload)).astype(np.float64)
                # pooled intensity histogram -> fixed-size feature vector
                hist, _ = np.histogram(px, bins=n_features, range=(0, 256))
                total = hist.sum() or 1
                feats.append((hist / total).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame index."""
    return (
        df.where(F.col("kind") != "image")
        .select(
            "media_id",
            "kind",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_ix"),
        )
    )


def resize_meta(df: DataFrame, max_side: int = 8) -> DataFrame:
    """Resize planning (pure metadata math, JVM-side): target dims keeping
    aspect ratio with the long side clamped to max_side."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")),
    )
    return df.select(
        "media_id",
        "width",
        "height",
        F.greatest(F.lit(1), F.round(F.col("width") * scale).cast("int")).alias(
            "target_w"
        ),
        F.greatest(F.lit(1), F.round(F.col("height") * scale).cast("int")).alias(
            "target_h"
        ),
    )
