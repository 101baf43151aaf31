"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as ``binary`` columns with
typed metadata; the Spark-side contract (schema, Arrow batch shape,
partition sizing) is real and tested — only the codec kernels are stubbed
because no image/audio libraries exist in this container.  Each stub is
deterministic (features derived from the payload bytes) so downstream
operators (dedup, ANN) are exercisable end to end; swap ``_decode_*`` for
PIL/torchaudio/ffmpeg bindings in a real deployment.

Design notes for 100 TB of media:
* payloads stay opaque ``binary`` until the LAST possible operator —
  filters/joins/dedup run on metadata and fingerprints, never on pixels;
* ``mapInPandas`` with ``spark.sql.execution.arrow.maxRecordsPerBatch``
  tuned down (payloads are MBs, not bytes) bounds executor memory;
* ``maxPartitionBytes`` (not row counts) governs scan parallelism.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int, codec string"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, feature array<float>, phash string"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id long, duration_ms int, n_frames int, feature array<float>"
)


def _bytes_rng(payload: bytes, n: int) -> np.ndarray:
    """Deterministic pseudo-features from payload bytes (stub kernel)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    return np.random.Generator(np.random.PCG64(seed)).random(n, dtype=np.float32)


def _decode_image_stub(payload: bytes, dim: int = 16) -> np.ndarray:
    """STUB — replace with a real decoder (PIL/turbojpeg).  Raises for
    payloads that do not carry the fake magic, mimicking codec errors."""
    if not payload:
        raise NotImplementedError(
            "real image decoding requires an image library absent from "
            "this container; payload was empty"
        )
    return _bytes_rng(payload, dim)


def image_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Decode + feature-extract images via mapInPandas (Arrow batches).

    Real plumbing: batch iterator in/out, per-row failure isolation (bad
    payloads are dropped, not fatal — at 100 TB some blobs are corrupt).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "feature": [], "phash": []}
            for mid, w, h, payload in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                try:
                    feat = _decode_image_stub(bytes(payload), dim)
                except (NotImplementedError, ValueError):
                    continue
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(feat.tolist())
                out["phash"].append(hashlib.md5(feat.tobytes()).hexdigest()[:16])
            if out["media_id"]:  # empty frames infer wrong Arrow types
                yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").select(
        "media_id", "width", "height", "payload"
    ).mapInPandas(op, schema=IMAGE_FEATURES_SCHEMA)


def audio_frame_sample(media: DataFrame, frame_ms: int = 1000, dim: int = 8) -> DataFrame:
    """Frame-sample audio payloads (stubbed codec, real batch plumbing)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "duration_ms": [], "n_frames": [], "feature": []}
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                if payload is None or len(payload) == 0:
                    continue
                n_frames = max(1, int(dur or 0) // frame_ms)
                out["media_id"].append(mid)
                out["duration_ms"].append(dur)
                out["n_frames"].append(n_frames)
                out["feature"].append(_bytes_rng(bytes(payload), dim).tolist())
            if out["media_id"]:  # empty frames infer wrong Arrow types
                yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "duration_ms", "payload"
    ).mapInPandas(op, schema=AUDIO_FEATURES_SCHEMA)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8))
        rows.append(
            (i, kind, payload, 64 + i % 128, 48 + i % 96, 1000 * (1 + i % 30), "fake")
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
