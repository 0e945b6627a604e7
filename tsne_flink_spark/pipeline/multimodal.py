"""Multimodal column handling: image/audio/video as opaque BINARY columns
with typed metadata, processed in Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image`` raises unless ``fake=True``, in which case a deterministic
fake decoder (seeded by the content hash) produces stable pseudo-pixels so
the Spark-side plumbing — schema, partitioning, UDF signature, batch shape —
is real and testable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, format string"
)


def attach_binary_payload(
    docs: DataFrame, payload_col: str = "payload", seed: int = 42
) -> DataFrame:
    """Synthesize a deterministic BINARY payload column from the text (test
    harness for the multimodal path; real pipelines read binary from
    parquet/object storage)."""
    return docs.withColumn(
        payload_col, F.to_binary(F.sha2(F.col("text"), 256), F.lit("hex"))
    )


def _fake_decode(payload: bytes, width: int = 8, height: int = 8) -> np.ndarray:
    """Deterministic fake 'decoder': content-hash-seeded uint8 pixels."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload.  Real decoding requires an imaging library
    not present in this container — STUB."""
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "image decoding requires an imaging library (e.g. Pillow); "
        "not available in this environment — use fake=True for plumbing tests"
    )


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake_decode: bool = True,
) -> DataFrame:
    """Per-image feature extraction over Arrow batches:
    (id, mean/std per channel, feature vector).  The decode is the stub; the
    batching, schema, and vectorized feature math are the real pipeline."""

    schema = (
        f"{id_col} bigint, mean_r double, mean_g double, mean_b double, "
        "std_gray double, features array<double>"
    )

    def per_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image(bytes(payload), fake=fake_decode).astype(
                    np.float64
                )
                means = img.mean(axis=(0, 1))
                gray = img.mean(axis=2)
                # 4x4 block-mean grid as an 16-dim embedding
                h, w = gray.shape
                blocks = gray[: h - h % 4, : w - w % 4].reshape(
                    4, h // 4, 4, w // 4
                ).mean(axis=(1, 3))
                out.append(
                    {
                        id_col: rid,
                        "mean_r": means[0],
                        "mean_g": means[1],
                        "mean_b": means[2],
                        "std_gray": float(gray.std()),
                        "features": (blocks.ravel() / 255.0).tolist(),
                    }
                )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(per_batch, schema=schema)


def resize_images(
    df: DataFrame,
    height: int,
    width: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake_decode: bool = True,
) -> DataFrame:
    """Resize plumbing: decode -> nearest-neighbor resample -> re-emit as a
    raw RGB byte payload with typed size metadata.

    The decode is the stub (``decode_image``); the Arrow batching, the
    vectorized nearest-neighbor index math, and the output schema
    (binary payload + height/width columns) are the real pipeline.  A real
    deployment swaps the decode and an interpolating resampler in the same
    kernel.
    """

    schema = f"{id_col} bigint, height int, width int, payload binary"

    def per_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image(bytes(payload), fake=fake_decode)
                h, w = img.shape[:2]
                ri = (np.arange(height) * h // height).clip(0, h - 1)
                ci = (np.arange(width) * w // width).clip(0, w - 1)
                resized = img[ri[:, None], ci[None, :]]
                out.append(
                    {
                        id_col: rid,
                        "height": height,
                        "width": width,
                        "payload": resized.tobytes(),
                    }
                )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(per_batch, schema=schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_nth: int = 10,
    n_frames: int = 3,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (id, frame_idx,
    frame_payload) rows.  The 'frames' are deterministic sub-slices of the
    payload (decode stubbed); real pipelines swap in a video demuxer."""

    schema = f"{id_col} bigint, frame_idx int, frame_payload binary"

    def per_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                for fi in range(n_frames):
                    off = (fi * every_nth) % max(len(raw), 1)
                    rows.append(
                        {
                            id_col: rid,
                            "frame_idx": fi * every_nth,
                            "frame_payload": raw[off:] + raw[:off],
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(per_batch, schema=schema)
