"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Spark-side design (the part that matters at 100 TB and IS real and tested):
  * payloads are `binary` columns + a metadata struct (mime, n_bytes, fp) —
    parquet stores them page-compressed; column pruning means metadata-only
    queries never touch payload bytes
  * decode / feature-extract run as Arrow-batched mapInPandas stages —
    batch-shaped Python, never per-row UDFs; partitioning is preserved
  * the actual codec calls are STUBBED (`decode_image`) — the decode
    libraries are not in this container; the stub is deterministic so
    pipelines remain testable end-to-end

The reference has no multimodal surface; this is extension scope mandated by
the build target (BASELINE.json north star).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

ASSET_SCHEMA = (
    "asset_id long, payload binary, mime string, n_bytes long, content_fp string"
)


def pack_assets(
    df: DataFrame, id_col: str, payload_col, mime: str = "application/octet-stream"
) -> DataFrame:
    """Wrap a binary-producing column into the canonical asset schema."""
    payload = payload_col
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        payload.alias("payload"),
        F.lit(mime).alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_fp"),
    )


def decode_image(payload: bytes) -> bytes:
    """STUB — real image decode requires codec libraries not present in this
    environment. Raises so nobody mistakes the fake features for real ones."""
    raise NotImplementedError(
        "image/audio decode libs are not available in this container; "
        "use fake_features (deterministic) for plumbing tests"
    )


def _fake_feature_vector(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: bytes of the
    payload folded into FEATURE_DIM buckets, normalized. Replace with a real
    decoder + model when codecs are available — same signature, same schema."""
    acc = [0] * FEATURE_DIM
    for i, byte in enumerate(payload):
        acc[i % FEATURE_DIM] += byte
    total = sum(acc) or 1
    return [a / total for a in acc]


def extract_features(assets: DataFrame, batch_hint: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction: (asset_id, features array<double>).

    mapInPandas keeps the decode vectorized per Arrow batch; swap
    `_fake_feature_vector` for a real decoder without touching the Spark
    plumbing (schema, batching, partitioning are what this operator owns)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(lambda p: _fake_feature_vector(bytes(p)))
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "features": feats})

    return assets.mapInPandas(run, "asset_id long, features array<double>")


def sample_frames(assets: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' plumbing demo over opaque payloads: emits one row per
    sampled offset (a video decoder would emit real frames here).
    mapInPandas with a fan-out output schema — one input row, many output
    rows — the shape a real frame sampler needs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_off, out_fp = [], [], []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                for off in range(0, max(len(payload), 1), every_n_bytes):
                    chunk = payload[off : off + every_n_bytes]
                    out_id.append(row["asset_id"])
                    out_off.append(off)
                    out_fp.append(sum(chunk) % 997)
            yield pd.DataFrame(
                {"asset_id": out_id, "frame_offset": out_off, "frame_sig": out_fp}
            )

    return assets.mapInPandas(run, "asset_id long, frame_offset long, frame_sig long")
