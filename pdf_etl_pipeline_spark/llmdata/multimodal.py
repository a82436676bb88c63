"""Multimodal columns for training-data pipelines (north-star op set).

Images/audio/video are opaque ``binary`` columns + a typed metadata struct.
The Spark-side plumbing — schema, Arrow batch shape, partition sizing — is
real and tested; the codec step is stubbed per the driver brief (image/audio
libraries are not in this container): ``decode=\"fake\"`` produces a
deterministic synthetic decode so the downstream plumbing is exercised,
``decode=\"real\"`` raises ``NotImplementedError`` until Pillow/torchcodec
are on the cluster image.

Scale notes: binary payloads dominate partition bytes — the asset table
should set ``spark.sql.files.maxPartitionBytes`` so one task holds a few
hundred MB of media, and metadata-only queries must NOT read the blob
(keep metadata in separate parquet columns → column pruning skips the
bytes; verified in tests via ReadSchema).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, content binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)

FEATURE_SCHEMA = "asset_id long, kind string, feature array<float>, feat_dim int"
THUMB_SCHEMA = "asset_id long, width int, height int, thumb binary"
FRAME_SCHEMA = "asset_id long, frame_idx int, frame binary"


def synthetic_assets(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake asset table (content = seeded bytes)."""
    rows = []
    for i in range(n):
        payload = bytes(((i * 37 + j * 11) % 251) for j in range(256))
        rows.append((i, kind, payload, (64, 48, 16000, 16, "fake")))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _decode_stub(content: bytes, meta) -> np.ndarray:
    """Deterministic fake decode: bytes → (h, w) float array.

    Real decode (PIL/av) is NOT available in this container."""
    arr = np.frombuffer(bytes(content), dtype=np.uint8).astype(np.float32)
    h, w = int(meta["height"]), int(meta["width"])
    return np.resize(arr, (h, w)) / 255.0


def extract_features(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """Decode → pooled feature vector, as an Arrow-batched mapInPandas op.

    The batch shape (one pandas batch per input split, vectorized numpy
    inside) is the production shape; only the codec call is faked."""
    if decode == "real":
        raise NotImplementedError(
            "real image/audio decode requires Pillow/torchcodec on the cluster image"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            for content, meta in zip(b["content"], b["meta"]):
                img = _decode_stub(content, meta)
                # 8-bin row-mean pooling — stands in for a real embedding
                pooled = img.mean(axis=1)
                feats.append(np.resize(pooled, 8).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "asset_id": b["asset_id"],
                    "kind": b["kind"],
                    "feature": feats,
                    "feat_dim": [len(f) for f in feats],
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def resize_thumbnails(assets: DataFrame, width: int = 8, height: int = 6) -> DataFrame:
    """Decode → resize → re-encode (stub: nearest-neighbor subsample of the
    fake decode, re-serialized as bytes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            thumbs = []
            for content, meta in zip(b["content"], b["meta"]):
                img = _decode_stub(content, meta)
                ys = np.linspace(0, img.shape[0] - 1, height).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, width).astype(int)
                thumb = (img[np.ix_(ys, xs)] * 255).astype(np.uint8)
                thumbs.append(thumb.tobytes())
            yield pd.DataFrame(
                {
                    "asset_id": b["asset_id"],
                    "width": [width] * len(b),
                    "height": [height] * len(b),
                    "thumb": thumbs,
                }
            )

    return assets.mapInPandas(run, THUMB_SCHEMA)


def sample_frames(assets: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame sampling plumbing: one input row → n_frames/every_n rows
    (UDTF shape, like the document parsers)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_id, out_idx, out_frame = [], [], []
            for asset_id, content, meta in zip(b["asset_id"], b["content"], b["meta"]):
                n = int(meta["n_frames"])
                for idx in range(0, n, every_n):
                    out_id.append(asset_id)
                    out_idx.append(idx)
                    # stub frame: slice of the payload, deterministic
                    out_frame.append(bytes(content)[idx : idx + 16])
            yield pd.DataFrame({"asset_id": out_id, "frame_idx": out_idx, "frame": out_frame})

    return assets.mapInPandas(run, FRAME_SCHEMA)


def metadata_only_projection(assets: DataFrame) -> DataFrame:
    """Metadata queries must not touch the blob — this projection prunes
    ``content`` at the scan (check .explain ReadSchema)."""
    return assets.select(
        "asset_id", "kind", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
