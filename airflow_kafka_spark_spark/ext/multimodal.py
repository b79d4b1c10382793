"""Multimodal column plumbing (SURVEY.md §2.12).

Images/audio/video are opaque ``binary`` columns plus typed metadata.
The Spark-side machinery — schema, Arrow batch shape, ``mapInPandas``
iterator signature, partition sizing — is real and tested; the actual
codec step is stubbed (this container ships no image/audio libraries)
behind ``DECODERS``: a deterministic fake that derives metadata from the
byte payload arithmetically, or a clearly-marked ``NotImplementedError``
for real codecs.

At 100 TB: binary payloads dominate partition size, so callers should
set ``spark.sql.files.maxPartitionBytes`` down (payload-aware splits)
and never collect payload columns; the decode runs per Arrow batch on
executors and projects payloads away as early as possible.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
)


def fake_image_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real image header parse: metadata is
    pure arithmetic on the payload length, so the SQL oracle can replicate
    it. Swap for a real codec (PIL etc.) when available."""
    n = len(payload)
    width = 16 + (n % 640)
    height = 16 + ((n // 640) % 480)
    channels = 1 + (n % 3)
    return width, height, channels


def _real_decode(payload: bytes):
    raise NotImplementedError(
        "real image decoding requires an image library not present in this "
        "environment; use DECODERS['fake'] or install a codec"
    )


DECODERS = {"fake": fake_image_meta, "real": _real_decode}


def binary_payloads(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: treat each document's UTF-8 bytes as an opaque
    media payload column (the driver tables ship no real media)."""
    return docs.select(
        "doc_id", F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def decode_image_meta(
    media: DataFrame,
    decoder: str = "fake",
    payload_col: str = "payload",
) -> DataFrame:
    """Extract typed image metadata from binary payloads via mapInPandas.

    Arrow-batched: each pandas batch holds a slice of payloads; the
    decoder runs per row inside the batch and the payload column is
    dropped in the same pass (never shuffled onward).
    """
    decode = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "width": pd.Series([m[0] for m in metas], dtype="int32"),
                    "height": pd.Series([m[1] for m in metas], dtype="int32"),
                    "n_channels": pd.Series([m[2] for m in metas], dtype="int32"),
                }
            )

    return media.mapInPandas(run, schema=IMAGE_META_SCHEMA)


def resize_image_meta(
    media: DataFrame,
    max_side: int = 256,
    decoder: str = "fake",
    payload_col: str = "payload",
) -> DataFrame:
    """Aspect-preserving resize planning: decode metadata, then compute
    the target box (longest side → ``max_side``, never upscale). A real
    deployment would re-encode the payload in the same mapInPandas pass;
    the geometry math — the Spark-visible part — is exact and
    oracle-checkable. Integer arithmetic only (floor), matching SQL."""
    meta = decode_image_meta(media, decoder, payload_col)
    longest = F.greatest("width", "height")
    scale_num = F.least(longest, F.lit(max_side))  # never upscale
    return meta.select(
        "*",
        ((F.col("width") * scale_num) / longest).cast("int").alias("target_width"),
        ((F.col("height") * scale_num) / longest).cast("int").alias("target_height"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)

_FRAME_SIZE = 1000  # fake codec: fixed-size "frames" of the byte stream


def sample_frames(
    media: DataFrame,
    every_nth: int = 4,
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame sampling plumbing: one input row fans out to one row
    per sampled frame (mapInPandas yielding more rows than it receives —
    the generator shape a real keyframe extractor uses). The fake codec
    treats the payload as fixed-1000-byte frames and samples every Nth;
    frame_bytes carries the actual byte slice so downstream stages see a
    real binary column. Frame *count and offsets* are arithmetic on
    payload length — oracle-checkable; the slices are checked by length
    in unit tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                n_frames = max(1, len(payload) // _FRAME_SIZE)
                for i, f in enumerate(range(0, n_frames, every_nth)):
                    off = f * _FRAME_SIZE
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(off)
                    out["frame_bytes"].append(payload[off : off + _FRAME_SIZE])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_offset": pd.Series(out["frame_offset"], dtype="int64"),
                    "frame_bytes": out["frame_bytes"],
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def extract_audio_features(
    media: DataFrame,
    n_features: int = 8,
    payload_col: str = "payload",
) -> DataFrame:
    """Audio feature extraction plumbing: payload → fixed-length
    float vector (the schema/batch shape an MFCC or embedding extractor
    produces). The fake extractor emits per-chunk byte means —
    deterministic, so downstream similarity ops on the vector column are
    testable end-to-end. Swap the inner function for a real DSP call."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                chunks = np.array_split(arr, n_features) if len(arr) else []
                feats.append(
                    [float(c.mean()) if len(c) else 0.0 for c in chunks]
                    or [0.0] * n_features
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
