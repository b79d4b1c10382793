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
