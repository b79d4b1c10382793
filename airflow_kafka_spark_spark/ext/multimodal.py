"""Multimodal column plumbing (SURVEY.md §2.12).

Images/audio/video are opaque ``binary`` columns plus typed metadata.
The Spark-side machinery — schema, Arrow batch shape, ``mapInPandas``
iterator signature, partition sizing — is real and tested, and so are
the container-format decoders: ``parse_png_header`` walks real PNG
IHDR chunks (CRC-checked) and the WAV path walks RIFF/WAVE chunks,
both from the public specs with stdlib only (no image/audio libraries
ship in this container; a compressed-pixel decode would slot in the
same ``DECODERS`` registry). ``DECODERS`` also keeps ``fake`` — a
deterministic arithmetic decoder whose output an oracle can replicate,
used where cross-engine checkable metadata matters more than real
bytes.

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


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# PNG color type → sample count per pixel (PNG spec §4.1.1 / RFC 2083)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_png_header(payload: bytes) -> tuple[int, int, int]:
    """REAL PNG header parse — no image library needed: the IHDR chunk is
    at a fixed offset (PNG spec: 8-byte signature, then length+\"IHDR\",
    then width/height as big-endian u32 at bytes 16..24, bit depth at 24,
    color type at 25). Returns (width, height, n_channels)."""
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    if payload[12:16] != b"IHDR":
        raise ValueError("not a PNG: first chunk is not IHDR")
    width = int.from_bytes(payload[16:20], "big")
    height = int.from_bytes(payload[20:24], "big")
    color_type = payload[25]
    return width, height, _PNG_CHANNELS[color_type]


def make_png(width: int, height: int, seed: int, color_type: int = 2) -> bytes:
    """Build a fully VALID (decodable) PNG: signature + IHDR + one
    zlib-compressed IDAT of filter-0 scanlines + IEND, with correct CRCs.
    Pixel bytes are deterministic in (seed, position) so fixtures are
    reproducible. Pure stdlib (zlib/struct) — the container ships no
    image library, but a PNG is just bytes."""
    import struct
    import zlib

    import numpy as np

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    channels = _PNG_CHANNELS[color_type]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    row_px = (
        (seed + np.arange(width * channels, dtype=np.int64)) % 256
    ).astype(np.uint8).tobytes()
    raw = b"".join(b"\x00" + row_px for _ in range(height))  # filter type 0
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def parse_wav_header(payload: bytes) -> tuple[int, int, int, int]:
    """REAL RIFF/WAVE header parse: walk the chunk list (4-byte id +
    little-endian u32 size, word-aligned), read PCM format fields from
    ``fmt `` and the sample count from ``data``. Returns
    (n_channels, sample_rate, bits_per_sample, n_samples)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        clen = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"fmt ":
            _, channels, rate, _, block_align, bits = struct.unpack(
                "<HHIIHH", payload[pos + 8 : pos + 24]
            )
            fmt = (channels, rate, bits, block_align)
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)  # chunks are 2-byte aligned
    if fmt is None or data_len is None:
        raise ValueError("WAV missing fmt/data chunk")
    channels, rate, bits, block_align = fmt
    return channels, rate, bits, data_len // block_align


def make_wav(
    sample_rate: int, channels: int, n_samples: int, seed: int, bits: int = 16
) -> bytes:
    """Build a fully valid PCM WAV (RIFF + fmt + data) with deterministic
    sample bytes. Pure stdlib."""
    import struct

    import numpy as np

    block_align = channels * bits // 8
    data = (
        (seed + np.arange(n_samples * block_align, dtype=np.int64)) % 256
    ).astype(np.uint8).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


DECODERS = {"fake": fake_image_meta, "png": parse_png_header}


def binary_payloads(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: treat each document's UTF-8 bytes as an opaque
    media payload column (the driver tables ship no real media)."""
    return docs.select(
        "doc_id", F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def png_payloads(docs: DataFrame) -> DataFrame:
    """Fixture adapter: one VALID PNG per doc, dimensions/color type
    deterministic in doc_id (width 16+id%97, height 16+id%53, RGB for
    even ids / RGBA for odd). Generated per Arrow batch on executors —
    the decode path then parses REAL IHDR bytes, and the oracle can
    recompute the same dimensions arithmetically from doc_id."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        make_png(
                            16 + int(i) % 97,
                            16 + int(i) % 53,
                            seed=int(i),
                            color_type=2 if int(i) % 2 == 0 else 6,
                        )
                        for i in ids
                    ],
                }
            )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    return docs.select("doc_id").mapInPandas(run, schema=schema)


WAV_RATES = (8000, 16000, 22050, 44100)


def wav_payloads(docs: DataFrame) -> DataFrame:
    """Fixture adapter: one valid PCM WAV per doc — sample rate cycles
    WAV_RATES by doc_id%4, 1-2 channels by parity, 100+id%400 samples."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        make_wav(
                            WAV_RATES[int(i) % 4],
                            1 + int(i) % 2,
                            100 + int(i) % 400,
                            seed=int(i),
                        )
                        for i in ids
                    ],
                }
            )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    return docs.select("doc_id").mapInPandas(run, schema=schema)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def decode_audio_meta(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed audio metadata from REAL WAV header bytes (parse_wav_header)
    via mapInPandas; payloads are projected away in the same pass.
    duration_s is derived JVM-side (SQL ROUND — Python's banker's
    round() disagrees with it at half-way points, e.g. 105/16000)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_wav_header(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_channels": pd.Series([m[0] for m in metas], dtype="int32"),
                    "sample_rate": pd.Series([m[1] for m in metas], dtype="int32"),
                    "bits_per_sample": pd.Series([m[2] for m in metas], dtype="int32"),
                    "n_samples": pd.Series([m[3] for m in metas], dtype="int64"),
                }
            )

    return media.mapInPandas(run, schema=AUDIO_META_SCHEMA).withColumn(
        "duration_s",
        F.round(F.col("n_samples") / F.col("sample_rate"), 6) + F.lit(0.0),
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
