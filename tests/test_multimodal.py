"""Multimodal plumbing: fan-out shape, byte-slice integrity, and vector
extraction — the parts the SQL oracle can't see."""

from __future__ import annotations

from airflow_kafka_spark_spark.ext.multimodal import (
    _FRAME_SIZE,
    binary_payloads,
    extract_audio_features,
    sample_frames,
)
from .conftest import SF_DIR


def _media(spark, n=20):
    from airflow_kafka_spark_spark.sources.files import load_table

    return binary_payloads(load_table(spark, SF_DIR, "documents").limit(n))


def test_frame_slices_are_real_bytes(spark):
    media = _media(spark)
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in sample_frames(media, every_nth=4).collect():
        payload = payloads[r["doc_id"]]
        expect = payload[r["frame_offset"] : r["frame_offset"] + _FRAME_SIZE]
        assert bytes(r["frame_bytes"]) == expect
        assert r["frame_offset"] % (_FRAME_SIZE * 4) == 0  # every 4th frame


def test_frame_fanout_count(spark):
    media = _media(spark)
    n_frames = {
        r["doc_id"]: max(1, len(bytes(r["payload"])) // _FRAME_SIZE)
        for r in media.collect()
    }
    got = sample_frames(media, every_nth=4).groupBy("doc_id").count().collect()
    for r in got:
        nf = n_frames[r["doc_id"]]
        assert r["count"] == (nf + 3) // 4  # ceil(nf / 4)


def test_png_roundtrip_and_validity():
    """make_png must emit a structurally valid PNG (correct CRCs, IDAT
    that decompresses to exactly height filter-0 scanlines) and
    parse_png_header must read the dims back from the real bytes."""
    import struct
    import zlib

    from airflow_kafka_spark_spark.ext.multimodal import (
        PNG_SIGNATURE,
        make_png,
        parse_png_header,
    )

    for w, h, ct, ch in [(16, 16, 2, 3), (113, 68, 6, 4), (1, 1, 0, 1)]:
        png = make_png(w, h, seed=7, color_type=ct)
        assert parse_png_header(png) == (w, h, ch)
        # walk chunks, verifying every CRC and collecting IDAT
        pos, idat = 8, b""
        while pos < len(png):
            (clen,) = struct.unpack(">I", png[pos : pos + 4])
            typ = png[pos + 4 : pos + 8]
            data = png[pos + 8 : pos + 8 + clen]
            (crc,) = struct.unpack(">I", png[pos + 8 + clen : pos + 12 + clen])
            assert crc == zlib.crc32(typ + data) & 0xFFFFFFFF, typ
            if typ == b"IDAT":
                idat += data
            pos += 12 + clen
        raw = zlib.decompress(idat)
        assert len(raw) == h * (1 + w * ch)
        assert all(raw[r * (1 + w * ch)] == 0 for r in range(h))  # filter 0
    try:
        parse_png_header(b"NOTAPNG" + bytes(64))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    assert png[:8] == PNG_SIGNATURE


def test_wav_roundtrip_and_chunk_walk():
    """parse_wav_header must WALK the RIFF chunk list, not assume fixed
    offsets — verified by inserting a LIST chunk before fmt."""
    import struct

    from airflow_kafka_spark_spark.ext.multimodal import make_wav, parse_wav_header

    for rate, ch, n in [(8000, 1, 100), (44100, 2, 499), (22050, 2, 250)]:
        wav = make_wav(rate, ch, n, seed=3)
        assert parse_wav_header(wav) == (ch, rate, 16, n)
        # splice an odd-length LIST chunk between WAVE and fmt (word-
        # aligned per RIFF) — a fixed-offset parser would misread fmt
        extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        spliced = wav[:12] + extra + wav[12:]
        spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
        assert parse_wav_header(spliced) == (ch, rate, 16, n)
    try:
        parse_wav_header(b"RIFX" + bytes(40))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_decode_paths_use_real_bytes(spark):
    """End-to-end through Spark: corrupting the payload bytes must change
    the decoded metadata (proves the decode reads bytes, not doc_id)."""
    from pyspark.sql import functions as F

    from airflow_kafka_spark_spark.ext.multimodal import (
        decode_image_meta,
        png_payloads,
    )
    from airflow_kafka_spark_spark.sources.files import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(8)
    media = png_payloads(docs)
    ok = decode_image_meta(media, decoder="png")
    assert ok.filter(F.col("width") == 16 + F.col("doc_id") % 97).count() == 8
    # zero out the IHDR width bytes → decoder must report width 0
    corrupted = media.select(
        "doc_id",
        F.concat(
            F.substring("payload", 1, 16), F.lit(bytes(4)), F.expr("substring(payload, 21)")
        ).alias("payload"),
    )
    got = decode_image_meta(corrupted, decoder="png")
    assert got.filter(F.col("width") == 0).count() == 8


def test_audio_features_deterministic_vectors(spark):
    import numpy as np

    media = _media(spark, n=5)
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in extract_audio_features(media, n_features=8).collect():
        assert len(r["features"]) == 8
        arr = np.frombuffer(payloads[r["doc_id"]], dtype=np.uint8)
        chunks = np.array_split(arr, 8)
        assert r["features"] == [float(c.mean()) for c in chunks]
        assert r["n_bytes"] == len(payloads[r["doc_id"]])
