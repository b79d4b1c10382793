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
