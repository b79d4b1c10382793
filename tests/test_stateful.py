"""Stateful delta-feed MACD (streaming/stateful.py): the recursion state
carried across micro-batches must reproduce the uninterrupted batch
series bit-for-bit."""

from __future__ import annotations

import os
import tempfile
import time

import numpy as np
import pytest

from airflow_kafka_spark_spark.functions.ema import ema_recurrence, macd_columns
from airflow_kafka_spark_spark.streaming.stateful import _continue_ema, running_macd


def test_continue_ema_bit_exact():
    rng = np.random.default_rng(7)
    x = rng.normal(size=200)
    full = ema_recurrence(x, 12)
    for split in (1, 50, 199):
        head = ema_recurrence(x[:split], 12)
        tail = _continue_ema(x[split:], 12, float(head[-1]))
        assert np.array_equal(np.concatenate([head, tail]), full)


def test_running_macd_across_microbatches(spark):
    """Two file-source micro-batches == one batch kernel run, exactly."""
    rng = np.random.default_rng(11)
    closes = {s: rng.uniform(10, 100, size=40) for s in ("AAA", "BBB")}

    workdir = tempfile.mkdtemp()
    src = os.path.join(workdir, "in")
    os.makedirs(src)
    # batch 1 = bars 0..19 (older mtime), batch 2 = bars 20..39; the file
    # source lists *files directly under src*, so move each part file there
    for i, lo, hi in ((0, 0, 20), (1, 20, 40)):
        rows = [
            (s, f"2024-01-{d + 1:02d}", float(closes[s][d]))
            for s in closes
            for d in range(lo, hi)
        ]
        tmp = os.path.join(workdir, f"tmp{i}")
        spark.createDataFrame(
            rows, "symbol string, date_str string, close double"
        ).coalesce(1).write.parquet(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dest = os.path.join(src, f"batch{i}.parquet")
        os.rename(os.path.join(tmp, part), dest)
        t = time.time() - 100 + i * 10
        os.utime(dest, (t, t))

    stream = (
        spark.readStream.schema("symbol string, date_str string, close double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_macd(stream)
        .writeStream.format("memory")
        .queryName("macd_state_test")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["symbol"], r["date_str"]): r
        for r in spark.sql("SELECT * FROM macd_state_test").collect()
    }
    assert len(got) == 80  # 2 symbols x 40 bars, each emitted exactly once
    for s, series in closes.items():
        line, sig, hist = macd_columns(series)
        for d in range(40):
            row = got[(s, f"2024-01-{d + 1:02d}")]
            assert row["macd_line"] == pytest.approx(line[d], abs=0.0)
            assert row["macd_signal"] == pytest.approx(sig[d], abs=0.0)
            assert row["macd_histogram"] == pytest.approx(hist[d], abs=0.0)
        assert got[(s, "2024-01-40")]["n_rows"] == 40


def test_state_recovers_across_query_restart(spark):
    """T12: stop the query, add data, restart from the same checkpoint —
    the state store must restore the EMA recursion so the continuation
    still matches the uninterrupted batch kernel exactly."""
    rng = np.random.default_rng(23)
    series = rng.uniform(10, 100, size=30)

    workdir = tempfile.mkdtemp()
    src = os.path.join(workdir, "in")
    ckpt = os.path.join(workdir, "ckpt")
    os.makedirs(src)

    def add_file(i, lo, hi):
        rows = [("KEY", f"2024-01-{d + 1:02d}", float(series[d])) for d in range(lo, hi)]
        tmp = os.path.join(workdir, f"tmp_r{i}")
        spark.createDataFrame(
            rows, "symbol string, date_str string, close double"
        ).coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.rename(os.path.join(tmp, part), os.path.join(src, f"b{i}.parquet"))

    captured: list = []

    def run_query():
        stream = spark.readStream.schema(
            "symbol string, date_str string, close double"
        ).parquet(src)
        q = (
            running_macd(stream)
            .writeStream.foreachBatch(
                lambda df, bid: captured.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    add_file(0, 0, 15)
    run_query()                      # first run: rows 0..14
    add_file(1, 15, 30)
    run_query()                      # restart: only rows 15..29, state restored

    assert len(captured) == 30
    line, sig, hist = macd_columns(series)
    by_date = {r["date_str"]: r for r in captured}
    for d in range(30):
        row = by_date[f"2024-01-{d + 1:02d}"]
        assert row["macd_line"] == pytest.approx(line[d], abs=0.0)
        assert row["macd_signal"] == pytest.approx(sig[d], abs=0.0)
    assert by_date["2024-01-30"]["n_rows"] == 30
