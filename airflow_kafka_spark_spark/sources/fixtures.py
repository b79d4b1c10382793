"""Synthetic fixtures shaped like the reference's wire formats (FIXTURES.md §A-B).

Two producers:

1. ``build_history_messages`` — re-nests the driver's ``events`` table into
   stock-history-topic JSON messages (one message per key with the full
   per-key series embedded, exactly the *append-of-snapshots* shape the
   reference's DAG emits at airflow/dags/fetch_to_kafka_dag.py:95-99).
   Used by the flagship ``entry()`` and the streaming tests, so the whole
   parse→explode path runs against realistic nested input.

2. ``synthetic_quotes_pdf`` — deterministic (seed 42) pandas frame of
   per-symbol OHLCV series with symbols shorter than every indicator
   warm-up (5/14/20/26 bars) for golden unit tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .files import load_table


def events_as_quote_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map events → per-key daily bars: symbol = 'U'||user_id, one bar per
    event with a synthetic strictly-increasing trading date per key (the
    events fixture can hold several events per user per day; the stock
    shape needs unique dates). Deterministic: ordered by (ts, event_id)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .select(
            F.concat(F.lit("U"), F.col("user_id")).alias("symbol"),
            F.date_format(
                F.date_add(F.lit("2020-01-01").cast("date"), F.col("rn")),
                "yyyy-MM-dd",
            ).alias("time"),
            v.alias("open"),
            (v * F.lit(1.01)).alias("high"),
            (v * F.lit(0.99)).alias("low"),
            v.alias("close"),
            (F.abs(v) * F.lit(1000.0)).alias("volume"),
            F.col("rn"),
        )
    )


def build_history_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested JSON messages: the inverse of the engine's explode (A2,
    dag:81-99) — ``collect_list(struct(...))`` ordered by date, plus the
    latest value as ``current_price``. Returns ``(key, value)`` rows
    matching the Kafka wire shape."""
    bars = events_as_quote_bars(spark, sf_dir)
    nested = bars.groupBy("symbol").agg(
        F.sort_array(
            F.collect_list(
                F.struct("rn", "time", "open", "high", "low", "close", "volume")
            )
        ).alias("sorted_bars")
    )
    msg = nested.select(
        F.col("symbol"),
        F.element_at("sorted_bars", -1)["close"].alias("current_price"),
        F.transform(
            "sorted_bars",
            lambda b: F.struct(
                b["time"].alias("time"),
                b["open"].alias("open"),
                b["high"].alias("high"),
                b["low"].alias("low"),
                b["close"].alias("close"),
                b["volume"].alias("volume"),
            ),
        ).alias("historical_data"),
    )
    return msg.select(
        F.col("symbol").alias("key"),
        F.to_json(F.struct("symbol", "current_price", "historical_data")).alias(
            "value"
        ),
    )


def synthetic_quotes_pdf(
    n_symbols: int = 8, seed: int = 42
) -> pd.DataFrame:
    """Deterministic per-symbol OHLCV random walks. Symbol lengths cover
    every warm-up edge: 3, 4, 13, 14, 19, 20, 25, 26+ bars."""
    rng = np.random.default_rng(seed)
    lengths = [3, 4, 13, 14, 19, 20, 25, 60]
    rows = []
    for s in range(n_symbols):
        n = lengths[s % len(lengths)]
        close = 100.0 + np.cumsum(rng.normal(0, 2.0, size=n))
        dates = pd.date_range("2021-01-04", periods=n, freq="B")
        for i in range(n):
            rows.append(
                {
                    "symbol": f"SYM{s}",
                    "current_price": float(close[-1]),
                    "time": dates[i].strftime("%Y-%m-%d"),
                    "open": float(close[i] * 0.995),
                    "high": float(close[i] * 1.01),
                    "low": float(close[i] * 0.99),
                    "close": float(close[i]),
                    "volume": float(rng.integers(1_000, 100_000)),
                }
            )
    pdf = pd.DataFrame(rows)
    pdf["date"] = pd.to_datetime(pdf["time"]).dt.date
    return pdf
