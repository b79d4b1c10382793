#!/usr/bin/env python
"""Dashboard feed: the reference Streamlit consumer's DATA CONTRACT,
materialized engine-side (VERDICT r10 item 6 — the one reference
component with no repo counterpart).

The reference dashboard (streamlit/app.py) consumes the processed Kafka
topic and derives exactly three things:

- per-symbol indicator frames sorted by date (app.py:96-131 folds the
  JSON messages into ``dataframes[symbol]``);
- ``current_prices[symbol]`` = the LAST row's current_price
  (app.py:126-128);
- metric tiles from the last row (app.py:364-427): the suggestion with
  a BUY→green / SELL→red / else→orange color class, MA5/MA20, RSI with
  an overbought (>70) / oversold (<30) label, and MACD with
  delta = macd_line − macd_signal rendered "normal" when positive,
  "inverse" otherwise.

The rendering is Streamlit's job; everything ABOVE the rendering is
data-plane and belongs in the engine: this module reproduces it as
three DataFrame transforms over the engine's own wire format, so a
dashboard process is a thin ``collect()`` + draw loop instead of a
driver-side JSON fold. Run directly for a demo over the sf0.001
fixtures:

    python examples/dashboard_feed.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airflow_kafka_spark_spark.schemas import JSON_VALUE_FIELDS, PROCESSED_SCHEMA

# the 16-field JSON value the processed topic carries
# (operators/serialize.with_json_value), as a parse schema
WIRE_VALUE_SCHEMA = T.StructType(
    [f for f in PROCESSED_SCHEMA.fields if f.name in JSON_VALUE_FIELDS]
)


def parse_processed_records(
    records: DataFrame, order_col: str | None = None
) -> DataFrame:
    """(key, value) wire rows → the typed processed frame the dashboard
    folds per message (app.py:96-115): all 16 JSON fields plus a typed
    ``date`` derived from ``time`` (the dashboard's
    ``pd.to_datetime(df['date'])``).

    Arrival-order ``ingest_seq``: a Kafka scan carries a per-partition
    ``offset`` column, and the producer keys by symbol — one symbol's
    messages live in ONE topic partition, so its offsets ARE its
    arrival order. ``order_col`` defaults to ``offset`` when the frame
    has one. Without an order column the fallback is
    ``monotonically_increasing_id``, which is (partition-index, row
    position) order — arrival order ONLY for a single-partition replay
    (``coalesce(1)`` a multi-partition file dump first, as the pytest
    fixture does); a data-carried order column is always preferred."""
    if order_col is None and "offset" in records.columns:
        order_col = "offset"
    seq = (
        F.col(order_col).cast("long")
        if order_col
        else F.monotonically_increasing_id()
    )
    return (
        records.withColumn("ingest_seq", seq)
        .select(
            F.from_json(F.col("value"), WIRE_VALUE_SCHEMA).alias("m"),
            "ingest_seq",
        )
        .select("m.*", "ingest_seq")
        .withColumn("date", F.to_date("time"))
    )


def symbol_frames(parsed: DataFrame) -> DataFrame:
    """The per-symbol chart frames (app.py:117-131 ``dataframes``): one
    DataFrame holding every symbol's series with an in-symbol ``seq``
    order column (the dashboard's ``df.sort_values('date')``). A UI
    filters one symbol out and draws; sorting happens once here, in one
    window shuffle, not per symbol driver-side.

    ``ingest_seq`` breaks day-granular ``date`` ties in arrival order —
    the reference app's pandas sort is stable, so two messages for one
    symbol-day keep their arrival order there too (app.py:113,365)."""
    from pyspark.sql import Window

    w = Window.partitionBy("symbol").orderBy("date", "ingest_seq")
    return parsed.withColumn("seq", F.row_number().over(w))


def metric_tiles(parsed: DataFrame) -> DataFrame:
    """The last-row metric tiles, one row per symbol (app.py:364-427
    semantics plus the :126-128 ``current_prices`` fold):

    - ``suggestion_color``: 'BUY' substring → green, else 'SELL' →
      red, else orange (first-match, exactly the app's elif chain);
    - ``rsi_label``: overbought (>70) / oversold (<30) / neutral —
      NULL RSI (warm-up rows) stays neutral, matching the app's
      N/A branch;
    - ``macd_delta`` = macd_line − macd_signal and
      ``macd_delta_color`` normal/inverse (the app's delta_color fix);
    - ``current_price`` = the latest row's value.
    """
    from airflow_kafka_spark_spark.functions.windows import last_per_key

    # ingest_seq tiebreak: "last row" for a symbol-day means last
    # ARRIVED, matching the app's stable fold (ADVICE r11)
    last = last_per_key(
        parsed, ["symbol"], [F.col("date"), F.col("ingest_seq")]
    )
    sugg = F.col("suggestion")
    rsi = F.col("rsi")
    delta = F.col("macd_line") - F.col("macd_signal")
    return last.select(
        "symbol",
        "date",
        "current_price",
        "close",
        "ma5",
        "ma20",
        "rsi",
        "macd_line",
        "macd_signal",
        "suggestion",
        "reason",
        F.when(sugg.contains("BUY"), F.lit("green"))
        .when(sugg.contains("SELL"), F.lit("red"))
        .otherwise(F.lit("orange"))
        .alias("suggestion_color"),
        F.when(rsi > 70, F.lit("overbought"))
        .when(rsi < 30, F.lit("oversold"))
        .otherwise(F.lit("neutral"))
        .alias("rsi_label"),
        delta.alias("macd_delta"),
        F.when(delta > 0, F.lit("normal"))
        .otherwise(F.lit("inverse"))
        .alias("macd_delta_color"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    from airflow_kafka_spark_spark.operators.serialize import to_kafka_records
    from airflow_kafka_spark_spark.session import build_session
    from airflow_kafka_spark_spark.sources.fixtures import build_history_messages
    from airflow_kafka_spark_spark.streaming.pipeline import analyze_history_batch

    spark = build_session(app_name="dashboard-feed")

    # replay the full producer side: history messages -> indicators ->
    # suggestion -> the processed-topic wire format
    wire = to_kafka_records(analyze_history_batch(build_history_messages(spark, sf_dir)))

    parsed = parse_processed_records(wire)
    print("== Metric tiles (one row per symbol) ==")
    metric_tiles(parsed).show(10, truncate=False)

    print("== Chart frame (first symbol, last 5 rows) ==")
    frames = symbol_frames(parsed)
    first = frames.select("symbol").orderBy("symbol").first()["symbol"]
    (
        frames.filter(F.col("symbol") == first)
        .orderBy(F.col("seq").desc())
        .select("symbol", "date", "close", "ma5", "ma20", "rsi", "suggestion")
        .show(5, truncate=False)
    )


if __name__ == "__main__":
    main()
