"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``airflow_kafka_spark_spark`` package; this
module only adapts it to the driver contract. The catalog
(airflow_kafka_spark_spark/plans/catalog.py) is the single source of truth
for query/oracle pairs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001.

    Runs the full reference pipeline shape end-to-end on nested
    Kafka-wire-format messages re-built from the events fixture:
    JSON parse → explode → per-symbol indicators (MA5/MA20, RSI-14,
    MACD 12-26-9) → BUY/SELL suggestion cascade → latest row per symbol
    (the dashboard's flagship question, reference streamlit/app.py:364-370).
    """
    from airflow_kafka_spark_spark.functions.windows import last_per_key
    from airflow_kafka_spark_spark.session import ensure_engine_confs
    from airflow_kafka_spark_spark.sources.fixtures import build_history_messages
    from airflow_kafka_spark_spark.streaming.pipeline import analyze_history_batch

    ensure_engine_confs(spark)
    messages = build_history_messages(spark, SMOKE_SF_DIR)
    processed = analyze_history_batch(messages)
    return last_per_key(processed, ["symbol"], [F.col("date_str")])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §2.12
    extensions). Each callable takes (spark, sf_dir) → DataFrame, with
    every computed column aliased to match ``oracle_sql``."""
    from airflow_kafka_spark_spark.plans.catalog import queries as catalog_queries

    return catalog_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query. Keys absent here (e.g.
    ``simhash``, which depends on an engine-specific hash function) get
    the driver's weaker rows-only check."""
    from airflow_kafka_spark_spark.plans.catalog import oracle_sql as catalog_oracle

    return catalog_oracle()
