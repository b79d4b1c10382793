"""Kafka source/sink wrappers (SURVEY.md §2.1 S1/S2).

Mirrors the reference's configuration exactly
(spark/stock_analysis.py:46-54: earliest offsets, maxOffsetsPerTrigger
20000, failOnDataLoss false; :278-283 keyed JSON writes). The Kafka
connector jar (spark-sql-kafka-0-10) is not bundled in this container, so
these wrappers only *declare* plans; tests drive the same transforms
through memory/file streams instead (SURVEY.md §5.2.4). On a real cluster
pass ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver>``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_MAX_OFFSETS_PER_TRIGGER = 20_000  # spark/stock_analysis.py:52


def read_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int = DEFAULT_MAX_OFFSETS_PER_TRIGGER,
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """S1: streaming Kafka source with the reference's backpressure knobs."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", max_offsets_per_trigger)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
        .load()
    )


def write_batch(df: DataFrame, bootstrap_servers: str, topic: str) -> None:
    """S2: batch write of ``(key, value)`` rows — used inside foreachBatch.
    At-least-once, matching the reference (no transactions/idempotence)."""
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )
