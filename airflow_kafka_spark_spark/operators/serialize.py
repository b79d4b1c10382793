"""Output projection + JSON serialization (SURVEY.md §2.2 P6/P7, §2.8 F5/F6).

Reproduces the reference's wire format exactly: a 17-column projection
(spark/stock_analysis.py:244-261) and a 16-field JSON ``value`` that
excludes ``date_str`` (:262-268), keyed by symbol for Kafka (:278).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import JSON_VALUE_FIELDS, PROCESSED_SCHEMA

OUTPUT_COLUMNS = [f.name for f in PROCESSED_SCHEMA.fields]


def to_processed(df: DataFrame) -> DataFrame:
    """Project to the reference's 17 output columns. The engine carries a
    typed ``date`` column; ``time``/``date_str`` are derived at this edge
    only (the reference kept strings end-to-end to dodge a pandas bug)."""
    cols = []
    for name in OUTPUT_COLUMNS:
        if name == "date_str" and "date_str" not in df.columns:
            cols.append(F.date_format("date", "yyyy-MM-dd").alias("date_str"))
        else:
            cols.append(F.col(name))
    return df.select(*cols)


def with_json_value(df: DataFrame) -> DataFrame:
    """Append the Kafka JSON ``value`` column (16 fields, reference order)."""
    return df.withColumn("value", F.to_json(F.struct(*JSON_VALUE_FIELDS)))


def to_kafka_records(df: DataFrame) -> DataFrame:
    """Final wire projection ``(key, value)`` (spark/stock_analysis.py:278)."""
    return with_json_value(df).select(
        F.col("symbol").alias("key"), F.col("value")
    )
