"""Wire-format parsing tests (SURVEY.md §2.2/§2.3): from_json PERMISSIVE
nulls, explode of empty arrays, snapshot-map melt, dedup-latest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_kafka_spark_spark.operators.dedup import latest_message_per_key
from airflow_kafka_spark_spark.operators.parse import (
    explode_history,
    parse_history_messages,
    parse_snapshot_messages,
)

GOOD = (
    '{"symbol":"AAA","current_price":10.5,"historical_data":'
    '[{"time":"2024-01-01","open":1,"high":2,"low":0.5,"close":1.5,"volume":10},'
    '{"time":"2024-01-02","open":1.5,"high":2.5,"low":1.0,"close":2.0,"volume":20}]}'
)
EMPTY_HIST = '{"symbol":"BBB","current_price":null,"historical_data":[]}'
MALFORMED = "NOT JSON {{{"


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(
        [("AAA", GOOD), ("BBB", EMPTY_HIST), ("x", MALFORMED), ("y", None)],
        "key string, value string",
    )


def test_parse_permissive_nulls(raw):
    messages = parse_history_messages(raw)
    rows = {r["symbol"]: r for r in messages.collect()}
    assert rows["AAA"]["current_price"] == 10.5
    assert len(rows["AAA"]["historical_data"]) == 2
    assert rows["BBB"]["historical_data"] == []
    # malformed / null JSON → null struct fields, not errors
    assert None in rows and rows[None]["historical_data"] is None


def test_explode_drops_empty_and_null(raw):
    quotes = explode_history(parse_history_messages(raw))
    rows = quotes.collect()
    assert {r["symbol"] for r in rows} == {"AAA"}
    assert len(rows) == 2
    by_time = {r["time"]: r for r in rows}
    assert by_time["2024-01-02"]["close"] == 2.0
    assert str(by_time["2024-01-02"]["date"]) == "2024-01-02"
    # current_price fans out to every exploded row (the reference's
    # denormalized broadcast, SURVEY §2.4)
    assert all(r["current_price"] == 10.5 for r in rows)


def test_parse_carry_cols_survive_and_collide_loudly(spark):
    """r14: the shared parser carries transport metadata (Kafka
    timestamp/offset) through the wire parse so the streaming dedup
    path doesn't re-implement the contract; names colliding with the
    message schema's own fields (or the internal json_data alias) are
    rejected eagerly — the flatten would otherwise emit duplicate
    columns that fail only at a downstream .select."""
    raw = spark.createDataFrame(
        [(GOOD, 7, 42)], "value string, timestamp long, offset long"
    )
    out = parse_history_messages(raw, carry_cols=["timestamp", "offset"])
    assert set(out.columns) == {
        "symbol", "current_price", "historical_data", "timestamp", "offset"
    }
    row = out.collect()[0]
    assert (row["symbol"], row["timestamp"], row["offset"]) == ("AAA", 7, 42)
    for bad in (["symbol"], ["json_data"], ["offset", "historical_data"]):
        with pytest.raises(ValueError, match="carry_cols"):
            parse_history_messages(raw, carry_cols=bad)
    # duplicates WITHIN carry_cols pass a set-based clash check but emit
    # duplicate output columns that only fail downstream — reject eagerly
    # too (r15, r14 review)
    with pytest.raises(ValueError, match="duplicates.*offset"):
        parse_history_messages(raw, carry_cols=["offset", "offset"])


def test_snapshot_melt(spark):
    snap = '{"time":"2024-01-01T09:00:00","AAA":"10.5","BBB":null}'
    raw = spark.createDataFrame([(snap,)], "value string")
    out = parse_snapshot_messages(raw).collect()
    got = {r["symbol"]: r["price"] for r in out}
    assert got == {"AAA": 10.5, "BBB": None}
    assert all(r["snapshot_time"] == "2024-01-01T09:00:00" for r in out)


def test_latest_message_per_key(spark):
    df = spark.createDataFrame(
        [("A", "old", 1, 5), ("A", "new", 2, 6), ("B", "only", 1, 7)],
        "symbol string, payload string, timestamp long, offset long",
    )
    out = latest_message_per_key(df, ["symbol"], ["timestamp", "offset"])
    got = {r["symbol"]: r["payload"] for r in out.collect()}
    assert got == {"A": "new", "B": "only"}
    # deterministic tiebreak on offset when timestamps collide
    df2 = spark.createDataFrame(
        [("A", "o5", 1, 5), ("A", "o9", 1, 9)],
        "symbol string, payload string, timestamp long, offset long",
    )
    out2 = latest_message_per_key(df2, ["symbol"], ["timestamp", "offset"])
    assert out2.collect()[0]["payload"] == "o9"
