"""Wire-format parsing: Kafka bytes → typed flat series (SURVEY.md §2.2/§2.3).

Covers P1 (binary→string cast), P2 (from_json), P3 (struct flatten),
A1 (explode), P4 (nested-field projection) and F3/F4 (typed dates) —
reference spark/stock_analysis.py:57-84 — as one declarative chain that
stays entirely inside whole-stage codegen. Catalyst prunes unused
``from_json`` fields automatically (OptimizeJsonExprs), so downstream
projections reach the JSON parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import SNAPSHOT_SCHEMA, STOCK_HISTORY_SCHEMA


def parse_history_messages(
    raw: DataFrame,
    value_col: str = "value",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Kafka-shaped rows (binary ``value``) → typed message rows.

    P1+P2+P3 (spark/stock_analysis.py:57-60): cast value to string, parse
    with the declared schema (PERMISSIVE — malformed JSON → null struct,
    matching the reference's default from_json behavior), flatten.

    ``carry_cols`` names source columns (e.g. Kafka ``timestamp``/
    ``offset``) to carry through the parse unchanged, so callers that
    dedup on transport metadata don't re-implement the wire contract
    (the pre-r14 ``analyze_history_batch`` kept a drifting inline copy
    for exactly this). Names that collide with the message schema's own
    fields are rejected — the flatten would silently produce duplicate
    columns.
    """
    carry = list(carry_cols or [])
    if len(set(carry)) != len(carry):
        dupes = sorted({c for c in carry if carry.count(c) > 1})
        raise ValueError(f"carry_cols contains duplicates: {dupes}")
    clash = set(carry) & ({f.name for f in STOCK_HISTORY_SCHEMA.fields} | {"json_data"})
    if clash:
        raise ValueError(
            f"carry_cols collide with message schema fields: {sorted(clash)}"
        )
    return (
        raw.select(F.col(value_col).cast("string").alias("json_data"), *carry)
        .select(F.from_json("json_data", STOCK_HISTORY_SCHEMA).alias("data"), *carry)
        .select("data.*", *carry)
    )


def explode_history(messages: DataFrame) -> DataFrame:
    """One message row → one row per (symbol, trading day).

    A1+P4 (spark/stock_analysis.py:63-78): ``explode`` drops rows with
    empty/null arrays, matching the reference (producer never sends empty
    arrays, dag:79). F3/F4 (:83-84): the engine keeps a real ``date``
    column end-to-end — the reference's string round-trip existed only to
    dodge a pandas datetime bug it no longer has.
    """
    return (
        messages.select(
            "symbol",
            "current_price",
            F.explode("historical_data").alias("history"),
        )
        .select(
            "symbol",
            "current_price",
            F.col("history.time").alias("time"),
            F.col("history.open").alias("open"),
            F.col("history.high").alias("high"),
            F.col("history.low").alias("low"),
            F.col("history.close").alias("close"),
            F.col("history.volume").alias("volume"),
        )
        .withColumn("date", F.to_date("time", "yyyy-MM-dd"))
    )


def attach_current_prices(
    bars: DataFrame, snapshot: DataFrame, how: str = "left"
) -> DataFrame:
    """SURVEY.md §2.4: the reference *embeds* current_price in every
    history message (a denormalized per-key scalar fan-out); the
    normalized equivalent is an explicit broadcast equi-join of the
    melted snapshot (`parse_snapshot_messages` output) onto the bar
    rows. The snapshot is one row per listed symbol — always tiny
    relative to history — so it broadcasts regardless of AQE thresholds.
    An existing ``current_price`` column (the reference's embedded copy,
    present on explode_history output) is replaced, not duplicated."""
    from pyspark.sql import functions as F

    if "current_price" in bars.columns:
        bars = bars.drop("current_price")

    prices = snapshot.select(
        "symbol", F.col("price").alias("current_price")
    )
    return bars.join(F.broadcast(prices), "symbol", how)


def parse_snapshot_messages(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """stock-topic snapshot ``{time: ts, <SYMBOL>: price|null}`` → long rows
    ``(snapshot_time, symbol, price)``.

    The reference produces this topic but never consumes it
    (dag:34-50; SURVEY.md §1.1.4). The engine ingests it as the optional
    current-price side input: a dynamic-keyed JSON object is parsed as a
    map and melted with ``explode(map)``.
    """
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), SNAPSHOT_SCHEMA).alias("m")
    )
    return (
        parsed.select(
            F.col("m")["time"].alias("snapshot_time"),
            F.explode(F.map_filter("m", lambda k, _: k != "time")).alias(
                "symbol", "price_str"
            ),
        )
        .withColumn("price", F.col("price_str").cast("double"))
        .drop("price_str")
    )
