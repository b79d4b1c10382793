"""Ingestion layer (SURVEY.md §2.1 S4/S5, §3.2): market-data fetch →
Kafka JSON messages.

Mirrors the reference DAG's message contract (airflow/dags/
fetch_to_kafka_dag.py:24-121) without its hard-wired API client:

- a *snapshot* message per cycle on the snapshot topic:
  ``{"time": <iso>, "<SYMBOL>": price-or-null, ...}`` (dynamic-keyed map,
  dag:34-40 — melted back by operators/parse.parse_snapshot_messages);
- one *history* message per symbol on the history topic:
  ``{"symbol", "current_price", "historical_data": [{time, open, high,
  low, close, volume}, ...]}`` (dag:95-99 — parsed by
  operators/parse.parse_history_messages);
- numpy/pandas scalars coerced to plain JSON types (the reference's
  NpEncoder, dag:12-22);
- symbol cap per cycle (dag:55) and a pluggable rate-limit hook instead
  of hard-coded sleeps (dag:106-118 — the engine does not block a
  scheduler thread by policy).

The fetcher and producer are injected callables, so the loop is testable
without a network or broker, and an Airflow PythonOperator can wrap
``publish_market_cycle`` directly (schedule + retries stay in the DAG,
exactly the reference's layering).
"""

from __future__ import annotations

import datetime as dt
import json
from typing import Any, Callable, Iterable, Mapping, Sequence

SNAPSHOT_TOPIC = "stock-topic"
HISTORY_TOPIC = "stock-history-topic"
BAR_FIELDS = ("time", "open", "high", "low", "close", "volume")


class NumpyJSONEncoder(json.JSONEncoder):
    """JSON encoder accepting numpy scalars/arrays and dates (the
    reference's NpEncoder, dag:12-22) without importing numpy eagerly."""

    def default(self, obj: Any) -> Any:
        tname = type(obj).__module__
        if tname.startswith("numpy"):
            if hasattr(obj, "tolist"):
                return obj.tolist()
            return obj.item()
        if isinstance(obj, (dt.date, dt.datetime)):
            return obj.strftime("%Y-%m-%d")
        return super().default(obj)


def encode_message(payload: Mapping[str, Any]) -> bytes:
    return json.dumps(payload, cls=NumpyJSONEncoder).encode("utf-8")


def snapshot_message(
    prices: Mapping[str, float | None], now: dt.datetime
) -> dict[str, Any]:
    """One market-wide snapshot: dynamic-keyed symbol→price map with a
    ``time`` field (dag:34-40). Missing prices stay explicit nulls."""
    msg: dict[str, Any] = {"time": now.isoformat()}
    msg.update(prices)
    return msg


def history_message(
    symbol: str,
    current_price: float | None,
    bars: Iterable[Mapping[str, Any]],
) -> dict[str, Any]:
    """One symbol's full daily history as a self-contained snapshot
    (dag:95-99) — the append-of-snapshots shape that makes downstream
    indicator computation stateless per micro-batch."""
    return {
        "symbol": symbol,
        "current_price": current_price,
        "historical_data": [
            {f: bar.get(f) for f in BAR_FIELDS} for bar in bars
        ],
    }


def publish_market_cycle(
    symbols: Sequence[str],
    fetch_price: Callable[[str], float | None],
    fetch_history: Callable[[str], Iterable[Mapping[str, Any]]],
    send: Callable[[str, bytes], None],
    max_symbols: int = 100,
    now: dt.datetime | None = None,
    throttle: Callable[[int], None] | None = None,
) -> dict[str, int]:
    """One ingest cycle (the DAG task body, dag:24-121): snapshot first,
    then per-symbol history messages. ``send(topic, value_bytes)`` is the
    producer boundary; ``throttle(i)`` is called after each symbol for
    rate-limit policy. Returns message counts for observability."""
    now = now or dt.datetime.now(dt.timezone.utc)
    capped = list(symbols)[:max_symbols]  # dag:55
    # price fetches are API calls too — an unthrottled burst here (r13
    # review) hit the upstream limiter before the dutifully-throttled
    # history loop even started, nulling snapshot prices on big batches
    prices: dict[str, float | None] = {}
    for i, s in enumerate(capped):
        prices[s] = fetch_price(s)
        if throttle is not None:
            throttle(i)
    send(SNAPSHOT_TOPIC, encode_message(snapshot_message(prices, now)))
    n_history = 0
    for i, sym in enumerate(capped):
        bars = list(fetch_history(sym))
        if bars:  # producer only sends non-empty histories (dag:79)
            send(
                HISTORY_TOPIC,
                encode_message(history_message(sym, prices[sym], bars)),
            )
            n_history += 1
        # throttle per API CALL, not per message — an empty history still
        # consumed a fetch_history request against the upstream rate limit
        if throttle is not None:
            throttle(i)
    return {"snapshot": 1, "history": n_history}
