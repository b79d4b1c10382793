"""Latest-snapshot-per-key dedup (SURVEY.md §4.3.3 — documented deviation).

The reference can receive *multiple* full-history snapshot messages for one
symbol in a single micro-batch (30-min DAG cadence vs 10-min trigger, plus
``startingOffsets=earliest`` replay). Its pandas loop concatenates them,
corrupting rolling windows with duplicated dates
(spark/stock_analysis.py:163-174). Messages are self-contained snapshots,
so the correct semantics — and the evident intent — is to keep only the
newest message per key before exploding.

Deterministic: ordered by Kafka ``timestamp`` then ``offset`` (a total
order within a partition; symbols are the message key so one symbol lives
in one Kafka partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_message_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Keep the single newest row per key. ``order_cols`` must form a total
    order (e.g. Kafka ``["timestamp", "offset"]``). Delegates to
    ``functions.windows.last_per_key`` — ONE definition of the rank-1
    idiom (r13 review: a future null-ordering or tie-break fix to one
    hand-copied variant would silently miss the streaming dedup path)."""
    from ..functions.windows import last_per_key

    return last_per_key(df, key_cols, [F.col(c) for c in order_cols])


def dedup_exact(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact dedup — ``dropDuplicates`` (hash aggregate under the hood;
    map-side partial aggregation keeps the shuffle small at scale)."""
    return df.dropDuplicates(subset)


def streaming_dedup(
    stream: DataFrame,
    id_cols: list[str],
    ts_col: str,
    watermark: str,
) -> DataFrame:
    """Cross-micro-batch exactly-once-style event dedup for streams:
    ``dropDuplicatesWithinWatermark`` keeps the first occurrence of each
    ``id_cols`` tuple and expires its dedup state once the watermark
    passes — bounded state, unlike plain ``dropDuplicates`` on a stream
    (whose keyed state grows forever). Use for at-least-once sources
    (Kafka redelivery, producer retries) where duplicates arrive within
    a known lateness bound.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )
