"""Technical indicators W1-W10 (SURVEY.md §2.6) as executor-side transforms.

Semantics are the reference's exactly (spark/stock_analysis.py:166-191):
per-key series ordered by date, pandas ``rolling(N)`` min_periods NULLs,
the RSI loss==0→0 quirk, ``ewm(adjust=False)`` MACD. Execution is native:

- MA5/MA20/RSI: pure Window functions — whole-stage codegen, one hash
  shuffle on the key.
- EMA/MACD: grouped-map ``applyInArrow`` (runs on executors). Arrow-native
  rather than pandas: the kernel touches exactly one column (close →
  float64 numpy, zero-copy) and appends three arrays — no per-group
  pandas DataFrame materialization, which profiling showed costs ~6× the
  math itself at 100k rows. Because the Window step already
  hash-partitioned the data by the same key, Catalyst satisfies the
  groupBy's distribution without a second shuffle.

At 100 TB the only state is per-key and per-partition; keys (symbols /
users) are hash-distributed across executors, so the plan scales linearly
with key cardinality. Skewed keys (one symbol with a giant history) are
bounded by history length, not data volume.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.ema import macd_columns
from ..functions.windows import (
    diff_1,
    gain_loss,
    rolling_mean,
    rsi_from_avgs,
    series_window,
)

MACD_FIELDS = [
    T.StructField("macd_line", T.DoubleType()),
    T.StructField("macd_signal", T.DoubleType()),
    T.StructField("macd_histogram", T.DoubleType()),
]


def with_moving_averages(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    close_col: str = "close",
) -> DataFrame:
    """W1/W2: ma5 + ma20 (spark/stock_analysis.py:173-174)."""
    w = series_window(key_cols, order_cols)
    c = F.col(close_col)
    return df.withColumn("ma5", rolling_mean(c, w, 5)).withColumn(
        "ma20", rolling_mean(c, w, 20)
    )


def with_rsi(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    close_col: str = "close",
    period: int = 14,
) -> DataFrame:
    """W3-W6: RSI over a simple (Cutler's) rolling mean of gains/losses
    (spark/stock_analysis.py:177-183), including the loss==0 ⇒ RSI=0 quirk."""
    w = series_window(key_cols, order_cols)
    delta = diff_1(F.col(close_col), w)
    gain, loss = gain_loss(delta)
    avg_gain = rolling_mean(gain, w, period)
    avg_loss = rolling_mean(loss, w, period)
    return df.withColumn("rsi", rsi_from_avgs(avg_gain, avg_loss))


def with_macd(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    close_col: str = "close",
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
) -> DataFrame:
    """W7-W10: MACD line / signal / histogram via grouped-map applyInArrow
    (spark/stock_analysis.py:186-191). The kernel sorts each key's table by
    ``order_cols`` — identical to the Window order used by the other
    indicators — and appends three double columns; everything else passes
    through untouched, never leaving Arrow representation."""
    import pyarrow as pa

    out_schema = T.StructType(list(df.schema.fields) + MACD_FIELDS)
    sort_keys = [(c, "ascending") for c in order_cols]

    def kernel(table: pa.Table) -> pa.Table:
        table = table.sort_by(sort_keys)
        close = np.asarray(
            table.column(close_col).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        line, sig, hist = macd_columns(close, fast, slow, signal)
        for name, arr in (
            ("macd_line", line),
            ("macd_signal", sig),
            ("macd_histogram", hist),
        ):
            # from_pandas=True: NaN → null, matching the pandas-path
            # semantics (DoubleType NULL, not NaN, for undefined rows)
            table = table.append_column(
                name, pa.array(arr, type=pa.float64(), from_pandas=True)
            )
        return table

    return df.groupBy(*key_cols).applyInArrow(kernel, schema=out_schema)


def with_indicators(
    df: DataFrame,
    key_cols: Iterable[str] = ("symbol",),
    order_cols: Iterable[str] = ("date",),
    close_col: str = "close",
) -> DataFrame:
    """Full W1-W10 stack in one pass: Window indicators first (one shuffle
    on the key), then the MACD grouped-map reusing that partitioning."""
    key_cols, order_cols = list(key_cols), list(order_cols)
    df = with_moving_averages(df, key_cols, order_cols, close_col)
    df = with_rsi(df, key_cols, order_cols, close_col)
    df = with_macd(df, key_cols, order_cols, close_col)
    return df
