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
    """W7-W10: MACD line / signal / histogram via partition-sorted
    ``mapInArrow`` with cross-batch state carry
    (spark/stock_analysis.py:186-191 semantics, unchanged).

    The previous shape was ``groupBy(key).applyInArrow`` — correct, but
    ``FlatMapGroupsInArrowExec`` invokes the Python function ONCE PER
    GROUP, so at large key counts the per-group invocation overhead
    (not the math) dominates (guide §4: r16 identity-kernel A/B
    measured ~0.4 s of pure per-group overhead over 1500 groups at
    sf0.1; at 10^6+ keys it scales with keys). This form instead
    repartitions by key, sorts within partitions by (key, order) and
    streams WHOLE Arrow batches through one kernel invocation each:
    contiguous key runs are segmented vectorized (null keys compare
    equal, matching groupBy), and a group spanning batch boundaries
    continues through the carried full recurrence state
    (:func:`..functions.ema.ema_recurrence_state` — value,
    have-state, pending NaN-gap weight), bit-identical to one-shot by
    construction and pinned by test at maxRecordsPerBatch=37.

    The explicit repartition keeps the operator correct standalone (a
    key split across partitions would silently restart its EMA);
    under ``with_indicators`` the Window stage already established the
    same hash partitioning and (key, order) sort, and Catalyst
    collapses both the repartition and the sort (verified: exchange
    count unchanged at sf0.1, r17).

    Null ORDER keys now sort nulls-first (Spark sort default, same as
    the ma/rsi Windows) where the old pyarrow ``sort_by`` placed them
    last — the two indicator families previously disagreed on
    null-order rows; no declared query or fixture carries null order
    keys. Float NaN KEYS would segment per-row (Arrow NaN != NaN)
    where groupBy pools them — keys are ids/symbols by contract."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.ema import ema_recurrence_state

    out_schema = T.StructType(list(df.schema.fields) + MACD_FIELDS)
    cols = df.columns
    k_idx = [cols.index(c) for c in key_cols]
    c_idx = cols.index(close_col)

    df = df.repartition(*[F.col(c) for c in key_cols]).sortWithinPartitions(
        *(list(key_cols) + list(order_cols))
    )

    def kernel(batches):
        cur_key = None
        st = [None, None, None]  # fast, slow, signal recurrence states
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            close = np.asarray(
                batch.column(c_idx).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            # segment starts: rows whose key differs from the previous
            # row (vectorized; nulls compare EQUAL so null keys stay
            # one group, as groupBy treats them)
            change = np.zeros(n, dtype=bool)
            if n > 1:
                for i in k_idx:
                    col = batch.column(i)
                    head, tail = col.slice(0, n - 1), col.slice(1)
                    neq = pc.fill_null(pc.not_equal(tail, head), False)
                    one_null = pc.xor(pc.is_null(tail), pc.is_null(head))
                    change[1:] |= pc.or_(neq, one_null).to_numpy(
                        zero_copy_only=False
                    )
            bounds = np.concatenate([[0], np.flatnonzero(change), [n]])
            line_out = np.empty(n, dtype=np.float64)
            sig_out = np.empty(n, dtype=np.float64)
            for s, e in zip(bounds[:-1], bounds[1:]):
                key = tuple(batch.column(i)[int(s)].as_py() for i in k_idx)
                if key != cur_key:
                    st = [None, None, None]
                    cur_key = key
                seg = close[s:e]
                ef, st[0] = ema_recurrence_state(seg, fast, st[0])
                es, st[1] = ema_recurrence_state(seg, slow, st[1])
                line = ef - es
                sg, st[2] = ema_recurrence_state(line, signal, st[2])
                line_out[s:e] = line
                sig_out[s:e] = sg
            hist = line_out - sig_out
            for name, arr in (
                ("macd_line", line_out),
                ("macd_signal", sig_out),
                ("macd_histogram", hist),
            ):
                # from_pandas=True: NaN → null, matching the pandas-path
                # semantics (DoubleType NULL, not NaN, for undefined rows)
                batch = batch.append_column(
                    name, pa.array(arr, type=pa.float64(), from_pandas=True)
                )
            yield batch

    return df.mapInArrow(kernel, out_schema)


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
