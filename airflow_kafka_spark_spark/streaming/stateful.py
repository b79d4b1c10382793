"""Custom stateful streaming operator (SURVEY.md §2.10 T7 "delta-feed
mode").

The reference's stream is append-of-snapshots — every message carries a
symbol's FULL history, so indicators recompute statelessly per batch
(spark/stock_analysis.py:153-231). That design re-ships ~1,400 bars per
symbol every 30 minutes; at 100 TB the transport alone dominates. The
scalable alternative is a *delta feed*: messages carry only new bars, and
the engine carries the indicator recursion state (EMA-12/26, MACD signal)
across micro-batches with ``applyInPandasWithState``.

State is tiny and per-key — five doubles and a count — so a
1000-executor cluster shards it by key hash with no hotspot; the state
store checkpoints with the query, giving exactly-once state evolution on
restart. The EMA continuation is *bit-exact* with the batch kernel: a
recurrence's state at a batch boundary fully captures its history, so
re-seeding ``ema_recurrence`` with the saved state and dropping the seed
row reproduces the uninterrupted series (unit-tested in
tests/test_stateful.py).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.ema import ema_recurrence

STATE_SCHEMA = (
    "n_rows long, ema12 double, ema26 double, macd_signal double"
)
OUTPUT_SCHEMA = (
    "symbol string, date_str string, close double, ema12 double, "
    "ema26 double, macd_line double, macd_signal double, "
    "macd_histogram double, n_rows long"
)


def _continue_ema(x: np.ndarray, span: int, prev: float | None) -> np.ndarray:
    """Run the EMA recurrence over ``x``, seeded with ``prev`` when a
    prior batch left state behind (prepend-seed-and-drop: recurrence
    state at a boundary fully captures its history)."""
    if prev is None or np.isnan(prev):
        return ema_recurrence(x, span)
    return ema_recurrence(np.concatenate([[prev], x]), span)[1:]


def _update_macd(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_prev, e12_prev, e26_prev, sig_prev = state.get
    else:
        n_prev, e12_prev, e26_prev, sig_prev = 0, None, None, None

    pdf = pd.concat(list(pdfs)).sort_values("date_str")
    close = pdf["close"].to_numpy(dtype=np.float64)
    e12 = _continue_ema(close, 12, e12_prev)
    e26 = _continue_ema(close, 26, e26_prev)
    line = e12 - e26
    sig = _continue_ema(line, 9, sig_prev)

    n_total = n_prev + len(close)
    # Delta-feed contract guard: when the upstream (quotefeed_deltas)
    # rides the snapshot length along, the cumulative bar count this
    # state has absorbed must equal the latest snapshot's length —
    # they diverge exactly when the stream was started with numBars>1
    # (the first numBars-1 bars never entered state) and the MACD
    # would silently continue from the wrong seed.
    if "snapshot_n" in pdf.columns:
        expected = int(pdf["snapshot_n"].iloc[-1])
        if n_total != expected:
            raise ValueError(
                f"running_macd[{key[0]}]: cumulative bars seen "
                f"({n_total}) != upstream snapshot length ({expected}). "
                "quotefeed_deltas requires the stream to start with "
                "numBars=1 so every bar enters state exactly once."
            )
    state.update((n_total, float(e12[-1]), float(e26[-1]), float(sig[-1])))
    yield pd.DataFrame(
        {
            "symbol": key[0],
            "date_str": pdf["date_str"].to_numpy(),
            "close": close,
            "ema12": e12,
            "ema26": e26,
            "macd_line": line,
            "macd_signal": sig,
            "macd_histogram": line - sig,
            "n_rows": np.int64(n_total),
        }
    )


def quotefeed_deltas(raw: DataFrame) -> DataFrame:
    """Per-bar delta feed from quotefeed snapshot messages — the wiring
    between the engine-native poll source (sources/quotefeed.py) and
    :func:`running_macd`.

    Start the stream at ``numBars=1``: cycle c's snapshot then carries
    bars 0..c and exactly the LAST bar is new each cycle, so a
    stateless tail projection (``element_at(historical_data, -1)``)
    turns the snapshot stream into a pure per-bar delta feed — no
    dedup state, no batch_id branching. The contract is ENFORCED, not
    just documented: the snapshot length rides along as ``snapshot_n``
    and :func:`running_macd`'s state kernel raises when its cumulative
    bar count diverges from it (which happens exactly when the stream
    was started with numBars>1 and earlier bars never entered state). This is the transport shape the
    module docstring argues for at 100 TB: the reference re-ships the
    full history every poll (spark/stock_analysis.py:57-78); here only
    the new bar crosses the wire into the stateful MACD.

    Note the synthetic generator's dates wrap every 28 bars
    (sources/quotefeed._synthetic_history) — within a micro-batch each
    symbol has exactly one bar so running_macd's in-batch sort never
    sees the wrap; examples/tests keep cycle counts below 28 anyway so
    date_str stays unique per bar.
    """
    from pyspark.sql import functions as F

    from ..operators.parse import parse_history_messages

    msgs = parse_history_messages(raw, value_col="message")
    last = F.element_at(F.col("historical_data"), -1)
    return msgs.select(
        "symbol",
        last.getField("time").alias("date_str"),
        last.getField("close").alias("close"),
        F.size("historical_data").cast("long").alias("snapshot_n"),
    )


def running_macd(deltas: DataFrame) -> DataFrame:
    """Per-key MACD over a delta feed of ``(symbol, date_str, close)``.

    Streaming-only (applyInPandasWithState is unsupported in batch
    queries — the batch equivalent is the stateless
    operators.indicators/with_macd kernel, which this reproduces
    bit-for-bit). Rows within a batch are ordered by ``date_str``; feed batches in
    event order (the delta-feed contract — late rows belong in a
    watermarked upstream dedup, not here).
    """
    return deltas.groupBy("symbol").applyInPandasWithState(
        _update_macd,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningMacdProcessor(StatefulProcessor):
    """StatefulProcessor for transformWithStateInPandas (Spark 4's
    successor to applyInPandasWithState): same delta-feed MACD
    continuation, same bit-exactness contract, expressed against the
    new typed-state API (named ValueState handles instead of one
    positional state tuple; per-state TTL and timers become available
    for free when needed).

    Deliberately reuses ``_continue_ema`` so all three surfaces — batch
    kernel, applyInPandasWithState, transformWithState — share one
    recurrence implementation (tests pin the equality).
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("macd", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            n_prev, e12_prev, e26_prev, sig_prev = self._state.get()
        else:
            n_prev, e12_prev, e26_prev, sig_prev = 0, None, None, None

        pdf = pd.concat(list(rows)).sort_values("date_str")
        close = pdf["close"].to_numpy(dtype=np.float64)
        e12 = _continue_ema(close, 12, e12_prev)
        e26 = _continue_ema(close, 26, e26_prev)
        line = e12 - e26
        sig = _continue_ema(line, 9, sig_prev)

        n_total = n_prev + len(close)
        # the same delta-feed contract guard as _update_macd — the
        # "identical semantics" claim covers the ERROR surface too: a
        # quotefeed_deltas stream started at numBars>1 must raise here
        # exactly as it does on the applyInPandasWithState path, not
        # silently continue the EMA from the wrong seed
        if "snapshot_n" in pdf.columns:
            expected = int(pdf["snapshot_n"].iloc[-1])
            if n_total != expected:
                raise ValueError(
                    f"running_macd[{key[0]}]: cumulative bars seen "
                    f"({n_total}) != upstream snapshot length "
                    f"({expected}). quotefeed_deltas requires the stream "
                    "to start with numBars=1 so every bar enters state "
                    "exactly once."
                )
        self._state.update(
            (n_total, float(e12[-1]), float(e26[-1]), float(sig[-1]))
        )
        yield pd.DataFrame(
            {
                "symbol": key[0],
                "date_str": pdf["date_str"].to_numpy(),
                "close": close,
                "ema12": e12,
                "ema26": e26,
                "macd_line": line,
                "macd_signal": sig,
                "macd_histogram": line - sig,
                "n_rows": np.int64(n_total),
            }
        )

    def close(self) -> None:
        pass


def running_macd_tws(deltas: DataFrame) -> DataFrame:
    """``running_macd`` on the transformWithStateInPandas API (Spark 4).

    Identical semantics and bit-identical output to
    :func:`running_macd`; requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` →
    ``...state.RocksDBStateStoreProvider``) — transformWithState does
    not run on the default HDFS-backed provider.
    """
    return deltas.groupBy("symbol").transformWithStateInPandas(
        statefulProcessor=RunningMacdProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def replay_macd_in_batches(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    close_col: str = "close",
    n_batches: int = 3,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
) -> DataFrame:
    """Batch-mode replay of the streaming MACD continuation — the
    certification surface for the module's bit-exactness claim.

    Per key, the ordered series is split into ``n_batches`` contiguous
    chunks and folded chunk-by-chunk through the EXACT state carry the
    streaming processors use: :func:`_continue_ema` seeded with the
    previous chunk's terminal ``(ema_fast, ema_slow, macd_signal)``
    state, mirroring ``_update_macd`` /
    ``RunningMacdProcessor.handleInputRows`` line for line. On a
    NaN-free series (the delta-feed contract; a NaN run ending a chunk
    forgets its pending gap decay at the boundary — see
    ``ema_recurrence``) the concatenated output must equal the
    uninterrupted one-shot kernel (``operators.indicators.with_macd``)
    bit for bit — ``running_macd_cert`` pins that equality under the
    driver's oracle hash check.

    Scale: grouped-map ``applyInPandas`` like the serving paths — one
    shuffle on the key, per-key work bounded by history length. An
    empty chunk (key with fewer rows than batches) carries state
    through unchanged, exactly like a micro-batch with no rows for
    that key."""
    from pyspark.sql import types as T

    keep = list(dict.fromkeys([*key_cols, *order_cols, close_col]))
    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = T.StructType(
        [in_fields[c] for c in keep]
        + [
            T.StructField(n, T.DoubleType())
            for n in ("macd_line", "macd_signal", "macd_histogram")
        ]
    )
    if n_batches < 1:
        raise ValueError(f"n_batches must be >= 1, got {n_batches}")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            list(order_cols), kind="mergesort"
        ).reset_index(drop=True)
        close = pdf[close_col].to_numpy(dtype=np.float64)
        n = len(close)
        bounds = [(n * b) // n_batches for b in range(n_batches + 1)]
        e12_prev = e26_prev = sig_prev = None
        lines: list[np.ndarray] = []
        sigs: list[np.ndarray] = []
        for b in range(n_batches):
            chunk = close[bounds[b] : bounds[b + 1]]
            if len(chunk) == 0:
                continue
            e12 = _continue_ema(chunk, fast, e12_prev)
            e26 = _continue_ema(chunk, slow, e26_prev)
            line = e12 - e26
            sig = _continue_ema(line, signal, sig_prev)
            e12_prev, e26_prev, sig_prev = (
                float(e12[-1]),
                float(e26[-1]),
                float(sig[-1]),
            )
            lines.append(line)
            sigs.append(sig)
        line = np.concatenate(lines) if lines else np.empty(0)
        sig = np.concatenate(sigs) if sigs else np.empty(0)
        out = pdf[keep].copy()
        out["macd_line"] = line
        out["macd_signal"] = sig
        out["macd_histogram"] = line - sig
        return out

    return (
        df.select(*keep).groupBy(*key_cols).applyInPandas(kernel, out_schema)
    )
