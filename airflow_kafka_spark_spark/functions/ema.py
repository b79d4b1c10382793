"""Exponential moving average kernel (SURVEY.md §2.6 W7/W9).

Spark has no built-in EMA (it is an order-sensitive recursion, not a frame
aggregate). The reference computes it with pandas ``ewm(span=N,
adjust=False)`` on the driver (reference spark/stock_analysis.py:186-190);
here the identical recurrence runs on *executors* as a grouped-map
``applyInPandas`` kernel, parallel per key partition:

    alpha = 2 / (span + 1)
    y[0]  = x[0]
    y[t]  = alpha * x[t] + (1 - alpha) * y[t-1]

The loop is written explicitly (not pandas ``ewm``) so the floating-point
operation order — one multiply-each, one add — is bit-identical to the
DuckDB recursive-CTE oracle, which evaluates the same expression shape.
pandas ``ewm(adjust=False)`` computes the same recurrence to within 1 ULP
per step (unit-tested).

Scale note: state is per-key and sequential *within* a key only; keys are
hash-distributed, so a 1000-executor cluster runs one small pandas frame
per key concurrently. Arrow-batched transfer, no driver involvement.
"""

from __future__ import annotations

import numpy as np


def ema_recurrence(x: np.ndarray, span: int) -> np.ndarray:
    """Exact adjust=False EMA recurrence over a 1-D float64 array.

    NULL (NaN) handling matches pandas ewm's DEFAULT ``ignore_na=False``
    — the reference's semantics, since it never passes ignore_na: a NaN
    row emits the previous state unchanged but still DECAYS the old
    state's weight, so the next observation counts the gap
    (``y = (β^(g+1)·y + α·x) / (β^(g+1) + α)`` after g NaNs; pandas'
    per-row weight multiply is mirrored exactly). r13 review caught the
    old kernel implementing ``ignore_na=True`` (gap ignored) while its
    docstring claimed pandas parity — confirmed divergent by execution.

    The gapless step keeps the ORIGINAL single-expression op order
    ``α·x + β·y`` (not pandas' divide-by-(w+α) form), so NaN-free series
    — every oracled fixture, and the streaming continuation contract —
    are bit-identical to the DuckDB recursive-CTE oracle as before.
    Pending gap decay does NOT cross calls: a NaN run ending a batch is
    forgotten at a ``_continue_ema`` boundary (the seed re-enters as a
    fresh observation) — documented limit, NaN-free by contract there.
    """
    return ema_recurrence_state(x, span)[0]


def ema_recurrence_state(
    x: np.ndarray,
    span: int,
    state: tuple[float, bool, float] | None = None,
) -> tuple[np.ndarray, tuple[float, bool, float]]:
    """Resumable form of :func:`ema_recurrence`: runs the identical op
    sequence over ``x`` starting from ``state = (value, have_state,
    pending_w)`` (``None`` = fresh series) and returns the outputs plus
    the terminal state. Feeding a series through in chunks with the
    carried state is bit-identical to one call over the whole array —
    INCLUDING a NaN run straddling a chunk boundary, which the
    prepend-seed idiom (``streaming.stateful._continue_ema``) forgets
    by construction (its documented limit). The chunked batch kernel
    (``operators.indicators.with_macd``) therefore carries this full
    triple, never just the value."""
    alpha = 2.0 / (span + 1.0)
    beta = 1.0 - alpha
    out = np.empty(len(x), dtype=np.float64)
    if state is None:
        sval = np.nan
        have_state = False
        w = 1.0  # pending old-state weight (pandas old_wt), decayed per row
    else:
        sval, have_state, w = state
    for i in range(len(x)):
        v = x[i]
        if not have_state:
            if np.isnan(v):
                out[i] = np.nan
                continue
            sval = v
            have_state = True
            w = 1.0
            out[i] = sval
            continue
        w *= beta  # one decay per row, observation or not (ignore_na=False)
        if np.isnan(v):
            out[i] = sval
            continue
        if w == beta:  # no gap since last observation (1.0 * beta == beta
            # exactly): the original op order, bit-identical to the oracle
            sval = alpha * v + beta * sval
        else:
            sval = (w * sval + alpha * v) / (w + alpha)
        w = 1.0
        out[i] = sval
    return out, (sval, have_state, w)


def macd_columns(
    close: np.ndarray,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """MACD line / signal / histogram (W7-W10,
    spark/stock_analysis.py:186-191): EMA(fast) − EMA(slow), EMA(signal) of
    the line, and their difference. Defined from the first row (no warm-up
    NULLs — ewm adjust=False seeds with x[0])."""
    ema_fast = ema_recurrence(close, fast)
    ema_slow = ema_recurrence(close, slow)
    line = ema_fast - ema_slow
    sig = ema_recurrence(line, signal)
    hist = line - sig
    return line, sig, hist
