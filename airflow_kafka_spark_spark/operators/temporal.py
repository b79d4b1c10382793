"""Temporal operators: as-of join, range join, event-time windows.

The reference's only temporal logic is per-key ordered series
(spark/stock_analysis.py:166-191); these operators extend that into the
standard time-series join/window surface a large-scale pipeline needs.
All are built for Spark's execution model:

- ``asof_join`` uses the union-merge formulation — ONE hash shuffle on the
  key, a single ordered window pass, no range-condition join. A naive
  non-equi join (``l.ts >= r.ts``) degenerates to BroadcastNestedLoop /
  cartesian-per-key and dies at scale; the union-merge plan is O(n log n)
  per key and survives a 1000-executor shuffle unchanged.
- ``bucketed_range_join`` turns a bounded range predicate into an
  equi-join on a coarse time bucket (probe side fans out to the two
  covering buckets) + a residual filter — the standard scale trick that
  keeps Catalyst on SortMergeJoin/ShuffledHashJoin instead of a nested
  loop.
- ``tumbling_agg`` / ``session_agg`` wrap ``F.window`` /
  ``F.session_window``; identical semantics batch-side (oracle-checkable)
  and stream-side (add ``withWatermark`` upstream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    inclusive: bool = True,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for every left row, attach the nearest right row
    within the same key — ``direction="backward"`` (default) picks the
    greatest ``right_ts`` ≤ ``left_ts``, ``direction="forward"`` the
    smallest ``right_ts`` ≥ ``left_ts`` (strict inequalities when
    ``inclusive=False``); NULLs when no such row. ``tolerance`` (a
    Spark interval string, e.g. ``"10 minutes"``) bounds the match
    distance like pandas merge_asof: a carried row farther than the
    tolerance is nulled out AFTER the carry — a pure map-side interval
    comparison, no plan change, no extra shuffle.

    Union-merge plan: tag sides, union, one window ordered by
    ``(ts, side)`` per key, carry the right payload across with
    ``last(ignorenulls)`` over the preceding frame (backward) or
    ``first(ignorenulls)`` over the following frame (forward), keep left
    rows. The side tag orders right rows so an equal-ts match is visible
    exactly when ``inclusive``.

    ``right_value_cols`` must not collide with left column names.
    ``right`` must be unique per (key, ts) for deterministic results —
    pre-aggregate it if not.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest":
        if not inclusive:
            raise ValueError("direction='nearest' requires inclusive=True")
        return _asof_nearest(
            left, right, key_cols, left_ts, right_ts, right_value_cols,
            tolerance=tolerance,
        )
    if direction == "backward":
        l_side, r_side = (1, 0) if inclusive else (0, 1)
    else:
        l_side, r_side = (0, 1) if inclusive else (1, 0)
    merged, left_payload = _asof_union_frame(
        left, right, key_cols, left_ts, right_ts, right_value_cols,
        l_side, r_side,
    )
    w = Window.partitionBy(*key_cols).orderBy("__ts", "__side")
    if direction == "backward":
        w = w.rowsBetween(Window.unboundedPreceding, 0)
        carry = F.last("__r", ignorenulls=True).over(w)
    else:
        w = w.rowsBetween(0, Window.unboundedFollowing)
        carry = F.first("__r", ignorenulls=True).over(w)
    merged = merged.withColumn("__r", carry)
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}")
        in_band = (
            F.col("__r.__rts") >= F.col("__ts") - tol
            if direction == "backward"
            else F.col("__r.__rts") <= F.col("__ts") + tol
        )
        merged = merged.withColumn(
            "__r", F.when(in_band, F.col("__r"))
        )
    # a NULL-ts left row matches nothing (NULL satisfies no predicate);
    # without the guard the forward frame hands it the earliest right row
    r_final = F.when(F.col("__ts").isNotNull(), F.col("__r"))
    return (
        merged.filter(F.col("__is_left"))
        .select(
            *key_cols,
            *left_payload,
            *[r_final[c].alias(c) for c in right_value_cols],
        )
    )


def _asof_union_frame(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    l_side: int,
    r_side: int,
) -> tuple[DataFrame, list[str]]:
    """The tagged union-merge frame shared by ``asof_join`` and
    ``_asof_nearest`` (one definition — a one-sided future fix to the
    carry frame was the r12-flagged hazard): left rows keep their
    payload and carry a NULL right struct; right rows null the left
    payload and carry their payload as ONE struct (``last/first
    (ignorenulls)`` then skips left rows but never skips a right row
    whose *fields* are NULL — per-column carry would mix fields from
    different right rows). The matched right ts rides in the struct as
    ``__rts`` so tolerance checks run after the carry. Side tags order
    equal-ts rows; callers choose them to make the equal-ts match
    visible exactly when inclusive. Returns (union frame, left payload
    column names).

    NULL-ts right rows are dropped here (r13 review): NULL satisfies no
    as-of predicate — but ascending window order puts NULLs FIRST, so
    an un-dropped NULL-ts right row's payload would be carried into
    every left row preceding the first real right row as its "most
    recent" match. NULL-ts LEFT rows stay in the frame (every left row
    must come back) — the callers NULL their match instead (they sort
    first too, which is only accidentally correct for the backward
    carry; the forward frame would hand them the earliest right row)."""
    left_payload = [c for c in left.columns if c not in key_cols]
    right = right.filter(F.col(right_ts).isNotNull())
    r_struct = F.struct(F.col(right_ts).alias("__rts"), *right_value_cols)
    r_struct_type = (
        right.select(r_struct.alias("__r")).schema["__r"].dataType
    )
    l = left.select(
        *key_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(True).alias("__is_left"),
        *left_payload,
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        F.lit(False).alias("__is_left"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_payload
        ],
        r_struct.alias("__r"),
    )
    return l.unionByName(r), left_payload


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """``asof_join(direction="nearest")``: attach the right row whose ts
    is CLOSEST to the left ts in either direction (|Δt| minimized; an
    exact-ts match is distance 0; equal distances break toward the
    backward candidate — deterministic and documented).

    Still ONE shuffle: the union-merge frame is ordered ``(ts, side)``
    with right rows before left rows at equal ts, so a single window
    pass yields BOTH carries — the backward candidate via
    ``last(ignorenulls)`` over the preceding-inclusive frame (sees the
    distance-0 match) and the forward candidate via
    ``first(ignorenulls)`` over the strictly-following frame (equal-ts
    rows sort before the left row, so it only sees strictly-later
    rights — which is correct, the tie already went backward). The
    closer candidate wins by day-time-interval comparison (no epoch
    casts — NTZ-safe).
    """
    union, left_payload = _asof_union_frame(
        left, right, key_cols, left_ts, right_ts, right_value_cols,
        l_side=1, r_side=0,
    )
    w = Window.partitionBy(*key_cols).orderBy("__ts", "__side")
    back = F.last("__r", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = F.first("__r", ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    merged = union.withColumn("__back", back).withColumn("__fwd", fwd)
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}")
        merged = merged.withColumn(
            "__back",
            F.when(
                F.col("__back.__rts") >= F.col("__ts") - tol, F.col("__back")
            ),
        ).withColumn(
            "__fwd",
            F.when(
                F.col("__fwd.__rts") <= F.col("__ts") + tol, F.col("__fwd")
            ),
        )
    nearer_back = (
        F.col("__fwd").isNull()
        | (
            F.col("__back").isNotNull()
            & (
                (F.col("__ts") - F.col("__back.__rts"))
                <= (F.col("__fwd.__rts") - F.col("__ts"))
            )
        )
    )
    # NULL-ts left rows match nothing (same guard as asof_join)
    chosen = F.when(
        F.col("__ts").isNotNull(),
        F.when(nearer_back, F.col("__back")).otherwise(F.col("__fwd")),
    )
    return (
        merged.filter(F.col("__is_left"))
        .withColumn("__chosen", chosen)
        .select(
            *key_cols,
            *left_payload,
            *[F.col("__chosen")[c].alias(c) for c in right_value_cols],
            F.when(F.col("__chosen").isNull(), F.lit(None).cast("string"))
            .when(nearer_back, F.lit("backward"))
            .otherwise(F.lit("forward"))
            .alias("asof_direction"),
        )
    )


def _wallclock_micros(c: Column) -> Column:
    """Micros since wall-clock ``1970-01-01 00:00:00`` of a TIMESTAMP_NTZ
    value — built purely from field extraction (date diff, hour, minute,
    fractional second via date_part), so no session-timezone rendering is
    involved anywhere. Unlike an NTZ→LTZ cast, this is exactly linear in
    the wall clock even when the session timezone observes DST."""
    days = F.datediff(c.cast("date"), F.to_date(F.lit("1970-01-01")))
    secs = days.cast("long") * 86400 + F.hour(c) * 3600 + F.minute(c) * 60
    frac = F.date_part(F.lit("SECOND"), c)  # decimal(8,6): sec + micros
    return secs * F.lit(1_000_000).cast("long") + (
        frac * 1_000_000
    ).cast("long")


# Upper bound in microseconds on one unit of each Spark interval
# keyword (longest calendar realization: 31-day months, 366-day years)
_INTERVAL_UNIT_UB_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 604_800_000_000,
    "month": 2_678_400_000_000,
    "year": 31_622_400_000_000,
}
_CALENDAR_UNITS = {"day", "week", "month", "year"}


def _interval_span_upper_bound_us(interval: str, caller: str) -> tuple[int, bool]:
    """Upper bound (µs) on the width of ``ts ± INTERVAL interval`` over
    ANY anchor, plus whether the interval has calendar units. The old
    epoch-anchored width UNDER-estimated calendar intervals ('2 months'
    measured Jan+Feb 1970 = 59 days, but an Oct anchor reaches back 61)
    — a bucket narrower than the real window breaks the two-bucket
    coverage invariant and SILENTLY drops matches. An over-estimate
    only coarsens bucket pruning; the exact residual predicate keeps
    the join correct, so the bound takes each unit's longest
    realization. Accepts the ``N unit [N unit ...]`` form the engine
    uses, with integer or fractional counts; note Spark's own INTERVAL
    literal permits fractions on SECONDS only ('1.5 seconds' is legal,
    '1.5 hours' is not) — this bound stays permissive and leaves unit
    rules to Spark's parser, the authority, which raises a clear
    INVALID_FRACTION at the residual predicate. Anything unmeasurable
    raises rather than risking a silent mis-measure."""
    from fractions import Fraction

    toks = interval.strip().lower().replace(",", " ").split()
    if not toks or len(toks) % 2:
        raise ValueError(
            f"{caller}: interval {interval!r} is not of the form "
            "'N unit [N unit ...]'"
        )
    total, has_cal = 0, False
    for num, unit in zip(toks[::2], toks[1::2]):
        u = unit.rstrip("s")
        if u not in _INTERVAL_UNIT_UB_US:
            raise ValueError(
                f"{caller}: unsupported interval unit {unit!r} in "
                f"{interval!r} (supported: {sorted(_INTERVAL_UNIT_UB_US)})"
            )
        # fractional counts ('1.5 seconds') are legal INTERVAL literals,
        # so the residual predicate accepts them — the bound must too
        # (r12 rejected them outright, breaking previously-working
        # lookbacks). Fraction keeps the ceil EXACT: a float product can
        # round DOWN below the true width, the silent-drop direction.
        try:
            val = Fraction(num)
        except (ValueError, ZeroDivisionError):
            raise ValueError(
                f"{caller}: interval count {num!r} in {interval!r} must "
                "be a non-negative number"
            ) from None
        if val < 0:
            raise ValueError(
                f"{caller}: interval count {num!r} in {interval!r} must "
                "be a non-negative number"
            )
        scaled = val * _INTERVAL_UNIT_UB_US[u]
        total += -(-scaled.numerator // scaled.denominator)
        has_cal = has_cal or u in _CALENDAR_UNITS
    if total <= 0:
        raise ValueError(f"{caller}: interval {interval!r} has zero width")
    return total, has_cal


def _span_ub_lit(interval: str, caller: str, ltz: bool):
    """The bucket width as a literal: the interval's upper-bound width,
    plus one hour of DST slack when calendar units meet an LTZ metric
    (a calendar day across a fall-back transition is 25 instant-hours;
    the engine session pins UTC where DST never fires, but the operator
    must stay correct on any caller session)."""
    ub, has_cal = _interval_span_upper_bound_us(interval, caller)
    if ltz and has_cal:
        ub += 3_600_000_000
    return F.lit(ub).cast("long")


def _require_uniform_ntz(caller: str, specs: list[tuple[DataFrame, str]]) -> bool:
    """All timestamp columns in ``specs`` must agree on NTZ-ness (mixed
    types would compare by an implicit session-timezone cast); returns
    the shared flag. Shared by both bucketizing joins — one definition
    of the boundary check, two callers."""
    from pyspark.sql import types as T

    flags = {
        (col, isinstance(df.schema[col].dataType, T.TimestampNTZType))
        for df, col in specs
    }
    if len({f for _c, f in flags}) != 1:
        detail = ", ".join(f"{c} NTZ={f}" for c, f in sorted(flags))
        raise ValueError(
            f"{caller}: all timestamp columns must agree on NTZ-ness "
            f"({detail}) — mixed types would compare by an implicit "
            "session-timezone cast"
        )
    return next(iter({f for _c, f in flags}))


def _time_metric_and_span(ntz: bool, span: str, caller: str):
    """The (metric fn, bucket width) pair both bucketizing joins derive
    from NTZ-ness — factored so the derivation has ONE definition (the
    r12 calendar-interval bug lived exactly here; a one-sided future
    fix was the standing hazard). The metric must be LINEAR in the
    columns' own comparison order, or the adjacent-bucket coverage
    invariant breaks:

    - TIMESTAMP_NTZ columns compare by WALL CLOCK, so buckets come from
      ``_wallclock_micros`` — pure field extraction, no session-timezone
      rendering. An NTZ→LTZ cast applies the session zone's per-row UTC
      offset, which is NOT constant in a DST zone: two wall times 2h
      apart straddling a spring-forward gap cast to instants only 1h
      apart, so a build row could land ≥2 buckets away and silently
      drop the match.
    - TIMESTAMP (LTZ) columns compare by instant, so ``unix_micros`` is
      the right (and exactly linear) metric; the explicit TimestampType
      cast keeps it legal under ``spark.sql.timestampType=
      TIMESTAMP_NTZ`` (where even timestamp_micros returns NTZ). The
      LTZ span adds one hour of DST slack for calendar units
      (``_span_ub_lit``).

    The bucket width is an UPPER BOUND on the window's width at any
    anchor (``_interval_span_upper_bound_us``): an epoch-anchored width
    under-measures calendar intervals ('2 months' = Jan+Feb 1970 = 59
    days vs a real 61/62-day window) and the two-bucket explode then
    silently drops in-range matches. Over-estimating only coarsens
    pruning — callers' exact residual predicates stay exact.
    """
    from pyspark.sql import types as T

    if ntz:
        return _wallclock_micros, _span_ub_lit(span, caller, ltz=False)

    def metric(c: Column) -> Column:
        return F.unix_micros(c.cast(T.TimestampType()))

    return metric, _span_ub_lit(span, caller, ltz=True)


def bucketed_range_join(
    probe: DataFrame,
    build: DataFrame,
    key_cols: list[str],
    probe_ts: str,
    build_ts: str,
    lookback: str,
    how: str = "inner",
) -> DataFrame:
    """Range join ``build.ts ∈ (probe.ts - lookback, probe.ts]`` per key,
    as an equi-join on a coarse time bucket.

    Both sides get ``bucket = floor(epoch / lookback)``; a build row can
    only match probe rows in its own or the next bucket, so the probe side
    fans out to its two covering buckets (2× row inflation — bounded,
    unlike a nested-loop range join) and the exact range predicate runs as
    a residual filter on the equi-joined candidates. ``lookback`` is a
    Spark interval string like ``"10 minutes"``.

    Inner join only: the bucket fan-out + residual filter cannot express
    outer semantics (null-extended rows fail the residual predicate, and
    the 2× probe fan-out would duplicate unmatched rows). For
    left-join-style results, aggregate the inner result and join it back
    to the probe side — see catalog q_range_join_clicks.
    """
    if how != "inner":
        raise ValueError(
            "bucketed_range_join supports how='inner' only; for left "
            "semantics aggregate the inner result and join back to the "
            "probe side (see q_range_join_clicks)"
        )
    # Metric + bucket width come from the shared _time_metric_and_span
    # derivation (wall-clock field extraction for NTZ — DST-safe;
    # instant micros for LTZ; width = any-anchor upper bound). The
    # exact residual filter below compares the raw columns either way.
    ntz = _require_uniform_ntz(
        "bucketed_range_join", [(probe, probe_ts), (build, build_ts)]
    )
    metric, span_us = _time_metric_and_span(
        ntz, lookback, "bucketed_range_join"
    )
    p_bucket = F.floor(metric(F.col(probe_ts)) / span_us)
    b_bucket = F.floor(metric(F.col(build_ts)) / span_us)
    p = probe.withColumn(
        "__bucket", F.explode(F.array(p_bucket - 1, p_bucket))
    )
    b = build.withColumn("__bucket", b_bucket)
    cond = (
        (F.col(build_ts) > F.col(probe_ts) - F.expr(f"INTERVAL {lookback}"))
        & (F.col(build_ts) <= F.col(probe_ts))
    )
    return p.join(b, [*key_cols, "__bucket"], how).filter(cond).drop("__bucket")


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
    slide: str | None = None,
) -> DataFrame:
    """Fixed tumbling event-time windows + group keys → aggregates, with
    the window emitted as ``window_start``/``window_end`` timestamps.
    ``slide`` < ``duration`` makes the windows sliding/overlapping (each
    row lands in duration/slide windows — Spark expands rows BEFORE the
    aggregate, so partial aggregation still applies per window).
    Works on batch frames as-is; on streams add ``withWatermark`` first.
    """
    window = (
        F.window(ts_col, duration) if slide is None else F.window(ts_col, duration, slide)
    )
    return (
        df.groupBy(window.alias("__w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Session windows per key: rows closer than ``gap`` merge into one
    session; ``session_start`` = first event ts, ``session_end`` = last
    event ts + gap (Spark's session_window convention).
    """
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("__w"), *group_cols)
        .agg(*aggs)
        .withColumn("session_start", F.col("__w.start"))
        .withColumn("session_end", F.col("__w.end"))
        .drop("__w")
    )


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion: for each key, stage k counts only if an
    event of ``stages[k]`` happens STRICTLY AFTER the key's stage-k-1
    time (first-touch semantics: each stage anchors at its earliest
    qualifying event). Returns one row:
    ``(keys_total, reached_<stage>...)`` — the classic conversion funnel.

    Scale design: every stage is a conditional MIN window aggregate over
    the SAME ``partitionBy(key)`` window — Catalyst plans one Exchange on
    the key and chains the WindowExecs on the sorted partition, so a
    5-stage funnel over 100 TB of events still shuffles once. The final
    per-key collapse reuses that partitioning (groupBy on the same key)
    and the global count is a single-row reduce.
    """
    w = Window.partitionBy(key_col)
    df = events.select(key_col, type_col, ts_col)
    prev: Column | None = None
    stage_cols = []
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        col_name = f"t{i}"
        df = df.withColumn(col_name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(col_name)
        stage_cols.append(col_name)
    per_key = df.groupBy(key_col).agg(
        *[F.max(c).alias(c) for c in stage_cols]
    )
    return per_key.agg(
        F.count("*").alias("keys_total"),
        *[
            F.count(c).alias(f"reached_{stage}")
            for c, stage in zip(stage_cols, stages)
        ],
    )


def cohort_retention(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention matrix: cohort = ISO week (Monday-based,
    matching ``date_trunc('week')`` in both Spark and DuckDB) of the
    key's FIRST event; each (cohort_week, week_offset) cell counts the
    distinct keys from that cohort active in that week. Output:
    ``(cohort_week date-string, week_offset int, users long)``.

    Scale design: first-seen is one MIN window over ``partitionBy(key)``
    (single shuffle on the key); the matrix is one hash aggregate with
    map-side combine on (cohort, offset) — a few thousand cells no matter
    the corpus size, so the second shuffle is tiny. No self-join: the
    naive cohort formulation (events ⨝ first_seen per user) is the same
    shuffle anyway, but the window form keeps one scan of the fact table.
    """
    w = Window.partitionBy(key_col)
    cohort = F.date_trunc("week", F.min(ts_col).over(w))
    week = F.date_trunc("week", F.col(ts_col))
    enriched = events.select(
        F.col(key_col),
        F.date_format(cohort, "yyyy-MM-dd").alias("cohort_week"),
        (F.datediff(F.to_date(week), F.to_date(cohort)) / 7)
        .cast("int")
        .alias("week_offset"),
    )
    return enriched.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct(key_col).alias("users")
    )


def densify_daily(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key daily calendar densification + forward fill — the
    time-series gap-fill (``asfreq('D')`` + ``ffill`` in pandas,
    ``time_bucket_gapfill`` + ``locf`` in TimescaleDB). For every key,
    emits one row per calendar day between the key's first and last
    observation: ``(keys..., day, value_ffill, is_gap)`` where
    ``value_ffill`` carries the last observation at-or-before the day
    and ``is_gap=1`` marks synthesized days.

    The day's representative value is the LAST observation of the day
    by ``order_cols`` (default ``[ts_col]``; pass a tiebreaker column
    for total order — forward fill is only deterministic under one).

    Scale design:
    - daily last observation: one hash aggregate ``max_by(value,
      struct(order))`` on ``(key, day)`` — no per-row window sort over
      the raw facts;
    - the calendar is ``explode(sequence(d0, d1))`` over the per-key
      span rows, generated AFTER aggregation — the raw fact table is
      never inflated, and output size is bounded by span-days per key
      (a key with a 10-year span and one event is the pathological
      case: 3 653 rows from 1 — bound spans upstream if that matters);
    - the calendar←daily join is an equi-join on ``(key, day)``, the
      same keys the daily aggregate just shuffled on;
    - forward fill is ``last(ignorenulls)`` over ONE window on the key
      ordered by day (rows frame, running).
    """
    order_cols = order_cols or [ts_col]
    day = F.col(ts_col).cast("date")
    daily = df.groupBy(*key_cols, day.alias("day")).agg(
        F.expr(
            f"max_by({value_col}, struct({', '.join(order_cols)}))"
        ).alias("day_value")
    )
    spans = daily.groupBy(*key_cols).agg(
        F.min("day").alias("__d0"), F.max("day").alias("__d1")
    )
    cal = spans.select(
        *key_cols, F.explode(F.sequence("__d0", "__d1")).alias("day")
    )
    # is_gap marks SYNTHESIZED days only — detected by join-miss, not by
    # a NULL day_value (r13 review: a day with a real observation whose
    # value is NULL was mislabeled is_gap=1, indistinguishable from a
    # calendar hole; locf still fills over it, the standard contract)
    joined = cal.join(
        daily.withColumn("__observed", F.lit(1)), [*key_cols, "day"], "left"
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *key_cols,
        "day",
        F.last("day_value", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("__observed").isNull().cast("int").alias("is_gap"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    max_span: str,
    how: str = "inner",
) -> DataFrame:
    """Interval-overlap join per key: pairs whose ``[start, end]``
    intervals intersect (inclusive ends: ``l_start <= r_end AND
    r_start <= l_end``) — the genomics/temporal "range intersects
    range" operator ``bucketed_range_join`` (point-in-range) cannot
    express.

    Scale shape: both sides bucketize on ``floor(epoch / max_span)``.
    An interval no longer than ``max_span`` covers at most two buckets,
    and any overlapping pair shares at least one covered bucket (a
    common time point's bucket). Each side explodes to its ≤2 covered
    buckets and the join is a plain EQUI-join on ``(key, bucket)``; the
    duplicate hit when a pair shares two buckets is eliminated without
    a distinct: a pair is emitted only from the bucket containing
    ``greatest(l_start, r_start)`` — a bucket both sides demonstrably
    cover. No nested loop, no cartesian, 2× bounded fan-out.

    Intervals longer than ``max_span`` (or inverted, end < start) can
    cover buckets outside their explode set and would SILENTLY drop
    matches — they fail loudly per row instead (chunk long intervals
    upstream). Timestamps follow bucketed_range_join's NTZ/LTZ metric
    rules (wall-clock field extraction for NTZ — DST-safe; instant
    micros for LTZ; mixed NTZ-ness rejected).
    """
    if how != "inner":
        raise ValueError("interval_overlap_join supports how='inner' only")
    ntz = _require_uniform_ntz(
        "interval_overlap_join",
        [
            (left, left_start),
            (left, left_end),
            (right, right_start),
            (right, right_end),
        ],
    )
    metric, span_us = _time_metric_and_span(
        ntz, max_span, "interval_overlap_join"
    )

    def guarded(frame, start, end, tag):
        # NULL endpoints are whitelisted THROUGH the guard (assert_true
        # raises on a NULL condition, so one null-timestamped row —
        # routine in real event data — would otherwise abort the whole
        # job with a misleading max_span error); the row then drops
        # naturally in the bucket explode / overlap predicate, the
        # same no-match semantics the plain range predicate has
        ok = (
            F.col(start).isNull()
            | F.col(end).isNull()
            | (
                (F.col(end) >= F.col(start))
                & (metric(F.col(end)) - metric(F.col(start)) <= span_us)
            )
        )
        return frame.filter(
            F.assert_true(
                ok,
                f"interval_overlap_join: {tag} interval inverted or longer "
                f"than max_span={max_span!r} — chunk long intervals "
                "upstream, matches would silently drop otherwise",
            ).isNull()
        )

    l = guarded(left, left_start, left_end, "left").withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(metric(F.col(left_start)) / span_us),
                F.floor(metric(F.col(left_end)) / span_us),
            )
        ),
    )
    r = guarded(right, right_start, right_end, "right").withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(metric(F.col(right_start)) / span_us),
                F.floor(metric(F.col(right_end)) / span_us),
            )
        ),
    )
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    emit_here = F.col("__bucket") == F.floor(
        metric(F.greatest(F.col(left_start), F.col(right_start))) / span_us
    )
    return (
        l.join(r, [*key_cols, "__bucket"])
        .filter(overlap & emit_here)
        .drop("__bucket")
    )
