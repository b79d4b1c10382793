"""Temporal operator semantics: as-of join, bucketed range join,
session-window boundary rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_kafka_spark_spark.operators.temporal import (
    asof_join,
    bucketed_range_join,
    session_agg,
)


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for c in df.columns:
        if c.endswith("ts"):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def test_asof_backward_inclusive(spark):
    left = _ts(
        spark,
        [
            (1, "2024-01-01 10:00:00", "a"),
            (1, "2024-01-01 10:05:00", "b"),  # exact-ts match
            (1, "2024-01-01 09:00:00", "c"),  # before any right row
            (2, "2024-01-01 12:00:00", "d"),  # key with no right rows
        ],
        "k int, ts string, tag string",
    )
    right = _ts(
        spark,
        [(1, "2024-01-01 09:30:00", 1.0), (1, "2024-01-01 10:05:00", 2.0)],
        "k int, rts string, rv double",
    )
    out = asof_join(left, right, ["k"], "ts", "rts", ["rv"])
    got = {r["tag"]: r["rv"] for r in out.collect()}
    assert got == {"a": 1.0, "b": 2.0, "c": None, "d": None}


def test_asof_backward_exclusive(spark):
    left = _ts(
        spark,
        [(1, "2024-01-01 10:05:00", "b")],
        "k int, ts string, tag string",
    )
    right = _ts(
        spark,
        [(1, "2024-01-01 09:30:00", 1.0), (1, "2024-01-01 10:05:00", 2.0)],
        "k int, rts string, rv double",
    )
    out = asof_join(left, right, ["k"], "ts", "rts", ["rv"], inclusive=False)
    assert out.collect()[0]["rv"] == 1.0  # strictly-before row wins


def test_bucketed_range_join_boundaries(spark):
    probe = _ts(
        spark, [(1, "2024-01-01 10:00:00", "p")], "k int, pts string, tag string"
    )
    build = _ts(
        spark,
        [
            (1, "2024-01-01 10:00:00", "same-instant"),    # included (<=)
            (1, "2024-01-01 09:50:00", "exact-lookback"),  # excluded (strict >)
            (1, "2024-01-01 09:50:01", "inside"),          # included, previous bucket
            (1, "2024-01-01 10:00:01", "future"),          # excluded
        ],
        "k int, bts string, name string",
    )
    out = bucketed_range_join(probe, build, ["k"], "pts", "bts", "10 minutes")
    assert sorted(r["name"] for r in out.collect()) == ["inside", "same-instant"]


def test_bucketed_range_join_calendar_lookback_keeps_all_matches(spark):
    """r12 review class (repro-confirmed): the old epoch-anchored span
    measured '2 months' as Jan+Feb 1970 = 59 days, but an October probe
    reaches back 61 — the in-range build row sat TWO buckets before the
    probe and silently vanished from the two-bucket explode. The bucket
    width is now an anchor-independent upper bound (31-day months), so
    the result equals the plain range predicate."""
    probe = _ts(
        spark, [(1, "2024-10-05 01:00:00", "p")], "k int, pts string, tag string"
    )
    build = _ts(
        spark,
        [
            (1, "2024-08-06 00:00:00", "in-range-61d-back"),
            (1, "2024-08-05 00:59:00", "just-outside"),
            (1, "2024-10-05 00:00:00", "recent"),
        ],
        "k int, bts string, name string",
    )
    out = bucketed_range_join(probe, build, ["k"], "pts", "bts", "2 months")
    assert sorted(r["name"] for r in out.collect()) == [
        "in-range-61d-back",
        "recent",
    ]
    # '1 year' across the 2024 leap year: 366 days back is in range
    probe2 = _ts(
        spark, [(1, "2024-12-31 12:00:00", "p")], "k int, pts string, tag string"
    )
    build2 = _ts(
        spark,
        [(1, "2024-01-01 00:00:00", "leap-year-back")],
        "k int, bts string, name string",
    )
    out2 = bucketed_range_join(probe2, build2, ["k"], "pts", "bts", "1 year")
    assert [r["name"] for r in out2.collect()] == ["leap-year-back"]


def test_bucketed_range_join_rejects_unparseable_interval(spark):
    """An interval the upper-bound parser cannot measure must raise
    rather than risk a silent mis-bucketing."""
    import pytest as _pytest

    probe = _ts(spark, [(1, "2024-01-01 10:00:00", "p")], "k int, pts string, tag string")
    build = _ts(spark, [(1, "2024-01-01 09:55:00", "b")], "k int, bts string, name string")
    with _pytest.raises(ValueError, match="unsupported interval unit"):
        bucketed_range_join(probe, build, ["k"], "pts", "bts", "2 fortnights")


def test_session_exact_gap_merges(spark):
    """Spark merges sessions when the inter-event gap == the gap duration
    (oracle SQL_SESSION_WINDOWS uses <= to match)."""
    df = _ts(
        spark,
        [(1, "2024-01-01 00:00:00", 1.0), (1, "2024-01-01 00:30:00", 2.0)],
        "k int, ts string, v double",
    )
    out = session_agg(df, "ts", "30 minutes", ["k"], [F.count("*").alias("n")])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n"] == 2


def test_asof_null_right_fields_not_mixed(spark):
    """A right row with NULL fields must be carried as-is — per-column
    last(ignorenulls) would stitch fields from different right rows."""
    left = _ts(spark, [(1, "2024-01-01 10:00:00", "a")], "k int, ts string, tag string")
    right = _ts(
        spark,
        [(1, "2024-01-01 09:00:00", 5.0, 9.0),
         (1, "2024-01-01 09:30:00", None, 7.0)],
        "k int, rts string, x double, y double",
    )
    out = asof_join(left, right, ["k"], "ts", "rts", ["x", "y"]).collect()[0]
    assert out["x"] is None and out["y"] == 7.0  # the 09:30 row, verbatim


def test_range_join_timezone_independent(spark):
    """The lookback span must not depend on the session timezone."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        probe = _ts(spark, [(1, "2024-01-01 10:00:00", "p")], "k int, pts string, tag string")
        build = _ts(spark, [(1, "2024-01-01 09:55:00", "in")], "k int, bts string, name string")
        out = bucketed_range_join(probe, build, ["k"], "pts", "bts", "10 minutes")
        assert [r["name"] for r in out.collect()] == ["in"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)


def test_range_join_ntz_session_non_utc(spark):
    """The review-found hazard: an NTZ-preferring session with a non-UTC
    timezone must still compute a correct (positive) span — the span is
    a difference of two casts so the tz shift cancels."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    ts_type = spark.conf.get("spark.sql.timestampType")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Ho_Chi_Minh")
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    try:
        probe = _ts(
            spark, [(1, "2024-01-01 10:00:00", "p")], "k int, pts string, tag string"
        )
        build = _ts(
            spark,
            [(1, "2024-01-01 09:55:00", "in"), (1, "2024-01-01 09:40:00", "out")],
            "k int, bts string, name string",
        )
        out = bucketed_range_join(probe, build, ["k"], "pts", "bts", "10 minutes")
        assert [r["name"] for r in out.collect()] == ["in"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)
        spark.conf.set("spark.sql.timestampType", ts_type)


def test_range_join_ntz_dst_timezone(spark):
    """NTZ columns under a DST session timezone (the advisor-found
    hazard): NTZ comparisons are wall-clock, but the old bucket metric
    cast NTZ→LTZ, whose per-row UTC offset jumps 1h across a DST
    transition — a build row in the spring-forward gap (02:30 never
    exists on the America/New_York wall clock, but NTZ data recorded in
    another zone can contain it) got pushed a full bucket PAST its probe
    row and the true match was silently dropped. Buckets now come from
    pure wall-clock field extraction, so the match survives."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        probe = spark.createDataFrame(
            [(1, "2024-03-10 03:00:00", "p")], "k int, pts string, tag string"
        ).withColumn("pts", F.col("pts").cast("timestamp_ntz"))
        build = spark.createDataFrame(
            [
                (1, "2024-03-10 02:30:00", "gap-in"),     # within 45 min wall-clock
                (1, "2024-03-10 02:10:00", "gap-out"),    # outside lookback
                (1, "2024-03-10 01:50:00", "before-out"), # outside lookback
            ],
            "k int, bts string, name string",
        ).withColumn("bts", F.col("bts").cast("timestamp_ntz"))
        out = bucketed_range_join(probe, build, ["k"], "pts", "bts", "45 minutes")
        assert [r["name"] for r in out.collect()] == ["gap-in"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)


def test_range_join_rejects_mixed_ntz_ltz(spark):
    import pytest

    probe = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "p")], "k int, pts string, tag string"
    ).withColumn("pts", F.col("pts").cast("timestamp_ntz"))
    build = _ts(
        spark, [(1, "2024-01-01 09:55:00", "in")], "k int, bts string, name string"
    )
    with pytest.raises(ValueError, match="NTZ"):
        bucketed_range_join(probe, build, ["k"], "pts", "bts", "10 minutes")


def test_range_join_rejects_outer(spark):
    import pytest

    probe = _ts(spark, [(1, "2024-01-01 10:00:00", "p")], "k int, pts string, tag string")
    with pytest.raises(ValueError, match="inner"):
        bucketed_range_join(probe, probe, ["k"], "pts", "pts", "10 minutes", how="left")


def test_asof_forward_inclusive(spark):
    left = _ts(
        spark,
        [
            (1, "2024-01-01 10:00:00", "a"),  # next right at 10:05
            (1, "2024-01-01 10:05:00", "b"),  # exact-ts match visible
            (1, "2024-01-01 11:00:00", "c"),  # after every right row
            (2, "2024-01-01 12:00:00", "d"),  # key with no right rows
        ],
        "k int, ts string, tag string",
    )
    right = _ts(
        spark,
        [(1, "2024-01-01 09:30:00", 1.0), (1, "2024-01-01 10:05:00", 2.0)],
        "k int, rts string, rv double",
    )
    out = asof_join(left, right, ["k"], "ts", "rts", ["rv"], direction="forward")
    got = {r["tag"]: r["rv"] for r in out.collect()}
    assert got == {"a": 2.0, "b": 2.0, "c": None, "d": None}


def test_asof_forward_exclusive(spark):
    left = _ts(
        spark,
        [(1, "2024-01-01 09:30:00", "b")],
        "k int, ts string, tag string",
    )
    right = _ts(
        spark,
        [(1, "2024-01-01 09:30:00", 1.0), (1, "2024-01-01 10:05:00", 2.0)],
        "k int, rts string, rv double",
    )
    out = asof_join(
        left, right, ["k"], "ts", "rts", ["rv"], inclusive=False, direction="forward"
    )
    assert out.collect()[0]["rv"] == 2.0  # strictly-after row wins


def test_asof_bad_direction_rejected(spark):
    import pytest

    left = _ts(spark, [(1, "2024-01-01 09:30:00", "x")], "k int, ts string, tag string")
    with pytest.raises(ValueError):
        asof_join(left, left, ["k"], "ts", "ts", ["tag"], direction="sideways")


def test_densify_daily_forward_fill(spark):
    from airflow_kafka_spark_spark.operators.temporal import densify_daily

    ev = _ts(
        spark,
        [
            # key 1: two obs on day 1 (last-by-(ts,eid) wins), gap days
            # 2-3, obs on day 4
            (1, "2024-01-01 09:00:00", 10, 1.0),
            (1, "2024-01-01 18:00:00", 11, 2.0),
            (1, "2024-01-04 08:00:00", 12, 9.0),
            # key 2: single observation → single-day span, no gaps
            (2, "2024-01-02 12:00:00", 13, 5.0),
        ],
        "k int, ts string, eid int, v double",
    )
    out = densify_daily(ev, ["k"], "ts", "v", order_cols=["ts", "eid"])
    rows = {
        (r["k"], str(r["day"])): (r["value_ffill"], r["is_gap"])
        for r in out.collect()
    }
    assert rows == {
        (1, "2024-01-01"): (2.0, 0),  # day's LAST obs, not first
        (1, "2024-01-02"): (2.0, 1),  # gap, carried forward
        (1, "2024-01-03"): (2.0, 1),
        (1, "2024-01-04"): (9.0, 0),
        (2, "2024-01-02"): (5.0, 0),
    }


def test_densify_daily_same_ts_tiebreak(spark):
    """Two observations at the identical timestamp: the order_cols
    tiebreaker (eid) decides the day value deterministically."""
    from airflow_kafka_spark_spark.operators.temporal import densify_daily

    ev = _ts(
        spark,
        [(1, "2024-01-01 09:00:00", 2, 7.0), (1, "2024-01-01 09:00:00", 1, 3.0)],
        "k int, ts string, eid int, v double",
    )
    out = densify_daily(ev, ["k"], "ts", "v", order_cols=["ts", "eid"])
    assert out.collect()[0]["value_ffill"] == 7.0


def test_asof_nearest(spark):
    left = _ts(
        spark,
        [
            (1, "2024-01-01 10:00:00", "a"),   # back 09:58 (2m) vs fwd 10:03 (3m) → back
            (1, "2024-01-01 10:02:00", "b"),   # back 09:58 (4m) vs fwd 10:03 (1m) → fwd
            (1, "2024-01-01 09:58:00", "c"),   # exact match → distance 0, backward
            (1, "2024-01-01 09:00:00", "d"),   # only fwd exists
            (2, "2024-01-01 12:00:00", "e"),   # no right rows at all
        ],
        "k int, ts string, tag string",
    )
    right = _ts(
        spark,
        [(1, "2024-01-01 09:58:00", 1.0), (1, "2024-01-01 10:03:00", 2.0)],
        "k int, rts string, rv double",
    )
    out = asof_join(left, right, ["k"], "ts", "rts", ["rv"], direction="nearest")
    got = {r["tag"]: (r["rv"], r["asof_direction"]) for r in out.collect()}
    assert got == {
        "a": (1.0, "backward"),
        "b": (2.0, "forward"),
        "c": (1.0, "backward"),
        "d": (1.0, "forward"),
        "e": (None, None),
    }


def test_asof_nearest_tie_breaks_backward(spark):
    left = _ts(spark, [(1, "2024-01-01 10:00:00", "x")], "k int, ts string, tag string")
    right = _ts(
        spark,
        [(1, "2024-01-01 09:59:00", 1.0), (1, "2024-01-01 10:01:00", 2.0)],
        "k int, rts string, rv double",
    )
    row = asof_join(left, right, ["k"], "ts", "rts", ["rv"], direction="nearest").collect()[0]
    assert (row["rv"], row["asof_direction"]) == (1.0, "backward")


def test_asof_nearest_rejects_exclusive(spark):
    left = _ts(spark, [(1, "2024-01-01 10:00:00", "x")], "k int, ts string, tag string")
    right = _ts(spark, [(1, "2024-01-01 09:59:00", 1.0)], "k int, rts string, rv double")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="inclusive"):
        asof_join(left, right, ["k"], "ts", "rts", ["rv"], direction="nearest", inclusive=False)


def test_interval_overlap_join_null_endpoints_drop_not_crash(spark):
    """r12 review class (repro-confirmed): assert_true raises on a NULL
    condition, so ONE null-timestamped row aborted the whole join with
    a misleading max_span error. NULL endpoints are now whitelisted
    through the guard and drop naturally (no-match), like the plain
    range predicate would treat them."""
    from airflow_kafka_spark_spark.operators.temporal import interval_overlap_join

    left = _ts(
        spark,
        [
            (1, "2024-01-01 10:00:00", "2024-01-01 11:00:00", "good"),
            (1, None, "2024-01-01 11:00:00", "null-start"),
            (1, "2024-01-01 10:00:00", None, "null-end"),
        ],
        "k int, ls string, le string, tag string",
    )
    right = _ts(
        spark,
        [(1, "2024-01-01 10:30:00", "2024-01-01 10:45:00", "r")],
        "k int, rs string, re string, name string",
    )
    out = interval_overlap_join(
        left, right, ["k"], "ls", "le", "rs", "re", max_span="2 hours"
    )
    assert [r["tag"] for r in out.collect()] == ["good"]


def test_interval_overlap_join_boundaries(spark):
    from airflow_kafka_spark_spark.operators.temporal import interval_overlap_join

    left = _ts(
        spark,
        [
            (1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", "L1"),
            (1, "2024-01-01 12:00:00", "2024-01-01 12:05:00", "L2"),
        ],
        "k int, ls string, le string, ltag string",
    )
    right = _ts(
        spark,
        [
            (1, "2024-01-01 10:10:00", "2024-01-01 10:20:00", "R1"),  # touches L1 end (inclusive)
            (1, "2024-01-01 10:10:01", "2024-01-01 10:20:00", "R2"),  # 1s past L1 → no
            (1, "2024-01-01 09:55:00", "2024-01-01 10:01:00", "R3"),  # overlaps L1 start
            (1, "2024-01-01 11:59:00", "2024-01-01 12:06:00", "R4"),  # contains L2
            (2, "2024-01-01 10:05:00", "2024-01-01 10:06:00", "R5"),  # other key
        ],
        "k int, rs string, re string, rtag string",
    )
    out = interval_overlap_join(
        left, right, ["k"], "ls", "le", "rs", "re", max_span="15 minutes"
    )
    got = {(r["ltag"], r["rtag"]) for r in out.collect()}
    assert got == {("L1", "R1"), ("L1", "R3"), ("L2", "R4")}


def test_interval_overlap_no_duplicate_across_buckets(spark):
    """A pair whose shared region covers two buckets must emit exactly
    once (the emit-at-max-start bucket rule, not a distinct)."""
    from airflow_kafka_spark_spark.operators.temporal import interval_overlap_join

    left = _ts(
        spark,
        [(1, "2024-01-01 10:00:00", "2024-01-01 10:09:00", "L")],
        "k int, ls string, le string, ltag string",
    )
    right = _ts(
        spark,
        [(1, "2024-01-01 10:01:00", "2024-01-01 10:08:00", "R")],
        "k int, rs string, re string, rtag string",
    )
    out = interval_overlap_join(
        left, right, ["k"], "ls", "le", "rs", "re", max_span="10 minutes"
    )
    assert out.count() == 1


def test_interval_overlap_rejects_overlong_interval(spark):
    from airflow_kafka_spark_spark.operators.temporal import interval_overlap_join

    left = _ts(
        spark,
        [(1, "2024-01-01 10:00:00", "2024-01-01 11:00:00", "L")],
        "k int, ls string, le string, ltag string",
    )
    right = _ts(
        spark,
        [(1, "2024-01-01 10:00:00", "2024-01-01 10:01:00", "R")],
        "k int, rs string, re string, rtag string",
    )
    out = interval_overlap_join(
        left, right, ["k"], "ls", "le", "rs", "re", max_span="10 minutes"
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="longer"):
        out.collect()


def test_asof_tolerance_backward(spark):
    left = _ts(
        spark,
        [(1, "2024-01-01 10:00:00", "near"), (1, "2024-01-01 12:00:00", "far")],
        "k int, ts string, tag string",
    )
    right = _ts(
        spark, [(1, "2024-01-01 09:55:00", 1.0)], "k int, rts string, rv double"
    )
    out = asof_join(
        left, right, ["k"], "ts", "rts", ["rv"], tolerance="10 minutes"
    )
    got = {r["tag"]: r["rv"] for r in out.collect()}
    assert got == {"near": 1.0, "far": None}  # 2h05m > tolerance → nulled


def test_asof_tolerance_forward_and_nearest(spark):
    left = _ts(spark, [(1, "2024-01-01 10:00:00", "x")], "k int, ts string, tag string")
    right = _ts(
        spark,
        [(1, "2024-01-01 10:04:00", 1.0), (1, "2024-01-01 09:30:00", 2.0)],
        "k int, rts string, rv double",
    )
    fwd = asof_join(
        left, right, ["k"], "ts", "rts", ["rv"],
        direction="forward", tolerance="5 minutes",
    ).collect()[0]
    assert fwd["rv"] == 1.0
    tight = asof_join(
        left, right, ["k"], "ts", "rts", ["rv"],
        direction="forward", tolerance="3 minutes",
    ).collect()[0]
    assert tight["rv"] is None
    # nearest with tolerance: backward candidate (30m away) out of band,
    # forward (4m) in band → forward wins even though backward is... not
    # nearer here; use a case where the NEARER side is out of band:
    near = asof_join(
        left, right, ["k"], "ts", "rts", ["rv"],
        direction="nearest", tolerance="5 minutes",
    ).collect()[0]
    assert (near["rv"], near["asof_direction"]) == (1.0, "forward")


def test_asof_nearest_tolerance_excludes_nearer_side(spark):
    """When the nearer candidate is outside the tolerance band, the
    in-band farther-side candidate must win (not NULL, not the
    out-of-band one)."""
    left = _ts(spark, [(1, "2024-01-01 10:00:00", "x")], "k int, ts string, tag string")
    right = _ts(
        spark,
        [(1, "2024-01-01 09:58:00", 1.0), (1, "2024-01-01 10:30:00", 2.0)],
        "k int, rts string, rv double",
    )
    # nearest overall = backward (2m); tolerance 1 minute kills BOTH
    both_out = asof_join(
        left, right, ["k"], "ts", "rts", ["rv"],
        direction="nearest", tolerance="1 minute",
    ).collect()[0]
    assert both_out["rv"] is None and both_out["asof_direction"] is None
    # tolerance 45 minutes keeps both → backward (nearer) wins
    both_in = asof_join(
        left, right, ["k"], "ts", "rts", ["rv"],
        direction="nearest", tolerance="45 minutes",
    ).collect()[0]
    assert (both_in["rv"], both_in["asof_direction"]) == (1.0, "backward")


def test_fractional_interval_counts_accepted(spark):
    """Fractional counts ('1.5 hours') are legal Spark INTERVAL literals,
    so the bucket-width bound must accept them too (the r12 parser
    rejected them, breaking previously-working lookback arguments). The
    bound ceils EXACTLY via Fraction arithmetic — a float product can
    round down below the true width, which is the silent-drop direction."""
    from airflow_kafka_spark_spark.operators.temporal import (
        _interval_span_upper_bound_us,
    )

    us, cal = _interval_span_upper_bound_us("1.5 hours", "t")
    assert (us, cal) == (5_400_000_000, False)
    # non-representable-in-binary fraction still ceils exactly
    us2, _ = _interval_span_upper_bound_us("0.1 seconds", "t")
    assert us2 == 100_000
    # end-to-end with the fractional form Spark's own INTERVAL literal
    # accepts (fractional counts are legal on seconds only — '1.5
    # hours' passes OUR bound but Spark's parser rejects it at the
    # residual predicate with INVALID_FRACTION, which is the right
    # authority for unit rules)
    probe = _ts(
        spark, [(1, "2024-01-01 12:00:01.600", "p")], "k int, pts string, tag string"
    )
    build = _ts(
        spark,
        [
            (1, "2024-01-01 12:00:00.500", "in"),   # 1.1s back
            (1, "2024-01-01 11:59:59.900", "out"),  # 1.7s back
        ],
        "k int, bts string, name string",
    )
    out = bucketed_range_join(probe, build, ["k"], "pts", "bts", "1.5 seconds")
    assert [r["name"] for r in out.collect()] == ["in"]


def test_fractional_interval_bad_counts_still_raise(spark):
    import pytest

    from airflow_kafka_spark_spark.operators.temporal import (
        _interval_span_upper_bound_us,
    )

    with pytest.raises(ValueError, match="non-negative number"):
        _interval_span_upper_bound_us("-1.5 hours", "t")
    with pytest.raises(ValueError, match="non-negative number"):
        _interval_span_upper_bound_us("abc hours", "t")
    with pytest.raises(ValueError, match="zero width"):
        _interval_span_upper_bound_us("0.0 hours", "t")


def test_asof_directions_share_one_union_frame():
    """asof_join and _asof_nearest must build their tagged union-merge
    frame through the SAME helper — r12's calendar-interval bug class
    was a one-sided fix to duplicated frame-construction code, and the
    r12 verdict named this duplication as the standing hazard."""
    import inspect

    from airflow_kafka_spark_spark.operators import temporal

    assert "_asof_union_frame(" in inspect.getsource(temporal.asof_join)
    assert "_asof_union_frame(" in inspect.getsource(temporal._asof_nearest)
    for fn in (temporal.bucketed_range_join, temporal.interval_overlap_join):
        src = inspect.getsource(fn)
        assert "_time_metric_and_span(" in src
        assert "_require_uniform_ntz(" in src


def test_asof_null_timestamps_never_match(spark):
    """NULL satisfies no as-of predicate: a NULL-ts RIGHT row must never
    be carried as a match (r13 review: ascending window order put NULLs
    FIRST, so its payload became the 'most recent' match for every left
    row before the first real right row — diverging from any SQL ASOF
    formulation), and a NULL-ts LEFT row matches nothing in any
    direction (the forward frame used to hand it the earliest right
    row)."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", "early"), (1, None, "null-ts")],
        "k int, ts string, tag string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, "2024-01-01 10:00:00", 1.0)],
        "k int, rts string, rv double",
    ).withColumn("rts", F.col("rts").cast("timestamp"))

    for direction in ("backward", "forward", "nearest"):
        out = {
            r["tag"]: r["rv"]
            for r in asof_join(
                left, right, ["k"], "ts", "rts", ["rv"], direction=direction
            ).collect()
        }
        # the NULL-ts left row never matches
        assert out["null-ts"] is None, direction
        # the early left row: backward has nothing before it (the
        # NULL-ts right row must NOT stand in); forward/nearest see the
        # real 10:00 row
        if direction == "backward":
            assert out["early"] is None
        else:
            assert out["early"] == 1.0, direction


def test_densify_daily_observed_null_is_not_a_gap(spark):
    """is_gap marks SYNTHESIZED calendar days only: a day with a real
    observation whose value is NULL was mislabeled is_gap=1 (r13
    review) — indistinguishable from a calendar hole; locf still fills
    over the NULL observation (the standard gapfill contract)."""
    from airflow_kafka_spark_spark.operators.temporal import densify_daily

    ev = _ts(
        spark,
        [
            (1, "2024-01-01 10:00:00", 5.0),
            (1, "2024-01-02 10:00:00", None),  # observed, value NULL
            (1, "2024-01-04 10:00:00", 7.0),   # Jan 3 is a true gap
        ],
        "k int, ts string, v double",
    )
    out = {
        str(r["day"]): (r["value_ffill"], r["is_gap"])
        for r in densify_daily(ev, ["k"], "ts", "v").collect()
    }
    assert out["2024-01-01"] == (5.0, 0)
    assert out["2024-01-02"] == (5.0, 0)  # observed day, filled, NOT a gap
    assert out["2024-01-03"] == (5.0, 1)  # the real calendar hole
    assert out["2024-01-04"] == (7.0, 0)
