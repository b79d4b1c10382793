"""Golden tests (SURVEY.md §5.2.2-5.2.3): the engine's native indicator
stack must reproduce the reference's exact pandas formulae
(reference spark/stock_analysis.py:166-224) — rolling min_periods NULLs,
the RSI loss==0→0 quirk, ewm(adjust=False) MACD, first-match-wins
np.select cascade — on per-symbol series covering every warm-up edge."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from airflow_kafka_spark_spark.operators.indicators import with_indicators
from airflow_kafka_spark_spark.operators.signals import (
    DEFAULT_REASON,
    DEFAULT_SUGGESTION,
    REASONS,
    SUGGESTIONS,
    with_suggestion,
)
from airflow_kafka_spark_spark.sources.fixtures import synthetic_quotes_pdf


def reference_indicators(symbol_df: pd.DataFrame) -> pd.DataFrame:
    """The reference's exact per-symbol math (spark/stock_analysis.py
    :173-224), re-stated from SURVEY.md §2.6/§2.7 semantics."""
    df = symbol_df.sort_values("date").copy()
    df["ma5"] = df["close"].rolling(window=5).mean()
    df["ma20"] = df["close"].rolling(window=20).mean()
    delta = df["close"].diff()
    gain = delta.where(delta > 0, 0).rolling(window=14).mean()
    loss = -delta.where(delta < 0, 0).rolling(window=14).mean()
    rs = pd.Series(np.where(loss == 0, 0, gain / loss), index=loss.index)
    df["rsi"] = 100 - (100 / (1 + rs))
    ema12 = df["close"].ewm(span=12, adjust=False).mean()
    ema26 = df["close"].ewm(span=26, adjust=False).mean()
    df["macd_line"] = ema12 - ema26
    df["macd_signal"] = df["macd_line"].ewm(span=9, adjust=False).mean()
    df["macd_histogram"] = df["macd_line"] - df["macd_signal"]
    conditions = [
        (df["ma5"] > df["ma20"]) & (df["rsi"] < 70)
        & (df["macd_line"] > df["macd_signal"]),
        (df["ma5"] > df["ma20"]) & (df["rsi"] >= 70),
        (df["ma5"] < df["ma20"]) & (df["rsi"] <= 30)
        & (df["macd_line"] > df["macd_signal"]),
        (df["ma5"] < df["ma20"]) & (df["macd_line"] <= df["macd_signal"]),
    ]
    df["suggestion"] = np.select(conditions, SUGGESTIONS, default=DEFAULT_SUGGESTION)
    df["reason"] = np.select(conditions, REASONS, default=DEFAULT_REASON)
    return df


@pytest.fixture(scope="module")
def engine_vs_reference(spark):
    pdf = synthetic_quotes_pdf()
    sdf = spark.createDataFrame(pdf)
    out = with_suggestion(with_indicators(sdf)).toPandas()
    expected = pd.concat(
        [reference_indicators(g) for _, g in pdf.groupby("symbol")]
    )
    merged = out.merge(
        expected,
        on=["symbol", "time"],
        suffixes=("", "_ref"),
        validate="one_to_one",
    )
    assert len(merged) == len(pdf)
    return merged


NUMERIC = ["ma5", "ma20", "rsi", "macd_line", "macd_signal", "macd_histogram"]


@pytest.mark.parametrize("col", NUMERIC)
def test_indicator_values(engine_vs_reference, col):
    got = engine_vs_reference[col].to_numpy(dtype=float)
    want = engine_vs_reference[f"{col}_ref"].to_numpy(dtype=float)
    assert np.allclose(got, want, rtol=1e-9, atol=1e-12, equal_nan=True), col


def test_suggestion_and_reason_exact(engine_vs_reference):
    m = engine_vs_reference
    assert (m["suggestion"] == m["suggestion_ref"]).all()
    assert (m["reason"] == m["reason_ref"]).all()


def test_warmup_nulls(engine_vs_reference):
    """Symbols shorter than a window must be NULL for that indicator;
    rsi needs 14 rows, ma20 needs 20 (pandas min_periods=window)."""
    m = engine_vs_reference
    short = m[m["symbol"] == "SYM0"]  # 3 bars
    assert short["ma5"].isna().all()
    assert short["rsi"].isna().all()
    assert short["macd_line"].notna().all()  # EMA defined from row 1
    sym13 = m[m["symbol"] == "SYM2"]  # 13 bars: never reaches 14
    assert sym13["rsi"].isna().all()
    sym14 = m[m["symbol"] == "SYM3"].sort_values("time")  # exactly 14
    assert sym14["rsi"].isna().iloc[:-1].all()
    assert not np.isnan(sym14["rsi"].iloc[-1])


def test_rsi_range_property(engine_vs_reference):
    rsi = engine_vs_reference["rsi"].dropna()
    assert ((rsi >= 0) & (rsi <= 100)).all()


def test_suggestion_domain(engine_vs_reference):
    allowed = set(SUGGESTIONS) | {DEFAULT_SUGGESTION}
    assert set(engine_vs_reference["suggestion"].unique()) <= allowed


def test_approx_aggs_within_bounds(spark):
    """approx_count_distinct (HLL++, rsd 5% default) and percentile_approx
    must land near the exact values on the fixtures."""
    from airflow_kafka_spark_spark.plans.catalog import q_approx_aggs
    from airflow_kafka_spark_spark.sources.files import load_table
    from .conftest import SF_DIR

    approx = {r["event_type"]: r for r in q_approx_aggs(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events")
    from pyspark.sql import functions as F

    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, array(0.5, 0.95))").alias("pcts"),
        )
        .collect()
    }
    for et, a in approx.items():
        e = exact[et]
        assert abs(a["approx_users"] - e["users"]) <= max(2, 0.1 * e["users"])
        for got, want in zip((a["value_p50"], a["value_p95"]), e["pcts"]):
            assert abs(got - want) <= 0.1 * (abs(want) + 1)
        # scalar doubles, never arrays — the driver's rows-only
        # canonicalizer crashes on list dtype (CORRECTNESS_r03)
        assert isinstance(a["value_p50"], float)
        assert isinstance(a["value_p95"], float)


def test_fixed_point_sum_equals_decimal_sum(spark):
    """The scaled-BIGINT formulation must be bit-identical to decimal_sum
    on every group — including products of columns and null values."""
    from pyspark.sql import functions as F

    from airflow_kafka_spark_spark.operators.relational import (
        decimal_sum,
        fixed_point_group_sum,
    )
    from airflow_kafka_spark_spark.sources.files import load_table
    from .conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem")
    # inject nulls so the ignore-null behaviour is part of the check
    li = li.withColumn(
        "price_n",
        F.when(F.col("l_orderkey") % 7 == 0, None).otherwise(
            F.col("l_extendedprice")
        ),
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    keys = ["l_returnflag", "l_linestatus"]
    want = {
        tuple(r[k] for k in keys): r
        for r in li.groupBy(*keys)
        .agg(
            decimal_sum(F.col("price_n")).alias("s_null"),
            decimal_sum(disc).alias("s_disc"),
        )
        .collect()
    }
    got = {
        tuple(r[k] for k in keys): r
        for r in fixed_point_group_sum(
            li, keys, {"s_null": F.col("price_n"), "s_disc": disc}
        ).collect()
    }
    assert set(want) == set(got)
    for k in want:
        assert want[k]["s_null"] == got[k]["s_null"], k
        assert want[k]["s_disc"] == got[k]["s_disc"], k


def test_fixed_point_sum_rejects_out_of_envelope(spark):
    """Out-of-envelope values must FAIL, not wrap: the scaled-long cast
    silently corrupts above 2^63/10^scale in non-ANSI mode (1e14 at
    scale 6 measured as 7.7e18 garbage before the guard)."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.errors.exceptions.base import PySparkException

    from airflow_kafka_spark_spark.operators.relational import (
        fixed_point_group_sum,
    )

    df = spark.createDataFrame([(1, 1.0e14)], "k int, v double")
    with pytest.raises(PySparkException, match="exceeds"):
        fixed_point_group_sum(df, ["k"], {"s": F.col("v")}).collect()


def test_fixed_point_sum_rejects_partial_overflow(spark):
    """ADVICE r4 (medium): rows that individually pass the per-row bound
    can still wrap the per-(key, partition) int64 partial — e.g. two
    8e12 values at scale 6 are 8e18 scaled each, summing past 2^63. The
    count*max_abs partial guard must raise loudly, not return garbage."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.errors.exceptions.base import PySparkException

    from airflow_kafka_spark_spark.operators.relational import (
        fixed_point_group_sum,
    )

    # single partition → both rows land in the same long partial
    df = spark.createDataFrame(
        [(1, 8.0e12), (1, 8.0e12)], "k int, v double"
    ).coalesce(1)
    with pytest.raises(PySparkException, match="int64 range"):
        fixed_point_group_sum(df, ["k"], {"s": F.col("v")}).collect()
    # and the guard is not over-eager: same magnitude, one row per key,
    # still within every bound → exact answer
    ok = spark.createDataFrame([(1, 8.0e12), (2, 8.0e12)], "k int, v double")
    rows = {
        r["k"]: r["s"]
        for r in fixed_point_group_sum(ok, ["k"], {"s": F.col("v")}).collect()
    }
    assert rows == {1: 8.0e12, 2: 8.0e12}


def test_salted_sum_partitioning_invariant(spark):
    """salted_decimal_sum must equal the unsalted decimal sum under ANY
    partitioning — F.rand(seed) is partition-dependent, so only the
    exact-decimal partial/final algebra makes the result stable."""
    from pyspark.sql import functions as F

    from airflow_kafka_spark_spark.operators.relational import (
        decimal_sum,
        salted_decimal_sum,
    )
    from airflow_kafka_spark_spark.sources.files import load_table

    from .conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem").select("l_returnflag", "l_quantity")
    want = {
        r["l_returnflag"]: r["s"]
        for r in li.groupBy("l_returnflag")
        .agg((decimal_sum("l_quantity") + F.lit(0.0)).alias("s"))
        .collect()
    }
    for nparts in (3, 17):
        got = {
            r["l_returnflag"]: r["sum_value"]
            for r in salted_decimal_sum(
                li.repartition(nparts), ["l_returnflag"], "l_quantity"
            ).collect()
        }
        assert got == want, (nparts, got, want)


def test_rollup_merge_equals_direct(spark):
    """Three-way partial-rollup merge is exactly the direct aggregate —
    the monoid property incremental maintenance relies on (decimal
    partials make it exact, not approximately-true)."""
    from pyspark.sql import functions as F

    from airflow_kafka_spark_spark.operators.relational import (
        decimal_sum,
        finalize_rollup,
        merge_rollups,
        partial_rollup,
    )

    rows = [
        (i, f"2024-01-{1 + i % 3:02d} 0{i % 9}:00:00", "t" + str(i % 2), 0.1 + i * 1e-6)
        for i in range(300)
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts_s string, event_type string, value double")
    ev = ev.selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type", "value")
    parts = [
        partial_rollup(ev.filter(F.col("event_id") % 3 == k), "ts", "day", ["event_type"], "value")
        for k in range(3)
    ]
    merged = finalize_rollup(merge_rollups(*parts)).orderBy("window_start", "event_type")
    direct = (
        ev.groupBy(F.date_trunc("day", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n_events"), (decimal_sum("value") + F.lit(0.0)).alias("sum_value"))
        .orderBy("window_start", "event_type")
    )
    assert merged.select("window_start", "event_type", "n_events", "sum_value").collect() == direct.collect()


def test_salted_join_matches_plain_join(spark):
    """Salting must be a pure re-partitioning: inner and semi results
    row-identical to the unsalted join, including duplicate keys on
    both sides."""
    from airflow_kafka_spark_spark.operators.relational import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, lv string"
    )
    right = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (4, "w")], "k long, rv string"
    )
    got = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in salted_join(left, right, ["k"], n_salts=4).collect()
    )
    want = sorted(
        (r["k"], r["lv"], r["rv"]) for r in left.join(right, "k").collect()
    )
    assert got == want and len(got) == 5
    semi = sorted(
        (r["k"], r["lv"])
        for r in salted_join(left, right, ["k"], n_salts=4, how="left_semi").collect()
    )
    assert semi == sorted((r["k"], r["lv"]) for r in left.join(right, "k", "left_semi").collect())
    import pytest

    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="left_outer")


def test_with_macd_cross_batch_carry_exact(spark):
    """with_macd's mapInArrow kernel (r17) must be BIT-identical to a
    per-group one-shot macd_columns reference — with Arrow batches
    forced tiny (37 rows) so key groups span batch boundaries and the
    carried (value, have_state, pending_w) recurrence state is
    exercised, with NaN closes (including runs that straddle a batch
    boundary) and with a NULL key (one group, like groupBy)."""
    from airflow_kafka_spark_spark.functions.ema import macd_columns
    from airflow_kafka_spark_spark.operators.indicators import with_macd

    rows = []
    for uid in [None, 1, 2, 3]:
        for t in range(150):
            v = (
                None
                if (t % 7 == 3 or t % 23 == 11)
                else float((t * 13 % 97) + 0.01 * t)
            )
            rows.append((uid, t, v))
    sdf = spark.createDataFrame(rows, "user_id int, event_id int, close double")

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", 37)
    try:
        got = {
            (r["user_id"], r["event_id"]): (
                r["macd_line"], r["macd_signal"], r["macd_histogram"]
            )
            for r in with_macd(sdf, ["user_id"], ["event_id"]).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    assert len(got) == len(rows)
    by_key: dict = {}
    for uid, t, v in rows:
        by_key.setdefault(uid, []).append((t, v))
    for uid, series in by_key.items():
        series.sort()
        closes = np.array(
            [np.nan if v is None else v for _, v in series], dtype=np.float64
        )
        line, sig, hist = macd_columns(closes)
        for j, (t, _) in enumerate(series):
            want = tuple(None if np.isnan(x) else x for x in (line[j], sig[j], hist[j]))
            assert got[(uid, t)] == want, (uid, t, got[(uid, t)], want)
