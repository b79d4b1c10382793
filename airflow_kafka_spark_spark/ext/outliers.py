"""Statistical outlier detection over event streams.

The training-data analogue of the reference's per-symbol indicator pass
(reference spark/stock_analysis.py:166-191 computes rolling deviations per
key): flag rows whose value deviates from their group's distribution —
the standard data-quality gate before a metric feeds a pipeline.

Scale design: group moments are ONE hash aggregate with map-side combine
(group count is small — event types, symbols, sources), broadcast back to
the fact table, and the z computation is a pure map. No window over the
full table, no second shuffle, no Python.

Cross-engine determinism: double SUM is association-order-dependent, so
the moments are accumulated as exact decimals (sum and sum-of-squares)
and cast back to double once — the same trick as
operators.relational.decimal_sum. The sum-of-squares decimal keeps the
unscaled value inside 2^53 up to |Σx²|≈9e9 (value≈5e2 ⇒ ~4e4 per row ⇒
~2e5 rows per group at fixture magnitudes; larger corpora stay
deterministic WITHIN Spark — the decimal sum is exact — but the final
cast may differ from another engine by 1 ULP past that bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_outliers(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    threshold: float = 3.0,
) -> DataFrame:
    """Rows whose |z| ≥ threshold within their group, z from population
    moments: z = (x − Σx/n) / sqrt(Σx²/n − (Σx/n)²).

    Returns ``(id_col, group_col, z)`` with z rounded to 6dp (the filter
    applies to the ROUNDED value so the kept set is identical across
    engines). Groups with fewer than 2 rows or zero variance emit
    nothing.
    """
    v = F.col(value_col)
    g = events.groupBy(group_col).agg(
        F.count(value_col).cast("long").alias("__n"),
        F.round(F.sum(v.cast("decimal(22,6)")), 6).cast("double").alias("__s"),
        F.round(F.sum((v * v).cast("decimal(38,12)")), 6)
        .cast("double")
        .alias("__q"),
    )
    j = events.join(F.broadcast(g), group_col)
    n_d = F.col("__n").cast("double")
    mean = F.col("__s") / n_d
    var = F.col("__q") / n_d - mean * mean
    zraw = (v - mean) / F.sqrt(var)
    z6 = F.round(zraw, 6)
    return (
        j.filter((F.col("__n") >= 2) & (F.col("__q") / n_d - mean * mean > 0))
        .filter(F.abs(z6) >= F.lit(threshold))
        .select(id_col, group_col, (z6 + F.lit(0.0)).alias("z"))
    )


def mad_outliers(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-group outliers via median/MAD — the quality gate to
    reach for when the metric itself is contaminated: one extreme row
    inflates a z-score's mean AND stddev (masking itself), while the
    median and the median absolute deviation have a 50% breakdown
    point. robust_z = (x − median) / (1.4826·MAD), |robust_z| ≥ 3.5 is
    the standard cut (1.4826 makes MAD estimate sigma under normality).

    Cross-engine determinism: both medians use ``percentile_disc`` —
    an ACTUAL data value, no interpolation (Spark percentile_disc ==
    DuckDB quantile_disc); the deviations |x − median| are single IEEE
    subtractions, identical everywhere, so the second percentile_disc
    picks the same value too. The final robust_z is two FP ops on
    exact operands, rounded to 6dp with the threshold applied to the
    ROUNDED value, so the kept set is engine-identical. Groups whose
    MAD is 0 (a majority-constant group — every row would divide by
    zero) emit nothing, same stance as zscore_outliers' zero-variance
    guard.

    Scale design: two hash aggregates over the facts (median, then MAD
    of deviations) with map-side combine, each broadcast back (group
    count is small); the flag pass is a pure map. No window over the
    full table, no Python. Note percentile_disc is a sort-based
    aggregate per group — at extreme skew prefer approx_percentile for
    the first pass and keep this as the certifier, the same
    exact-vs-sketch split as approx_aggs_bounded.
    """
    v = F.col(value_col)
    med = events.groupBy(group_col).agg(
        F.expr(f"percentile_disc(0.5) WITHIN GROUP (ORDER BY {value_col})")
        .alias("__med")
    )
    dev = events.join(F.broadcast(med), group_col).withColumn(
        "__dev", F.abs(v - F.col("__med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __dev)")
        .alias("__mad")
    )
    z6 = F.round(
        (v - F.col("__med")) / (F.lit(1.4826) * F.col("__mad")), 6
    )
    return (
        dev.join(F.broadcast(mad), group_col)
        .filter(F.col("__mad") > 0)
        .filter(F.abs(z6) >= F.lit(threshold))
        .select(id_col, group_col, (z6 + F.lit(0.0)).alias("robust_z"))
    )
