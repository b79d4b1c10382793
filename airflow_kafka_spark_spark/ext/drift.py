"""Distribution-drift monitors for training-data pipelines.

A pretraining pipeline re-ingests sources across snapshots and needs a
cheap, exact answer to "did the categorical mix shift?" — per cohort,
between two windows. Total-variation distance (TVD) is the standard
metric without the cross-engine float hazards of KL/JS divergence
(no log anywhere — see the repo's determinism notes): for discrete
distributions p, q over the same support,

    TVD(p, q) = 0.5 * Σ_i |p_i - q_i|.

The implementation keeps the whole computation in BIGINT until one
final division: with window counts ``cnt_a[i]``, ``cnt_b[i]`` and
totals ``N_a``, ``N_b``,

    TVD = Σ_i |cnt_a[i]·N_b - cnt_b[i]·N_a| / (2·N_a·N_b)

whose numerator is an order-independent integer sum — exact in any
engine — and whose single IEEE double division is deterministic.
Overflow bound: the numerator is ≤ 2·N_a·N_b ≤ 2·(total rows)², fine
in BIGINT below ~2·10^9 rows per cohort-window; beyond that, cast the
products to DECIMAL(38,0).

Scale shape: ONE pass over the fact table — a partial-aggregated
groupBy over (cohort, category) with conditional counts, then the
cohort totals as window sums over the (tiny, cohort×category-sized)
count table and the final cohort aggregate on the partitioning the
window already established. A join-based formulation would reference
the count aggregate twice and compute it twice (verified in the
physical plan); the window form scans the facts once and shuffles the
count table once. No Python, no per-row UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tvd_drift(
    df: DataFrame,
    cohort: Column,
    split: Column,
    category: str,
) -> DataFrame:
    """Per-cohort total-variation distance between the ``category``
    distributions of the two windows selected by ``split``.

    ``split`` must evaluate to 0 (window A) or 1 (window B) per row;
    ``cohort`` is any grouping expression. Output per cohort:
    ``(cohort, n_a, n_b, tvd_num, tvd)`` where ``tvd_num`` is the
    exact BIGINT numerator ``Σ|cnt_a·N_b - cnt_b·N_a|`` (the
    cross-engine-comparable value) and ``tvd`` its double rendering
    ``tvd_num / (2·n_a·n_b)``. Cohorts with an empty window emit
    NULL tvd (0/0) rather than a fake 0.
    """
    counts = df.groupBy(cohort.alias("cohort"), F.col(category)).agg(
        F.sum(F.when(split == 0, 1).otherwise(0)).cast("bigint").alias("cnt_a"),
        F.sum(F.when(split == 1, 1).otherwise(0)).cast("bigint").alias("cnt_b"),
    )
    w = Window.partitionBy("cohort")
    with_tot = counts.select(
        "cohort",
        "cnt_a",
        "cnt_b",
        F.sum("cnt_a").over(w).alias("n_a"),
        F.sum("cnt_b").over(w).alias("n_b"),
    )
    num = with_tot.groupBy("cohort").agg(
        F.sum(
            F.abs(F.col("cnt_a") * F.col("n_b") - F.col("cnt_b") * F.col("n_a"))
        ).alias("tvd_num"),
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
    )
    return num.select(
        "cohort",
        "n_a",
        "n_b",
        "tvd_num",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.col("tvd_num").cast("double")
            / (F.lit(2.0) * F.col("n_a").cast("double") * F.col("n_b").cast("double")),
        ).alias("tvd"),
    )
