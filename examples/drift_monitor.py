#!/usr/bin/env python
"""Snapshot-to-snapshot drift monitoring over the events stream — the
checks a training pipeline runs BETWEEN ingests before it trusts a new
batch, all exact-or-certified (no uninterpretable fuzz):

    window split (old vs new)
      → per-cohort TVD          (ext.drift.tvd_drift — categorical mix
                                 shift, BIGINT-exact numerator)
      → per-cohort KS           (ext.drift.ks_drift — NUMERIC
                                 distribution shift, exact ECDF
                                 distance, no quantile interpolation)
      → per-cohort AUC          (ext.drift.mw_drift — Mann–Whitney
                                 stochastic dominance: WHICH WAY the
                                 numeric shift points, tie-correct
                                 integer midranks)
      → heavy-hitter census     (df.stat.freqItems sketch, checked
                                 against exact BIGINT heavy hitters —
                                 the freq_items_bounded contract)
      → robust outlier audit    (ext.outliers.mad_outliers on the new
                                 window — contamination-proof z)

Every stage is shuffle-on-key or broadcast: no collects of data-sized
frames, no cartesian products, no per-row Python. Run:
python examples/drift_monitor.py [sf_dir] (default /root/testdata/sf0.01).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from airflow_kafka_spark_spark.ext.drift import ks_drift, mw_drift, tvd_drift
    from airflow_kafka_spark_spark.ext.outliers import mad_outliers
    from airflow_kafka_spark_spark.session import build_session
    from airflow_kafka_spark_spark.sources.files import load_table

    spark = build_session(app_name="drift-monitor-example")
    ev = load_table(spark, sf_dir, "events")

    # 1. categorical mix drift per user cohort, old vs new window
    #    (event_id parity stands in for the snapshot boundary)
    drift = tvd_drift(
        ev,
        cohort=F.col("user_id") % 10,
        split=F.col("event_id") % 2,
        category="event_type",
    ).orderBy(F.col("tvd").desc_nulls_last())
    worst = drift.first()
    if worst is None or worst["tvd"] is None:
        print("categorical TVD: no cohort with both windows populated")
    else:
        print(
            f"worst cohort TVD: cohort={worst['cohort']} tvd={worst['tvd']:.4f} "
            f"(n_a={worst['n_a']}, n_b={worst['n_b']})"
        )

    # 2. numeric drift: did the value distribution shift between
    #    windows? Exact two-sample KS per cohort — the check TVD/χ²
    #    can't express (they see categories, not order)
    ks = ks_drift(
        ev,
        cohort=F.col("user_id") % 10,
        split=F.col("event_id") % 2,
        value=F.col("value"),
    ).orderBy(F.col("ks").desc_nulls_last())
    worst_ks = ks.first()
    if worst_ks is None or worst_ks["ks"] is None:
        print("numeric KS: no cohort with both windows populated")
    else:
        print(
            f"worst cohort KS(value): cohort={worst_ks['cohort']} "
            f"ks={worst_ks['ks']:.4f} (n_a={worst_ks['n_a']}, n_b={worst_ks['n_b']})"
        )

    # 2b. direction of the shift: KS says HOW FAR the distributions
    #     diverge, Mann–Whitney AUC says WHICH WAY (auc > 0.5: the old
    #     window stochastically dominates; 0.5 = no location shift)
    mw = mw_drift(
        ev,
        cohort=F.col("user_id") % 10,
        split=F.col("event_id") % 2,
        value=F.col("value"),
    ).withColumn("dev", F.abs(F.col("auc") - F.lit(0.5)))
    worst_mw = mw.orderBy(F.col("dev").desc_nulls_last()).first()
    if worst_mw is None or worst_mw["auc"] is None:
        print("numeric AUC: no cohort with both windows populated")
    else:
        if worst_mw["auc"] > 0.5:
            direction = "old>new"
        elif worst_mw["auc"] < 0.5:
            direction = "new>old"
        else:
            direction = "no shift"
        print(
            f"most-shifted cohort AUC(value): cohort={worst_mw['cohort']} "
            f"auc={worst_mw['auc']:.4f} ({direction}, "
            f"n_a={worst_mw['n_a']}, n_b={worst_mw['n_b']})"
        )

    # 3. heavy-hitter census: the single-pass sketch vs exact counts
    sketch = {
        r["event_type"]
        for r in ev.stat.freqItems(["event_type"], support=0.15)
        .select(F.explode("event_type_freqItems").alias("event_type"))
        .collect()
    }
    n = ev.count()
    heavy = {
        r["event_type"]
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * 100 > F.lit(n) * 15)
        .collect()
    }
    missing = heavy - sketch
    print(f"heavy hitters: exact={sorted(heavy)} sketch_extra={sorted(sketch - heavy)}")
    assert not missing, f"sketch guarantee violated: {missing}"

    # 4. robust outlier audit on the new window only
    new_win = ev.filter(F.col("event_id") % 2 == 1)
    n_out = mad_outliers(new_win, threshold=2.5).count()
    print(f"new-window robust outliers (|z*|>=2.5): {n_out} of {new_win.count()} rows")

    # 5. the STREAMING form — the shape a training-data pipeline
    #    actually runs: each arriving micro-batch is drift-checked
    #    against a stored reference window via foreachBatch BEFORE the
    #    batch is trusted. Reference = the old window (materialized
    #    once inside the monitor); stream = the new window arriving as
    #    files. Same exact statistics, zero new machinery per batch.
    import tempfile

    from airflow_kafka_spark_spark.streaming.drift_monitor import (
        make_drift_monitor,
    )

    workdir = tempfile.mkdtemp()
    src = os.path.join(workdir, "incoming")
    os.makedirs(src)
    monitored = ["user_id", "event_type", "value", "event_id"]
    reference = ev.filter(F.col("event_id") % 2 == 0).select(*monitored)
    monitor = make_drift_monitor(
        reference.withColumn("cohort10", F.col("user_id") % 10),
        cohort="cohort10",
        category="event_type",
        value="value",
    )
    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, value double, event_id long"
        )
        .parquet(src)
        .withColumn("cohort10", F.col("user_id") % 10)
    )
    q = (
        stream.writeStream.foreachBatch(monitor)
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        ev.filter(F.col("event_id") % 2 == 1).select(*monitored).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    spark.stop()


if __name__ == "__main__":
    main()
