#!/usr/bin/env python
"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": <sf>}

Each query is timed end-to-end (plan + execute) with a ``noop`` sink so
results are computed on executors but never shipped to the driver —
measuring the engine, not the collect path.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from airflow_kafka_spark_spark.plans.catalog import headline_queries
    from airflow_kafka_spark_spark.session import build_session

    spark = build_session(app_name="aks-bench")
    # warm the JVM/codegen paths and the Python/Arrow worker pool outside
    # the timed region — bench measures steady-state engine throughput,
    # not one-time process spin-up
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1_000).selectExpr("id % 8 AS g", "id").groupBy("g").applyInArrow(
        lambda t: t, "g bigint, id bigint"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    for name, fn in headline_queries().items():
        # best-of-2: one timing per query is ±25% machine-load noise;
        # min of two runs reports the engine, not the neighbors. The raw
        # first-run timing is recorded too ("queries_single_run") so
        # round-over-round regressions aren't masked by min().
        # clearCache before EVERY run: queries that persist intermediates
        # (minhash_lsh) must not get a warm-cache second run, and cached
        # state must not occupy memory while later queries are timed.
        best = float("inf")
        for i in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            if i == 0:
                first_run[name] = round(elapsed, 3)
            best = min(best, elapsed)
        timings[name] = round(best, 3)
    spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_set_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_single_run": first_run,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
