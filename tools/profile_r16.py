#!/usr/bin/env python
"""Round-16 optimization profiler: per-query explain capture + solo timing.

Usage:
    python tools/profile_r16.py [--explain-dir plans/r16 --suffix before] \
        [--runs 3] [query ...]

For each named headline/catalog query: writes ``.explain("formatted")`` to
``<explain-dir>/<name>_<suffix>.txt`` (the judge-checkable plan artifact)
and times it solo with the noop sink (clearCache between runs, min/median
printed). No arguments = all headline queries.

This is a measurement tool (guide §1): the bench's cross-query
interleaving is the comparable artifact; this isolates one query so plan
work and stage structure can be attributed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = (
    _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--explain-dir", default=os.path.join(_ROOT, "plans", "r16"))
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-time", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from airflow_kafka_spark_spark.plans.catalog import CATALOG, headline_queries
    from airflow_kafka_spark_spark.session import build_session

    spark = build_session(app_name="aks-profile-r16")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1_000).selectExpr("id % 8 AS g", "id").groupBy("g").applyInArrow(
        lambda t: t, "g bigint, id bigint"
    ).write.format("noop").mode("overwrite").save()

    names = args.queries or list(headline_queries().keys())
    os.makedirs(args.explain_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        fn = CATALOG[name].fn
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # explain capture (plan only; cheap actions inside the query fn
        # itself — e.g. checkpoints — do run during construction)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        build_sec = time.perf_counter() - t0
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        n_reuse = plan.count("ReusedExchange")
        rec = {
            "build_sec": round(build_sec, 3),
            "exchanges": n_exch - n_reuse,
            "reused_exchanges": n_reuse,
            "joins": {
                j: plan.count(j)
                for j in (
                    "BroadcastHashJoin",
                    "ShuffledHashJoin",
                    "SortMergeJoin",
                    "BroadcastNestedLoopJoin",
                )
                if plan.count(j)
            },
            "python_nodes": {
                p: plan.count(p)
                for p in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInArrow", "MapInArrow")
                if plan.count(p)
            },
        }
        if not args.no_time:
            runs = []
            for _ in range(args.runs):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            rec["runs"] = runs
            rec["min"] = min(runs)
            rec["median"] = sorted(runs)[len(runs) // 2]
        out[name] = rec
        print(f"{name}: {json.dumps(rec)}", flush=True)
        spark.sparkContext.setJobDescription(None)

    print("TOTAL_MIN:", round(sum(r.get("min", 0) for r in out.values()), 2))
    spark.stop()


if __name__ == "__main__":
    main()
