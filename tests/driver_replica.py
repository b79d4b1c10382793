"""Replica of the DRIVER harness: vanilla SparkSession (no engine confs),
all catalog queries at sf0.01, DuckDB oracle compare. Run directly:

    python tests/driver_replica.py [sf_dir]

Every catalog entry runs under BOTH session shapes a harness might use:
the r02 range_join_clicks failure proved the real driver sets
spark.sql.timestampType=TIMESTAMP_NTZ (timestamp_micros returned NTZ
there), and the conf is runtime-settable — so each query is checked
under TIMESTAMP_NTZ and again under the default TIMESTAMP_LTZ, within
one session. This is the pre-flight for CORRECTNESS_r{N}.json — it must
be all-green from a session the engine did NOT build (VERDICT r1
item 1/3).
"""

from __future__ import annotations

import json
import sys
import time
import traceback

TS_TYPES = ("TIMESTAMP_NTZ", "TIMESTAMP_LTZ")


def err_tail(n: int = 3) -> str:
    """Last non-blank traceback lines. `splitlines()[-1]` alone recorded
    an EMPTY error for the one sf0.1 pagerank failure ever observed
    (py4j tracebacks can end with a blank line), leaving nothing to
    diagnose — keep the last few real lines instead."""
    lines = [l for l in traceback.format_exc().splitlines() if l.strip()]
    return " | ".join(lines[-n:])

# rows-only canonicalization cap: big enough to exercise every dtype the
# driver's pandas sort will see, small enough to bound driver transfer
# (rows-only entries currently emit 5-16 rows; this guards future ones)
CANON_CAP = 10_000


def engine_tree_stamp() -> str:
    """Git hash of the engine-source tree this replica runs against,
    '+dirty' when the working tree has uncommitted engine changes.
    PREFLIGHT_r{N}.txt embeds this so a preflight that predates later
    engine commits is *provably* stale (r5 shipped one 2 engine commits
    behind HEAD; tests/test_preflight_fresh.py closes that hole)."""
    import subprocess
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    try:
        tree = subprocess.run(
            ["git", "-C", str(repo), "rev-parse", "HEAD:airflow_kafka_spark_spark"],
            capture_output=True, text=True, check=True, timeout=30,
        ).stdout.strip()
        dirty = subprocess.run(
            ["git", "-C", str(repo), "status", "--porcelain",
             "airflow_kafka_spark_spark"],
            capture_output=True, text=True, check=True, timeout=30,
        ).stdout.strip()
        return tree + ("+dirty" if dirty else "")
    except Exception:
        return "unknown"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    print(f"engine-tree: {engine_tree_stamp()}", flush=True)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-replica")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from tests.oracle_utils import duck_connection, compare

    # the driver smoke-checks entry() on its own session too
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    n_entry = entrymod.entry(spark).count()
    print(f"entry() rows: {n_entry}", flush=True)
    assert n_entry > 0, "entry() returned no rows"

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duck_connection(sf_dir)

    # the driver measures exactly the FIRST 50 queries() entries — print
    # the window so each round's measurement slate is reviewable (and a
    # rotation-priority bug is visible BEFORE the round lands)
    window = list(qs)[:50]
    print("=== measurement window (first 50 queries() entries) ===")
    for i, name in enumerate(window, 1):
        print(f"{i:3d} {name}")
    print("=== end window ===", flush=True)

    results: dict[str, dict] = {}
    t_all = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        entry: dict = {"ok": True}
        for ts_type in TS_TYPES:
            spark.conf.set("spark.sql.timestampType", ts_type)
            tag = ts_type.rsplit("_", 1)[-1].lower()
            try:
                df = fn(spark, sf_dir)
                if name in oracles:
                    oracle_pdf = con.execute(oracles[name]).df()
                    problems = compare(df, oracle_pdf)
                    if problems:
                        entry["ok"] = False
                        entry[f"problems_{tag}"] = problems[:3]
                else:
                    # rows-only entries: ONE bounded execution per ts
                    # type — limit().toPandas() keeps the real Arrow
                    # dtype path (the driver canonicalizes via pandas;
                    # an array-typed column crashes its sort_values
                    # with "unhashable type: 'list'" — approx_aggs,
                    # CORRECTNESS_r03) while capping driver transfer
                    # for pair-generating outputs.
                    pdf = df.limit(CANON_CAP).toPandas()
                    entry["rows_only"] = len(pdf)
                    try:
                        pdf.sort_values(list(pdf.columns)).reset_index(
                            drop=True
                        )
                    except Exception:
                        entry["ok"] = False
                        entry["err_canon"] = err_tail()
            except Exception:
                entry["ok"] = False
                entry[f"err_{tag}"] = err_tail()
        entry["sec"] = round(time.time() - t0, 2)
        results[name] = entry
        status = "ok" if entry["ok"] else "FAIL"
        print(f"{status:4s} {entry['sec']:6.2f}s {name}", flush=True)

    bad = {k: v for k, v in results.items() if not v["ok"]}
    print(
        f"\n{len(results) - len(bad)}/{len(results)} green "
        f"(each under {' + '.join(TS_TYPES)}) in {time.time() - t_all:.0f}s"
    )
    if bad:
        print(json.dumps(bad, indent=2, default=str))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
