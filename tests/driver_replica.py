"""Replica of the DRIVER harness: vanilla SparkSession (no engine confs),
all catalog queries at sf0.01, DuckDB oracle compare. Run directly:

    python tests/driver_replica.py [sf_dir]

This is the pre-flight for CORRECTNESS_r{N}.json — it must be all-green
from a session the engine did NOT build (VERDICT r1 item 1/3).
"""

from __future__ import annotations

import json
import sys
import time
import traceback


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    # Deliberately vanilla except timestampType: the r02 range_join_clicks
    # failure proved the driver harness runs with
    # spark.sql.timestampType=TIMESTAMP_NTZ (timestamp_micros returned NTZ
    # there), so the replica mirrors it — every catalog entry must survive
    # an NTZ-preferring session the engine did not build.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-replica")
        .config("spark.sql.timestampType", "TIMESTAMP_NTZ")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from tests.oracle_utils import duck_connection, compare

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duck_connection(sf_dir)

    results: dict[str, dict] = {}
    t_all = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                oracle_pdf = con.execute(oracles[name]).df()
                problems = compare(df, oracle_pdf)
                ok = not problems
                results[name] = {
                    "ok": ok,
                    "sec": round(time.time() - t0, 2),
                    "problems": problems[:3],
                }
            else:
                n = df.count()
                results[name] = {"ok": n >= 0, "rows_only": n, "sec": round(time.time() - t0, 2)}
        except Exception:
            results[name] = {
                "ok": False,
                "sec": round(time.time() - t0, 2),
                "err": traceback.format_exc().splitlines()[-1],
            }
        status = "ok" if results[name]["ok"] else "FAIL"
        print(f"{status:4s} {results[name]['sec']:6.2f}s {name}", flush=True)

    bad = {k: v for k, v in results.items() if not v["ok"]}
    print(f"\n{len(results) - len(bad)}/{len(results)} green in {time.time() - t_all:.0f}s")
    if bad:
        print(json.dumps(bad, indent=2, default=str))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
