"""Print entry-hash churn vs MEASURED_HASHES.json and the resulting
measurement window, so catalog edits can be budgeted in entry-hash units
(CLAUDE.md steady-state rule: new + changed + debt <= 50).

Usage: python tools/churn_check.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    from airflow_kafka_spark_spark.plans.catalog import (
        CATALOG,
        _correctness_history,
        _ordered_names,
    )
    from airflow_kafka_spark_spark.plans.staleness import (
        entry_source_hash,
        measured_hashes,
    )

    measured = measured_hashes()
    hist = _correctness_history()
    changed = []
    never = []
    for name in CATALOG:
        rec = measured.get(name)
        if rec is None or name not in hist:
            never.append(name)
            continue
        if rec.get("hash") != entry_source_hash(name):
            changed.append(name)
    print(f"never-measured (new): {len(never)} {never}")
    print(f"changed-since-measured: {len(changed)} {changed}")
    win = _ordered_names()[:50]
    debt = [n for n in win if n in hist and hist[n][0] <= 9]
    print(f"window debt rows (latest<=r9) still inside: {len(debt)}")
    pushed = [
        n
        for n, (rnd, _s) in hist.items()
        if rnd <= 9 and n not in win
    ]
    if pushed:
        print(f"!! r9-era debt rows PUSHED OUT of window: {pushed}")
    else:
        print("all r9-era debt rows remain in window")


if __name__ == "__main__":
    main()
