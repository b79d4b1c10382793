"""Print entry-hash churn vs MEASURED_HASHES.json and the resulting
measurement window, so catalog edits can be budgeted in entry-hash units
(CLAUDE.md steady-state rule: new + changed + debt <= 50).

Classification comes straight from ``catalog._measure_priority`` — the
authority the driver window actually sorts by — instead of a local
re-implementation (r13 review: the first version missed ERR rows and
stale-snapshot/pre-hash rows, so the budget could read clean while over;
it also hardcoded the r9 debt threshold, going stale from r14 on).

Tiers: 0 = ERR rows, 1 = never-measured (new), 2 = changed-since-
measured, 3 = stale-snapshot / pre-hash-era, 4 = green + unchanged.
Window consumers ahead of the oldest-green tier are 0/1/2/3; "debt" is
the oldest slice of tier 4 (rows <= latest_round - lag, default lag 3 —
r13: latest r12, debt = r9-era; override with argv[1]).

Usage: python tools/churn_check.py [debt_round_cutoff]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    from airflow_kafka_spark_spark.plans.catalog import (
        CATALOG,
        _correctness_history,
        _measure_priority,
        _ordered_names,
    )

    hist = _correctness_history()
    latest = max((rnd for rnd, _s in hist.values()), default=0)
    cutoff = int(sys.argv[1]) if len(sys.argv) > 1 else latest - 3
    tiers: dict[int, list[str]] = {}
    for name in CATALOG:
        tiers.setdefault(_measure_priority(name)[0], []).append(name)
    err = tiers.get(0, [])
    never = tiers.get(1, [])
    changed = tiers.get(2, [])
    stale = tiers.get(3, [])
    if err:
        print(f"ERR rows (tier 0): {len(err)} {err}")
    print(f"never-measured (new): {len(never)} {never}")
    print(f"changed-since-measured: {len(changed)} {changed}")
    if stale:
        print(f"stale-snapshot/pre-hash (tier 3): {len(stale)} {stale}")
    ahead = len(err) + len(never) + len(changed) + len(stale)
    print(f"window consumers ahead of oldest-green: {ahead}")
    win = set(_ordered_names()[:50])
    debt_all = [
        n for n, (rnd, _s) in hist.items()
        if rnd <= cutoff and _measure_priority(n)[0] == 4
    ]
    inside = [n for n in debt_all if n in win]
    pushed = [n for n in debt_all if n not in win]
    print(
        f"oldest-green debt rows (<= r{cutoff}): {len(debt_all)}, "
        f"in window: {len(inside)}"
    )
    if pushed:
        print(f"!! debt rows PUSHED OUT of window: {pushed}")
    else:
        print("all debt rows remain in window")


if __name__ == "__main__":
    main()
