"""Preflight freshness gate (VERDICT r5 item 6).

PREFLIGHT_r{N}.txt claims "every catalog entry ran green at HEAD under
both timestamp types" — round 5 shipped one refreshed at `da71103` with
two engine-source commits landing after it, so the committed artifact no
longer proved what it claimed. The replica now stamps the engine-tree
git hash (`engine-tree: <hash>`) into its output; this test makes the
claim checkable:

- always: the NEWEST preflight artifact must carry the stamp, be
  all-green, and the stamp must not be `+dirty` or `unknown` (a
  preflight from an uncommitted tree proves nothing about any commit);
- with ``AKS_ROUND_FINAL=1`` (the round-closing ritual, see the verify
  skill): the stamp must equal the CURRENT committed engine tree —
  i.e. no engine-source commit postdates the preflight. This strict leg
  is env-gated because mid-round the tree is legitimately ahead of the
  last preflight; at round close it must not be.

Preflights r5 and earlier predate the stamp and are grandfathered (the
newest-file rule means they stop being checked the moment a stamped one
lands).
"""

from __future__ import annotations

import os
import re
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
FIRST_STAMPED_ROUND = 6


def _newest_preflight() -> tuple[int, Path] | None:
    best: tuple[int, Path] | None = None
    for p in REPO.glob("PREFLIGHT_r*.txt"):
        m = re.fullmatch(r"PREFLIGHT_r(\d+)\.txt", p.name)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), p)
    return best


def _current_engine_tree() -> str:
    return subprocess.run(
        ["git", "-C", str(REPO), "rev-parse", "HEAD:airflow_kafka_spark_spark"],
        capture_output=True, text=True, check=True, timeout=30,
    ).stdout.strip()


def test_newest_preflight_stamped_and_green():
    found = _newest_preflight()
    assert found, "no PREFLIGHT_r*.txt artifact at the repo root"
    rnd, path = found
    if rnd < FIRST_STAMPED_ROUND:
        pytest.skip(f"PREFLIGHT_r{rnd:02d} predates the engine-tree stamp")
    text = path.read_text()
    m = re.search(r"^engine-tree: (\S+)$", text, re.MULTILINE)
    assert m, f"{path.name} lost its engine-tree stamp"
    stamp = m.group(1)
    assert stamp != "unknown", f"{path.name} ran where git was unavailable"
    assert not stamp.endswith("+dirty"), (
        f"{path.name} was produced from a dirty engine tree — it proves "
        "nothing about any commit; re-run tests/driver_replica.py from a "
        "clean tree"
    )
    m_green = re.search(r"(\d+)/(\d+) green", text)
    assert m_green and m_green.group(1) == m_green.group(2), (
        f"{path.name} is not all-green"
    )


@pytest.mark.skipif(
    os.environ.get("AKS_ROUND_FINAL") != "1",
    reason="strict staleness leg runs at round close (AKS_ROUND_FINAL=1)",
)
def test_preflight_matches_current_engine_tree():
    found = _newest_preflight()
    assert found, "no PREFLIGHT_r*.txt artifact at the repo root"
    rnd, path = found
    assert rnd >= FIRST_STAMPED_ROUND, (
        f"newest preflight is unstamped r{rnd} — produce a stamped one "
        "before closing the round"
    )
    m = re.search(r"^engine-tree: (\S+)$", path.read_text(), re.MULTILINE)
    assert m, f"{path.name} lost its engine-tree stamp"
    current = _current_engine_tree()
    assert m.group(1) == current, (
        f"{path.name} was produced at engine tree {m.group(1)}, but HEAD's "
        f"engine tree is {current} — engine commits postdate the preflight; "
        "re-run tests/driver_replica.py and refresh the artifact"
    )
