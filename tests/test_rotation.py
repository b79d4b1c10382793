"""Measurement-rotation derivation (plans.catalog._correctness_history):
the driver measures only the FIRST 50 queries() entries per round, so the
ordering logic IS part of correctness coverage — a priority bug silently
starves entries of driver rows (it cost array_hof/pivot_events two
rounds). These tests pin the tier semantics against the committed
CORRECTNESS_r*.json artifacts."""

from __future__ import annotations

from airflow_kafka_spark_spark.plans.catalog import (
    CATALOG,
    _correctness_history,
    _measure_priority,
    _ordered_names,
)


def test_history_covers_catalog():
    """Every catalog entry that existed in a past round has a parsed
    (round, status) row; brand-new entries are absent (tier 1)."""
    hist = _correctness_history()
    assert set(hist) <= set(CATALOG)
    # every parsed round number is a real round artifact
    assert all(rnd >= 1 for rnd, _ in hist.values())
    assert all(status in ("clean", "err") for _, status in hist.values())


def test_err_rows_outrank_everything():
    """approx_aggs crashed in r3 and array_hof/pivot_events ERRed in r1
    with no row since — their latest rows are ERRs, so they must occupy
    the head of the measurement window until a clean row lands."""
    names = _ordered_names()
    hist = _correctness_history()
    err_names = {n for n, (_, s) in hist.items() if s == "err"}
    if not err_names:  # all clean — nothing to pin
        return
    head = set(names[: len(err_names)])
    assert head == err_names, (head, err_names)


def test_never_measured_before_stale_greens():
    """Entries with no driver row in any round (new operators) come
    before every green entry, and greens order oldest-round-first."""
    names = _ordered_names()
    hist = _correctness_history()
    tiers = [_measure_priority(n) for n in names]
    assert tiers == sorted(tiers)  # ordering really is by (tier, round)
    new = [n for n in names if n not in hist]
    greens = [n for n in names if hist.get(n, (0, ""))[1] == "clean"]
    if new and greens:
        assert names.index(new[-1]) < names.index(greens[0])


def test_window_has_no_fresh_green_while_stale_exists():
    """The 50-slot window never spends a slot re-measuring the freshest
    round's green while an older green is left outside it."""
    names = _ordered_names()
    hist = _correctness_history()
    green_rounds = [
        hist[n][0] for n in names if n in hist and hist[n][1] == "clean"
    ]
    if not green_rounds:
        return
    newest = max(green_rounds)
    inside = set(names[:50])
    stale_outside = [
        n
        for n in names[50:]
        if n in hist and hist[n][1] == "clean" and hist[n][0] < newest
    ]
    fresh_inside = [
        n for n in inside if n in hist and hist[n][1] == "clean" and hist[n][0] == newest
    ]
    assert not (stale_outside and fresh_inside), (stale_outside, fresh_inside)


def test_queries_and_oracles_consistent():
    """queries()/oracle_sql() agree with CATALOG: same ordering source,
    oracles exactly for entries that declare one."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert list(qs) == _ordered_names()
    assert set(oracles) == {n for n in CATALOG if CATALOG[n].oracle is not None}
