"""Pin the integer-exactness envelopes documented in COVERAGE.md's
"Integer-exactness envelopes" table (r7 verdict item 8).

These are pure-arithmetic boundary checks: each asserts that the
documented safe-N keeps the operator's governing product inside int64
(or 2^53 for double-exact integers) AND that a modestly larger N does
not — so a doc edit that inflates a bound without re-deriving it fails
here, the way chi2_drift's denominator claim (3e9 documented, 2.1e6
real) should have. Behavior AT the edge (silent wrap vs loud raise) is
covered by the operator tests the table references:
test_chi2_drift_overflow_scale crosses the old denominator bound for
real, and fixed_point_group_sum's guards have raise tests in
test_indicators.py.
"""

from __future__ import annotations

I64 = 2**63 - 1
D53 = 2**53  # last double-exact integer magnitude


def test_tvd_drift_envelope():
    """tvd_drift: numerator terms cnt·N ≤ N_a·N_b, full sum ≤ 2·N_a·N_b.
    Documented safe: ~2e9 rows per cohort-WINDOW (each window)."""
    na = nb = 2_000_000_000
    assert 2 * na * nb <= I64
    # 10% past the documented bound must overflow — the envelope is tight
    na_bad = nb_bad = 2_200_000_000
    assert 2 * na_bad * nb_bad > I64


def test_ks_drift_envelope():
    """ks_drift: every product is cum_w·N_w' ≤ N_a·N_b. Documented
    safe: ~3e9 rows per cohort-window (each window)."""
    na = nb = 3_000_000_000
    assert na * nb <= I64
    assert (na + 100_000_000) * (nb + 100_000_000) > I64


def test_mw_drift_envelope():
    """mw_drift: the doubled-U sum telescopes to ≤ 2·N_a·N_b (every
    term c_a·(2·cum_b − c_b) ≤ c_a·2·N_b). Documented safe: ~2e9 rows
    per cohort-window — the tvd_drift envelope class."""
    na = nb = 2_000_000_000
    assert 2 * na * nb <= I64
    na_bad = nb_bad = 2_200_000_000
    assert 2 * na_bad * nb_bad > I64


def test_chi2_drift_numerator_envelope():
    """chi2_drift numerator: N·O and n_w·c_i are < N². Documented safe:
    ~3e9 rows per cohort. The denominator has NO BIGINT product any
    more (per-factor double casts — the r7 fix); each factor is ≤ N,
    double-exact far beyond any real cohort (2^53 ≈ 9e15)."""
    n = 3_000_000_000
    assert n * n <= I64
    assert int(n * 1.1) * int(n * 1.1) > I64
    assert n < D53  # denominator factors cast exactly


def test_chi2_drift_old_denominator_was_unsafe():
    """Regression pin for the r7 finding: the pre-fix BIGINT triple
    product N·n_w·c_i wraps at ~2.1e6 rows/cohort — the scale
    test_chi2_drift_overflow_scale actually crosses (4.5M rows)."""
    # worst case: one dominant category in a lopsided window makes
    # n_w ~ c_i ~ N, so the wrap point is N^3 > 2^63 -> N ~ 2.1e6
    n = 2_100_000
    assert n * n * n > I64  # would have wrapped
    # and the overflow-scale test's actual fixture (balanced windows,
    # two categories: N=4.5e6, n_a=2.5e6, c_x=2.3e6) is beyond it too
    assert 4_500_000 * 2_500_000 * 2_300_000 > I64


def test_fixed_point_group_sum_envelope():
    """fixed_point_group_sum: per-row |v|·10^s < 2^63 (guard raises);
    partial-sum proof is count·max_abs < 2^63 checked in DECIMAL(38,0).
    Pin the documented per-row bound formula at scale 6."""
    scale = 6
    max_abs = I64 // 10**scale
    assert max_abs * 10**scale <= I64
    assert (max_abs + 1) * 10**scale > I64


def test_pagerank_fixed_point_envelope():
    """pagerank scale 12: total mass is 10^12 grid units, so rank sums
    and the dangling mass D are ≤ 10^12 + leak — far inside int64; the
    teleport term (100−d)·10^scale and N·(grid ops) stay exact while
    N·10^scale < 2^63, i.e. N ≲ 9.2e6 at scale 12 (drop scale to grow
    N; at scale 6 the same form reaches N ≈ 9.2e12)."""
    scale = 12
    assert 100 * 10**scale <= I64
    n_safe = 9_200_000
    assert n_safe * 10**scale <= I64
    assert (n_safe * 2) * 10**scale > I64
    # scale-6 escalation headroom
    assert 9_200_000_000_000 * 10**6 <= I64


def test_triangle_clustering_envelope():
    """triangle_stats clustering renders 3·triangles / Σ C(deg,2) in
    double: exact while the wedge total < 2^53."""
    wedges = D53 - 1
    assert float(wedges) == wedges
    assert float(D53 + 1) != D53 + 1  # past the edge doubles skip odd ints
