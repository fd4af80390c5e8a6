"""Hypothesis property pins for the round-16 algorithmic claims —
the THEOREMS the Spark plans rely on, on randomized inputs (pure
python, no Spark session per example). Engine identity of the concrete
operators is pinned separately (oracles + test_round16_ops.py replays).
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------- #
# greedy set cover: the running sum of marginal gains equals the
# cardinality of the union of selected sets (the identity that lets
# greedy_coverage_doc_selection skip a per-round distinct-count
# action), and greedy marginal gains never increase (submodularity
# under the greedy order).
# ---------------------------------------------------------------- #


@settings(max_examples=300, deadline=None)
@given(
    sets=st.dictionaries(
        st.integers(min_value=0, max_value=50),
        st.sets(st.integers(min_value=0, max_value=30), min_size=1),
        min_size=1,
        max_size=12,
    ),
    k=st.integers(min_value=1, max_value=6),
)
def test_greedy_cover_gain_sum_equals_union(sets, k):
    covered: set[int] = set()
    selected: list[int] = []
    cum = 0
    gains = []
    for _ in range(min(k, len(sets))):
        best = None
        for did in sorted(sets):
            if did in selected:
                continue
            gain = len(sets[did] - covered)
            if best is None or gain > best[1]:
                best = (did, gain)
        selected.append(best[0])
        covered |= sets[best[0]]
        cum += best[1]
        gains.append(best[1])
        assert cum == len(covered), "running gain sum != union size"
    assert gains == sorted(gains, reverse=True), (
        "greedy marginal gains increased"
    )


# ---------------------------------------------------------------- #
# Kendall trichotomy: every day pair is exactly one of concordant
# (product > 0), discordant (product < 0), or product-zero — and the
# product-zero set is exactly {xa = xb or ya = yb}, the OR-form the
# query counts. So conc + disc + tied == npairs.
# ---------------------------------------------------------------- #


@settings(max_examples=300, deadline=None)
@given(
    series=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=2,
        max_size=25,
    )
)
def test_kendall_trichotomy_identity(series):
    n = len(series)
    conc = disc = tied = 0
    for i in range(n):
        for j in range(i + 1, n):
            xa, ya = series[i]
            xb, yb = series[j]
            p = (xa - xb) * (ya - yb)
            if p > 0:
                conc += 1
            elif p < 0:
                disc += 1
            if xa == xb or ya == yb:
                tied += 1
            assert (p == 0) == (xa == xb or ya == yb)
    assert conc + disc + tied == n * (n - 1) // 2


# ---------------------------------------------------------------- #
# stratification == cell-propensity IPW: with p_c = n1c/nc, the
# Horvitz-Thompson IPW difference restricted to common-support cells
# equals the cell-size-weighted difference of cell means — the
# identity stratified_ate_priority_returns' docstring claims. Exact
# rational arithmetic (pre-ppm-flooring form).
# ---------------------------------------------------------------- #


@settings(max_examples=200, deadline=None)
@given(
    cells=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=9),  # n1
            st.integers(min_value=0, max_value=9),  # x1 <= n1 clamped
            st.integers(min_value=1, max_value=9),  # n0
            st.integers(min_value=0, max_value=9),  # x0 <= n0 clamped
        ),
        min_size=1,
        max_size=8,
    )
)
def test_stratified_equals_cell_ipw(cells):
    cells = [
        (n1, min(x1, n1), n0, min(x0, n0)) for n1, x1, n0, x0 in cells
    ]
    big_n = sum(n1 + n0 for n1, _, n0, _ in cells)
    # stratified: sum nc/N * (mean1c - mean0c)
    strat = sum(
        Fraction(n1 + n0, big_n)
        * (Fraction(x1, n1) - Fraction(x0, n0))
        for n1, x1, n0, x0 in cells
    )
    # IPW with cell propensity p_c = n1c/nc: E[TY/p] - E[(1-T)Y/(1-p)]
    # over all units, denominators N
    ipw = Fraction(0)
    for n1, x1, n0, x0 in cells:
        nc = n1 + n0
        p = Fraction(n1, nc)
        ipw += Fraction(x1, 1) / p / big_n - Fraction(x0, 1) / (1 - p) / big_n
    assert strat == ipw


# ---------------------------------------------------------------- #
# Gries' DP bounds: 0 <= DP <= 1 for any non-degenerate count grid
# (triangle inequality over the proportion differences), and a term
# confined to one source s* has DP = 1 - T_s*/T exactly.
# ---------------------------------------------------------------- #


@settings(max_examples=300, deadline=None)
@given(
    t_s=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=8),
    data=st.data(),
)
def test_gries_dp_bounds_and_confinement(t_s, data):
    n_sources = len(t_s)
    c_ts = [
        data.draw(st.integers(min_value=0, max_value=t_s[i]))
        for i in range(n_sources)
    ]
    c_t = sum(c_ts)
    t_all = sum(t_s)
    if c_t == 0:
        return
    dp = (
        sum(abs(Fraction(c, c_t) - Fraction(t, t_all))
            for c, t in zip(c_ts, t_s))
        / 2
    )
    assert 0 <= dp <= 1
    # confinement: all mass in source 0
    dp_conf = (
        sum(
            abs(
                (Fraction(1) if i == 0 else Fraction(0))
                - Fraction(t_s[i], t_all)
            )
            for i in range(n_sources)
        )
        / 2
    )
    assert dp_conf == 1 - Fraction(t_s[0], t_all)


# ---------------------------------------------------------------- #
# EB shrinkage is a convex combination: (x*N + m*X) / (N*(n+m)) lies
# between x/n and X/N exactly (rational form, before ppm flooring).
# ---------------------------------------------------------------- #


@settings(max_examples=300, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=1000),
    x_frac=st.integers(min_value=0, max_value=1000),
    big_n=st.integers(min_value=1, max_value=100000),
    big_x_frac=st.integers(min_value=0, max_value=100000),
    m=st.integers(min_value=1, max_value=500),
)
def test_eb_shrinkage_is_convex_combination(n, x_frac, big_n, big_x_frac, m):
    x = min(x_frac, n)
    big_x = min(big_x_frac, big_n)
    raw = Fraction(x, n)
    grand = Fraction(big_x, big_n)
    shrunk = Fraction(x * big_n + m * big_x, big_n * (n + m))
    lo, hi = min(raw, grand), max(raw, grand)
    assert lo <= shrunk <= hi
    # exact convex-combination weight: n/(n+m) on raw
    assert shrunk == raw * Fraction(n, n + m) + grand * Fraction(m, n + m)
