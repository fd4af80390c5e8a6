"""Hypothesis property pins for the round-10 algorithmic claims.

These test the THEOREMS the Spark plans rely on (lossless prefix
filtering, flow-accounting identities, formulation equivalences) on
randomized inputs — pure python, no Spark session per example, so
hypothesis can explore hundreds of cases. The engine-identity of the
concrete operators is pinned separately (oracles + the python
replays in test_round10_ops.py).
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------- #
# containment prefix filter: if |A∩B| / |A| >= t then A's
# (n_a - ceil(t*n_a) + 1) rarest shingles (any fixed global order)
# intersect B — the losslessness dedup_shingle_containment's
# candidate generation depends on.
# ---------------------------------------------------------------- #


@settings(max_examples=300, deadline=None)
@given(
    sets=st.lists(
        st.sets(st.integers(min_value=0, max_value=40), min_size=1),
        min_size=2,
        max_size=8,
    ),
    t_num=st.sampled_from([1, 2, 3, 4]),
)
def test_containment_prefix_filter_lossless_theorem(sets, t_num):
    t_den = 5
    # global rarity order: (document frequency, token)
    df = defaultdict(int)
    for s in sets:
        for tok in s:
            df[tok] += 1
    order = {tok: (df[tok], tok) for tok in df}
    for a in sets:
        n_a = len(a)
        pref_len = n_a - math.ceil(t_num * n_a / t_den) + 1
        prefix = set(sorted(a, key=lambda x: order[x])[:pref_len])
        for b in sets:
            if a is b:
                continue
            if t_den * len(a & b) >= t_num * n_a:
                assert prefix & b, (
                    "prefix filter dropped a qualifying pair"
                )


# ---------------------------------------------------------------- #
# growth accounting: actives(m) - actives(m-1) =
#   new(m) + resurrected(m) - churned(m) for any activity set
# ---------------------------------------------------------------- #


@settings(max_examples=200, deadline=None)
@given(
    activity=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # customer
            st.integers(min_value=0, max_value=10),  # month
        ),
        min_size=1,
        max_size=120,
    )
)
def test_growth_accounting_identity(activity):
    by_month = defaultdict(set)
    for c, m in activity:
        by_month[m].add(c)
    first = {}
    for m in sorted(by_month):
        for c in by_month[m]:
            first.setdefault(c, m)
    months = sorted(by_month)
    for prev_m, m in zip(months, months[1:]):
        act, prev = by_month[m], by_month[m - 1]
        n_new = sum(1 for c in act if first[c] == m)
        n_ret = len(act & prev)
        n_res = len(act) - n_new - n_ret
        n_churn = len(prev - act)
        assert len(act) - len(prev) == n_new + n_res - n_churn
        assert n_res >= 0


# ---------------------------------------------------------------- #
# relational division: count-distinct set cover == FOR ALL
# (double negation) on arbitrary pair sets
# ---------------------------------------------------------------- #


@settings(max_examples=200, deadline=None)
@given(
    pairs=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=15),  # part
            st.integers(min_value=0, max_value=4),  # priority
        ),
        min_size=1,
        max_size=60,
    )
)
def test_relational_division_formulations_agree(pairs):
    divisor = {p for _, p in pairs}
    cover = defaultdict(set)
    for k, p in pairs:
        cover[k].add(p)
    via_count = {k for k, ps in cover.items() if len(ps) == len(divisor)}
    via_forall = {
        k
        for k in cover
        if not any(p not in cover[k] for p in divisor)
    }
    assert via_count == via_forall


# ---------------------------------------------------------------- #
# hypothetical rank: count(<) + 1 equals the rank v would receive
# if inserted into the sorted multiset (bisect identity)
# ---------------------------------------------------------------- #


@settings(max_examples=300, deadline=None)
@given(
    xs=st.lists(st.integers(min_value=-100, max_value=100), min_size=1),
    v=st.integers(min_value=-120, max_value=120),
)
def test_hypothetical_rank_bisect_identity(xs, v):
    import bisect

    srt = sorted(xs)
    assert sum(1 for x in xs if x < v) + 1 == bisect.bisect_left(srt, v) + 1
    # cume_dist numerator: items <= v plus the hypothetical row itself
    assert sum(1 for x in xs if x <= v) + 1 == bisect.bisect_right(
        srt, v
    ) + 1


# ---------------------------------------------------------------- #
# BFS frontier relaxation yields true shortest hop counts (vs
# Floyd-Warshall) within the hop budget
# ---------------------------------------------------------------- #


@settings(max_examples=150, deadline=None)
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        max_size=30,
    )
)
def test_bfs_equals_floyd_within_budget(edges):
    edges = {(u, v) for u, v in edges if u != v}
    if not edges:
        return
    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    seed = verts[0]
    # frontier BFS, budget 4 (the operator's shape)
    dist = {seed: 0}
    frontier = [seed]
    for h in range(1, 5):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    # Floyd-Warshall ground truth
    inf = float("inf")
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    d = [[0 if i == j else inf for j in range(n)] for i in range(n)]
    for u, v in edges:
        d[idx[u]][idx[v]] = d[idx[v]][idx[u]] = 1
    for k in range(n):
        for i in range(n):
            for j in range(n):
                if d[i][k] + d[k][j] < d[i][j]:
                    d[i][j] = d[i][k] + d[k][j]
    for v in verts:
        true = d[idx[seed]][idx[v]]
        if true <= 4:
            assert dist.get(v) == true
        else:
            assert v not in dist


# ---------------------------------------------------------------- #
# weighted unit-race sampling: the ticket is the min over unit
# hashes, so it is non-increasing in the weight for every key
# ---------------------------------------------------------------- #


@settings(max_examples=200, deadline=None)
@given(key=st.integers(min_value=0, max_value=10**9))
def test_unit_race_ticket_monotone(key):
    best = None
    for u in range(1, 27):
        h = hashlib.md5(f"{key}:{u}".encode()).hexdigest()
        best = h if best is None else min(best, h)
        # ticket with weight u == running min over units 1..u
        assert best == min(
            hashlib.md5(f"{key}:{k}".encode()).hexdigest()
            for k in range(1, u + 1)
        )


# ---------------------------------------------------------------- #
# Newcombe interval: always contains the point estimate, and the
# significance flag is exactly "0 outside the interval"
# ---------------------------------------------------------------- #


@settings(max_examples=300, deadline=None)
@given(
    n1=st.integers(min_value=1, max_value=10**6),
    n2=st.integers(min_value=1, max_value=10**6),
    data=st.data(),
)
def test_newcombe_interval_properties(n1, n2, data):
    x1 = data.draw(st.integers(min_value=0, max_value=n1))
    x2 = data.draw(st.integers(min_value=0, max_value=n2))

    def wilson(x, n):
        p = x / n
        z2 = 1.96 * 1.96
        half = 1.96 * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        return (
            (p + z2 / (2 * n) - half) / (1 + z2 / n),
            (p + z2 / (2 * n) + half) / (1 + z2 / n),
        )

    l1, u1 = wilson(x1, n1)
    l2, u2 = wilson(x2, n2)
    p1, p2 = x1 / n1, x2 / n2
    assert l1 - 1e-12 <= p1 <= u1 + 1e-12
    assert 0 - 1e-12 <= l1 and u1 <= 1 + 1e-12
    delta = p2 - p1
    lo = delta - math.sqrt((p2 - l2) ** 2 + (u1 - p1) ** 2)
    hi = delta + math.sqrt((u2 - p2) ** 2 + (p1 - l1) ** 2)
    assert lo - 1e-12 <= delta <= hi + 1e-12
    assert (lo > 0 or hi < 0) == not_contains_zero(lo, hi)


def not_contains_zero(lo: float, hi: float) -> bool:
    return not (lo <= 0 <= hi)
