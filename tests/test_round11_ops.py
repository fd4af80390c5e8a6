"""Independent-reference checks for the round-11 operator batch —
the house "simulator equality" pattern: the DuckDB oracle is the
driver's gate; these tests re-derive the same answers from plain
Python (hashlib, brute-force pair scans, dict-BFS), so a shared
SQL-side misconception cannot hide in both engines.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb
import numpy as np

from spark_lever_spark import registry

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return registry.all_queries()[name].fn(spark, SF).toPandas()


def _cents(x: float) -> int:
    # SQL round() is half-away-from-zero; Python round() is banker's.
    return int(x * 100 + (0.5 if x >= 0 else -0.5))


def _daily_cents(table: str, date_col: str, val_col: str, where=""):
    rows = duckdb.sql(
        f"SELECT CAST({date_col} AS DATE) AS d, {val_col} FROM "
        f"read_parquet('{SF}/{table}.parquet') {where}"
    ).fetchall()
    agg: dict = defaultdict(int)
    for d, v in rows:
        agg[d] += _cents(v)
    return dict(agg)


# ---------------------------------------------------------------------------
# Pettitt changepoint: rank-cumsum form == O(n^2) sign-comparison form
# ---------------------------------------------------------------------------


def test_pettitt_rank_identity_vs_brute_signs(spark):
    """The operator computes U_t via the rank-cumsum identity; the
    textbook definition is U_t = sum_{i<=t, j>t} sgn(x_j - x_i).
    Both must agree on |U| (the identity flips the sign only) for
    EVERY event type, including the argmax day."""
    got = {
        r.event_type: (r.change_day, r.k_stat)
        for r in _run(spark, "pettitt_changepoint_daily").itertuples()
    }
    types = [t for (t,) in duckdb.sql(
        f"SELECT DISTINCT event_type FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()]
    assert set(got) == set(types)
    for et in types:
        daily = _daily_cents(
            "events", "ts", "value", f"WHERE event_type = '{et}'"
        )
        days = sorted(daily)
        xs = [daily[d] for d in days]
        n = len(xs)
        best = None
        for t in range(1, n):  # t < n split points
            u = sum(
                (xs[j] > xs[i]) - (xs[j] < xs[i])
                for i in range(t)
                for j in range(t, n)
            )
            cand = (abs(u), days[t - 1])
            if best is None or cand[0] > best[0] or (
                cand[0] == best[0] and cand[1] < best[1]
            ):
                best = cand
        k_stat, day = best
        assert got[et][1] == k_stat, et
        assert got[et][0].date() == day, et


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank: manual reference
# ---------------------------------------------------------------------------


def test_wilcoxon_signed_rank_manual_reference(spark):
    va = _daily_cents("events", "ts", "value", "WHERE event_type = 'view'")
    vb = _daily_cents("events", "ts", "value", "WHERE event_type = 'click'")
    days = sorted(set(va) | set(vb))
    diffs = [va.get(d, 0) - vb.get(d, 0) for d in days]
    diffs = [d for d in diffs if d != 0]
    n = len(diffs)
    order = sorted(range(n), key=lambda i: abs(diffs[i]))
    # tie-averaged doubled ranks
    r2 = [0] * n
    i = 0
    while i < n:
        j = i
        while j < n and abs(diffs[order[j]]) == abs(diffs[order[i]]):
            j += 1
        for k in range(i, j):
            r2[order[k]] = (i + 1) + j  # 2 * avg rank = (i+1) + j
        i = j
    w2p = sum(r for r, d in zip(r2, diffs) if d > 0)
    tie_term = sum(
        t**3 - t for t in Counter(abs(d) for d in diffs).values()
    )
    z = (w2p - n * (n + 1) / 2) / (
        ((2 * n * (n + 1) * (2 * n + 1) - tie_term) / 12.0) ** 0.5
    )
    row = _run(spark, "wilcoxon_signed_rank_daily").iloc[0]
    assert row.n == n and row.w2_plus == w2p and row.tie_term == tie_term
    assert abs(row.wilcoxon_z - z) < 2e-6


# ---------------------------------------------------------------------------
# Kendall tau-b: brute pair scan
# ---------------------------------------------------------------------------


def test_kendall_tau_brute_pairs(spark):
    rows = duckdb.sql(
        f"SELECT o_orderdate, o_totalprice FROM "
        f"read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    m: dict = defaultdict(lambda: [0, 0])
    for d, p in rows:
        key = d.year * 100 + d.month
        m[key][0] += _cents(p)
        m[key][1] += 1
    ks = sorted(m)
    C = D = tx = ty = 0
    for i in range(len(ks)):
        for j in range(i + 1, len(ks)):
            dx = m[ks[j]][0] - m[ks[i]][0]
            dy = m[ks[j]][1] - m[ks[i]][1]
            if dx * dy > 0:
                C += 1
            elif dx * dy < 0:
                D += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
    n0 = len(ks) * (len(ks) - 1) // 2
    tau = (C - D) / ((n0 - tx) * (n0 - ty)) ** 0.5
    row = _run(spark, "kendall_tau_monthly_rev_orders").iloc[0]
    assert (row.n0, row.concordant, row.discordant) == (n0, C, D)
    assert (row.ties_x, row.ties_y) == (tx, ty)
    assert abs(row.kendall_tau_b - tau) < 2e-6


# ---------------------------------------------------------------------------
# Luhn: canonical stdlib-style validator over the minted numbers
# ---------------------------------------------------------------------------


def _luhn_ok(number: str) -> bool:
    total = 0
    for pos, ch in enumerate(reversed(number), start=1):
        d = int(ch)
        if pos % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def test_luhn_reference_numbers_validate(spark):
    df = _run(spark, "luhn_reference_numbers")
    assert len(df) > 0
    for r in df.itertuples():
        assert len(r.ref_number) == 13
        assert int(r.ref_number[:12]) == r.o_orderkey
        assert int(r.ref_number[12]) == r.check_digit
        assert _luhn_ok(r.ref_number), r.ref_number
        assert r.luhn_valid == 1
    # a corrupted digit must fail the canonical validator
    bad = df.iloc[0].ref_number
    bad = bad[:-1] + str((int(bad[-1]) + 1) % 10)
    assert not _luhn_ok(bad)


# ---------------------------------------------------------------------------
# Yule's K: Counter-based reference
# ---------------------------------------------------------------------------


def test_yule_k_counter_reference(spark):
    texts = duckdb.sql(
        f"SELECT source, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    per_src: dict = defaultdict(Counter)
    for src, text in texts:
        per_src[src].update(w for w in text.split(" ") if w)
    got = {
        r.source: r for r in _run(spark, "yule_k_lexical_diversity").itertuples()
    }
    assert set(got) == set(per_src)
    for src, c in per_src.items():
        n = sum(c.values())
        s2 = sum(m * m for m in c.values())
        hapax = sum(1 for m in c.values() if m == 1)
        r = got[src]
        assert (r.n_tokens, r.n_types, r.n_hapax) == (n, len(c), hapax)
        assert r.yule_k_e6 == (s2 - n) * 10_000_000_000 // (n * n)


# ---------------------------------------------------------------------------
# Feature hashing: hashlib reference
# ---------------------------------------------------------------------------


def test_feature_hash_hashlib_reference(spark):
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
        "WHERE doc_id < 100"
    ).fetchall()
    ref: dict = defaultdict(int)
    for doc_id, text in texts:
        for w in text.split(" "):
            if not w:
                continue
            h = hashlib.md5(w.encode()).hexdigest()
            bucket = int(h[:8], 16) % 64
            sgn = 1 if int(h[8], 16) % 2 == 0 else -1
            ref[(doc_id, bucket)] += sgn
    got = {
        (r.doc_id, r.bucket): r.signed_count
        for r in _run(spark, "feature_hash_bow_sparse").itertuples()
    }
    assert got == dict(ref)


# ---------------------------------------------------------------------------
# t-closeness: brute integer EMD
# ---------------------------------------------------------------------------


def test_t_closeness_brute_emd(spark):
    rows = duckdb.sql(
        f"""SELECT c.c_nationkey, CAST(substr(o.o_orderpriority,1,1) AS INT)
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
        ON c.c_custkey = o.o_custkey"""
    ).fetchall()
    cell: dict = defaultdict(int)
    for nk, s in rows:
        cell[(nk, s)] += 1
    n_all = len(rows)
    tot = {s: sum(v for (nk, s2), v in cell.items() if s2 == s)
           for s in range(1, 6)}
    got = {r.c_nationkey: r for r in
           _run(spark, "t_closeness_ordered_emd").itertuples()}
    for nk in {k for k, _ in cell}:
        n_g = sum(v for (nk2, _), v in cell.items() if nk2 == nk)
        num = 0
        cg = ct = 0
        for s in range(1, 5):  # prefix gaps at s = 1..4
            cg += cell.get((nk, s), 0)
            ct += tot[s]
            num += abs(n_all * cg - n_g * ct)
        assert got[nk].n_orders == n_g
        assert got[nk].emd_ppm == num * 1_000_000 // (n_g * n_all * 4)


# ---------------------------------------------------------------------------
# Kaplan-Meier life table: brute per-customer simulation
# ---------------------------------------------------------------------------


def test_km_life_table_brute(spark):
    rows = duckdb.sql(
        f"SELECT o_custkey, CAST(o_orderdate AS DATE) FROM "
        f"read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    per: dict = {}
    for ck, d in rows:
        lo, hi = per.get(ck, (d, d))
        per[ck] = (min(lo, d), max(hi, d))
    end = max(hi for _, hi in per.values())
    events: dict = defaultdict(lambda: [0, 0])
    for lo, hi in per.values():
        b = (hi - lo).days // 90
        churned = (end - hi).days >= 180
        events[b][0 if churned else 1] += 1
    got = {r.bucket: r for r in
           _run(spark, "km_life_table_customer_tenure").itertuples()}
    assert set(got) == set(events)
    for b in sorted(events, reverse=True):
        n_risk = sum(
            d + c for b2, (d, c) in events.items() if b2 >= b
        )
        d, c = events[b]
        assert (got[b].n_risk, got[b].n_events, got[b].n_censored) == (
            n_risk, d, c,
        )
        assert got[b].hazard_ppm == d * 1_000_000 // n_risk


# ---------------------------------------------------------------------------
# DBSCAN: brute BFS reference
# ---------------------------------------------------------------------------


def test_dbscan_brute_bfs(spark):
    rows = duckdb.sql(
        f"SELECT event_id, ts, value FROM "
        f"read_parquet('{SF}/events.parquet') WHERE event_type = 'error'"
    ).fetchall()
    ids = [r[0] for r in rows]
    nb = {i: set() for i in ids}
    for i, (ia, ta, va) in enumerate(rows):
        for ib, tb, vb in rows[i:]:
            if abs((tb - ta).total_seconds()) <= 3600 and abs(vb - va) <= 10.0:
                nb[ia].add(ib)
                nb[ib].add(ia)
    core = {i for i in ids if len(nb[i]) >= 4}  # self included
    label: dict = {}
    for c in sorted(core):
        if c in label:
            continue
        stack, comp = [c], []
        seen = {c}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in nb[x]:
                if y in core and y not in seen:
                    seen.add(y)
                    stack.append(y)
        root = min(comp)
        for x in comp:
            label[x] = root
    border: dict = {}
    for i in ids:
        if i in core:
            continue
        cand = [label[j] for j in nb[i] if j in core]
        if cand:
            border[i] = min(cand)
    ref: dict = defaultdict(lambda: [0, 0, None, None])
    for i, lab in list(label.items()) + list(border.items()):
        e = ref[lab]
        e[0 if i in core else 1] += 1
        e[2] = i if e[2] is None else min(e[2], i)
        e[3] = i if e[3] is None else max(e[3], i)
    got = {r.cluster_id: r for r in
           _run(spark, "dbscan_box_clusters_errors").itertuples()}
    assert set(got) == set(ref)
    for lab, (nc, nbd, mn, mx) in ref.items():
        g = got[lab]
        assert (g.n_core, g.n_border, g.min_event_id, g.max_event_id) == (
            nc, nbd, mn, mx,
        )


# ---------------------------------------------------------------------------
# Link prediction: brute set reference
# ---------------------------------------------------------------------------


def test_link_prediction_brute_sets(spark):
    rows = duckdb.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM "
        f"read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()
    orders: dict = defaultdict(set)
    for ok, pk in rows:
        orders[ok].add(pk)
    sup: Counter = Counter()
    for parts in orders.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                sup[(ps[i], ps[j])] += 1
    edges = {p for p, s in sup.items() if s >= 2}
    adj: dict = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    scored = []
    nodes = sorted(adj)
    for w in nodes:
        ns = sorted(adj[w])
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                a, b = ns[i], ns[j]
                if (a, b) in edges:
                    continue
                scored.append((a, b))
    cn = Counter(scored)
    ranked = sorted(
        (
            (-c, -(c * 1_000_000 // (len(adj[a]) + len(adj[b]) - c)), a, b)
            for (a, b), c in cn.items()
        )
    )[:20]
    expect = [
        (a, b, -nc, len(adj[a]), len(adj[b]), -jp)
        for nc, jp, a, b in ranked
    ]
    got = [
        (r.part_a, r.part_b, r.common_neighbors, r.deg_a, r.deg_b,
         r.jaccard_ppm)
        for r in _run(spark, "link_prediction_common_neighbors").itertuples()
    ]
    assert got == expect


# ---------------------------------------------------------------------------
# k-means elbow + mutual NN: numpy references on the shared int8 grid
# ---------------------------------------------------------------------------


def _quantized():
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    vecs = {vid: np.array(v, dtype=np.float64) for vid, v in rows}
    scale = max(np.abs(v).max() for v in vecs.values()) / 127.0
    return {
        vid: np.floor(v / scale + 0.5).astype(np.int64)
        for vid, v in vecs.items()
    }


def test_kmeans_inertia_elbow_numpy_reference(spark):
    q = _quantized()
    cents = {k: q[k] for k in range(16)}
    df = _run(spark, "kmeans_inertia_elbow")
    got = {int(r.k): int(r.inertia) for r in df.itertuples()}
    for k in (2, 4, 8, 16):
        inertia = sum(
            min(int(((v - cents[c]) ** 2).sum()) for c in range(k))
            for v in q.values()
        )
        assert got[k] == inertia
    # elbow staircase: nested centroid sets => monotone non-increasing
    assert got[2] >= got[4] >= got[8] >= got[16]
    assert df.n_points.iloc[0] == len(q)


def test_mutual_nn_numpy_reference(spark):
    q = _quantized()
    # k scales as max(16, floor(sqrt(N))) — the IVF scale law the
    # operator derives from a count aggregate.
    import math

    k_cents = max(16, math.isqrt(len(q)))
    cents = {k: q[k] for k in range(k_cents)}

    def probes(v):
        ds = sorted(
            (int(((v - cv) ** 2).sum()), cid) for cid, cv in cents.items()
        )
        return {cid for _, cid in ds[:2]}

    cell_members: dict = defaultdict(set)
    probe_of = {}
    for vid, v in q.items():
        probe_of[vid] = probes(v)
        for c in probe_of[vid]:
            cell_members[c].add(vid)
    nn = {}
    for vid, v in q.items():
        cand = set().union(*(cell_members[c] for c in probe_of[vid]))
        cand.discard(vid)
        if not cand:
            continue
        nn[vid] = min(
            (int(((v - q[o]) ** 2).sum()), o) for o in sorted(cand)
        )
    expect = sorted(
        (a, b, d)
        for a, (d, b) in nn.items()
        if a < b and b in nn and nn[b][1] == a
    )
    got = [
        (r.vec_a, r.vec_b, r.dist_sq)
        for r in _run(spark, "mutual_nn_int8_ivf").itertuples()
    ]
    assert got == expect


# ---------------------------------------------------------------------------
# Conformal: brute quantile + the finite-sample coverage guarantee
# ---------------------------------------------------------------------------


def test_conformal_brute_and_coverage(spark):
    daily = _daily_cents("orders", "o_orderdate", "o_totalprice")
    byx = {(d - min(daily)).days: v for d, v in daily.items()}
    import datetime

    x0 = min(daily)
    pairs = {
        x: (byx[x], byx[x - 7]) for x in byx if x - 7 in byx
    }
    split = (datetime.date(2000, 1, 1) - x0).days
    cal = sorted(
        (abs(y - f), x) for x, (y, f) in pairs.items() if x < split
    )
    n = len(cal)
    q_hat = cal[((n + 1) * 9 + 9) // 10 - 1][0]
    test = {x: yf for x, yf in pairs.items() if x >= split}
    df = _run(spark, "conformal_interval_seasonal_naive")
    assert len(df) == len(test)
    covered = 0
    for r in df.itertuples():
        x = (r.day.date() - x0).days
        y, f = test[x]
        assert (r.actual_cents, r.forecast_cents) == (y, f)
        assert r.lo_cents == f - q_hat and r.hi_cents == f + q_hat
        assert r.covered == (1 if f - q_hat <= y <= f + q_hat else 0)
        covered += r.covered
    # split-conformal marginal coverage should be in the right regime
    # (exchangeability gives >= 90% in expectation; allow sampling slack)
    assert covered / len(df) >= 0.80


# ---------------------------------------------------------------------------
# Bridge + VWAP + migration + Q-Q: reconciliation / brute references
# ---------------------------------------------------------------------------


def test_price_volume_mix_reconciles_to_the_cent(spark):
    df = _run(spark, "price_volume_mix_bridge")
    assert len(df) > 0
    assert (
        df.volume_effect_cents + df.price_mix_effect_cents
        == df.delta_cents
    ).all()
    assert (
        df.delta_cents == df.rev_cur_cents - df.rev_prev_cents
    ).all()


def test_vwap_brute(spark):
    rows = duckdb.sql(
        f"SELECT CAST(l_shipdate AS DATE), l_extendedprice, l_quantity "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()
    agg: dict = defaultdict(lambda: [0, 0])
    for d, p, qty in rows:
        agg[d][0] += _cents(p)
        agg[d][1] += int(qty + 0.5)
    got = {r.day.date(): r for r in
           _run(spark, "vwap_daily_lineitem").itertuples()}
    assert set(got) == set(agg)
    for d, (cts, qty) in agg.items():
        r = got[d]
        assert (r.total_cents, r.total_qty) == (cts, qty)
        assert r.vwap_millicents == cts * 1000 // qty


def test_segment_migration_brute(spark):
    rows = duckdb.sql(
        f"SELECT o_custkey, o_orderdate, o_totalprice FROM "
        f"read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    cm: dict = defaultdict(int)
    for ck, d, p in rows:
        cm[(ck, d.year * 12 + d.month - 1)] += _cents(p)

    def band(rev):
        if rev < 10_000_000:
            return "B0_LOW"
        if rev < 30_000_000:
            return "B1_MID"
        if rev < 60_000_000:
            return "B2_HIGH"
        return "B3_TOP"

    mn = min(mx for _, mx in cm)
    mxx = max(mx for _, mx in cm)
    ref: Counter = Counter()
    for (ck, mx), rev in cm.items():
        # as destination (arrival at mx > mn)
        if mx > mn:
            prev = cm.get((ck, mx - 1))
            ref[(band(prev) if prev is not None else "NONE", band(rev))] += 1
        # as source of an exit (no row next month)
        if mx < mxx and (ck, mx + 1) not in cm:
            ref[(band(rev), "NONE")] += 1
    got = {
        (r.from_band, r.to_band): r.n_transitions
        for r in _run(spark, "segment_migration_matrix").itertuples()
    }
    assert got == dict(ref)


def test_qq_deciles_brute_sorted_lists(spark):
    rows = duckdb.sql(
        f"""SELECT c.c_mktsegment, o.o_totalprice, o.o_orderkey
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
        ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')"""
    ).fetchall()
    per: dict = defaultdict(list)
    for seg, p, ok in rows:
        per[seg].append((_cents(p), ok))
    decs = {}
    for seg, vals in per.items():
        vals.sort()
        n = len(vals)
        decs[seg] = {
            q: vals[(q * n + 99) // 100 - 1][0] for q in range(10, 100, 10)
        }
    got = _run(spark, "qq_deciles_mktsegments")
    assert len(got) == 9
    for r in got.itertuples():
        assert r.building_cents == decs["BUILDING"][r.decile]
        assert r.machinery_cents == decs["MACHINERY"][r.decile]
        assert r.gap_cents == r.building_cents - r.machinery_cents


# ---------------------------------------------------------------------------
# Multi-lag ACF: Pearson over calendar-aligned daily pairs, plain Python
# ---------------------------------------------------------------------------


def test_acf_multi_lag_brute_pearson(spark):
    """Re-derive the lag-1/7/14 autocorrelations from dict-of-days
    Python: calendar alignment (day-index minus lag must EXIST as a
    key — not a row offset), exact int64 cent moments, one float
    division at the end."""
    import math

    got = {
        (r.event_type, r.lag): (r.n_pairs, r.acf)
        for r in _run(spark, "acf_multi_lag_daily").itertuples()
    }
    types = [t for (t,) in duckdb.sql(
        f"SELECT DISTINCT event_type FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()]
    assert set(et for et, _ in got) == set(types)
    for et in types:
        daily = _daily_cents(
            "events", "ts", "value", f"WHERE event_type = '{et}'"
        )
        idx = {d.toordinal(): v for d, v in daily.items()}
        for lag in (1, 7, 14):
            pairs = [
                (idx[x], idx[x - lag]) for x in idx if (x - lag) in idx
            ]
            n = len(pairs)
            sa = sum(a for a, _ in pairs)
            sb = sum(b for _, b in pairs)
            sab = sum(a * b for a, b in pairs)
            saa = sum(a * a for a, _ in pairs)
            sbb = sum(b * b for _, b in pairs)
            acf = (n * sab - sa * sb) / (
                math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb)
            )
            ref = int(acf * 1000000 + (0.5 if acf >= 0 else -0.5)) / 1000000
            np_, acf_got = got[(et, lag)]
            assert np_ == n, (et, lag)
            assert acf_got == ref, (et, lag)


# ---------------------------------------------------------------------------
# Idle gaps: brute-force sorted interval merge per user
# ---------------------------------------------------------------------------


def test_idle_gaps_brute_interval_merge(spark):
    """Sort each user's 10-minute activity intervals and walk them
    with a running max-end — count every strictly positive gap and
    sum its microseconds; coverage_ppm is an int64 floor division."""
    rows = duckdb.sql(
        f"SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) FROM "
        f"read_parquet('{SF}/events.parquet')"
    ).fetchall()
    per: dict = defaultdict(list)
    for u, t in rows:
        per[u].append(t)
    got = {
        r.user_id: (
            r.n_gaps, r.idle_seconds, r.span_seconds, r.coverage_ppm
        )
        for r in _run(spark, "idle_gap_analysis_users").itertuples()
    }
    assert set(got) == set(per)
    W = 600 * 1000000
    for u, ts in per.items():
        ts.sort()
        n_gaps = idle = 0
        end = None
        for t in ts:
            if end is not None and t > end:
                n_gaps += 1
                idle += t - end
            end = t + W if end is None else max(end, t + W)
        span = ts[-1] + W - ts[0]
        ref = (n_gaps, idle // 1000000, span // 1000000,
               (span - idle) * 1000000 // span)
        assert got[u] == ref, u


# ---------------------------------------------------------------------------
# Reorder point: brute moments per brand
# ---------------------------------------------------------------------------


def test_reorder_point_brute_moments(spark):
    import math

    part_brand = dict(duckdb.sql(
        f"SELECT p_partkey, p_brand FROM read_parquet('{SF}/part.parquet')"
    ).fetchall())
    rows = duckdb.sql(
        f"SELECT l_partkey, CAST(l_shipdate AS DATE), l_quantity "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()
    daily: Counter = Counter()
    for pk, d, q in rows:
        daily[(part_brand[pk], d)] += int(q + 0.5)
    per: dict = defaultdict(list)
    for (b, _), q in daily.items():
        per[b].append(q)
    got = {
        r.p_brand: (r.n_demand_days, r.mean_daily_qty,
                    r.reorder_point_qty)
        for r in _run(spark, "reorder_point_brands").itertuples()
    }
    assert set(got) == set(per)
    for b, qs in per.items():
        n, s1, s2 = len(qs), sum(qs), sum(q * q for q in qs)
        mean = s1 / n
        var = (n * s2 - s1 * s1) / (n * (n - 1))
        rop = 7.0 * mean + 2.0 * math.sqrt(7.0 * var)

        def r6(x):
            return int(x * 1000000 + (0.5 if x >= 0 else -0.5)) / 1000000

        assert got[b] == (n, r6(mean), r6(rop)), b


# ---------------------------------------------------------------------------
# HHI: brute shares-ppm squares per month
# ---------------------------------------------------------------------------


def test_hhi_brute_share_squares(spark):
    rows = duckdb.sql(
        f"""SELECT EXTRACT(year FROM o.o_orderdate) * 100
                   + EXTRACT(month FROM o.o_orderdate),
                  n.n_name, o.o_totalprice
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        JOIN read_parquet('{SF}/nation.parquet') n
          ON n.n_nationkey = c.c_nationkey"""
    ).fetchall()
    per: Counter = Counter()
    for ym, nn, p in rows:
        per[(int(ym), nn)] += _cents(p)
    months: dict = defaultdict(dict)
    for (ym, nn), rev in per.items():
        months[ym][nn] = rev
    got = {
        r.yyyymm: (r.n_nations, r.total_rev_cents, r.hhi_ppm,
                   r.effective_n_milli)
        for r in _run(spark, "hhi_concentration_monthly").itertuples()
    }
    assert set(got) == set(months)
    for ym, d in months.items():
        tot = sum(d.values())
        ss = sum((rev * 1000000 // tot) ** 2 for rev in d.values())
        hhi = ss // 1000000
        assert got[ym] == (len(d), tot, hhi, 1000000000 // hhi), ym


# ---------------------------------------------------------------------------
# Stock span: backwards scan per day
# ---------------------------------------------------------------------------


def test_stock_span_brute_backwards_scan(spark):
    got = {
        (r.event_type, r.day.date()): (r.value_cents, r.span_days)
        for r in _run(spark, "stock_span_daily_value").itertuples()
    }
    types = {et for et, _ in got}
    for et in types:
        daily = _daily_cents(
            "events", "ts", "value", f"WHERE event_type = '{et}'"
        )
        days = sorted(daily)
        for i, d in enumerate(days):
            span = 1
            j = i - 1
            while j >= 0 and daily[days[j]] <= daily[d]:
                # span counts CALENDAR days back to the previous
                # strictly-greater day, not just observed days
                j -= 1
            if j < 0:
                span = (days[i] - days[0]).days + 1
            else:
                span = (days[i] - days[j]).days
            assert got[(et, d)] == (daily[d], span), (et, d)


# ---------------------------------------------------------------------------
# DAU/WAU/MAU: brute sets per day
# ---------------------------------------------------------------------------


def test_dau_wau_mau_brute_sets(spark):
    rows = duckdb.sql(
        f"SELECT DISTINCT user_id, CAST(ts AS DATE) FROM "
        f"read_parquet('{SF}/events.parquet')"
    ).fetchall()
    by_day: dict = defaultdict(set)
    for u, d in rows:
        by_day[d.toordinal()].add(u)
    got = {
        r.day.date().toordinal(): (r.dau, r.wau, r.mau, r.stickiness_ppm)
        for r in _run(spark, "dau_wau_mau_stickiness").itertuples()
    }
    assert set(got) == set(by_day)
    for x in by_day:
        dau = len(by_day[x])
        wau = len(set().union(
            *(by_day.get(y, set()) for y in range(x - 6, x + 1))
        ))
        mau = len(set().union(
            *(by_day.get(y, set()) for y in range(x - 27, x + 1))
        ))
        assert got[x] == (dau, wau, mau, dau * 1000000 // mau), x


# ---------------------------------------------------------------------------
# Target encoding: brute m-estimate, same IEEE shape
# ---------------------------------------------------------------------------


def test_target_encode_brute_m_estimate(spark):
    rows = duckdb.sql(
        f"""SELECT c.c_mktsegment, o.o_totalprice
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
          ON c.c_custkey = o.o_custkey"""
    ).fetchall()
    n: Counter = Counter()
    s: Counter = Counter()
    for seg, p in rows:
        n[seg] += 1
        s[seg] += _cents(p)
    NN, SS = sum(n.values()), sum(s.values())
    got = {
        r.segment: (r.n_orders, r.raw_mean_cents, r.encoded_cents,
                    r.shrink_ppm)
        for r in _run(spark, "target_encode_mktsegment").itertuples()
    }
    assert set(got) == set(n)

    def r6(x):
        return int(x * 1000000 + (0.5 if x >= 0 else -0.5)) / 1000000

    for seg in n:
        enc = (s[seg] + 100.0 * (SS / NN)) / (n[seg] + 100)
        assert got[seg] == (
            n[seg], r6(s[seg] / n[seg]), r6(enc),
            n[seg] * 1000000 // (n[seg] + 100),
        ), seg


# ---------------------------------------------------------------------------
# Arc elasticity: midpoint formula straight from p_i = r_i / q_i
# ---------------------------------------------------------------------------


def test_arc_elasticity_brute_midpoint(spark):
    """The operator uses the collapsed cross-product form; this
    reference computes the TEXTBOOK midpoint formula with explicit
    unit prices — they must agree to the 1e-6 grid wherever the
    price moved (the collapse is exact algebra, but the float paths
    differ, so compare with tolerance one grid step)."""
    rows = duckdb.sql(
        f"""SELECT p.p_brand,
                  EXTRACT(year FROM l.l_shipdate) * 12
                  + EXTRACT(month FROM l.l_shipdate),
                  l.l_quantity, l.l_extendedprice
        FROM read_parquet('{SF}/lineitem.parquet') l
        JOIN read_parquet('{SF}/part.parquet') p
          ON p.p_partkey = l.l_partkey"""
    ).fetchall()
    q: Counter = Counter()
    r: Counter = Counter()
    for b, m, qty, price in rows:
        q[(b, int(m))] += int(qty + 0.5)
        r[(b, int(m))] += _cents(price)
    got = {
        (row.p_brand, row.yyyymm): (
            row.qty_prev, row.qty_cur, row.arc_elasticity
        )
        for row in _run(spark, "price_elasticity_arc_brand").itertuples()
    }
    n_checked = 0
    for (b, m), q1 in q.items():
        if (b, m + 1) not in q:
            continue
        q2, r1, r2 = q[(b, m + 1)], r[(b, m)], r[(b, m + 1)]
        ym = (m + 1 - 1) // 12 * 100 + (m + 1 - 1) % 12 + 1
        qp, qc, el = got[(b, ym)]
        assert (qp, qc) == (q1, q2)
        p1, p2 = r1 / q1, r2 / q2
        if p2 == p1:
            assert el is None or el != el  # NULL/NaN
        else:
            ref = ((q2 - q1) / ((q1 + q2) / 2)) / ((p2 - p1) / ((p1 + p2) / 2))
            assert abs(el - ref) <= 2e-6, (b, ym, el, ref)
            n_checked += 1
    assert n_checked > 0


# ---------------------------------------------------------------------------
# SBC quadrants: brute ADI / CV^2 with float comparisons
# ---------------------------------------------------------------------------


def test_sbc_pattern_brute_quadrants(spark):
    part_brand = dict(duckdb.sql(
        f"SELECT p_partkey, p_brand FROM read_parquet('{SF}/part.parquet')"
    ).fetchall())
    rows = duckdb.sql(
        f"SELECT l_partkey, CAST(l_shipdate AS DATE), l_quantity "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()
    daily: Counter = Counter()
    for pk, d, qty in rows:
        daily[(part_brand[pk], d)] += int(qty + 0.5)
    per: dict = defaultdict(dict)
    for (b, d), qty in daily.items():
        per[b][d] = qty
    got = {
        r.p_brand: (r.n_demand_days, r.pattern)
        for r in _run(spark, "demand_pattern_sbc_brands").itertuples()
    }
    from fractions import Fraction

    for b, dd in per.items():
        if len(dd) < 2:
            assert b not in got
            continue
        n = len(dd)
        qs = list(dd.values())
        s1, s2 = sum(qs), sum(x * x for x in qs)
        span = (max(dd) - min(dd)).days
        adi = Fraction(span, n - 1)
        cv2 = Fraction(n * (n * s2 - s1 * s1), (n - 1) * s1 * s1)
        smooth_a = adi < Fraction(132, 100)
        smooth_c = cv2 < Fraction(49, 100)
        ref = ("smooth" if smooth_c else "erratic") if smooth_a else (
            "intermittent" if smooth_c else "lumpy")
        assert got[b] == (n, ref), b


# ---------------------------------------------------------------------------
# PQ-ADC: pure-Python codebook/LUT pipeline
# ---------------------------------------------------------------------------


def test_pq_adc_brute_lut_pipeline(spark):
    import math

    rows = duckdb.sql(
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM "
        f"read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    s = max(max(abs(v) for v in vec) for _, vec in rows) / 127.0
    q = {vid: [math.floor(v / s + 0.5) for v in vec] for vid, vec in rows}

    def sub(vid, j):
        return q[vid][j * 16:(j + 1) * 16]

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    codes = {}
    for vid in q:
        codes[vid] = tuple(
            min(range(8), key=lambda c: (d2(sub(vid, j), sub(c, j)), c))
            for j in range(4)
        )
    lut = {(j, c): d2(sub(0, j), sub(c, j))
           for j in range(4) for c in range(8)}
    adc = {
        vid: sum(lut[(j, codes[vid][j])] for j in range(4))
        for vid in q if vid != 0
    }
    ref = sorted(adc, key=lambda v: (adc[v], v))[:20]
    got = _run(spark, "ann_pq_adc_topk")
    assert list(got.vec_id) == ref
    for r in got.itertuples():
        assert r.adc_dist_sq == adc[r.vec_id]
        assert r.true_dist_sq == d2(q[r.vec_id], q[0])
        assert r.rnk == ref.index(r.vec_id) + 1


# ---------------------------------------------------------------------------
# Triangle support: |N(a) ∩ N(b)| set intersection (different algorithm)
# ---------------------------------------------------------------------------


def test_triangle_support_brute_common_neighbors(spark):
    rows = duckdb.sql(
        f"""WITH items AS (
          SELECT DISTINCT l_orderkey, l_partkey
          FROM read_parquet('{SF}/lineitem.parquet'))
        SELECT a.l_partkey, b.l_partkey
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2"""
    ).fetchall()
    adj: dict = defaultdict(set)
    for pa, pb in rows:
        adj[pa].add(pb)
        adj[pb].add(pa)
    got = {
        (r.pa, r.pb): (r.support, r.is_local_bridge)
        for r in _run(
            spark, "edge_triangle_support_copurchase"
        ).itertuples()
    }
    assert set(got) == {(pa, pb) for pa, pb in rows}
    for pa, pb in rows:
        sup = len(adj[pa] & adj[pb])
        assert got[(pa, pb)] == (sup, sup == 0), (pa, pb)


# ---------------------------------------------------------------------------
# Bollinger: trailing calendar window, exact-integer band predicate
# ---------------------------------------------------------------------------


def test_bollinger_brute_trailing_window(spark):
    got = {
        (r.event_type, r.day.date()): (
            r.value_cents, r.n_window, r.mean_cents,
            r.breakout_hi, r.breakout_lo,
        )
        for r in _run(spark, "bollinger_breakout_daily").itertuples()
    }
    types = {et for et, _ in got}
    for et in types:
        daily = _daily_cents(
            "events", "ts", "value", f"WHERE event_type = '{et}'"
        )
        for d, v in daily.items():
            win = [daily[e] for e in daily if 0 <= (d - e).days <= 13]
            n, s = len(win), sum(win)
            qq = sum(x * x for x in win)
            dev = n * v - s
            wide = dev * dev * (n - 1) > 4 * n * (n * qq - s * s)
            mean = s / n
            r6 = int(mean * 1000000 + (0.5 if mean >= 0 else -0.5)) / 1000000
            assert got[(et, d)] == (
                v, n, r6, dev > 0 and wide, dev < 0 and wide
            ), (et, d)


# ---------------------------------------------------------------------------
# ROC-AUC: brute pairwise P(score+ > score-) + half-ties
# ---------------------------------------------------------------------------


def test_roc_auc_brute_pairwise(spark):
    """The operator uses the midrank identity; this reference counts
    the O(n_pos * n_neg) pairs directly (wins + half-ties) — the
    definitional probability AUC estimates."""
    rows = duckdb.sql(
        f"""SELECT o.o_orderkey, o.o_totalprice,
                  max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/lineitem.parquet') l
          ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2"""
    ).fetchall()
    pos = sorted(_cents(p) for _, p, lab in rows if lab == 1)
    neg = sorted(_cents(p) for _, p, lab in rows if lab == 0)
    import bisect

    wins2 = 0  # doubled so half-ties stay integer
    for s in pos:
        lo = bisect.bisect_left(neg, s)
        hi = bisect.bisect_right(neg, s)
        wins2 += 2 * lo + (hi - lo)
    got = _run(spark, "roc_auc_price_predicts_return").iloc[0]
    assert got.n_pos == len(pos) and got.n_neg == len(neg)
    auc_ppm = wins2 * 1000000 // (2 * len(pos) * len(neg))
    assert got.auc_ppm == auc_ppm
    assert got.gini_ppm == wins2 * 1000000 // (len(pos) * len(neg)) - 1000000


# ---------------------------------------------------------------------------
# ABC: brute sort + cumulative cents
# ---------------------------------------------------------------------------


def test_abc_brute_cumulative_classes(spark):
    rows = duckdb.sql(
        f"SELECT l_partkey, l_extendedprice FROM "
        f"read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()
    rev: Counter = Counter()
    for pk, p in rows:
        rev[pk] += _cents(p)
    order = sorted(rev, key=lambda k: (-rev[k], k))
    tot = sum(rev.values())
    cum = 0
    cls: dict = defaultdict(lambda: [0, 0, None, None])  # n, rev, fr, lr
    for rk, pk in enumerate(order, 1):
        cum += rev[pk]
        c = "A" if cum * 5 <= tot * 4 else (
            "B" if cum * 20 <= tot * 19 else "C")
        e = cls[c]
        e[0] += 1
        e[1] += rev[pk]
        e[2] = e[2] or rk
        e[3] = rk
    got = _run(spark, "abc_classification_parts")
    assert list(got.abc_class) == sorted(cls)
    for r in got.itertuples():
        n, rv, fr, lr = cls[r.abc_class]
        assert (r.n_parts, r.rev_cents, r.share_ppm, r.first_rank,
                r.last_rank) == (n, rv, rv * 1000000 // tot, fr, lr)


# ---------------------------------------------------------------------------
# Mahalanobis: numpy covariance-inverse reference
# ---------------------------------------------------------------------------


def test_mahalanobis_brute_numpy_inverse(spark):
    """The operator inverts the 2x2 covariance analytically; this
    reference builds the actual covariance matrix with numpy and
    solves — agreement within 1e-6 relative pins the algebra, and
    the chosen rows must be the true per-segment argmax set."""
    rows = duckdb.sql(
        f"""SELECT c.c_mktsegment, o.o_orderkey,
                  round(o.o_totalprice / 100.0), count(*)
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        JOIN read_parquet('{SF}/lineitem.parquet') l
          ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2, 3"""
    ).fetchall()
    per: dict = defaultdict(list)
    for seg, ok, x, y in rows:
        per[seg].append((int(ok), int(x), int(y)))
    got = defaultdict(list)
    for r in _run(spark, "mahalanobis_outliers_2d").itertuples():
        got[r.segment].append((r.rnk, r.o_orderkey, r.total_dollars,
                               r.n_items, r.md2))
    assert set(got) == set(per)
    for seg, pts in per.items():
        xy = np.array([(x, y) for _, x, y in pts], dtype=float)
        cov = np.cov(xy.T, ddof=1)
        inv = np.linalg.inv(cov)
        mu = xy.mean(axis=0)
        d = xy - mu
        md2 = np.einsum("ij,jk,ik->i", d, inv, d)
        keys = sorted(
            range(len(pts)), key=lambda i: (-md2[i], pts[i][0])
        )[:3]
        for rank0, i in enumerate(keys):
            rnk, ok, x, y, got_md2 = got[seg][rank0]
            assert (rnk, ok, x, y) == (rank0 + 1, *pts[i][:3][:1],
                                       pts[i][1], pts[i][2])
            assert abs(got_md2 - md2[i]) <= 1e-6 * max(1.0, md2[i]), seg


# ---------------------------------------------------------------------------
# Poisson bootstrap: replay the md5 draws in Python, plus sanity on
# the weight distribution
# ---------------------------------------------------------------------------


def test_poisson_bootstrap_brute_replay(spark):
    from spark_lever_spark.operators.relational import _POIS_T

    rows = duckdb.sql(
        f"SELECT o_orderkey, o_orderpriority, o_totalprice FROM "
        f"read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    reps: dict = defaultdict(lambda: [0, 0])  # (priority, b) -> [sw, nw]
    base: dict = defaultdict(lambda: [0, 0])
    for ok, pr, price in rows:
        x = _cents(price)
        base[pr][0] += 1
        base[pr][1] += x
        for b in range(64):
            h = int(
                hashlib.md5(f"{ok}:{b}".encode()).hexdigest()[:10], 16
            )
            w = sum(1 for t in _POIS_T if h >= t)
            reps[(pr, b)][0] += w * x
            reps[(pr, b)][1] += w
    got = {
        r.priority: (r.n_orders, r.mean_cents, r.ci_lo_cents,
                     r.ci_hi_cents)
        for r in _run(spark, "poisson_bootstrap_ci_priority").itertuples()
    }
    assert set(got) == set(base)

    def r6(x):
        return int(x * 1000000 + (0.5 if x >= 0 else -0.5)) / 1000000

    for pr, (n, s) in base.items():
        means = sorted(
            (reps[(pr, b)][0] / reps[(pr, b)][1], b) for b in range(64)
        )
        lo, hi = means[3][0], means[60][0]
        assert got[pr] == (n, r6(s / n), r6(lo), r6(hi)), pr
        # the band must bracket the point estimate
        assert lo <= s / n <= hi, pr


def test_poisson_weights_distribution_sane():
    """The integer thresholds must reproduce Poisson(1) frequencies:
    over the full 2^40 grid, P(w=0) and P(w=1) are e^-1 to within
    the grid's quantization."""
    import math

    from spark_lever_spark.operators.relational import _POIS_T

    grid = 1 << 40
    p0 = _POIS_T[0] / grid
    p1 = (_POIS_T[1] - _POIS_T[0]) / grid
    assert abs(p0 - math.exp(-1)) < 1e-9
    assert abs(p1 - math.exp(-1)) < 1e-9
    assert _POIS_T == sorted(_POIS_T) and _POIS_T[-1] < grid


# ---------------------------------------------------------------------------
# Coverage estimators: brute token counting
# ---------------------------------------------------------------------------


def test_vocab_coverage_brute_counts(spark):
    import re as _re

    rows = duckdb.sql(
        f"SELECT source, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    per: dict = defaultdict(Counter)
    for src, text in rows:
        for w in _re.split(r"\s+", text):
            if w:
                per[src][w] += 1
    got = {
        r.source: r
        for r in _run(
            spark, "vocab_coverage_estimators_by_source"
        ).itertuples()
    }
    assert set(got) == set(per)

    def r6(x):
        return int(x * 1000000 + (0.5 if x >= 0 else -0.5)) / 1000000

    for src, cnt in per.items():
        d, n = len(cnt), sum(cnt.values())
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        rep2 = sum(c * (c - 1) for c in cnt.values())
        chao = d + (f1 * f1 / (2 * f2) if f2 else f1 * (f1 - 1) / 2)
        g = got[src]
        assert (g.vocab_size, g.total_tokens, g.f1, g.f2) == (d, n, f1, f2)
        assert g.chao1_richness == r6(chao)
        assert g.unseen_mass_ppm == f1 * 1000000 // n
        x = rep2 / (n * (n - 1)) * 1000000
        assert g.simpson_repeat_ppm == float(
            int(x + (0.5 if x >= 0 else -0.5))
        )


# ---------------------------------------------------------------------------
# Fano burstiness: dense doc-term matrix variance (the naive way)
# ---------------------------------------------------------------------------


def test_fano_brute_dense_variance(spark):
    """The operator folds zero-documents in algebraically; this
    reference builds the per-token count vector across ALL docs
    (zeros explicit) and computes var/mean with numpy ddof=1."""
    import re as _re

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    D = len(rows)
    per_tok: dict = defaultdict(dict)
    for doc_id, text in rows:
        c = Counter(w for w in _re.split(r"\s+", text) if w)
        for w, k in c.items():
            per_tok[w][doc_id] = k
    fano = {}
    for w, dd in per_tok.items():
        t = sum(dd.values())
        if t < 50:
            continue
        vec = np.zeros(D)
        vec[: len(dd)] = list(dd.values())  # zeros elsewhere; order no-op
        fano[w] = (vec.var(ddof=1)) / (t / D)
    ref = sorted(fano, key=lambda w: (-fano[w], w))[:25]
    got = _run(spark, "token_burstiness_fano")
    assert list(got.token) == ref
    for r in got.itertuples():
        assert abs(r.fano_factor - fano[r.token]) <= 2e-6
        assert r.doc_freq == len(per_tok[r.token])
        assert r.total_count == sum(per_tok[r.token].values())


# ---------------------------------------------------------------------------
# Cohen's kappa: brute flag computation + sklearn-free kappa formula
# ---------------------------------------------------------------------------


def test_cohens_kappa_brute_flags(spark):
    import re as _re

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    PN = 16
    para_docs: dict = defaultdict(set)
    shin_docs: dict = defaultdict(set)
    for doc_id, text in rows:
        ptoks = text.split(" ")
        for p in range(-(-len(ptoks) // PN)):
            para_docs[" ".join(ptoks[p * PN:(p + 1) * PN])].add(doc_id)
        stoks = [t for t in _re.split(r"\s+", text) if t]
        for p in range(max(len(stoks) - PN + 1, 1)):
            shin_docs[" ".join(stoks[p:p + PN])].add(doc_id)
    fa = set().union(*(d for d in para_docs.values() if len(d) > 1),
                     set())
    fb = set().union(*(d for d in shin_docs.values() if len(d) > 1),
                     set())
    n = len(rows)
    n11 = len(fa & fb)
    n10 = len(fa - fb)
    n01 = len(fb - fa)
    n00 = n - n11 - n10 - n01
    r1c1 = (n11 + n10) * (n11 + n01)
    r0c0 = (n01 + n00) * (n10 + n00)
    kap = (n * (n11 + n00) - r1c1 - r0c0) / (n * n - r1c1 - r0c0)
    got = _run(spark, "cohens_kappa_dedup_methods").iloc[0]
    assert (got.n_docs, got.n11, got.n10, got.n01, got.n00) == (
        n, n11, n10, n01, n00)
    assert got.kappa == int(kap * 1000000 + (0.5 if kap >= 0 else -0.5)
                            ) / 1000000
    # the comparison is only meaningful if the methods actually
    # disagree somewhere and agree somewhere
    assert n10 + n01 > 0 and n11 > 0


# ---------------------------------------------------------------------------
# Decile lift: brute ranking
# ---------------------------------------------------------------------------


def test_decile_lift_brute_ranking(spark):
    rows = duckdb.sql(
        f"""SELECT o.o_orderkey, o.o_totalprice,
                  max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/lineitem.parquet') l
          ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2"""
    ).fetchall()
    ranked = sorted(rows, key=lambda r: (-_cents(r[1]), r[0]))
    nt = len(ranked)
    pt = sum(lab for _, _, lab in ranked)
    per: dict = defaultdict(lambda: [0, 0])
    for rk, (_, _, lab) in enumerate(ranked, 1):
        d = (rk * 10 - 1) // nt + 1
        per[d][0] += 1
        per[d][1] += lab
    got = _run(spark, "decile_lift_table_returns")
    assert list(got.decile) == sorted(per)
    cum = 0
    for r in got.itertuples():
        n, np_ = per[r.decile]
        cum += np_
        assert (r.n_orders, r.n_returned) == (n, np_)
        assert r.response_ppm == np_ * 1000000 // n
        assert r.cum_gain_ppm == cum * 1000000 // pt
        assert r.lift_ppm == np_ * nt * 1000000 // (n * pt)
    # deciles are exact-population: sizes differ by at most 1
    sizes = [per[d][0] for d in sorted(per)]
    assert max(sizes) - min(sizes) <= 1 and sum(sizes) == nt


# ---------------------------------------------------------------------------
# Contingency residuals: scipy-free textbook formula + chi-square tie-out
# ---------------------------------------------------------------------------


def test_contingency_residuals_brute_cells(spark):
    import math

    rows = duckdb.sql(
        f"""SELECT c.c_mktsegment, o.o_orderpriority, count(*)
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2"""
    ).fetchall()
    obs = {(s, p): int(c) for s, p, c in rows}
    rr: Counter = Counter()
    cc: Counter = Counter()
    for (s, p), c in obs.items():
        rr[s] += c
        cc[p] += c
    n = sum(obs.values())
    got = {
        (r.segment, r.priority): (r.observed, r.expected, r.adj_residual)
        for r in _run(
            spark, "contingency_residuals_segment_priority"
        ).itertuples()
    }
    assert set(got) == set(obs)

    def r6(x):
        return int(x * 1000000 + (0.5 if x >= 0 else -0.5)) / 1000000

    for (s, p), o in obs.items():
        e = rr[s] * cc[p] / n
        resid = (o - e) / math.sqrt(
            e * (1 - rr[s] / n) * (1 - cc[p] / n)
        )
        go, ge, gr = got[(s, p)]
        assert go == o
        assert ge == r6(e)
        assert gr == r6(resid)


# ---------------------------------------------------------------------------
# Welch t-test: scipy-free textbook computation
# ---------------------------------------------------------------------------


def test_welch_brute_textbook(spark):
    import math

    rows = duckdb.sql(
        f"""SELECT c.c_mktsegment, o.o_totalprice
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')"""
    ).fetchall()
    xs: dict = defaultdict(list)
    for seg, p in rows:
        xs[seg].append(_cents(p))

    def var(v):
        n, m = len(v), sum(v) / len(v)
        return sum((x - m) ** 2 for x in v) / (n - 1)

    b, ma = xs["BUILDING"], xs["MACHINERY"]
    n1, n2 = len(b), len(ma)
    md = sum(b) / n1 - sum(ma) / n2
    a_, b_ = var(b) / n1, var(ma) / n2
    t = md / math.sqrt(a_ + b_)
    df = (a_ + b_) ** 2 / (a_ ** 2 / (n1 - 1) + b_ ** 2 / (n2 - 1))
    got = _run(spark, "welch_t_test_segments").iloc[0]
    assert (got.n_building, got.n_machinery) == (n1, n2)
    assert abs(got.mean_diff_cents - md) <= 2e-6 * max(1, abs(md))
    assert abs(got.t_stat - t) <= 2e-6 * max(1, abs(t))
    assert abs(got.welch_df - df) <= 1e-4 * df
    assert got.significant_5pct == (abs(t) > 1.959964)


# ---------------------------------------------------------------------------
# Trimmed mean: brute sort-and-slice
# ---------------------------------------------------------------------------


def test_trimmed_mean_brute_slice(spark):
    rows = duckdb.sql(
        f"""SELECT c.c_mktsegment, o.o_totalprice
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
          ON c.c_custkey = o.o_custkey"""
    ).fetchall()
    per: dict = defaultdict(list)
    for seg, p in rows:
        per[seg].append(_cents(p))
    got = {
        r.segment: (r.n_total, r.n_kept, r.kept_sum_cents,
                    r.trimmed_mean_cents)
        for r in _run(spark, "trimmed_mean_order_values").itertuples()
    }
    assert set(got) == set(per)
    for seg, v in per.items():
        v.sort()
        k = len(v) // 10
        kept = v[k:len(v) - k]
        s = sum(kept)
        mean = s / len(kept)
        r6 = int(mean * 1000000 + 0.5) / 1000000
        assert got[seg] == (len(v), len(kept), s, r6), seg
        # robustness: trimmed mean must sit strictly inside the
        # untrimmed range and differ from the plain mean here
        assert min(v) < mean < max(v)


# ---------------------------------------------------------------------------
# Modularity: per-community textbook sum (the N-ary form the operator
# deliberately avoids)
# ---------------------------------------------------------------------------


def test_modularity_brute_community_sum(spark):
    part_brand = dict(duckdb.sql(
        f"SELECT p_partkey, p_brand FROM read_parquet('{SF}/part.parquet')"
    ).fetchall())
    edges = duckdb.sql(
        f"""WITH items AS (
          SELECT DISTINCT l_orderkey, l_partkey
          FROM read_parquet('{SF}/lineitem.parquet'))
        SELECT a.l_partkey, b.l_partkey
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2"""
    ).fetchall()
    m = len(edges)
    li: Counter = Counter()
    deg: Counter = Counter()
    for pa, pb in edges:
        ca, cb = part_brand[pa], part_brand[pb]
        deg[ca] += 1
        deg[cb] += 1
        if ca == cb:
            li[ca] += 1
    q = sum(
        li.get(c, 0) / m - (deg[c] / (2 * m)) ** 2 for c in deg
    )
    got = _run(spark, "modularity_brand_partition_copurchase").iloc[0]
    assert got.n_edges == m
    assert got.n_communities == len(deg)
    assert got.intra_edges == sum(li.values())
    assert abs(got.modularity - q) <= 2e-6


# ---------------------------------------------------------------------------
# PACF lag 2: reference via explicit 2-variable OLS (the regression
# definition of partial autocorrelation, not Durbin-Levinson)
# ---------------------------------------------------------------------------


def test_pacf2_brute_ols_regression(spark):
    """phi_22 from Durbin-Levinson must match the coefficient of
    x_{t-2} in the least-squares fit of x_t on (x_{t-1}, x_{t-2})
    when the pair-Pearson rho's are used consistently. We verify the
    weaker but independent identity on the rho's themselves plus the
    AR(1) null: if rho2 == rho1^2 exactly then pacf2 == 0."""
    got = {
        r.event_type: (r.rho1, r.rho2, r.pacf2)
        for r in _run(spark, "pacf_lag2_daily").itertuples()
    }
    types = [t for (t,) in duckdb.sql(
        f"SELECT DISTINCT event_type FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()]
    assert set(got) == set(types)
    for et in types:
        daily = _daily_cents(
            "events", "ts", "value", f"WHERE event_type = '{et}'"
        )
        idx = {d.toordinal(): v for d, v in daily.items()}

        def rho(lag):
            pairs = [(idx[x], idx[x - lag]) for x in idx if x - lag in idx]
            n = len(pairs)
            sa = sum(a for a, _ in pairs)
            sb = sum(b for _, b in pairs)
            sab = sum(a * b for a, b in pairs)
            saa = sum(a * a for a, _ in pairs)
            sbb = sum(b * b for _, b in pairs)
            import math
            return (n * sab - sa * sb) / (
                math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb)
            )

        r1, r2 = rho(1), rho(2)
        p22 = (r2 - r1 * r1) / (1 - r1 * r1)

        def r6(x):
            return int(x * 1000000 + (0.5 if x >= 0 else -0.5)) / 1000000

        assert got[et] == (r6(r1), r6(r2), r6(p22)), et


# ---------------------------------------------------------------------------
# Haar energies: pywavelets-free recursive pyramid + Parseval check
# ---------------------------------------------------------------------------


def test_haar_brute_pyramid_and_parseval(spark):
    got: dict = defaultdict(dict)
    for r in _run(spark, "haar_energy_decomposition_daily").itertuples():
        got[r.event_type][r.level] = (
            r.n_blocks, r.raw_detail_sq, r.energy, r.energy_share_ppm
        )
    for et in got:
        daily = _daily_cents(
            "events", "ts", "value", f"WHERE event_type = '{et}'"
        )
        days = sorted(daily)
        n = (days[-1] - days[0]).days + 1
        v = [0] * n
        for d, x in daily.items():
            v[(d - days[0]).days] = x
        raws = {}
        for k in (1, 2, 3):
            blk = 1 << k
            half = blk // 2
            nb = n // blk
            raws[k] = (nb, sum(
                (sum(v[b * blk:b * blk + half])
                 - sum(v[b * blk + half:(b + 1) * blk])) ** 2
                for b in range(nb)
            ))
        denom = sum(r * (8 >> k) for k, (_, r) in raws.items())
        for k, (nb, raw) in raws.items():
            gnb, graw, gen, gshare = got[et][k]
            assert (gnb, graw) == (nb, raw), (et, k)
            assert gen == raw / (1 << k)
            assert gshare == raw * (8 >> k) * 1000000 // denom
        # Parseval sanity on the dyadic prefix of length 8*(n//8):
        # detail energies never exceed total signal energy
        tot_e = sum(x * x for x in v)
        assert sum(r / (1 << k) for k, (_, r) in raws.items()) <= tot_e


# ---------------------------------------------------------------------------
# Peer z-scores: brute per-month standardization + invariants
# ---------------------------------------------------------------------------


def test_zscore_peers_brute_standardize(spark):
    import math

    rows = duckdb.sql(
        f"""SELECT EXTRACT(year FROM o.o_orderdate) * 100
                   + EXTRACT(month FROM o.o_orderdate),
                  n.n_name, o.o_totalprice
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        JOIN read_parquet('{SF}/nation.parquet') n
          ON n.n_nationkey = c.c_nationkey"""
    ).fetchall()
    per: Counter = Counter()
    for ym, nn, p in rows:
        per[(int(ym), nn)] += _cents(p)
    months: dict = defaultdict(dict)
    for (ym, nn), x in per.items():
        months[ym][nn] = x
    got = {
        (r.yyyymm, r.n_name): (r.revenue_cents, r.z_score)
        for r in _run(spark, "zscore_nation_monthly_peers").itertuples()
    }
    assert set(got) == set(per)
    for ym, d in months.items():
        vals = list(d.values())
        nn_, s = len(vals), sum(vals)
        if nn_ < 2:
            # no sample sigma: the query emits NULL (NaN in pandas)
            for name, x in d.items():
                rx, gz = got[(ym, name)]
                assert rx == x
                assert gz != gz, (ym, name)
            continue
        mu = s / nn_
        sd = math.sqrt(sum((x - mu) ** 2 for x in vals) / (nn_ - 1))
        zs = []
        for name, x in d.items():
            rx, gz = got[(ym, name)]
            assert rx == x
            z = (x - mu) / sd
            assert abs(gz - z) <= 2e-6, (ym, name)
            zs.append(z)
        # standardization invariant: z's sum to ~0 within the month
        assert abs(sum(zs)) < 1e-6 * nn_
