"""Independent-reference checks for the round-14 operator batch
(registered in round 13, defer-window tagged) — the house "simulator
equality" pattern: plain-Python replays so a shared SQL-side
misconception cannot hide in both engines.
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
    return int(x * 100 + (0.5 if x >= 0 else -0.5))


def _sql(q: str):
    return duckdb.sql(q.replace("{SF}", SF)).fetchall()


def _day(ts) -> int:
    return (ts.date() - EPOCH.date()) // timedelta(days=1)


def _round_half_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _micro(x: float) -> float:
    return _round_half_away(x * 1000000) / 1000000


def _daily_dollars():
    d = defaultdict(int)
    for od, tp in _sql(
        "SELECT o_orderdate, o_totalprice FROM '{SF}/orders.parquet'"
    ):
        d[_day(od)] += _cents(tp)
    return {k: v / 100 for k, v in sorted(d.items())}


# ---------------------------------------------------------------------------
# Multimodal: generator-formula replays
# ---------------------------------------------------------------------------


def test_pgm_histogram_brute(spark):
    doc_ids = [
        r[0]
        for r in _sql(
            "SELECT doc_id FROM '{SF}/documents.parquet'"
            " WHERE doc_id < 120"
        )
    ]
    expect = {}
    for did in doc_ids:
        w, h = did % 16 + 4, did % 12 + 4
        counts = defaultdict(int)
        for i in range(w * h):
            counts[((did * 31 + i * 7) % 256) // 16] += 1
        for b, c in counts.items():
            expect[(did, b)] = c
    got = _run(spark, "multimodal_pgm_histogram")
    assert len(got) == len(expect)
    for r in got.itertuples():
        assert r.n_pixels == expect[(r.doc_id, r.bin)]
    # per-doc histograms must sum back to the raster size
    per_doc = defaultdict(int)
    for r in got.itertuples():
        per_doc[r.doc_id] += r.n_pixels
    for did in doc_ids:
        assert per_doc[did] == (did % 16 + 4) * (did % 12 + 4)


def test_wav_rms_brute(spark):
    doc_ids = [
        r[0]
        for r in _sql(
            "SELECT doc_id FROM '{SF}/documents.parquet'"
            " WHERE doc_id < 200"
        )
    ]
    got = _run(spark, "multimodal_wav_rms_energy")
    assert len(got) == len(doc_ids)
    for r in got.itertuples():
        did = r.doc_id
        ns = did % 200 + 50
        samples = [
            (did * 131 + i * 17) % 2048 - 1024 for i in range(ns)
        ]
        ss = sum(s * s for s in samples)
        zc = sum(
            1
            for i in range(ns - 1)
            if samples[i] * samples[i + 1] < 0
        )
        assert (r.n_samples, r.sum_sq, r.zero_crossings) == (ns, ss, zc)
        assert r.rms_milli == math.floor(
            math.sqrt(float(ss * 1000000) / ns)
        )


# ---------------------------------------------------------------------------
# KMV sketch: hashlib replay + accuracy contract
# ---------------------------------------------------------------------------


def test_kmv_brute(spark):
    keys = {
        r[0]
        for r in _sql(
            "SELECT DISTINCT l_orderkey FROM '{SF}/lineitem.parquet'"
        )
    }
    hashes = sorted(
        {
            int(hashlib.md5(str(k).encode()).hexdigest()[:10], 16)
            for k in keys
        }
    )
    k = min(256, len(hashes))
    hk = hashes[k - 1]
    est = (k - 1) * (1 << 40) // hk
    got = _run(spark, "sketch_kmv_distinct_orders").iloc[0]
    assert (got.k, got.kth_hash, got.est_distinct) == (k, hk, est)
    assert got.true_distinct == len(keys)
    assert got.err_ppm == abs(est - len(keys)) * 1000000 // len(keys)
    # accuracy contract: KMV with k=256 should land within ~5/sqrt(k)
    assert got.err_ppm < 320000


# ---------------------------------------------------------------------------
# SemDeDup: numpy int8-grid replay
# ---------------------------------------------------------------------------


def _ivf_cells(q):
    # the mutual_nn/semdedup/lof cell doctrine: nearest of
    # k = max(16, floor(sqrt(N))) prefix centroids, ties to lower cid
    k = max(16, math.isqrt(len(q)))
    cents = {cid: q[cid] for cid in q if cid < k}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    return {
        vid: min((d2(qv, cv), cid) for cid, cv in cents.items())[1]
        for vid, qv in q.items()
    }


def test_semdedup_brute(spark):
    rows = _sql(
        "SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    )
    arrs = {r[0]: [float(x) for x in r[1]] for r in rows}
    s = max(max(abs(x) for x in a) for a in arrs.values()) / 127.0
    q = {
        vid: [int(math.floor(x / s + 0.5)) for x in a]
        for vid, a in arrs.items()
    }
    cell = _ivf_cells(q)
    by_cell = defaultdict(list)
    for vid in q:
        by_cell[cell[vid]].append(vid)
    expect = {}
    for lab, vids in by_cell.items():
        vids = sorted(vids)
        for j, b in enumerate(vids):
            qb = q[b]
            nb = sum(x * x for x in qb)
            for a in vids[:j]:
                qa = q[a]
                na = sum(x * x for x in qa)
                dot = sum(x * y for x, y in zip(qa, qb))
                if dot > 0 and 400 * dot * dot >= 49 * na * nb:
                    expect[b] = (min(a, expect.get(b, (a, lab))[0]), lab)
    got = _run(spark, "semdedup_int8_cells")
    assert len(got) == len(expect) > 0
    for r in got.itertuples():
        ca, lab = expect[r.dup_id]
        assert (r.canonical_id, r.cell) == (ca, lab)


# ---------------------------------------------------------------------------
# Graph: PPR and HITS integer replays
# ---------------------------------------------------------------------------


def _copurchase_sym():
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
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                sup[(ps[i], ps[j])] += 1
    adj = defaultdict(set)
    for (a, b), c in sup.items():
        if c >= 2:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def test_ppr_brute(spark):
    adj = _copurchase_sym()
    seeds = {
        r[0]
        for r in _sql(
            "SELECT p_partkey FROM '{SF}/part.parquet'"
            " WHERE p_brand = 'Brand#11'"
        )
    } & set(adj)
    R0, TEL = 1_000_000_000, 1_000_000_000 * 3 // 20
    r = {v: (R0 if v in seeds else 0) for v in adj}
    for _ in range(5):
        nxt = {}
        for v in adj:
            contrib = sum(
                (r[u] * 17) // (20 * len(adj[u])) for u in adj[v]
            )
            nxt[v] = (TEL if v in seeds else 0) + contrib
        r = nxt
    expect = {v: x for v, x in r.items() if x > 0}
    got = _run(spark, "personalized_pagerank_copurchase")
    assert len(got) == len(expect) > 0
    for row in got.itertuples():
        assert expect[row.part] == row.rank_units
    # seeds hold teleport mass: every seed must appear
    assert seeds <= set(got.part)


def test_hits_brute(spark):
    edges = set(
        _sql(
            "SELECT DISTINCT o.o_custkey, l.l_partkey"
            " FROM '{SF}/orders.parquet' o"
            " JOIN '{SF}/lineitem.parquet' l"
            " ON l.l_orderkey = o.o_orderkey"
        )
    )
    by_c = defaultdict(set)
    by_p = defaultdict(set)
    for c, p in edges:
        by_c[c].add(p)
        by_p[p].add(c)
    a = {p: 1000000 for p in by_p}
    h = {}
    for _ in range(3):
        hu = {c: sum(a[p] for p in by_c[c]) for c in by_c}
        m = max(hu.values())
        h = {c: v * 1000000 // m for c, v in hu.items()}
        au = {p: sum(h[c] for c in by_p[p]) for p in by_p}
        m = max(au.values())
        a = {p: v * 1000000 // m for p, v in au.items()}
    got = _run(spark, "hits_hubs_authorities_purchases")
    hubs = got[got.kind == "hub"]
    auths = got[got.kind == "authority"]
    assert len(hubs) == len(h) and len(auths) == len(a)
    for r in hubs.itertuples():
        assert h[r.node] == r.score_micro
    for r in auths.itertuples():
        assert a[r.node] == r.score_micro


# ---------------------------------------------------------------------------
# Kalman and Holt-Winters: float recursion replays
# ---------------------------------------------------------------------------


def test_kalman_brute(spark):
    daily = _daily_dollars()
    expect = {}
    l = p = None
    for i, (d, x) in enumerate(daily.items()):
        if i == 0:
            l, p, k = x, 1.0, 0.0
        else:
            pp = p + 0.01
            k = pp / (pp + 1.0)
            l = l + k * (x - l)
            p = (1 - k) * pp
        expect[d] = (_micro(l), _micro(k), _micro(p))
    got = _run(spark, "kalman_local_level_daily")
    assert len(got) == len(expect)
    for r in got.itertuples():
        lv, kv, pv = expect[r.d]
        assert abs(r.level - lv) < 1e-9
        assert abs(r.gain - kv) < 1e-9
        assert abs(r.variance - pv) < 1e-9
    # gain trajectory converges to the steady state of the model
    gains = list(got.sort_values("d").gain)
    assert gains[0] == 0.0 and abs(gains[-1] - gains[-2]) < 1e-3


def test_holt_winters_brute(spark):
    monthly = defaultdict(int)
    for od, tp in _sql(
        "SELECT o_orderdate, o_totalprice FROM '{SF}/orders.parquet'"
    ):
        monthly[od.year * 100 + od.month] += _cents(tp)
    ms = sorted(monthly)
    xs = [monthly[m] / 100 for m in ms]
    assert len(xs) > 24
    rs = 0.0
    expect = {}
    l = b = None
    sl = []
    for i, x in enumerate(xs):
        rn = i + 1
        rs = x if rn == 1 else rs + x
        if rn < 12:
            continue
        if rn == 12:
            l = rs / 12.0
            b = 0.0
            sl = [v - l for v in xs[:12]]
            continue
        su = sl[0]
        f = l + b + su
        lp = 0.2 * (x - su) + 0.8 * (l + b)
        bp = 0.1 * (lp - l) + 0.9 * b
        snew = 0.3 * (x - lp) + 0.7 * su
        sl = sl[1:] + [snew]
        l, b = lp, bp
        expect[ms[i]] = (
            _micro(l),
            _micro(b),
            _micro(snew),
            _micro(f),
        )
    got = _run(spark, "holt_winters_additive_monthly")
    assert len(got) == len(expect)
    for r in got.itertuples():
        lv, bv, sv, fv = expect[r.yyyymm]
        assert abs(r.level - lv) < 1e-9
        assert abs(r.trend - bv) < 1e-9
        assert abs(r.seasonal - sv) < 1e-9
        assert abs(r.fitted - fv) < 1e-9


# ---------------------------------------------------------------------------
# Newsvendor: empirical-quantile + cost-optimality invariant
# ---------------------------------------------------------------------------


def test_newsvendor_brute(spark):
    part_brand = dict(
        _sql("SELECT p_partkey, p_brand FROM '{SF}/part.parquet'")
    )
    dem = defaultdict(int)
    for pk, ship, q in _sql(
        "SELECT l_partkey, l_shipdate, l_quantity"
        " FROM '{SF}/lineitem.parquet'"
    ):
        dem[(part_brand[pk], _day(ship))] += int(q + 0.5)
    by_brand = defaultdict(list)
    for (b, d), q in sorted(dem.items()):
        by_brand[b].append((q, d))
    got = _run(spark, "newsvendor_quantile_brands")
    assert len(got) == len(by_brand)
    for r in got.itertuples():
        xs = sorted(by_brand[r.p_brand])
        n = len(xs)
        qstar = xs[(3 * n + 3) // 4 - 1][0]
        assert (r.n_days, r.q_star) == (n, qstar)
        lo = sum(max(qstar - q, 0) for q, _ in xs)
        sh = sum(max(q - qstar, 0) for q, _ in xs)
        assert (r.total_leftover_units, r.total_shortage_units) == (
            lo,
            sh,
        )
        # newsvendor optimality: q* minimizes 1*leftover + 3*shortage
        # among all candidate stocking levels
        def cost(qq):
            return sum(max(qq - q, 0) + 3 * max(q - qq, 0) for q, _ in xs)

        best = min(cost(qq) for qq, _ in xs)
        assert cost(qstar) == best


# ---------------------------------------------------------------------------
# Binary segmentation: exhaustive argmax replay
# ---------------------------------------------------------------------------


def test_binseg_brute(spark):
    daily = _daily_dollars()
    xs = [(d, int(round(v * 100))) for d, v in sorted(daily.items())]
    # rebuild exact cents (dollars float came from exact cents/100)
    cents_by_day = defaultdict(int)
    for od, tp in _sql(
        "SELECT o_orderdate, o_totalprice FROM '{SF}/orders.parquet'"
    ):
        cents_by_day[_day(od)] += _cents(tp)
    xs = sorted(cents_by_day.items())

    def split(seg):
        # seg: list of (day, x); returns (cp_day, floor(score/n_seg))
        n = len(seg)
        t = sum(x for _, x in seg)
        best = None
        pf = 0
        for k in range(1, n):
            pf += seg[k - 1][1]
            sc = abs(n * pf - k * t)
            if best is None or sc > best[0]:
                best = (sc, k)
        sc, k = best
        return seg[k - 1][0], sc // n, k

    cp1, s1, k1 = split(xs)
    cp2, s2, _ = split(xs[:k1])
    cp3, s3, _ = split(xs[k1:])
    got = _run(spark, "binseg_changepoints_daily")
    assert len(got) == 3
    r1, r2, r3 = [got[got.level == i].iloc[0] for i in (1, 2, 3)]
    assert (r1.cp_day, r1.score_cents) == (cp1, s1)
    assert (r1.start_day, r1.end_day) == (xs[0][0], xs[-1][0])
    assert (r2.cp_day, r2.score_cents) == (cp2, s2)
    assert (r2.start_day, r2.end_day) == (xs[0][0], cp1)
    assert (r3.cp_day, r3.score_cents) == (cp3, s3)
    assert (r3.start_day, r3.end_day) == (cp1, xs[-1][0])


# ---------------------------------------------------------------------------
# Hilbert layout: python xy2d replay + curve-adjacency proof
# ---------------------------------------------------------------------------


def _xy2d(order, x, y):
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_brute(spark):
    rows = _sql(
        "SELECT event_id, user_id, dayofyear(ts)"
        " FROM '{SF}/events.parquet'"
    )
    expect = {
        eid: _xy2d(256, uid & 255, doy & 255) for eid, uid, doy in rows
    }
    got = _run(spark, "layout_hilbert_events")
    assert len(got) == len(expect)
    for r in got.itertuples():
        assert r.hval == expect[r.event_id]
    # Hilbert-ness: the full 256x256 traversal is a bijection whose
    # consecutive cells are grid-adjacent (|dx|+|dy| == 1) — the
    # locality property Z-order lacks at quadrant seams.
    order = 16  # 16x16 sub-proof of the same step recurrence
    cells = {}
    for x in range(order):
        for y in range(order):
            cells[_xy2d(order, x, y)] = (x, y)
    assert len(cells) == order * order
    for d in range(order * order - 1):
        x0, y0 = cells[d]
        x1, y1 = cells[d + 1]
        assert abs(x1 - x0) + abs(y1 - y0) == 1


# ---------------------------------------------------------------------------
# Absorbing Markov chain: Fraction-exact linear solve
# ---------------------------------------------------------------------------


def test_absorbing_markov_brute(spark):
    from fractions import Fraction

    rows = _sql(
        "SELECT user_id, ts, event_id, event_type"
        " FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id"
    )
    by_user = defaultdict(list)
    for u, ts, eid, et in rows:
        by_user[u].append(et)
    states = ["click", "error", "signup", "view"]
    idx = {s: i for i, s in enumerate(states)}
    c = [[0] * 4 for _ in range(4)]
    cp = [0] * 4
    r = [0] * 4
    for seq in by_user.values():
        for a, b in zip(seq, seq[1:]):
            if a == "purchase":
                continue
            i = idx[a]
            r[i] += 1
            if b == "purchase":
                cp[i] += 1
            else:
                c[i][idx[b]] += 1
    # solve (I - Q) t = 1 and (I - Q) p = R with exact Fractions
    def solve(rhs):
        m = [
            [
                Fraction(
                    (r[i] if i == j else 0) - c[i][j], r[i]
                )
                for j in range(4)
            ]
            for i in range(4)
        ]
        v = [Fraction(rhs[i], r[i]) for i in range(4)]
        for col in range(4):
            piv = next(
                i for i in range(col, 4) if m[i][col] != 0
            )
            m[col], m[piv] = m[piv], m[col]
            v[col], v[piv] = v[piv], v[col]
            inv = 1 / m[col][col]
            m[col] = [x * inv for x in m[col]]
            v[col] *= inv
            for i in range(4):
                if i != col and m[i][col] != 0:
                    f = m[i][col]
                    m[i] = [a - f * b for a, b in zip(m[i], m[col])]
                    v[i] -= f * v[col]
        return v

    t = solve(r)  # (I-Q)t = 1  after row-clearing by r_i
    p = solve(cp)
    got = _run(spark, "absorbing_markov_sessions")
    for row in got.itertuples():
        i = idx[row.state]
        assert row.n_out == r[i]
        assert row.expected_steps_micro == (
            t[i].numerator * 1000000
        ) // t[i].denominator
        assert row.absorb_prob_ppm == (
            p[i].numerator * 1000000
        ) // p[i].denominator
        assert 0 <= row.absorb_prob_ppm <= 1000000
        assert row.expected_steps_micro >= 1000000


# ---------------------------------------------------------------------------
# Fellegi-Sunter: Fraction-exact weight table replay
# ---------------------------------------------------------------------------


def test_fellegi_sunter_brute(spark):
    from fractions import Fraction

    docs = _sql(
        "SELECT doc_id, source, lang, n_chars, text"
        " FROM '{SF}/documents.parquet'"
    )
    recs = []
    for did, src, lang, nc, text in docs:
        toks = [w for w in __import__("re").split(r"\s+", text) if w]
        h1 = hashlib.md5(text.encode()).hexdigest()[0]
        recs.append((did, src, lang, nc, len(toks), h1))
    params = [
        (Fraction(9, 10), Fraction(1, 20)),
        (Fraction(8, 10), Fraction(1, 100)),
        (Fraction(95, 100), Fraction(1, 10)),
        (Fraction(99, 100), Fraction(1, 16)),
    ]
    pat_counts = defaultdict(int)
    for i in range(len(recs)):
        for j in range(i + 1, len(recs)):
            a, b = recs[i], recs[j]
            if a[0] > b[0]:
                a, b = b, a
            if a[2] != b[2] or a[3] // 50 != b[3] // 50:
                continue
            flags = (
                1 if a[1] == b[1] else 0,
                1 if a[3] == b[3] else 0,
                1 if a[4] // 10 == b[4] // 10 else 0,
                1 if a[5] == b[5] else 0,
            )
            pat_counts[flags] += 1
    got = _run(spark, "fellegi_sunter_weight_table")
    assert len(got) == len(pat_counts)
    for r in got.itertuples():
        flags = (r.f_source, r.f_nchars, r.f_tokband, r.f_md5char)
        assert r.n_pairs == pat_counts[flags]
        w = Fraction(1)
        for f, (m, u) in zip(flags, params):
            w *= (m / u) if f else ((1 - m) / (1 - u))
        assert r.weight_milli == (w.numerator * 1000) // w.denominator
        if w >= 100:
            assert r.decision == "match"
        elif w >= 1:
            assert r.decision == "possible"
        else:
            assert r.decision == "nonmatch"
    # monotonicity: full agreement outranks every other pattern
    top = got.iloc[0]
    assert (
        top.f_source,
        top.f_nchars,
        top.f_tokband,
        top.f_md5char,
    ) == (1, 1, 1, 1) or (1, 1, 1, 1) not in pat_counts


# ---------------------------------------------------------------------------
# ANOVA F + Brown-Forsythe: moment replays with the milli-floor grid
# ---------------------------------------------------------------------------


def _anova_f_milli(groups):
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    s = sum(sum(v) for v in groups.values())
    q = sum(sum(x * x for x in v) for v in groups.values())
    ssov = sum(sum(v) ** 2 * 1000 // len(v) for v in groups.values())
    ssb = ssov - s * s * 1000 // n
    ssw = q * 1000 - ssov
    return n, k, ssb, ssw


def test_anova_f_brute(spark):
    groups = defaultdict(list)
    for g, tp in _sql(
        "SELECT o_orderpriority, o_totalprice FROM '{SF}/orders.parquet'"
    ):
        groups[g].append(_cents(tp))
    n, k, ssb, ssw = _anova_f_milli(groups)
    got = _run(spark, "anova_f_priorities").iloc[0]
    assert (got.n, got.k) == (n, k)
    assert got.f_micro == ssb * (n - k) * 1000000 // (ssw * (k - 1))
    assert got.eta_sq_ppm == ssb * 1000000 // (ssb + ssw)


def test_brown_forsythe_brute(spark):
    vals = defaultdict(list)
    for g, ok, tp in _sql(
        "SELECT o_orderpriority, o_orderkey, o_totalprice"
        " FROM '{SF}/orders.parquet'"
    ):
        vals[g].append((_cents(tp), ok))
    groups = {}
    for g, xs in vals.items():
        xs = sorted(xs)
        med = xs[(len(xs) + 1) // 2 - 1][0]
        groups[g] = [abs(x - med) for x, _ in xs]
    n, k, ssb, ssw = _anova_f_milli(groups)
    got = _run(spark, "brown_forsythe_priorities").iloc[0]
    assert (got.n, got.k) == (n, k)
    assert got.bf_w_micro == ssb * (n - k) * 1000000 // (ssw * (k - 1))


# ---------------------------------------------------------------------------
# Decision stump: exhaustive split scan
# ---------------------------------------------------------------------------


def test_decision_stump_brute(spark):
    orders = dict(
        _sql(
            "SELECT o_orderkey, o_totalprice FROM '{SF}/orders.parquet'"
        )
    )
    flags = defaultdict(int)
    for ok, rf in _sql(
        "SELECT l_orderkey, l_returnflag FROM '{SF}/lineitem.parquet'"
    ):
        if rf == "R":
            flags[ok] = 1
    with_lines = {
        ok
        for (ok,) in _sql(
            "SELECT DISTINCT l_orderkey FROM '{SF}/lineitem.parquet'"
        )
    }
    pts = defaultdict(lambda: [0, 0])
    for ok, tp in orders.items():
        if ok not in with_lines:  # the operator's inner join drops
            continue              # line-less orders (synthetic data)
        x = _cents(tp)
        pts[x][0] += 1
        pts[x][1] += flags.get(ok, 0)
    xs = sorted(pts)
    n = sum(c for c, _ in pts.values())
    p = sum(q for _, q in pts.values())
    best = None
    nl = pl = 0
    for x in xs:
        nl += pts[x][0]
        pl += pts[x][1]
        if nl >= n:
            break
        nr, pr = n - nl, p - pl
        obj = (nl * nl - 2 * pl * (nl - pl)) * 1000 // nl + (
            nr * nr - 2 * pr * (nr - pr)
        ) * 1000 // nr
        if best is None or obj > best[0] or (obj == best[0] and x < best[1]):
            if best is None or obj > best[0]:
                best = (obj, x, nl, pl, nr, pr)
    got = _run(spark, "decision_stump_returns").iloc[0]
    _, x, nl, pl, nr, pr = best
    assert got.split_value_cents == x
    assert (got.n_left, got.pos_left, got.n_right, got.pos_right) == (
        nl,
        pl,
        nr,
        pr,
    )
    assert got.gini_left_ppm == 2 * pl * (nl - pl) * 1000000 // (nl * nl)
    assert got.gini_right_ppm == 2 * pr * (nr - pr) * 1000000 // (
        nr * nr
    )
    assert got.gini_root_ppm == 2 * p * (n - p) * 1000000 // (n * n)
    # a useful split never exceeds the root impurity on either side's
    # weighted average
    wavg = (nl * got.gini_left_ppm + nr * got.gini_right_ppm) // n
    assert wavg <= got.gini_root_ppm


# ---------------------------------------------------------------------------
# Rolling Sharpe: window replay
# ---------------------------------------------------------------------------


def test_rolling_sharpe_brute(spark):
    cents_by_day = defaultdict(int)
    for od, tp in _sql(
        "SELECT o_orderdate, o_totalprice FROM '{SF}/orders.parquet'"
    ):
        cents_by_day[_day(od)] += _cents(tp)
    days = sorted(cents_by_day)
    rets = {
        days[i]: cents_by_day[days[i]] - cents_by_day[days[i - 1]]
        for i in range(1, len(days))
    }
    got = _run(spark, "rolling_sharpe_14d_daily")
    assert len(got) == len(rets)
    for r in got.itertuples():
        win = [rets[dd] for dd in rets if r.d - 13 <= dd <= r.d]
        s, q, n = sum(win), sum(x * x for x in win), len(win)
        comp = n * q - s * s
        assert r.return_cents == rets[r.d]
        if comp > 0:
            expect = math.floor(
                float(s) * 1000 / math.sqrt(float(comp))
            )
            assert r.sharpe_milli == expect


# ---------------------------------------------------------------------------
# Granger causality: fixed-tree replay + numpy OLS cross-check
# ---------------------------------------------------------------------------


def test_granger_brute(spark):
    cents_by_day = defaultdict(int)
    cnt_by_day = defaultdict(int)
    for od, tp in _sql(
        "SELECT o_orderdate, o_totalprice FROM '{SF}/orders.parquet'"
    ):
        cents_by_day[_day(od)] += _cents(tp)
        cnt_by_day[_day(od)] += 1
    days = sorted(cents_by_day)
    rows = [
        (
            float(cents_by_day[days[i]]),
            float(cents_by_day[days[i - 1]]),
            float(cnt_by_day[days[i - 1]]),
        )
        for i in range(1, len(days))
    ]
    # exact moments then the identical double tree
    yi = [cents_by_day[days[i]] for i in range(1, len(days))]
    yli = [cents_by_day[days[i - 1]] for i in range(1, len(days))]
    xli = [cnt_by_day[days[i - 1]] for i in range(1, len(days))]
    n = len(yi)
    dn = float(n)
    dsy, dsyl, dsxl = (
        float(sum(yi)),
        float(sum(yli)),
        float(sum(xli)),
    )
    dsyy = float(sum(a * a for a in yi))
    dsylyl = float(sum(a * a for a in yli))
    dsxlxl = float(sum(a * a for a in xli))
    dsyyl = float(sum(a * b for a, b in zip(yi, yli)))
    dsyxl = float(sum(a * b for a, b in zip(yi, xli)))
    dsylxl = float(sum(a * b for a, b in zip(yli, xli)))
    det3 = (
        dn * (dsylyl * dsxlxl - dsylxl * dsylxl)
        - dsyl * (dsyl * dsxlxl - dsylxl * dsxl)
        + dsxl * (dsyl * dsylxl - dsylyl * dsxl)
    )
    deta = (
        dsy * (dsylyl * dsxlxl - dsylxl * dsylxl)
        - dsyl * (dsyyl * dsxlxl - dsylxl * dsyxl)
        + dsxl * (dsyyl * dsylxl - dsylyl * dsyxl)
    )
    detb = (
        dn * (dsyyl * dsxlxl - dsylxl * dsyxl)
        - dsy * (dsyl * dsxlxl - dsylxl * dsxl)
        + dsxl * (dsyl * dsyxl - dsyyl * dsxl)
    )
    detc = (
        dn * (dsylyl * dsyxl - dsyyl * dsylxl)
        - dsyl * (dsyl * dsyxl - dsyyl * dsxl)
        + dsy * (dsyl * dsylxl - dsylyl * dsxl)
    )
    det2 = dn * dsylyl - dsyl * dsyl
    ca, cb, cc = deta / det3, detb / det3, detc / det3
    car = (dsy * dsylyl - dsyl * dsyyl) / det2
    cbr = (dn * dsyyl - dsyl * dsy) / det2
    ssr_u = dsyy - (ca * dsy + cb * dsyyl + cc * dsyxl)
    ssr_r = dsyy - (car * dsy + cbr * dsyyl)
    f = (ssr_r - ssr_u) * (dn - 3.0) / ssr_u
    got = _run(spark, "granger_causality_daily").iloc[0]
    assert got.n == n
    assert abs(got.coef_y_lag - _micro(cb)) < 1e-9
    assert abs(got.coef_x_lag - _micro(cc)) < 1e-9
    assert abs(got.f_stat - _micro(f)) < 1e-9
    # independent check: numpy least squares agrees to float precision
    import numpy as np

    X = np.array([[1.0, b, c] for _, b, c in rows])
    yv = np.array([a for a, _, _ in rows])
    beta, res, _, _ = np.linalg.lstsq(X, yv, rcond=None)
    assert abs(beta[1] - cb) < 1e-6 * max(1.0, abs(cb))
    assert abs(beta[2] - cc) < 1e-6 * max(1.0, abs(cc))
    ssr_np = float(((X @ beta - yv) ** 2).sum())
    assert abs(ssr_np - ssr_u) <= 1e-6 * ssr_u
    assert f >= 0 or abs(f) < 1e-6


# ---------------------------------------------------------------------------
# Hampel filter: centered-window replay
# ---------------------------------------------------------------------------


def _median(vals):
    vals = sorted(vals)
    n = len(vals)
    if n % 2 == 1:
        return float(vals[n // 2])
    return vals[n // 2 - 1] + (vals[n // 2] - vals[n // 2 - 1]) * 0.5


def test_hampel_brute(spark):
    cents_by_day = defaultdict(int)
    for od, tp in _sql(
        "SELECT o_orderdate, o_totalprice FROM '{SF}/orders.parquet'"
    ):
        cents_by_day[_day(od)] += _cents(tp)
    days = sorted(cents_by_day)
    got = _run(spark, "hampel_filter_daily")
    assert len(got) == len(days)
    n_out = 0
    for r in got.itertuples():
        win = [
            cents_by_day[dd]
            for dd in days
            if r.d - 3 <= dd <= r.d + 3
        ]
        med = _median(win)
        mad = _median([abs(float(x) - med) for x in win])
        flag = abs(float(r.value_cents) - med) * 10000 > 44478.0 * mad
        assert abs(r.window_median - _micro(med)) < 1e-9
        assert abs(r.window_mad - _micro(mad)) < 1e-9
        assert r.is_outlier == (1 if flag else 0)
        assert r.filtered_cents == (
            _round_half_away(med) if flag else r.value_cents
        )
        n_out += r.is_outlier
    # the filter must actually fire somewhere but not everywhere
    assert 0 < n_out < len(days)


# ---------------------------------------------------------------------------
# Isotonic regression: minimax replay + true-PAVA cross-check
# ---------------------------------------------------------------------------


def test_isotonic_brute(spark):
    orders = dict(
        _sql(
            "SELECT o_orderkey, o_totalprice FROM '{SF}/orders.parquet'"
        )
    )
    with_lines = {
        ok
        for (ok,) in _sql(
            "SELECT DISTINCT l_orderkey FROM '{SF}/lineitem.parquet'"
        )
    }
    returned = {
        ok
        for (ok,) in _sql(
            "SELECT DISTINCT l_orderkey FROM '{SF}/lineitem.parquet'"
            " WHERE l_returnflag = 'R'"
        )
    }
    rows = sorted(
        (_cents(tp), ok, 1 if ok in returned else 0)
        for ok, tp in orders.items()
        if ok in with_lines
    )
    n = len(rows)
    buckets = defaultdict(lambda: [0, 0])
    for r0, (_, _, y) in enumerate(rows):
        b = (r0 * 20) // n + 1
        buckets[b][0] += 1
        buckets[b][1] += y
    bs = sorted(buckets)
    nb = [buckets[b][0] for b in bs]
    pb = [buckets[b][1] for b in bs]
    m = len(bs)
    # minimax on the milli grid (the operator's defined statistic)
    avg = {}
    for j in range(m):
        sn = sp = 0
        for k in range(j, m):
            sn += nb[k]
            sp += pb[k]
            avg[(j, k)] = sp * 1000 // sn
    iso = []
    for i in range(m):
        best = None
        for j in range(i + 1):
            mn = min(avg[(j, k)] for k in range(i, m))
            best = mn if best is None else max(best, mn)
        iso.append(best)
    got = _run(spark, "isotonic_return_rate_by_price")
    assert len(got) == m
    for r in got.itertuples():
        idx = r.bucket - 1
        assert (r.n_orders, r.n_returned) == (nb[idx], pb[idx])
        assert r.raw_rate_milli == pb[idx] * 1000 // nb[idx]
        assert r.iso_rate_milli == iso[idx]
    # monotone by construction
    assert all(a <= b for a, b in zip(iso, iso[1:]))
    # true PAVA (exact fractions) agrees within the 1-milli floor grid
    pools = [[nb[i], pb[i]] for i in range(m)]
    idxs = list(range(m))
    stack = []
    for w, s in pools:
        stack.append([w, s])
        while len(stack) > 1 and (
            stack[-2][1] * stack[-1][0] > stack[-1][1] * stack[-2][0]
        ):
            w2, s2 = stack.pop()
            stack[-1][0] += w2
            stack[-1][1] += s2
    # expand pooled values back to bucket grain by pooled widths
    fit = []
    start = 0
    for w, s in stack:
        cnt = 0
        acc = 0
        while acc < w:
            acc += nb[start + cnt]
            cnt += 1
        fit.extend([s / w] * cnt)
        start += cnt
    assert len(fit) == m
    for i in range(m):
        assert abs(fit[i] * 1000 - iso[i]) <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# Burst Viterbi: exact-integer DP replay
# ---------------------------------------------------------------------------


def test_burst_viterbi_brute(spark):
    counts = defaultdict(int)
    for (ts,) in _sql("SELECT ts FROM '{SF}/events.parquet'"):
        counts[_day(ts)] += 1
    days = sorted(counts)
    xs = [counts[d] for d in days]

    def qdisc(vals, frac):
        # discrete quantile: smallest element with cum weight >= frac
        sv = sorted(vals)
        import math as _m

        idx = _m.ceil(frac * len(sv)) - 1
        return sv[max(idx, 0)]

    l0, l1, pen = qdisc(xs, 0.25), qdisc(xs, 0.75), qdisc(xs, 0.5)
    c0 = abs(xs[0] - l0)
    c1 = abs(xs[0] - l1)
    p0, p1 = [0], [1]
    for x in xs[1:]:
        stay0 = c0 <= c1 + pen
        stay1 = c1 <= c0 + pen
        b00 = c0 if stay0 else c1 + pen
        b11 = c1 if stay1 else c0 + pen
        np0 = (p0 if stay0 else p1) + [0]
        np1 = (p1 if stay1 else p0) + [1]
        c0, c1 = abs(x - l0) + b00, abs(x - l1) + b11
        p0, p1 = np0, np1
    path = p0 if c0 <= c1 else p1
    got = _run(spark, "burst_viterbi_daily")
    assert len(got) == len(days)
    for r in got.itertuples():
        assert r.burst_state == path[days.index(r.d)]
        assert r.n_events == counts[r.d]
    # semantic: burst days (if any) average more events than baseline
    burst = [counts[d] for d, s in zip(days, path) if s == 1]
    base = [counts[d] for d, s in zip(days, path) if s == 0]
    if burst and base:
        assert sum(burst) / len(burst) > sum(base) / len(base)


# ---------------------------------------------------------------------------
# LOF: full python replay on the int8 grid
# ---------------------------------------------------------------------------


def test_lof_brute(spark):
    rows = _sql(
        "SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    )
    arrs = {r[0]: [float(x) for x in r[1]] for r in rows}
    s = max(max(abs(x) for x in a) for a in arrs.values()) / 127.0
    q = {
        vid: [int(math.floor(x / s + 0.5)) for x in a]
        for vid, a in arrs.items()
    }
    cell = _ivf_cells(q)
    cells = defaultdict(list)
    for vid in q:
        cells[cell[vid]].append(vid)

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    knn = {}
    for lab, vids in cells.items():
        for i in vids:
            ds = sorted(
                (d2(q[i], q[j]), j) for j in vids if j != i
            )[:5]
            knn[i] = ds
    kdist = {i: ds[-1][0] for i, ds in knn.items()}
    cnt = {i: len(ds) for i, ds in knn.items()}
    r = {
        i: sum(max(d, kdist[j]) for d, j in ds)
        for i, ds in knn.items()
    }
    lof = {}
    for i, ds in knn.items():
        terms = [
            cnt[j] * r[i] * 1000 // (r[j] * cnt[i])
            for _, j in ds
            if r[j] > 0
        ]
        lof[i] = sum(terms) // cnt[i]
    top = sorted(lof.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = _run(spark, "lof_outliers_int8_cells")
    assert len(got) == len(top)
    for row, (vid, score) in zip(got.itertuples(), top):
        assert (row.vec_id, row.lof_milli) == (vid, score)
        assert row.cell == cell[vid]
        assert row.n_neighbors == cnt[vid]
    # LOF semantics: the flagged set scores above the typical point
    med = sorted(lof.values())[len(lof) // 2]
    assert top[0][1] > med


# ---------------------------------------------------------------------------
# Competing risks: per-user outcome replay
# ---------------------------------------------------------------------------


def test_competing_risks_brute(spark):
    users = defaultdict(list)
    for uid, ts, et in _sql(
        "SELECT user_id, ts, event_type FROM '{SF}/events.parquet'"
    ):
        users[uid].append((ts, et))
    per_bucket = defaultdict(lambda: [0, 0, 0])
    for uid, evs in users.items():
        first = min(t for t, _ in evs)
        last = max(t for t, _ in evs)
        ta = min((t for t, e in evs if e == "purchase"), default=None)
        tb = min((t for t, e in evs if e == "error"), default=None)
        if ta is not None and (tb is None or ta <= tb):
            bucket, cause = (ta.date() - first.date()).days, 0
        elif tb is not None:
            bucket, cause = (tb.date() - first.date()).days, 1
        else:
            bucket, cause = (last.date() - first.date()).days, 2
        per_bucket[bucket][cause] += 1
    got = _run(spark, "competing_risks_daily_events")
    assert len(got) == len(per_bucket)
    total = sum(sum(v) for v in per_bucket.values())
    for r in got.itertuples():
        ea, eb, cz = per_bucket[r.bucket]
        n_risk = sum(
            sum(v) for b, v in per_bucket.items() if b >= r.bucket
        )
        assert (r.ev_purchase, r.ev_error, r.censored) == (ea, eb, cz)
        assert r.n_risk == n_risk
        assert r.hazard_purchase_ppm == ea * 1000000 // n_risk
        assert r.hazard_error_ppm == eb * 1000000 // n_risk
    # risk set at bucket 0 covers everyone
    assert got[got.bucket == got.bucket.min()].iloc[0].n_risk == total


# ---------------------------------------------------------------------------
# Median polish: full sweep replay + exact reconstruction identity
# ---------------------------------------------------------------------------


def test_median_polish_brute(spark):
    cell = defaultdict(int)
    cust_nation = dict(
        _sql("SELECT c_custkey, c_nationkey FROM '{SF}/customer.parquet'")
    )
    nations = dict(
        _sql("SELECT n_nationkey, n_name FROM '{SF}/nation.parquet'")
    )
    for ck, od, tp in _sql(
        "SELECT o_custkey, o_orderdate, o_totalprice"
        " FROM '{SF}/orders.parquet'"
    ):
        rn = nations[cust_nation[ck]]
        cm = od.year * 100 + od.month
        cell[(rn, cm)] += _cents(tp)

    def lower_median(pairs):
        # pairs: list of (value, tiebreak)
        pairs = sorted(pairs)
        return pairs[(len(pairs) + 1) // 2 - 1][0]

    r = dict(cell)
    re = defaultdict(int)
    ce = defaultdict(int)
    for sweep in range(4):
        if sweep % 2 == 0:  # rows
            for rn in {k[0] for k in r}:
                m = lower_median(
                    [(v, k[1]) for k, v in r.items() if k[0] == rn]
                )
                re[rn] += m
                for k in list(r):
                    if k[0] == rn:
                        r[k] -= m
        else:  # columns
            for cm in {k[1] for k in r}:
                m = lower_median(
                    [(v, k[0]) for k, v in r.items() if k[1] == cm]
                )
                ce[cm] += m
                for k in list(r):
                    if k[1] == cm:
                        r[k] -= m
    got = _run(spark, "median_polish_nation_month")
    assert len(got) == len(cell)
    for row in got.itertuples():
        k = (row.n_name, row.yyyymm)
        assert row.rev_cents == cell[k]
        assert row.row_effect_cents == re[row.n_name]
        assert row.col_effect_cents == ce[row.yyyymm]
        assert row.residual_cents == r[k]
        # exact reconstruction
        assert (
            row.row_effect_cents
            + row.col_effect_cents
            + row.residual_cents
            == row.rev_cents
        )


# ---------------------------------------------------------------------------
# Wasserstein: trapezoid-free exact area replay
# ---------------------------------------------------------------------------


def test_wasserstein_brute(spark):
    rows = _sql(
        "SELECT n_chars, source FROM '{SF}/documents.parquet'"
        " WHERE source IN ('src0', 'src1')"
    )
    pts = defaultdict(lambda: [0, 0])
    for v, src in rows:
        pts[v][0 if src == "src0" else 1] += 1
    n1 = sum(c[0] for c in pts.values())
    n2 = sum(c[1] for c in pts.values())
    vs = sorted(pts)
    f1 = f2 = 0
    area = 0
    for i, v in enumerate(vs[:-1]):
        f1 += pts[v][0]
        f2 += pts[v][1]
        area += abs(f1 * n2 - f2 * n1) * (vs[i + 1] - v)
    got = _run(spark, "wasserstein_distance_sources").iloc[0]
    assert (got.n1, got.n2) == (n1, n2)
    assert got.w1_micro == area * 1000000 // (n1 * n2)
    # scipy-style sanity: W1 equals mean |sorted quantile gap| when
    # n1 == n2 — check the metric is in a sane range instead (bounded
    # by the value span)
    assert 0 <= got.w1_micro <= (vs[-1] - vs[0]) * 1000000


# ---------------------------------------------------------------------------
# Chow test: fixed-tree replay
# ---------------------------------------------------------------------------


def test_chow_brute(spark):
    cents_by_day = defaultdict(int)
    for od, tp in _sql(
        "SELECT o_orderdate, o_totalprice FROM '{SF}/orders.parquet'"
    ):
        cents_by_day[_day(od)] += _cents(tp)
    days = sorted(cents_by_day)
    import math as _m

    bd = days[_m.ceil(0.5 * len(days)) - 1]

    def ssr(sub):
        n = float(len(sub))
        sx = float(sum(d for d, _ in sub))
        sy = float(sum(y for _, y in sub))
        sxx = float(sum(d * d for d, _ in sub))
        sxy = float(sum(d * y for d, y in sub))
        syy = float(sum(y * y for _, y in sub))
        return (syy - (sy * sy) / n) - (sxy - (sx * sy) / n) * (
            sxy - (sx * sy) / n
        ) / (sxx - (sx * sx) / n)

    h1 = [(d, cents_by_day[d]) for d in days if d <= bd]
    h2 = [(d, cents_by_day[d]) for d in days if d > bd]
    s1, s2, sp = ssr(h1), ssr(h2), ssr(h1 + h2)
    n = float(len(days))
    f = (sp - s1 - s2) * (n - 4.0) / ((s1 + s2) * 2.0)
    got = _run(spark, "chow_test_midpoint_daily").iloc[0]
    assert (got.n1, got.n2, got.break_day) == (len(h1), len(h2), bd)
    assert abs(got.f_stat - _micro(f)) < 1e-9


# ---------------------------------------------------------------------------
# GE(2) inequality decomposition: moment replay + additivity + ANOVA tie
# ---------------------------------------------------------------------------


def test_ge2_brute(spark):
    cust_nation = dict(
        _sql("SELECT c_custkey, c_nationkey FROM '{SF}/customer.parquet'")
    )
    nations = dict(
        _sql("SELECT n_nationkey, n_name FROM '{SF}/nation.parquet'")
    )
    groups = defaultdict(list)
    for ck, tp in _sql(
        "SELECT o_custkey, o_totalprice FROM '{SF}/orders.parquet'"
    ):
        groups[nations[cust_nation[ck]]].append(_cents(tp))
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    q = sum(sum(x * x for x in v) for v in groups.values())
    ssov_milli = sum(
        sum(v) ** 2 * 1000 // len(v) for v in groups.values()
    )
    total = (n * q - s * s) * 1000000 // (2 * s * s)
    between = (n * ssov_milli - s * s * 1000) * 1000000 // (
        2 * s * s * 1000
    )
    got = _run(spark, "ge2_inequality_decomposition_nations").iloc[0]
    assert (got.n, got.total_cents) == (n, s)
    assert got.ge2_total_micro == total
    assert got.ge2_between_micro == between
    assert got.ge2_within_micro == total - between
    # sanity: between <= total (decomposition non-negativity) and the
    # index equals half the squared CV on the micro grid
    assert 0 <= between <= total
    mean = s / n
    var = q / n - mean * mean
    cv2_half = var / (2 * mean * mean)
    assert abs(total / 1e6 - cv2_half) < 1e-4
