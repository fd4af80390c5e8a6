"""Independent-reference checks for the operators registered IN round
14 (they land in the round-14/15 driver windows together with the
late-r13 batch) — plain-Python replays per the house simulator-
equality pattern, so a shared SQL-side misconception cannot hide in
both engines.
"""

from __future__ import annotations

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


def _daily_cents() -> dict[int, int]:
    d = defaultdict(int)
    for od, tp in _sql(
        "SELECT o_orderdate, o_totalprice FROM '{SF}/orders.parquet'"
    ):
        d[_day(od)] += _cents(tp)
    return dict(sorted(d.items()))


# ---------------------------------------------------------------------------
# Daily-series operators
# ---------------------------------------------------------------------------


def test_grubbs_brute(spark):
    daily = _daily_cents()
    xs = list(daily.items())
    n, s = len(xs), sum(v for _, v in xs)
    ys = [(x, n * v - s) for x, v in xs]
    ssq = sum(y * y for _, y in ys)
    x0, y0 = min(ys, key=lambda p: (-abs(p[1]), p[0]))
    got = _run(spark, "grubbs_outlier_daily").iloc[0]
    assert (got.outlier_x, got.n, got.dev_n) == (x0, n, abs(y0))
    assert got.g2_ppm == (n - 1) * y0 * y0 * 1000000 // ssq
    # G^2 is bounded by (n-1)^2/n * 1e6 (one-point-takes-all limit)
    assert got.g2_ppm <= (n - 1) * (n - 1) * 1000000 // n


def test_cox_stuart_brute(spark):
    vs = list(_daily_cents().values())
    n = len(vs)
    h = (n + 1) // 2
    pairs = [(vs[t], vs[t + h]) for t in range(n - h)]
    got = _run(spark, "cox_stuart_trend_daily").iloc[0]
    assert got.n_days == n
    assert got.n_pairs == len(pairs)
    assert got.n_plus == sum(1 for a, b in pairs if b > a)
    assert got.n_minus == sum(1 for a, b in pairs if b < a)
    assert got.n_plus + got.n_minus <= got.n_pairs


def test_williams_r_brute(spark):
    items = list(_daily_cents().items())
    expect = {}
    for i in range(13, len(items)):
        win = [v for _, v in items[i - 13 : i + 1]]
        hh, ll = max(win), min(win)
        x, v = items[i]
        expect[x] = (
            hh,
            ll,
            (hh - v) * 1000000 // (hh - ll) if hh > ll else None,
        )
    got = _run(spark, "williams_r_14_daily")
    assert len(got) == len(expect)
    for r in got.itertuples():
        hh, ll, wr = expect[r.x]
        assert (r.hh, r.ll) == (hh, ll)
        assert (None if r.wr_ppm != r.wr_ppm else r.wr_ppm) == wr
        # %R is a 0..1e6 oscillator by construction
        if wr is not None:
            assert 0 <= r.wr_ppm <= 1000000


def test_mfi_brute(spark):
    items = list(_daily_cents().items())
    flows = []  # (x, pos, neg, valid)
    for i, (x, v) in enumerate(items):
        if i == 0:
            flows.append((x, 0, 0, 0))
        else:
            pv = items[i - 1][1]
            flows.append((x, v if v > pv else 0, v if v < pv else 0, 1))
    got = _run(spark, "mfi_14_daily")
    expect = {}
    for i in range(len(flows)):
        win = flows[max(0, i - 13) : i + 1]
        if sum(f[3] for f in win) == 14:
            p = sum(f[1] for f in win)
            ng = sum(f[2] for f in win)
            expect[flows[i][0]] = (
                p,
                ng,
                p * 1000000 // (p + ng) if p + ng > 0 else None,
            )
    assert len(got) == len(expect)
    for r in got.itertuples():
        p, ng, mfi = expect[r.x]
        assert (r.pos_flow_cents, r.neg_flow_cents) == (p, ng)
        assert (None if r.mfi_ppm != r.mfi_ppm else r.mfi_ppm) == mfi


def test_variance_ratio_brute(spark):
    vs = list(_daily_cents().values())
    n = len(vs)
    zs = [sum(vs[i - 4 : i + 1]) for i in range(4, n)]
    m = len(zs)
    sx, qx = sum(vs), sum(v * v for v in vs)
    sz, qz = sum(zs), sum(z * z for z in zs)
    vr = (m * qz - sz * sz) * n * n * 1000 // (
        5 * (n * qx - sx * sx) * m * m
    )
    got = _run(spark, "variance_ratio_5d_daily").iloc[0]
    assert (got.n, got.m, got.vr_milli) == (n, m, vr)


def test_ljung_box_brute(spark):
    vs = list(_daily_cents().values())
    n, s = len(vs), sum(vs)
    ys = [n * v - s for v in vs]
    c0 = sum(y * y for y in ys)
    got = _run(spark, "ljung_box_daily")
    assert list(got.lag_k) == list(range(1, 8))
    for r in got.itertuples():
        k = r.lag_k
        ck = sum(ys[t] * ys[t + k] for t in range(n - k))
        rm = (
            ck * 1000000 // c0
            if ck >= 0
            else -((-ck) * 1000000 // c0)
        )
        assert r.r_micro == rm
        assert r.q_term_milli == n * (n + 2) * rm * rm * 1000 // (
            (n - k) * 10**12
        )
    # portmanteau sanity: every |r_k| strictly below 1
    assert (got.r_micro.abs() < 1000000).all()


def test_cci_brute(spark):
    items = list(_daily_cents().items())
    got = _run(spark, "cci_20_daily")
    expect = {}
    for i in range(19, len(items)):
        win = [v for _, v in items[i - 19 : i + 1]]
        s20 = sum(win)
        x, v = items[i]
        md = sum(abs(20 * w - s20) for w in win)
        if md == 0:
            expect[x] = None
        else:
            u = 20 * v - s20
            expect[x] = (
                u * 4000000 // (3 * md)
                if u >= 0
                else -((-u) * 4000000 // (3 * md))
            )
    assert len(got) == len(expect)
    for r in got.itertuples():
        e = expect[r.x]
        assert (None if r.cci_milli != r.cci_milli else r.cci_milli) == e


# ---------------------------------------------------------------------------
# Blocked-design rank / reliability statistics
# ---------------------------------------------------------------------------


def _month_cells():
    cells = defaultdict(int)
    for od, g, tp in _sql(
        "SELECT o_orderdate, o_orderpriority, o_totalprice"
        " FROM '{SF}/orders.parquet'"
    ):
        mx = od.year * 12 + od.month - 1
        cells[(mx, g)] += _cents(tp)
    k = len({g for _, g in cells})
    by_m = defaultdict(dict)
    for (mx, g), rev in cells.items():
        by_m[mx][g] = rev
    comp = {mx: d for mx, d in by_m.items() if len(d) == k}
    return comp, k


def test_friedman_brute(spark):
    comp, k = _month_cells()
    b = len(comp)
    r2_sum = defaultdict(int)
    for mx, d in comp.items():
        vals = sorted(d.values())
        for g, rev in d.items():
            rank = 1 + sum(1 for v in vals if v < rev)
            ties = sum(1 for v in vals if v == rev)
            r2_sum[g] += 2 * rank + ties - 1
    ssq = sum(v * v for v in r2_sum.values())
    chi2 = 3000 * ssq // (4 * b * k * (k + 1)) - 3000 * b * (k + 1)
    got = _run(spark, "friedman_test_priorities_monthly").iloc[0]
    assert (got.b_months, got.k_groups, got.sum_r2_sq, got.chi2_milli) == (
        b,
        k,
        ssq,
        chi2,
    )
    # within each block the x2 ranks must sum to k(k+1) exactly
    assert sum(r2_sum.values()) == b * k * (k + 1)


def test_cronbach_brute(spark):
    comp, k = _month_cells()
    b = len(comp)
    groups = sorted({g for d in comp.values() for g in d})
    d_items = 0
    for g in groups:
        xs = [comp[mx][g] for mx in comp]
        d_items += b * sum(x * x for x in xs) - sum(xs) ** 2
    ts = [sum(d.values()) for d in comp.values()]
    d_t = b * sum(t * t for t in ts) - sum(ts) ** 2
    num = k * (d_t - d_items) * 1000
    den = (k - 1) * d_t
    alpha = num // den if num >= 0 else -((-num) // den)
    got = _run(spark, "cronbach_alpha_priorities_monthly").iloc[0]
    assert (got.b_months, got.k_items, got.alpha_milli) == (b, k, alpha)


def test_jonckheere_brute(spark):
    rows = _sql(
        "SELECT o_orderpriority, o_totalprice FROM '{SF}/orders.parquet'"
    )
    by_g = defaultdict(list)
    for g, tp in rows:
        by_g[g].append(_cents(tp))
    groups = sorted(by_g)
    jt2 = 0
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            for a in by_g[groups[i]]:
                for bb in by_g[groups[j]]:
                    if a < bb:
                        jt2 += 2
                    elif a == bb:
                        jt2 += 1
    n = sum(len(v) for v in by_g.values())
    sum_n_sq = sum(len(v) ** 2 for v in by_g.values())
    got = _run(spark, "jonckheere_terpstra_priorities").iloc[0]
    assert (got.n_total, got.jt2) == (n, jt2)
    assert got.dev_x4 == 2 * jt2 - (n * n - sum_n_sq)


# ---------------------------------------------------------------------------
# Queueing / survival / audit
# ---------------------------------------------------------------------------


def test_mm1_brute(spark):
    slots = defaultdict(int)
    days = set()
    for (ts,) in _sql("SELECT ts FROM '{SF}/events.parquet'"):
        slots[(ts.date(), ts.hour)] += 1
        days.add(ts.date())
    nd = len(days)
    mu = max(slots.values()) + 1
    hourly = defaultdict(int)
    for (d, h), c in slots.items():
        hourly[h] += c
    got = _run(spark, "mm1_queue_metrics_hourly")
    assert len(got) == len(hourly)
    for r in got.itertuples():
        a = hourly[r.hour]
        assert (r.arrivals, r.n_days, r.mu_per_slot) == (a, nd, mu)
        assert r.rho_ppm == a * 1000000 // (nd * mu)
        assert r.lq_milli == a * a * 1000 // (nd * mu * (nd * mu - a))
        assert r.wq_milli_slots == a * 1000 // (mu * (nd * mu - a))
        # stability: rho strictly below 1 by construction of mu
        assert r.rho_ppm < 1000000


def test_logrank_brute(spark):
    per_cust = {}
    for ck, od in _sql(
        "SELECT o_custkey, o_orderdate FROM '{SF}/orders.parquet'"
    ):
        d = od.date()
        f, l_ = per_cust.get(ck, (d, d))
        per_cust[ck] = (min(f, d), max(l_, d))
    seg = dict(
        _sql("SELECT c_custkey, c_mktsegment FROM '{SF}/customer.parquet'")
    )
    end_d = max(l_ for _, l_ in per_cust.values())
    per_bucket = defaultdict(lambda: [0, 0, 0, 0])  # e1,e0,x1,x0
    for ck, (f, l_) in per_cust.items():
        bucket = (l_ - f).days // 90
        churned = 1 if (end_d - l_).days >= 180 else 0
        grp = 1 if seg[ck] == "BUILDING" else 0
        row = per_bucket[bucket]
        if churned and grp:
            row[0] += 1
        elif churned:
            row[1] += 1
        elif grp:
            row[2] += 1
        else:
            row[3] += 1
    oe = v = 0
    buckets = sorted(per_bucket)
    for i, bkt in enumerate(buckets):
        n1 = sum(
            per_bucket[b2][0] + per_bucket[b2][2]
            for b2 in buckets[i:]
        )
        n = n1 + sum(
            per_bucket[b2][1] + per_bucket[b2][3]
            for b2 in buckets[i:]
        )
        e1, e0 = per_bucket[bkt][0], per_bucket[bkt][1]
        d = e1 + e0
        oe += e1 * 1000 - d * n1 * 1000 // n
        if n > 1:
            v += d * n1 * (n - n1) * (n - d) * 1000000 // (n * n * (n - 1))
    got = _run(spark, "logrank_test_segments").iloc[0]
    assert (got.n_buckets, got.oe_milli, got.v_micro) == (
        len(buckets),
        oe,
        v,
    )
    expect_chi2 = oe * oe * 1000 // v if v > 0 else None
    assert (
        None if got.chi2_milli != got.chi2_milli else got.chi2_milli
    ) == expect_chi2


_BENFORD2_PPM = {
    0: 119679, 1: 113890, 2: 108821, 3: 104330, 4: 100308,
    5: 96677, 6: 93375, 7: 90352, 8: 87570, 9: 84997,
}


def test_benford_second_digit_brute(spark):
    counts = defaultdict(int)
    for (tp,) in _sql(
        "SELECT o_totalprice FROM '{SF}/orders.parquet'"
        " WHERE o_totalprice > 0"
    ):
        s = str(_cents(tp))
        if len(s) >= 2:
            counts[int(s[1])] += 1
    total = sum(counts.values())
    got = _run(spark, "benford_second_digit_audit")
    assert list(got.digit) == list(range(10))
    for r in got.itertuples():
        n = counts.get(r.digit, 0)
        e = total * _BENFORD2_PPM[r.digit]
        assert (r.n, r.expected_ppm) == (n, _BENFORD2_PPM[r.digit])
        assert r.chi2_term_milli == (n * 1000000 - e) ** 2 // (e * 1000)
    # the expected ppm table itself must total ~1e6 (constants check)
    assert sum(_BENFORD2_PPM.values()) in (999999, 1000000, 1000001)


def test_log2_histogram_brute(spark):
    buckets = defaultdict(int)
    for (tp,) in _sql(
        "SELECT o_totalprice FROM '{SF}/orders.parquet'"
        " WHERE o_totalprice > 0"
    ):
        buckets[_cents(tp).bit_length() - 1] += 1
    total = sum(buckets.values())
    k_med, k_p90 = (total + 1) // 2, (9 * total + 9) // 10
    got = _run(spark, "sketch_log2_histogram_quantiles")
    assert len(got) == len(buckets)
    cum = 0
    for r in got.itertuples():
        cum += buckets[r.bucket]
        assert (r.n, r.cum, r.lo_cents) == (
            buckets[r.bucket],
            cum,
            1 << r.bucket,
        )
        assert r.contains_median == int(cum - r.n < k_med <= cum)
        assert r.contains_p90 == int(cum - r.n < k_p90 <= cum)
    assert got.contains_median.sum() == 1
    assert got.contains_p90.sum() == 1
    # relative-error contract of the base-2 sketch: the true median
    # lies within [lo, 2*lo) of its bucket's estimate
    med_lo = int(got[got.contains_median == 1].lo_cents.iloc[0])
    true_med = sorted(
        _cents(tp)
        for (tp,) in _sql(
            "SELECT o_totalprice FROM '{SF}/orders.parquet'"
            " WHERE o_totalprice > 0"
        )
    )[k_med - 1]
    assert med_lo <= true_med < 2 * med_lo


# ---------------------------------------------------------------------------
# Graph: clustering coefficient replay
# ---------------------------------------------------------------------------


def test_clustering_coefficient_brute(spark):
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
    edges = {e for e, c in sup.items() if c >= 2}
    nbr = defaultdict(set)
    for a, b in edges:
        nbr[a].add(b)
        nbr[b].add(a)
    rows = []
    for v, ns in nbr.items():
        d = len(ns)
        if d < 2:
            continue
        ns_sorted = sorted(ns)
        t = sum(
            1
            for i in range(len(ns_sorted))
            for j in range(i + 1, len(ns_sorted))
            if (ns_sorted[i], ns_sorted[j]) in edges
        )
        rows.append((2 * t * 1000000 // (d * (d - 1)), d, t, v))
    rows.sort(key=lambda r: (-r[0], -r[1], r[3]))
    got = _run(spark, "clustering_coefficient_copurchase")
    assert len(got) == min(20, len(rows))
    for r, (cc, d, t, v) in zip(got.itertuples(), rows):
        assert (r.part, r.degree, r.n_triangles, r.cc_ppm) == (v, d, t, cc)
        assert 0 <= r.cc_ppm <= 1000000


# ---------------------------------------------------------------------------
# Multimodal: Sobel energy replay from the raster formula
# ---------------------------------------------------------------------------


def test_sobel_energy_brute(spark):
    got = _run(spark, "multimodal_pgm_sobel_energy")
    n_docs = _sql(
        "SELECT count(*) FROM '{SF}/documents.parquet' WHERE doc_id < 200"
    )[0][0]
    assert len(got) == n_docs
    for r in got.itertuples():
        doc = r.doc_id
        w, h = doc % 16 + 4, doc % 12 + 4
        px = [[(doc * 31 + (y * w + x) * 7) % 256 for x in range(w)]
              for y in range(h)]
        energy = 0
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                gx = (
                    px[y - 1][x + 1] + 2 * px[y][x + 1] + px[y + 1][x + 1]
                    - px[y - 1][x - 1] - 2 * px[y][x - 1]
                    - px[y + 1][x - 1]
                )
                gy = (
                    px[y + 1][x - 1] + 2 * px[y + 1][x] + px[y + 1][x + 1]
                    - px[y - 1][x - 1] - 2 * px[y - 1][x]
                    - px[y - 1][x + 1]
                )
                energy += gx * gx + gy * gy
        assert (r.width, r.height) == (w, h)
        assert r.n_interior == (w - 2) * (h - 2)
        assert r.sobel_energy == energy


# ---------------------------------------------------------------------------
# Late additions: Dixon Q, dominant cycle, Keltner, Lincoln-Petersen
# ---------------------------------------------------------------------------


def test_dixon_q_brute(spark):
    daily = _daily_cents()
    vals = sorted((v, x) for x, v in daily.items())
    n = len(vals)
    x1, x2 = vals[0][0], vals[1][0]
    xn, xn1 = vals[-1][0], vals[-2][0]
    got = _run(spark, "dixon_q_daily").iloc[0]
    assert got.n == n
    assert got.low_x == vals[0][1]
    # high-end tie-break is (v desc, x desc): the LAST day wins
    assert got.high_x == max(x for v, x in vals if v == xn)
    assert got.q_low_ppm == (x2 - x1) * 1000000 // (xn - x1)
    assert got.q_high_ppm == (xn - xn1) * 1000000 // (xn - x1)
    assert 0 <= got.q_low_ppm <= 1000000
    assert 0 <= got.q_high_ppm <= 1000000


def test_dominant_cycle_brute(spark):
    vs = list(_daily_cents().values())
    n, s = len(vs), sum(vs)
    ys = [n * v - s for v in vs]
    c0 = sum(y * y for y in ys)
    scores = {}
    for k in range(2, 15):
        ck = sum(ys[t] * ys[t + k] for t in range(n - k))
        num = ck * 1000000 * n
        den = c0 * (n - k)
        scores[k] = num // den if num >= 0 else -((-num) // den)
    best = min(
        scores, key=lambda k: (-scores[k], k)
    )
    got = _run(spark, "dominant_cycle_acf_daily")
    assert list(got.lag_k) == list(range(2, 15))
    for r in got.itertuples():
        assert r.score_micro == scores[r.lag_k]
        assert r.is_dominant == int(r.lag_k == best)
    assert got.is_dominant.sum() == 1
    # the winner's score is a maximum by construction
    assert scores[best] == max(scores.values())


def test_keltner_brute(spark):
    daily = _daily_cents()
    items = sorted(daily.items())
    a20, b20 = 2.0 / 21.0, 1 - 2.0 / 21.0
    a10, b10 = 2.0 / 11.0, 1 - 2.0 / 11.0
    expect = []
    e20 = e10 = None
    prev_c = None
    for d, c in items:
        x = c / 100
        r = abs(c - prev_c) / 100 if prev_c is not None else 0.0
        if e20 is None:
            e20, e10 = x, 0.0
        else:
            e20 = a20 * x + b20 * e20
            e10 = a10 * r + b10 * e10
        up, lo = e20 + 2 * e10, e20 - 2 * e10
        flag = 1 if x > up else (-1 if x < lo else 0)
        expect.append((d, x, e20, up, lo, flag))
        prev_c = c
    got = _run(spark, "keltner_channel_daily")
    assert len(got) == len(expect)
    for row, (d, x, c_, up, lo, flag) in zip(got.itertuples(), expect):
        assert row.d == d
        assert row.daily_value == _micro(x)
        assert row.center == _micro(c_)
        assert row.upper_band == _micro(up)
        assert row.lower_band == _micro(lo)
        assert row.breakout == flag
    # day 1 sits exactly on the center: never a breakout
    assert got.breakout.iloc[0] == 0


def _micro(x: float) -> float:
    v = x * 1000000
    r = math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)
    return r / 1000000


def test_lincoln_petersen_brute(spark):
    rows = _sql("SELECT doc_id, text FROM '{SF}/documents.parquet'")
    N = 16
    para_fp = defaultdict(set)
    shin_fp = defaultdict(set)
    for doc_id, text in rows:
        ptoks = text.split(" ")
        stoks = [t for t in text.split() if t]
        n_chunks = math.ceil(len(ptoks) / N)
        for p in range(n_chunks):
            para_fp[" ".join(ptoks[p * N : p * N + N])].add(doc_id)
        for p in range(max(len(stoks) - N + 1, 1)):
            shin_fp[" ".join(stoks[p : p + N])].add(doc_id)
    fa = set().union(
        *(d for d in para_fp.values() if len(d) > 1), set()
    )
    fb = set().union(
        *(d for d in shin_fp.values() if len(d) > 1), set()
    )
    n_docs = len(rows)
    n1, n2 = len(fa), len(fb)
    m = len(fa & fb)
    union = len(fa | fb)
    chapman = (n1 + 1) * (n2 + 1) // (m + 1) - 1
    got = _run(spark, "lincoln_petersen_dedup_estimate").iloc[0]
    assert (got.n_docs, got.n1, got.n2, got.m_both) == (n_docs, n1, n2, m)
    assert got.union_flagged == union
    assert got.chapman_est == chapman
    assert got.est_missed == max(chapman - union, 0)
    # the estimator can never undercut the recapture count
    assert got.chapman_est >= m
