"""Independent-reference checks for the round-14 second-wave
operators (portfolio-risk ratio family) — plain-Python replays per
the house simulator-equality pattern, so a shared SQL-side
misconception cannot hide in both engines."""

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


def _mkt_cents() -> dict[int, int]:
    d = defaultdict(int)
    for sd, ext, disc in _sql(
        "SELECT l_shipdate, l_extendedprice, l_discount"
        " FROM '{SF}/lineitem.parquet'"
    ):
        v = ext * (1 - disc) * 100
        d[_day(sd)] += int(v + (0.5 if v >= 0 else -0.5))
    return dict(sorted(d.items()))


def _returns(series: dict[int, int]) -> list[tuple[int, int]]:
    xs = sorted(series.items())
    return [
        (x1, v1 - v0)
        for (_, v0), (x1, v1) in zip(xs, xs[1:])
    ]


def _ssdiv(num: int, den: int, scale: int) -> int:
    # sign-split floor: magnitudes floor-divided, sign reapplied
    if num >= 0:
        return (num * scale) // den
    return -(((-num) * scale) // den)


# ---------------------------------------------------------------------------


def test_sortino_brute(spark):
    rets = [r for _, r in _returns(_daily_cents())]
    n, s = len(rets), sum(rets)
    dq = sum(r * r for r in rets if r < 0)
    nd = sum(1 for r in rets if r < 0)
    want = (
        math.floor(float(s) * 1000 / math.sqrt(float(n * dq)))
        if dq > 0
        else None
    )
    got = _run(spark, "sortino_ratio_daily").iloc[0]
    assert (got.n, got.sum_ret_cents, got.n_down) == (n, s, nd)
    assert got.sortino_milli == want


def test_var_cvar_brute(spark):
    rx = _returns(_daily_cents())
    order = sorted(rx, key=lambda p: (p[1], p[0]))
    n = len(order)
    k = (n + 19) // 20
    var95 = order[k - 1][1]
    tail = [r for _, r in order[:k]]
    ts, tn = sum(tail), len(tail)
    got = _run(spark, "var_cvar_daily").iloc[0]
    assert (got.n, got.k, got.var95_cents) == (n, k, var95)
    assert (got.tail_sum_cents, got.n_tail) == (ts, tn)
    assert got.cvar_milli == _ssdiv(ts, tn, 1000)


def test_omega_brute(spark):
    rets = [r for _, r in _returns(_daily_cents())]
    g = sum(r for r in rets if r > 0)
    l = sum(-r for r in rets if r < 0)
    got = _run(spark, "omega_ratio_daily").iloc[0]
    assert (got.n, got.gains_cents, got.losses_cents) == (
        len(rets), g, l,
    )
    assert got.omega_ppm == (g * 10**6 // l if l > 0 else None)


def test_calmar_brute(spark):
    xs = sorted(_daily_cents().items())
    vs = [v for _, v in xs]
    peak, mdd = -(10**30), 0
    for v in vs:
        peak = max(peak, v)
        mdd = max(mdd, peak - v)
    gain = vs[-1] - vs[0]
    got = _run(spark, "calmar_ratio_daily").iloc[0]
    assert (got.n, got.total_gain_cents, got.max_drawdown_cents) == (
        len(vs), gain, mdd,
    )
    want = _ssdiv(gain, mdd, 10**6) if mdd > 0 else None
    assert got.calmar_ppm == want


def test_kelly_brute(spark):
    rets = [r for _, r in _returns(_daily_cents())]
    w = sum(1 for r in rets if r > 0)
    l = sum(1 for r in rets if r < 0)
    sw = sum(r for r in rets if r > 0)
    sl = sum(-r for r in rets if r < 0)
    got = _run(spark, "kelly_criterion_daily").iloc[0]
    assert (got.n_wins, got.n_losses) == (w, l)
    assert (got.sum_win_cents, got.sum_loss_cents) == (sw, sl)
    want = (
        _ssdiv(w * (sw - sl), (w + l) * sw, 10**6)
        if w > 0 and l > 0 and sw > 0
        else None
    )
    assert got.kelly_ppm == want
    # cross-check against the textbook f* = p - q/b on floats
    if want is not None:
        p, q = w / (w + l), l / (w + l)
        b = (sw / w) / (sl / l)
        assert abs(want / 1e6 - (p - q / b)) < 1e-5


def _joined_returns():
    port, mkt = _daily_cents(), _mkt_cents()
    days = sorted(set(port) & set(mkt))
    rp = [port[b] - port[a] for a, b in zip(days, days[1:])]
    rm = [mkt[b] - mkt[a] for a, b in zip(days, days[1:])]
    return rp, rm


def test_beta_ir_brute(spark):
    rp, rm = _joined_returns()
    n = len(rp)
    sp, sm = sum(rp), sum(rm)
    smm = sum(r * r for r in rm)
    spm = sum(a * b for a, b in zip(rp, rm))
    ds = [a - b for a, b in zip(rp, rm)]
    sd, qd = sum(ds), sum(d * d for d in ds)
    got = _run(spark, "beta_information_ratio_daily").iloc[0]
    assert (got.n, got.sum_port_cents, got.sum_mkt_cents) == (n, sp, sm)
    den = n * smm - sm * sm
    want_beta = (
        math.floor(float(n * spm - sp * sm) * 10**6 / float(den))
        if den > 0
        else None
    )
    assert got.beta_ppm == want_beta
    vd = n * qd - sd * sd
    want_ir = (
        math.floor(float(sd) * 1000 / math.sqrt(float(vd)))
        if vd > 0
        else None
    )
    assert got.info_ratio_milli == want_ir
    # float cross-check: beta should equal the numpy-style cov/var
    if want_beta is not None:
        mean_p, mean_m = sp / n, sm / n
        cov = sum((a - mean_p) * (b - mean_m) for a, b in zip(rp, rm))
        var = sum((b - mean_m) ** 2 for b in rm)
        assert abs(want_beta / 1e6 - cov / var) < 1e-5


def test_capture_brute(spark):
    rp, rm = _joined_returns()
    pu = sum(a for a, b in zip(rp, rm) if b > 0)
    mu = sum(b for b in rm if b > 0)
    pd_ = sum(a for a, b in zip(rp, rm) if b < 0)
    md = sum(b for b in rm if b < 0)
    got = _run(spark, "capture_ratios_daily").iloc[0]
    assert (got.n_up, got.n_down) == (
        sum(1 for b in rm if b > 0),
        sum(1 for b in rm if b < 0),
    )
    assert (got.port_up_cents, got.mkt_up_cents) == (pu, mu)
    assert (got.port_down_cents, got.mkt_down_cents) == (pd_, md)
    assert got.up_capture_ppm == (
        _ssdiv(pu, mu, 10**6) if mu > 0 else None
    )
    assert got.down_capture_ppm == (
        _ssdiv(-pd_, -md, 10**6) if md < 0 else None
    )


# ---------------------------------------------------------------------------
# SPC charts
# ---------------------------------------------------------------------------


def test_p_chart_brute(spark):
    months = defaultdict(lambda: [0, 0])
    for sd, rf in _sql(
        "SELECT l_shipdate, l_returnflag FROM '{SF}/lineitem.parquet'"
    ):
        key = sd.year * 100 + sd.month
        months[key][0] += 1
        months[key][1] += 1 if rf == "R" else 0
    nn = sum(v[0] for v in months.values())
    dd = sum(v[1] for v in months.values())
    got = _run(spark, "p_chart_monthly_returns").set_index("ym")
    assert len(got) == len(months)
    for ym, (ni, di) in sorted(months.items()):
        row = got.loc[ym]
        assert (row.n_lines, row.n_returned) == (ni, di)
        assert row.phat_ppm == di * 10**6 // ni
        ucl = math.floor(
            (dd * 1e6 + 3e6 * math.sqrt(dd * (nn - dd) / ni)) / nn
        )
        lcl = max(
            0,
            math.floor(
                (dd * 1e6 - 3e6 * math.sqrt(dd * (nn - dd) / ni)) / nn
            ),
        )
        assert (row.ucl_ppm, row.lcl_ppm) == (ucl, lcl)
        assert row.above_ucl == (1 if row.phat_ppm > ucl else 0)
        assert row.below_lcl == (1 if row.phat_ppm < lcl else 0)


def test_c_chart_brute(spark):
    days, errs = set(), defaultdict(int)
    for ts, et in _sql(
        "SELECT ts, event_type FROM '{SF}/events.parquet'"
    ):
        d = _day(ts)
        days.add(d)
        if et == "error":
            errs[d] += 1
    nd, tt = len(days), sum(errs.values())
    ucl = math.floor((1000 * tt + 3000 * math.sqrt(tt * nd)) / nd)
    lcl = max(
        0, math.floor((1000 * tt - 3000 * math.sqrt(tt * nd)) / nd)
    )
    got = _run(spark, "c_chart_daily_error_events").set_index("x")
    assert len(got) == nd
    for d in sorted(days):
        row = got.loc[d]
        c = errs.get(d, 0)
        assert row.c == c
        assert row.cbar_milli == 1000 * tt // nd
        assert (row.ucl_milli, row.lcl_milli) == (ucl, lcl)
        assert row.above_ucl == (1 if c * 1000 > ucl else 0)
        assert row.below_lcl == (1 if c * 1000 < lcl else 0)


def test_western_electric_brute(spark):
    xs = sorted(_daily_cents().items())
    n = len(xs)
    s = sum(v for _, v in xs)
    q = sum(v * v for _, v in xs)
    vv = n * q - s * s
    rows = []
    for x, v in xs:
        dev = n * v - s
        side = 1 if dev > 0 else (-1 if dev < 0 else 0)
        d2 = dev * dev
        zone = 3 if d2 > 9 * vv else (2 if d2 > 4 * vv else (1 if d2 > vv else 0))
        rows.append((x, v, side, zone, d2 > 4 * vv, d2 > vv))
    want = []
    for i, (x, v, side, zone, b2, b1) in enumerate(rows):
        r1 = 1 if zone == 3 else 0
        w3 = rows[max(0, i - 2): i + 1]
        r2 = int(
            len(w3) == 3
            and (
                sum(1 for t in w3 if t[4] and t[2] > 0) >= 2
                or sum(1 for t in w3 if t[4] and t[2] < 0) >= 2
            )
        )
        w5 = rows[max(0, i - 4): i + 1]
        r3 = int(
            len(w5) == 5
            and (
                sum(1 for t in w5 if t[5] and t[2] > 0) >= 4
                or sum(1 for t in w5 if t[5] and t[2] < 0) >= 4
            )
        )
        w8 = rows[max(0, i - 7): i + 1]
        r4 = int(
            len(w8) == 8
            and (
                sum(1 for t in w8 if t[2] == 1) == 8
                or sum(1 for t in w8 if t[2] == -1) == 8
            )
        )
        if r1 + r2 + r3 + r4 > 0:
            want.append((x, v, side, zone, r1, r2, r3, r4))
    got = _run(spark, "western_electric_rules_daily")
    assert [tuple(r) for r in got.itertuples(index=False)] == want


# ---------------------------------------------------------------------------
# Diversity / concentration
# ---------------------------------------------------------------------------


def test_ecological_diversity_brute(spark):
    counts = defaultdict(lambda: defaultdict(int))
    for nat, brand in _sql("""
        SELECT cu.c_nationkey, p.p_brand
        FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
        JOIN '{SF}/customer.parquet' cu ON cu.c_custkey = o.o_custkey
        JOIN '{SF}/part.parquet' p ON p.p_partkey = l.l_partkey
    """):
        counts[nat][brand] += 1
    got = _run(spark, "ecological_diversity_brands_by_nation").set_index(
        "nation"
    )
    assert len(got) == len(counts)
    for nat, bc in counts.items():
        row = got.loc[nat]
        rich, n = len(bc), sum(bc.values())
        rep2 = sum(c * (c - 1) for c in bc.values())
        cmax = max(bc.values())
        assert (row.richness, row.n) == (rich, n)
        assert row.simpson_ppm == (
            rep2 * 10**6 // (n * (n - 1)) if n > 1 else None
        )
        assert row.inv_simpson_ppm == (
            n * (n - 1) * 10**6 // rep2 if rep2 > 0 else None
        )
        assert row.berger_parker_ppm == cmax * 10**6 // n
        assert row.simpson_evenness_ppm == (
            n * (n - 1) * 10**6 // (rep2 * rich) if rep2 > 0 else None
        )


def _cust_revenue():
    d = defaultdict(int)
    for ck, tp in _sql(
        "SELECT o_custkey, o_totalprice FROM '{SF}/orders.parquet'"
    ):
        d[ck] += _cents(tp)
    return d


def test_atkinson_brute(spark):
    xs = [x for x in _cust_revenue().values() if x > 0]
    n, t = len(xs), sum(xs)
    rsum = sum(10**12 // x for x in xs)
    got = _run(spark, "atkinson_index_customers").iloc[0]
    assert (got.n, got.total_cents, got.recip_sum_pico) == (n, t, rsum)
    want = 10**6 - n * n * 10**18 // (t * rsum)
    assert got.atkinson2_ppm == want
    # float cross-check vs the textbook 1 - harmonic/mean
    hm = n / sum(1.0 / x for x in xs)
    assert abs(want / 1e6 - (1 - hm / (t / n))) < 1e-4


def test_palma_hoover_brute(spark):
    rev = sorted(_cust_revenue().items())
    xs_asc = sorted(rev, key=lambda p: (p[1], p[0]))
    xs_desc = sorted(rev, key=lambda p: (-p[1], -p[0]))
    n = len(rev)
    t = sum(x for _, x in rev)
    n10, n40 = n // 10, 4 * n // 10
    top10 = sum(x for _, x in xs_desc[:n10])
    bot40 = sum(x for _, x in xs_asc[:n40])
    sdev = sum(abs(n * x - t) for _, x in rev)
    got = _run(spark, "palma_hoover_customers").iloc[0]
    assert (got.n, got.total_cents, got.n10, got.n40) == (n, t, n10, n40)
    assert (got.top10_cents, got.bottom40_cents) == (top10, bot40)
    assert got.palma_ppm == (
        top10 * 10**6 // bot40 if bot40 > 0 else None
    )
    assert got.hoover_ppm == (
        sdev * 10**6 // (2 * n * t) if t > 0 else None
    )


def test_cr_concentration_brute(spark):
    brands = defaultdict(int)
    for brand, ext, disc in _sql("""
        SELECT p.p_brand, l.l_extendedprice, l.l_discount
        FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/part.parquet' p ON p.p_partkey = l.l_partkey
    """):
        v = ext * (1 - disc) * 100
        brands[brand] += int(v + (0.5 if v >= 0 else -0.5))
    order = sorted(brands.items(), key=lambda p: (-p[1], p[0]))
    t = sum(brands.values())
    got = _run(spark, "cr_concentration_brands").iloc[0]
    assert (got.n_brands, got.total_cents) == (len(brands), t)
    for k, col in ((1, "cr1_ppm"), (4, "cr4_ppm"), (8, "cr8_ppm")):
        want = sum(v for _, v in order[:k]) * 10**6 // t
        assert got[col] == want


# ---------------------------------------------------------------------------
# ML evaluation metrics
# ---------------------------------------------------------------------------


def _labels():
    return _sql("""
        SELECT o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT),
               max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    """)


def test_pr_auc_brute(spark):
    lab = _labels()
    per = defaultdict(lambda: [0, 0])
    for _, score, pos in lab:
        per[score][0] += 1
        per[score][1] += pos
    n_pos = sum(v[1] for v in per.values())
    n_neg = sum(v[0] - v[1] for v in per.values())
    cum_n = tp = 0
    terms = 0
    for score in sorted(per, reverse=True):
        cnt, np_ = per[score]
        cum_n += cnt
        tp += np_
        terms += np_ * tp * 10**6 // cum_n
    got = _run(spark, "pr_auc_price_predicts_return").iloc[0]
    assert (got.n_pos, got.n_neg, got.n_scores) == (
        n_pos, n_neg, len(per),
    )
    assert got.prevalence_ppm == n_pos * 10**6 // (n_pos + n_neg)
    assert got.ap_ppm == terms // n_pos
    # sanity: AP is a mean of precisions — bounded by [0, 1]; for this
    # near-random score it should sit NEAR the prevalence baseline
    assert 0 <= got.ap_ppm <= 10**6
    assert abs(got.ap_ppm - got.prevalence_ppm) < 100_000


def test_mcc_youden_brute(spark):
    lab = _labels()
    order = sorted(lab, key=lambda r: (r[1], r[0]))
    n = len(order)
    thr = order[(n + 1) // 2 - 1][1]
    tp = sum(1 for _, s, p in lab if p == 1 and s > thr)
    fp = sum(1 for _, s, p in lab if p == 0 and s > thr)
    fn = sum(1 for _, s, p in lab if p == 1 and s <= thr)
    tn = sum(1 for _, s, p in lab if p == 0 and s <= thr)
    got = _run(spark, "mcc_youden_price_median").iloc[0]
    assert (got.threshold_cents, got.tp, got.fp, got.fn, got.tn) == (
        thr, tp, fp, fn, tn,
    )
    den = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    want_mcc = (
        math.floor(float(tp * tn - fp * fn) * 1000 / math.sqrt(float(den)))
        if (tp + fp) * (tp + fn) > 0 and (tn + fp) * (tn + fn) > 0
        else None
    )
    assert got.mcc_milli == want_mcc
    assert got.youden_j_ppm == (
        tp * 10**6 // (tp + fn) + tn * 10**6 // (fp + tn) - 10**6
    )
    assert got.f1_ppm == 2 * tp * 10**6 // (2 * tp + fp + fn)


def test_brier_brute(spark):
    lab = _labels()
    train = defaultdict(lambda: [0, 0])
    test = defaultdict(lambda: [0, 0])
    n_test_all = 0
    for ok, score, pos in lab:
        band = score // 500000
        if ok % 2 == 1:
            train[band][0] += 1
            train[band][1] += pos
        else:
            n_test_all += 1
            test[band][0] += pos
            test[band][1] += 1 - pos
    tsum = n_test = n_bands = 0
    for band, (b, a) in train.items():
        if band not in test:
            continue
        n1, n0 = test[band]
        n_bands += 1
        n_test += n1 + n0
        tsum += (n1 * (a - b) ** 2 + n0 * a * a) * 10**12 // (b * b)
    got = _run(spark, "brier_score_band_forecast").iloc[0]
    assert (got.n_bands, got.n_test, got.n_test_all) == (
        n_bands, n_test, n_test_all,
    )
    assert got.brier_ppm == tsum // (10**6 * n_test)
    # float sanity: Brier of a band-rate forecast is bounded by 0.25-ish
    assert 0 <= got.brier_ppm <= 10**6


def test_odds_risk_brute(spark):
    rows = _sql("""
        WITH lab AS (
          SELECT o.o_orderkey, o.o_custkey,
                 max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                     AS pos
          FROM '{SF}/orders.parquet' o
          JOIN '{SF}/lineitem.parquet' l
            ON l.l_orderkey = o.o_orderkey
          GROUP BY 1, 2
        )
        SELECT lab.pos,
               CASE WHEN cu.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
        FROM lab JOIN '{SF}/customer.parquet' cu
          ON cu.c_custkey = lab.o_custkey
    """)
    a = sum(1 for p, e in rows if e == 1 and p == 1)
    b = sum(1 for p, e in rows if e == 1 and p == 0)
    c = sum(1 for p, e in rows if e == 0 and p == 1)
    d = sum(1 for p, e in rows if e == 0 and p == 0)
    got = _run(spark, "odds_risk_ratio_building_returns").iloc[0]
    assert (got.a, got.b, got.c, got.d) == (a, b, c, d)
    assert got.risk_exposed_ppm == a * 10**6 // (a + b)
    assert got.risk_unexposed_ppm == c * 10**6 // (c + d)
    assert got.odds_ratio_ppm == (
        a * d * 10**6 // (b * c) if b * c > 0 else None
    )
    assert got.risk_ratio_ppm == (
        a * (c + d) * 10**6 // (c * (a + b))
        if c > 0 and a + b > 0
        else None
    )


# ---------------------------------------------------------------------------
# Time-series: spectral / complexity / stationarity / momentum
# ---------------------------------------------------------------------------


def test_square_wave_periodogram_brute(spark):
    xs = sorted(_daily_cents().items())
    n = len(xs)
    s = sum(v for _, v in xs)
    q = sum(v * v for _, v in xs)
    c0 = n * q - s * s
    got = _run(spark, "square_wave_periodogram_daily").set_index(
        "period"
    )
    for p in (7, 14, 30, 91, 365):
        ip = sum(
            (n * v - s) * (1 if (x % p) * 2 < p else -1) for x, v in xs
        )
        qd = sum(
            (n * v - s) * (1 if ((x + p // 4) % p) * 2 < p else -1)
            for x, v in xs
        )
        row = got.loc[p]
        assert (row.inphase_sum, row.quadrature_sum) == (ip, qd)
        assert row.power_ppm == (ip * ip + qd * qd) * 10**6 // (n * c0)


def test_sample_entropy_brute(spark):
    vs = [v for _, v in sorted(_daily_cents().items())]
    n = len(vs)
    s, q = sum(vs), sum(v * v for v in vs)
    vv = n * q - s * s
    tri = [
        (vs[i], vs[i + 1], vs[i + 2]) for i in range(n - 2)
    ]

    def close(a, b):
        return 25 * (a - b) ** 2 * n * n <= vv

    bb = aa = npairs = 0
    for i in range(len(tri)):
        for j in range(i + 1, len(tri)):
            npairs += 1
            if close(tri[i][0], tri[j][0]) and close(tri[i][1], tri[j][1]):
                bb += 1
                if close(tri[i][2], tri[j][2]):
                    aa += 1
    got = _run(spark, "sample_entropy_kernel_daily").iloc[0]
    assert (got.n_pairs, got.template_matches_m2,
            got.template_matches_m3) == (npairs, bb, aa)
    assert got.sampen_kernel_ppm == (
        aa * 10**6 // bb if bb > 0 else None
    )


def test_kpss_brute(spark):
    vs = [v for _, v in sorted(_daily_cents().items())]
    n, s = len(vs), sum(vs)
    es = [n * v - s for v in vs]
    pt, sp2 = 0, 0
    for e in es:
        pt += e
        sp2 += pt * pt
    se2 = sum(e * e for e in es)
    got = _run(spark, "kpss_level_stat_daily").iloc[0]
    assert got.n == n
    assert got.kpss_eta_ppm == math.floor(
        float(sp2) * 10**6 / (float(n) * float(se2))
    )


def test_permutation_census_brute(spark):
    vs = [v for _, v in sorted(_daily_cents().items())]
    pats = defaultdict(int)
    for a, b, c in zip(vs, vs[1:], vs[2:]):
        if a <= b and b <= c:
            p = "012"
        elif a <= c and c < b:
            p = "021"
        elif b < a and a <= c:
            p = "102"
        elif c < a and a <= b:
            p = "120"
        elif b <= c and c < a:
            p = "201"
        else:
            p = "210"
        pats[p] += 1
    t = sum(pats.values())
    rep2 = sum(c * (c - 1) for c in pats.values())
    got = _run(spark, "permutation_pattern_census_daily").set_index(
        "pattern"
    )
    assert len(got) == len(pats)
    for p, c in pats.items():
        row = got.loc[p]
        assert row.cnt == c
        assert row.share_ppm == c * 10**6 // t
        assert row.renyi2_repeat_ppm == rep2 * 10**6 // (t * (t - 1))
    # cross-check the CASE tree against rank-of-each-position
    # (digit i = rank of the i-th value, position-tie-broken)
    for a, b, c in [(1, 2, 3), (1, 3, 2), (2, 1, 3), (2, 3, 1),
                    (3, 1, 2), (3, 2, 1), (1, 1, 2), (2, 1, 1),
                    (1, 2, 1), (1, 1, 1)]:
        order = sorted(range(3), key=lambda i: ([a, b, c][i], i))
        rank = [0, 0, 0]
        for r, i in enumerate(order):
            rank[i] = r
        expect = "".join(str(r) for r in rank)
        if a <= b and b <= c:
            p = "012"
        elif a <= c and c < b:
            p = "021"
        elif b < a and a <= c:
            p = "102"
        elif c < a and a <= b:
            p = "120"
        elif b <= c and c < a:
            p = "201"
        else:
            p = "210"
        # pattern names positions in ascending-value order
        assert p == expect, (a, b, c)


def test_dpo_cmo_brute(spark):
    xs = sorted(_daily_cents().items())
    vs = [v for _, v in xs]
    got = _run(spark, "dpo_20_daily").set_index("x")
    cnt = 0
    for i in range(len(vs)):
        if i >= 19 and i >= 11:
            s20 = sum(vs[i - 19: i + 1])
            want = _ssdiv(20 * vs[i - 11] - s20, 20, 1000)
            assert got.loc[xs[i][0]].dpo_milli == want
            cnt += 1
    assert len(got) == cnt

    rets = _returns(_daily_cents())
    got2 = _run(spark, "chande_momentum_20_daily").set_index("x")
    cnt2 = 0
    for i in range(19, len(rets)):
        w = [r for _, r in rets[i - 19: i + 1]]
        su = sum(r for r in w if r > 0)
        sd = sum(-r for r in w if r < 0)
        row = got2.loc[rets[i][0]]
        assert (row.up_sum_cents, row.down_sum_cents) == (su, sd)
        want = (
            _ssdiv(su - sd, su + sd, 10**6) if su + sd > 0 else None
        )
        assert row.cmo_ppm == want
        cnt2 += 1
    assert len(got2) == cnt2


# ---------------------------------------------------------------------------
# Graph: rich-club / k-truss / preferential attachment
# ---------------------------------------------------------------------------


def _copurchase_edges():
    items = set(_sql(
        "SELECT DISTINCT l_orderkey, l_partkey"
        " FROM '{SF}/lineitem.parquet'"
    ))
    by_order = defaultdict(list)
    for ok, pk in items:
        by_order[ok].append(pk)
    pair_counts = defaultdict(int)
    for parts in by_order.values():
        parts.sort()
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pair_counts[(parts[i], parts[j])] += 1
    return {p for p, c in pair_counts.items() if c >= 2}


def test_rich_club_brute(spark):
    edges = _copurchase_edges()
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    got = _run(spark, "rich_club_coefficient_copurchase").set_index("k")
    for k in (2, 4, 8, 16, 32):
        club = {u for u, d in deg.items() if d > k}
        if not club:
            assert k not in got.index
            continue
        mk = sum(1 for a, b in edges if a in club and b in club)
        row = got.loc[k]
        assert (row.club_size, row.club_edges) == (len(club), mk)
        want = (
            mk * 2 * 10**6 // (len(club) * (len(club) - 1))
            if len(club) > 1
            else None
        )
        assert row.phi_ppm == want


def test_ktruss_brute(spark):
    edges = _copurchase_edges()
    traj = [len(edges)]
    cur = set(edges)
    for _ in range(3):
        adj = defaultdict(set)
        for a, b in cur:
            adj[a].add(b)
            adj[b].add(a)
        cur = {
            (a, b) for a, b in cur if adj[a] & adj[b]
        }
        traj.append(len(cur))
    got = _run(spark, "ktruss_3_copurchase")
    assert [tuple(r) for r in got.itertuples(index=False)] == [
        (i, c) for i, c in enumerate(traj)
    ]


def test_pref_attachment_brute(spark):
    edges = _copurchase_edges()
    adj = defaultdict(set)
    deg = defaultdict(int)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
        deg[a] += 1
        deg[b] += 1
    cands = set()
    for w, nbrs in adj.items():
        nl = sorted(nbrs)
        for i in range(len(nl)):
            for j in range(i + 1, len(nl)):
                if (nl[i], nl[j]) not in edges:
                    cands.add((nl[i], nl[j]))
    scored = sorted(
        ((deg[a] * deg[b], a, b) for a, b in cands),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:20]
    got = _run(spark, "link_prediction_pref_attachment")
    assert [
        (r.pa_score, r.part_a, r.part_b)
        for r in got.itertuples(index=False)
    ] == scored
    for r in got.itertuples(index=False):
        assert (r.deg_a, r.deg_b) == (deg[r.part_a], deg[r.part_b])


# ---------------------------------------------------------------------------
# Text: dyadic Zipf, Hellinger, BM25
# ---------------------------------------------------------------------------


def _source_word_counts():
    counts = defaultdict(lambda: defaultdict(int))
    for src, text in _sql(
        "SELECT source, text FROM '{SF}/documents.parquet'"
    ):
        for w in text.split():
            counts[src][w] += 1
    return counts


def test_zipf_dyadic_brute(spark):
    counts = _source_word_counts()
    got = _run(spark, "zipf_dyadic_slope_by_source").set_index("source")
    for src, wc in counts.items():
        ranked = sorted(wc.items(), key=lambda p: (-p[1], p[0]))
        pts = defaultdict(lambda: [0, 0])
        for rnk, (_, c) in enumerate(ranked, start=1):
            b = rnk.bit_length() - 1
            pts[b][0] += c.bit_length() - 1
            pts[b][1] += 1
        xy = [(b, 1000 * ylog // nb) for b, (ylog, nb) in pts.items()]
        nb = len(xy)
        sx = sum(x for x, _ in xy)
        sxx = sum(x * x for x, _ in xy)
        sy = sum(y for _, y in xy)
        sxy = sum(x * y for x, y in xy)
        den = nb * sxx - sx * sx
        want = (
            _ssdiv(nb * sxy - sx * sy, den, 1000) if den > 0 else None
        )
        row = got.loc[src]
        assert row.n_buckets == nb
        assert row.zipf_slope_micro == want
        # the synthetic corpus should be roughly Zipfian: slope <= 0
        # (a tiny corpus where most dyadic buckets hold count-1 types
        # can flatten the fit to exactly 0)
        if want is not None:
            assert want <= 0


def test_hellinger_brute(spark):
    counts = _source_word_counts()
    totals = sorted(
        ((sum(wc.values()), src) for src, wc in counts.items()),
        key=lambda p: (-p[0], p[1]),
    )
    (na, sa), (nb, sb) = totals[0], totals[1]
    wa, wb = counts[sa], counts[sb]
    bc = 0
    for w in set(wa) | set(wb):
        cp, cq = wa.get(w, 0), wb.get(w, 0)
        bc += math.floor(
            10**6 * math.sqrt(float(cp * cq))
            / math.sqrt(float(na * nb))
        )
    got = _run(spark, "hellinger_affinity_sources").iloc[0]
    assert (got.source_a, got.source_b, got.n_a, got.n_b) == (
        sa, sb, na, nb,
    )
    assert got.bc_affinity_ppm == bc
    assert got.hellinger_sq_ppm == 10**6 - bc


def test_bm25_brute(spark):
    doc_toks = {}
    for did, text in _sql(
        "SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ):
        doc_toks[did] = text.split()
    nd = len(doc_toks)
    tt = sum(len(t) for t in doc_toks.values())
    df = defaultdict(int)
    for toks in doc_toks.values():
        for w in set(toks):
            df[w] += 1
    ranked = sorted(df.items(), key=lambda p: (-p[1], p[0]))
    qterms = dict(ranked[9:12])
    scores = {}
    for did, toks in doc_toks.items():
        s = 0
        matched = 0
        dl = len(toks)
        for w, dfc in qterms.items():
            tf = sum(1 for t in toks if t == w)
            if tf == 0:
                continue
            matched += 1
            s += (
                (2 * nd - 2 * dfc + 1) * 22 * tt * tf * 10**6
                // ((2 * dfc + 1) * (10 * tt * tf + 3 * tt + 9 * dl * nd))
            )
        if matched:
            scores[did] = (s, matched, dl)
    want = sorted(
        ((s, did, m, dl) for did, (s, m, dl) in scores.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = _run(spark, "bm25_rsj_topk")
    assert [
        (r.score_micro, r.doc_id, r.terms_matched, r.doc_len)
        for r in got.itertuples(index=False)
    ] == want


# ---------------------------------------------------------------------------
# Survey sampling
# ---------------------------------------------------------------------------


def _seg_sample_py():
    import hashlib
    segs = sorted({s for (s,) in _sql(
        "SELECT DISTINCT c_mktsegment FROM '{SF}/customer.parquet'"
    )})
    k = {s: i + 2 for i, s in enumerate(segs)}
    rows = []
    for ok, seg, tp in _sql("""
        SELECT o.o_orderkey, cu.c_mktsegment, o.o_totalprice
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' cu ON cu.c_custkey = o.o_custkey
    """):
        bucket = int(
            hashlib.md5(str(ok).encode()).hexdigest()[:8], 16
        ) % 100
        rows.append((ok, seg, _cents(tp), bucket, k[seg]))
    return rows


def test_kish_brute(spark):
    rows = _seg_sample_py()
    samp = [(x, kk) for _, _, x, b, kk in rows if b * kk < 100]
    n = len(samp)
    sw = sum(kk for _, kk in samp)
    sww = sum(kk * kk for _, kk in samp)
    got = _run(spark, "kish_design_effect_segments").iloc[0]
    assert (got.n, got.sum_weights, got.sum_sq_weights) == (n, sw, sww)
    assert got.deff_ppm == n * sww * 10**6 // (sw * sw)
    assert got.effective_n == sw * sw // sww
    assert got.deff_ppm >= 10**6  # deff >= 1 always (Cauchy-Schwarz)


def test_horvitz_thompson_brute(spark):
    rows = _seg_sample_py()
    t = sum(x for _, _, x, _, _ in rows)
    ht = sum(kk * x for _, _, x, b, kk in rows if b * kk < 100)
    got = _run(spark, "horvitz_thompson_total_audit").iloc[0]
    assert (got.n_all, got.true_total_cents) == (len(rows), t)
    assert got.ht_total_cents == ht
    assert got.rel_error_ppm == _ssdiv(ht - t, t, 10**6)
    # design-based estimate should land within 25% of truth here
    assert abs(got.rel_error_ppm) < 250_000


def test_jackknife_brute(spark):
    base = defaultdict(lambda: [0, 0])
    for nat, rf in _sql("""
        SELECT cu.c_nationkey, l.l_returnflag
        FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
        JOIN '{SF}/customer.parquet' cu ON cu.c_custkey = o.o_custkey
    """):
        base[nat][0] += 1
        base[nat][1] += 1 if rf == "R" else 0
    grp = len(base)
    n = sum(v[0] for v in base.values())
    r = sum(v[1] for v in base.values())
    thetas = [
        (r - rl) * 10**6 // (n - nl) for nl, rl in base.values()
    ]
    st = sum(thetas)
    stt = sum(t * t for t in thetas)
    got = _run(spark, "jackknife_ratio_nations").iloc[0]
    assert (got.n_groups, got.theta_ppm) == (grp, r * 10**6 // n)
    assert got.jack_mean_ppm == st // grp
    want_se = math.floor(
        math.sqrt(
            float(grp - 1)
            * float(grp * stt - st * st)
            / (float(grp) * grp * grp)
        )
    )
    assert got.jack_se_ppm == want_se


# ---------------------------------------------------------------------------
# Classical randomness / robust-trend tests
# ---------------------------------------------------------------------------


def test_turning_points_brute(spark):
    vs = [v for _, v in sorted(_daily_cents().items())]
    n = len(vs)
    tp = sum(
        1
        for a, b, c in zip(vs, vs[1:], vs[2:])
        if (b > a and b > c) or (b < a and b < c)
    )
    got = _run(spark, "turning_points_test_daily").iloc[0]
    assert (got.n, got.turning_points) == (n, tp)
    assert got.expected_milli == 2 * (n - 2) * 1000 // 3
    want_z = math.floor(
        (tp * 90.0 - float(2 * (n - 2) * 30)) * 1000
        / (90 * math.sqrt((16 * n - 29) / 90))
    )
    assert got.z_milli == want_z


def test_records_brute(spark):
    vs = [v for _, v in sorted(_daily_cents().items())]
    n = len(vs)
    best = None
    recs = 0
    for v in vs:
        if best is None or v > best:
            recs += 1
            best = v
    h = sum(10**6 // t for t in range(1, n + 1))
    got = _run(spark, "records_test_daily").iloc[0]
    assert (got.n, got.n_records) == (n, recs)
    assert got.expected_micro == h
    assert got.excess_micro == recs * 10**6 - h


def test_siegel_brute(spark):
    xs = sorted(_daily_cents().items())
    meds = []
    for i, (xi, vi) in enumerate(xs):
        slopes = []
        for j, (xj, vj) in enumerate(xs):
            if i == j:
                continue
            num, den = abs(vj - vi) * 1000, abs(xj - xi)
            q = num // den
            slopes.append(q if (vj >= vi) == (xj > xi) else -q)
        slopes.sort()
        meds.append((slopes[(len(slopes) + 1) // 2 - 1], xi))
    meds.sort()
    want = meds[(len(meds) + 1) // 2 - 1][0]
    got = _run(spark, "siegel_repeated_medians_daily").iloc[0]
    assert (got.n_days, got.siegel_slope_milli) == (len(xs), want)


# ---------------------------------------------------------------------------
# Unit root + Erlang-B
# ---------------------------------------------------------------------------


def test_dickey_fuller_brute(spark):
    vs = [v for _, v in sorted(_daily_cents().items())]
    ys = [b - a for a, b in zip(vs, vs[1:])]
    zs = vs[:-1]
    m = len(ys)
    sy, sz = sum(ys), sum(zs)
    syy = sum(y * y for y in ys)
    szz = sum(z * z for z in zs)
    szy = sum(z * y for z, y in zip(zs, ys))
    dzy = m * szy - sz * sy
    dzz = m * szz - sz * sz
    dyy = m * syy - sy * sy
    got = _run(spark, "dickey_fuller_t_daily").iloc[0]
    assert got.n_obs == m
    assert got.gamma_micro == math.floor(
        float(dzy) * 10**6 / float(dzz)
    )
    ssr_m = float(dyy) - float(dzy) * float(dzy) / float(dzz)
    want_t = math.floor(
        float(dzy)
        * math.sqrt(float(m - 2) / (float(dzz) * ssr_m))
        * 1000
    )
    assert got.df_t_milli == want_t
    # gamma should be negative (mean-reverting daily revenue)
    assert got.gamma_micro < 0
    # cross-check t against the textbook OLS route on floats
    gamma = dzy / dzz
    alpha = (sy - gamma * sz) / m
    ssr = sum(
        (y - alpha - gamma * z) ** 2 for y, z in zip(ys, zs)
    )
    s2 = ssr / (m - 2)
    se = math.sqrt(s2 / (szz - sz * sz / m))
    assert abs(want_t / 1000 - gamma / se) < 0.01


def test_erlang_b_brute(spark):
    hours = defaultdict(int)
    for (ts,) in _sql("SELECT ts FROM '{SF}/events.parquet'"):
        hours[ts.replace(minute=0, second=0, microsecond=0)] += 1
    an, ad = sum(hours.values()), len(hours)
    b = 10**6
    bs = []
    for k in range(1, 9):
        b = (an * b * 10**6) // (k * ad * 10**6 + an * b)
        bs.append(b)
    got = _run(spark, "erlang_b_blocking_hourly").set_index("servers")
    assert len(got) == 8
    for k in range(1, 9):
        row = got.loc[k]
        assert row.offered_load_milli == 1000 * an // ad
        assert row.blocking_micro == bs[k - 1]
    # float cross-check of the final value vs the true recursion
    a = an / ad
    bf = 1.0
    for k in range(1, 9):
        bf = a * bf / (k + a * bf)
    assert abs(bs[7] / 1e6 - bf) < 2e-3
    # blocking decreases with more servers
    assert all(x > y for x, y in zip(bs, bs[1:]))


# ---------------------------------------------------------------------------
# Multimodal + embedding drift
# ---------------------------------------------------------------------------


def test_pgm_centroid_brute(spark):
    got = _run(spark, "multimodal_pgm_centroid_moments").set_index(
        "doc_id"
    )
    doc_ids = [d for (d,) in _sql(
        "SELECT doc_id FROM '{SF}/documents.parquet' WHERE doc_id < 120"
    )]
    assert len(got) == len(doc_ids)
    for d in doc_ids:
        w, h = d % 16 + 4, d % 12 + 4
        m00 = m10 = m01 = 0
        for i in range(w * h):
            p = (d * 31 + i * 7) % 256
            m00 += p
            m10 += (i % w) * p
            m01 += (i // w) * p
        row = got.loc[d]
        assert (row.width, row.height) == (w, h)
        assert (row.m00, row.m10, row.m01) == (m00, m10, m01)
        assert row.cx_milli == (m10 * 1000 // m00 if m00 else None)
        assert row.cy_milli == (m01 * 1000 // m00 if m00 else None)


def test_wav_diff_energy_brute(spark):
    got = _run(spark, "multimodal_wav_diff_energy").set_index("doc_id")
    doc_ids = [d for (d,) in _sql(
        "SELECT doc_id FROM '{SF}/documents.parquet' WHERE doc_id < 200"
    )]
    assert len(got) == len(doc_ids)
    for d in doc_ids:
        n = d % 200 + 50
        s = [((d * 131 + i * 17) % 2048) - 1024 for i in range(n)]
        e = sum(v * v for v in s)
        de = sum((b - a) ** 2 for a, b in zip(s, s[1:]))
        row = got.loc[d]
        assert (row.n_samples, row.energy, row.diff_energy) == (n, e, de)
        want = de * 10**6 // (4 * e) if e > 0 else None
        assert row.hf_ratio_ppm == want
        if want is not None:
            assert 0 <= want <= 10**6


def test_embedding_centroid_drift_brute(spark):
    sums = defaultdict(lambda: defaultdict(int))
    counts = defaultdict(int)
    for label, emb in _sql(
        "SELECT label, embedding FROM '{SF}/embeddings.parquet'"
    ):
        counts[label] += 1
        for pos, v in enumerate(emb):
            sums[label][pos] += math.floor(float(v) * 1000 + 0.5)
    cent = {}
    for label, by_pos in sums.items():
        n = counts[label]
        cent[label] = {}
        for pos, s in by_pos.items():
            q = (s * 1000) // n if s >= 0 else -(((-s) * 1000) // n)
            cent[label][pos] = q
    labels = sorted(cent)
    got = _run(spark, "embedding_centroid_drift_labels")
    want = []
    for i, la in enumerate(labels):
        for lb in labels[i + 1:]:
            l2 = sum(
                (cent[la][p] - cent[lb][p]) ** 2 for p in cent[la]
            )
            want.append((la, lb, l2 // 10**6))
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_ewma_control_chart_brute(spark):
    xs = sorted(_daily_cents().items())
    n = len(xs)
    s = sum(v for _, v in xs)
    q = sum(v * v for _, v in xs)
    mu = (s / n) / 100
    sig = math.sqrt(float(n * q - s * s)) / n / 100
    lam = 1.0 / 5.0
    dec2 = (1 - 1.0 / 5.0) * (1 - 1.0 / 5.0)
    got = _run(spark, "ewma_control_chart_daily").set_index("d")
    assert len(got) == n
    z = p = None
    for i, (d, c) in enumerate(xs):
        x = c / 100
        if i == 0:
            z, p = x, dec2
        else:
            z = lam * x + (1 - 1.0 / 5.0) * z
            p = p * dec2
        row = got.loc[d]
        assert row.daily_value == round(x * 10**6) / 10**6
        assert row.ewma == round(z * 10**6) / 10**6
        ucl = mu + sig * math.sqrt(1 - p)
        lcl = mu - sig * math.sqrt(1 - p)
        assert abs(row.ucl - ucl) < 2e-6 and abs(row.lcl - lcl) < 2e-6
        assert row.signal == (1 if z > ucl else (-1 if z < lcl else 0))


# ---------------------------------------------------------------------------
# Apportionment + chain ladder
# ---------------------------------------------------------------------------

_LCM20 = 232792560


def test_dhondt_brute(spark):
    rev = defaultdict(int)
    for nat, tp in _sql("""
        SELECT cu.c_nationkey, o.o_totalprice
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' cu ON cu.c_custkey = o.o_custkey
    """):
        rev[nat] += _cents(tp)

    def alloc(divisor):
        quots = []
        for nat, r in rev.items():
            for k in range(1, 21):
                quots.append((-(r * (_LCM20 * 2 // divisor(k))), nat, k))
        quots.sort()
        seats = defaultdict(int)
        for _, nat, _k in quots[:20]:
            seats[nat] += 1
        return seats

    dh = alloc(lambda k: 2 * k)      # keys r*(2L//2k) == r*(L//k)
    sl = alloc(lambda k: 2 * k - 1)
    got = _run(spark, "dhondt_allocation_nations").set_index("nation")
    assert len(got) == len(rev)
    for nat, r in rev.items():
        row = got.loc[nat]
        assert row.revenue_cents == r
        assert row.dhondt_seats == dh.get(nat, 0)
        assert row.sainte_lague_seats == sl.get(nat, 0)
    assert got.dhondt_seats.sum() == 20
    assert got.sainte_lague_seats.sum() == 20


def test_chain_ladder_brute(spark):
    paid = defaultdict(int)
    for od, sd, ext, disc in _sql("""
        SELECT o.o_orderdate, l.l_shipdate, l.l_extendedprice,
               l.l_discount
        FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
    """):
        cohort = od.year * 12 + od.month
        dev = (sd.year * 12 + sd.month) - cohort
        if 0 <= dev <= 6:
            v = ext * (1 - disc) * 100
            paid[(cohort, dev)] += int(v + (0.5 if v >= 0 else -0.5))
    cum = {}
    running = defaultdict(int)
    for (cohort, dev), amt in sorted(paid.items()):
        running[cohort] += amt
        cum[(cohort, dev)] = running[cohort]
    links = defaultdict(lambda: [0, 0, 0])
    for (cohort, dev), c in cum.items():
        nxt = cum.get((cohort, dev + 1))
        if nxt is not None:
            links[dev][0] += 1
            links[dev][1] += nxt
            links[dev][2] += c
    got = _run(spark, "chain_ladder_dev_factors").set_index("from_dev")
    assert len(got) == len(links)
    for dev, (ncoh, num, den) in links.items():
        row = got.loc[dev]
        assert (row.n_cohorts, row.next_cum_cents, row.cur_cum_cents) \
            == (ncoh, num, den)
        assert row.dev_factor_ppm == (
            num * 10**6 // den if den > 0 else None
        )


# ---------------------------------------------------------------------------
# Token Gini, burstiness, top-k stability
# ---------------------------------------------------------------------------


def test_token_gini_brute(spark):
    counts = _source_word_counts()
    got = _run(spark, "token_gini_by_source").set_index("source")
    for src, wc in counts.items():
        ranked = sorted(wc.items(), key=lambda p: (p[1], p[0]))
        n = len(ranked)
        t = sum(c for _, c in ranked)
        ic = sum((i + 1) * c for i, (_, c) in enumerate(ranked))
        want = (2 * ic - (n + 1) * t) * 10**6 // (n * t)
        row = got.loc[src]
        assert (row.n_types, row.n_tokens) == (n, t)
        assert row.token_gini_ppm == want
        assert 0 <= want <= 10**6


def test_burstiness_memory_brute(spark):
    seqs = defaultdict(list)
    for et, ts, eid in _sql(
        "SELECT event_type, ts, event_id FROM '{SF}/events.parquet'"
        " ORDER BY ts, event_id"
    ):
        seqs[et].append(ts)
    got = _run(
        spark, "interevent_burstiness_memory_types"
    ).set_index("event_type")
    for et, tss in seqs.items():
        gaps = [
            int((b - a).total_seconds() * 1_000_000)
            for a, b in zip(tss, tss[1:])
        ]
        n, s = len(gaps), sum(gaps)
        q = sum(g * g for g in gaps)
        row = got.loc[et]
        assert row.n_gaps == n
        sd = math.sqrt(float(n * q - s * s))
        want_b = math.floor((sd - s) * 1000 / (sd + s))
        assert row.burstiness_milli == want_b
        sg = sorted(gaps)
        xs, ys = sg[:-1], sg[1:]
        m = len(xs)
        sa, sb = sum(xs), sum(ys)
        qa = sum(x * x for x in xs)
        qb = sum(y * y for y in ys)
        sab = sum(x * y for x, y in zip(xs, ys))
        va, vb = m * qa - sa * sa, m * qb - sb * sb
        if va > 0 and vb > 0:
            want_m = math.floor(
                float(m * sab - sa * sb) * 1000
                / (math.sqrt(float(va)) * math.sqrt(float(vb)))
            )
        else:
            want_m = None
        assert row.sorted_memory_milli == want_m


def test_topk_stability_brute(spark):
    pm = defaultdict(lambda: defaultdict(int))
    for sd, pk, ext, disc in _sql(
        "SELECT l_shipdate, l_partkey, l_extendedprice, l_discount"
        " FROM '{SF}/lineitem.parquet'"
    ):
        v = ext * (1 - disc) * 100
        pm[sd.year * 100 + sd.month][pk] += int(
            v + (0.5 if v >= 0 else -0.5)
        )
    tops = {}
    for ym, parts in pm.items():
        ranked = sorted(parts.items(), key=lambda p: (-p[1], p[0]))
        tops[ym] = {pk for pk, _ in ranked[:10]}
    months = sorted(tops)
    got = _run(spark, "topk_stability_monthly_parts").set_index("ym")
    assert len(got) == len(months)
    for i, ym in enumerate(months):
        row = got.loc[ym]
        if i == 0:
            import pandas as pd
            assert pd.isna(row.prev_ym)
            assert row.jaccard_ppm is None or pd.isna(row.jaccard_ppm)
            continue
        prev = months[i - 1]
        c = len(tops[ym] & tops[prev])
        assert row.prev_ym == prev
        assert row.n_common == c
        assert row.jaccard_ppm == c * 10**6 // (20 - c)


# ---------------------------------------------------------------------------
# Linear counting + adstock
# ---------------------------------------------------------------------------


def test_linear_counting_brute(spark):
    import hashlib
    users = [u for (u,) in _sql(
        "SELECT DISTINCT user_id FROM '{SF}/events.parquet'"
    )]
    d = len(users)
    got = _run(spark, "linear_counting_audit").set_index("m_bits")
    for m in (256, 1024, 4096):
        occ = len({
            int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % m
            for u in users
        })
        row = got.loc[m]
        assert (row.occupied, row.true_distinct) == (occ, d)
        assert row.empty_frac_ppm == (m - occ) * 10**6 // m
        assert row.collision_loss_ppm == (d - occ) * 10**6 // d


def test_adstock_regression_brute(spark):
    days = defaultdict(lambda: [0, 0])
    for ts, et in _sql(
        "SELECT ts, event_type FROM '{SF}/events.parquet'"
    ):
        dd = _day(ts)
        if et == "click":
            days[dd][0] += 1
        elif et == "purchase":
            days[dd][1] += 1
        else:
            days[dd]  # day exists even without clicks/purchases
    zs, ys = [], []
    z = None
    for dd in sorted(days):
        clicks, purchases = days[dd]
        z = clicks * 1000 if z is None else clicks * 1000 + 7 * z // 10
        zs.append(z)
        ys.append(purchases)
    n = len(zs)
    sx, sy = sum(zs), sum(ys)
    sxx = sum(z * z for z in zs)
    sxy = sum(z * y for z, y in zip(zs, ys))
    got = _run(spark, "adstock_regression_daily").iloc[0]
    assert got.n == n
    den = n * sxx - sx * sx
    want = (
        math.floor(float(n * sxy - sx * sy) * 10**9 / float(den))
        if den > 0
        else None
    )
    assert got.beta_nano_per_milli == want
    assert got.mean_adstock_milli == sx // n
    assert got.mean_purchases_milli == sy * 1000 // n


# ---------------------------------------------------------------------------
# GROUPED_AGG IQR + partial correlation
# ---------------------------------------------------------------------------


def test_pandas_grouped_agg_iqr_brute(spark):
    groups = defaultdict(list)
    for pri, tp, ok in _sql(
        "SELECT o_orderpriority, o_totalprice, o_orderkey"
        " FROM '{SF}/orders.parquet'"
    ):
        groups[pri].append((_cents(tp), ok))
    got = _run(spark, "pandas_grouped_agg_iqr").set_index("pri")
    assert len(got) == len(groups)
    for pri, vals in groups.items():
        vals.sort()
        n = len(vals)
        q1 = vals[(n + 3) // 4 - 1][0]
        q3 = vals[(3 * n + 3) // 4 - 1][0]
        row = got.loc[pri]
        assert (row.n_orders, row.q1_cents, row.q3_cents) == (n, q1, q3)
        assert row.iqr_cents == q3 - q1


def test_partial_correlation_brute(spark):
    days = defaultdict(lambda: [0, 0, 0])
    for ts, et in _sql(
        "SELECT ts, event_type FROM '{SF}/events.parquet'"
    ):
        dd = days[_day(ts)]
        if et == "click":
            dd[0] += 1
        elif et == "purchase":
            dd[1] += 1
        elif et == "view":
            dd[2] += 1
    xs = [v[0] for v in days.values()]
    ys = [v[1] for v in days.values()]
    zs = [v[2] for v in days.values()]
    n = len(xs)

    def dets(a, b):
        return n * sum(x * y for x, y in zip(a, b)) - sum(a) * sum(b)

    dxy, dxz, dzy = dets(xs, ys), dets(xs, zs), dets(zs, ys)
    vx, vy, vz = dets(xs, xs), dets(ys, ys), dets(zs, zs)
    rxy = float(dxy) / math.sqrt(float(vx) * float(vy))
    rxz = float(dxz) / math.sqrt(float(vx) * float(vz))
    rzy = float(dzy) / math.sqrt(float(vz) * float(vy))
    den = (1 - rxz * rxz) * (1 - rzy * rzy)
    want = (
        math.floor((rxy - rxz * rzy) * 1000 / math.sqrt(den))
        if vx > 0 and vy > 0 and vz > 0 and den > 0
        else None
    )
    got = _run(spark, "partial_correlation_daily_events").iloc[0]
    assert got.n_days == n
    assert got.partial_corr_milli == want
    assert -1000 <= got.partial_corr_milli <= 1000


# ---------------------------------------------------------------------------
# Stochastic RSI + KST
# ---------------------------------------------------------------------------


def test_stoch_rsi_brute(spark):
    rets = [r for _, r in _returns(_daily_cents())]
    days = [x for x, _ in _returns(_daily_cents())]
    rsi = []
    for i in range(13, len(rets)):
        w = rets[i - 13: i + 1]
        su = sum(r for r in w if r > 0)
        sd = sum(-r for r in w if r < 0)
        rsi.append(
            (days[i], su * 10**6 // (su + sd) if su + sd > 0 else 500000)
        )
    got = _run(spark, "stoch_rsi_14_daily").set_index("x")
    cnt = 0
    for i in range(13, len(rsi)):
        w = [p for _, p in rsi[i - 13: i + 1]]
        lo, hi = min(w), max(w)
        row = got.loc[rsi[i][0]]
        assert row.rsi_ppm == rsi[i][1]
        want = (
            (rsi[i][1] - lo) * 10**6 // (hi - lo) if hi > lo else None
        )
        assert row.stoch_rsi_ppm == want
        cnt += 1
    assert len(got) == cnt


def test_kst_brute(spark):
    xs = sorted(_daily_cents().items())
    days = [x for x, _ in xs]
    vs = [v for _, v in xs]
    legs = {}
    for nn, wgt in ((10, 1), (15, 2), (20, 3), (30, 4)):
        rocs = []
        for i in range(len(vs)):
            if i < nn or vs[i - nn] <= 0:
                rocs.append(None)
            else:
                rocs.append(
                    _ssdiv(vs[i] - vs[i - nn], vs[i - nn], 10**6)
                )
        rcma = {}
        for i in range(len(rocs)):
            w = [r for r in rocs[max(0, i - 9): i + 1] if r is not None]
            if len(w) == 10 and rocs[i] is not None:
                rcma[days[i]] = _ssdiv(sum(w), 10, 1)
        legs[(nn, wgt)] = rcma
    want = {}
    for d in days:
        if all(d in legs[k] for k in legs):
            want[d] = sum(w * legs[(n, w)][d] for n, w in legs)
    got = _run(spark, "kst_daily").set_index("x")
    assert len(got) == len(want)
    for d, k in want.items():
        assert got.loc[d].kst_ppm == k


# ---------------------------------------------------------------------------
# Clustering quality
# ---------------------------------------------------------------------------


def _emb_grid():
    vecs = {}
    for vid, label, emb in _sql(
        "SELECT vec_id, label, embedding FROM '{SF}/embeddings.parquet'"
    ):
        vecs[vid] = (
            label,
            [math.floor(float(v) * 1000 + 0.5) for v in emb],
        )
    cents = {}
    by_label = defaultdict(list)
    for vid, (label, q) in vecs.items():
        by_label[label].append(q)
    for label, qs in by_label.items():
        n = len(qs)
        c = []
        for pos in range(len(qs[0])):
            s = sum(q[pos] for q in qs)
            c.append((s * 1000) // n if s >= 0 else -(((-s) * 1000) // n))
        cents[label] = (c, n)
    return vecs, cents


def test_silhouette_brute(spark):
    vecs, cents = _emb_grid()
    per_label = defaultdict(list)
    for vid, (label, q) in vecs.items():
        dd = {
            lb: sum(
                (qi * 1000 - ci) ** 2 for qi, ci in zip(q, c)
            )
            for lb, (c, _) in cents.items()
        }
        a2 = dd[label]
        b2 = min(v for lb, v in dd.items() if lb != label)
        if b2 > a2:
            s = (b2 - a2) * 10**6 // max(a2, b2)
        elif a2 > b2:
            s = -((a2 - b2) * 10**6 // max(a2, b2))
        else:
            s = 0
        per_label[label].append(s)
    got = _run(spark, "silhouette_simplified_labels").set_index("label")
    assert len(got) == len(per_label)
    for label, ss in per_label.items():
        row = got.loc[label]
        assert row.n_points == len(ss)
        t = sum(ss)
        want = t // len(ss) if t >= 0 else -(((-t) // len(ss)))
        assert row.mean_silhouette_ppm == want


def test_calinski_harabasz_brute(spark):
    vecs, cents = _emb_grid()
    dim = len(next(iter(vecs.values()))[1])
    n, k = len(vecs), len(cents)
    gsum = [0] * dim
    for _, (label, q) in vecs.items():
        for pos in range(dim):
            gsum[pos] += q[pos]
    gm = [
        (s * 1000) // n if s >= 0 else -(((-s) * 1000) // n)
        for s in gsum
    ]
    ssw = 0
    for _, (label, q) in vecs.items():
        c, _n = cents[label]
        ssw += sum((qi * 1000 - ci) ** 2 for qi, ci in zip(q, c))
    ssb = 0
    for label, (c, nm) in cents.items():
        ssb += nm * sum((ci - gi) ** 2 for ci, gi in zip(c, gm))
    got = _run(spark, "calinski_harabasz_labels").iloc[0]
    assert (got.n, got.k) == (n, k)
    want = ssb * (n - k) * 1000 // (ssw * (k - 1))
    assert got.ch_milli == want


# ---------------------------------------------------------------------------
# Chebyshev coverage + Gini mean difference
# ---------------------------------------------------------------------------


def test_chebyshev_coverage_brute(spark):
    vs = [v for _, v in sorted(_daily_cents().items())]
    n = len(vs)
    s, q = sum(vs), sum(v * v for v in vs)
    vv = n * q - s * s
    got = _run(spark, "chebyshev_coverage_audit").set_index("k")
    for k in (1, 2, 3):
        within = sum(1 for v in vs if (n * v - s) ** 2 <= k * k * vv)
        row = got.loc[k]
        assert (row.n, row.within) == (n, within)
        assert row.coverage_ppm == within * 10**6 // n
        floor = 0 if k == 1 else (k * k - 1) * 10**6 // (k * k)
        assert row.chebyshev_floor_ppm == floor
        assert row.coverage_ppm >= floor  # Chebyshev holds


def test_gini_mean_difference_brute(spark):
    vs = sorted(
        (v, x) for x, v in _daily_cents().items()
    )
    n = len(vs)
    s = sum(v for v, _ in vs)
    s2iv = sum(2 * (i + 1) * v for i, (v, _) in enumerate(vs))
    got = _run(spark, "gini_mean_difference_daily").iloc[0]
    assert got.n == n
    want_gmd = (2 * (s2iv - (n + 1) * s)) // (n * (n - 1))
    assert got.gmd_cents == want_gmd
    assert got.gini_ppm == (s2iv - (n + 1) * s) * 10**6 // (n * s)
    # brute pairwise cross-check of the rank identity
    vals = [v for v, _ in vs]
    pair_sum = sum(
        abs(a - b) for i, a in enumerate(vals) for b in vals[i + 1:]
    )
    assert want_gmd == 2 * pair_sum // (n * (n - 1))


# ---------------------------------------------------------------------------
# Drawdown spells + ARCH LM
# ---------------------------------------------------------------------------


def test_drawdown_spells_brute(spark):
    xs = sorted(_daily_cents().items())
    peak = -(10**30)
    spells = []
    cur = None
    for x, v in xs:
        peak = max(peak, v)
        if v < peak:
            if cur is None:
                cur = [x, 0, 0]  # start, len, depth
            cur[1] += 1
            cur[2] = max(cur[2], peak - v)
        else:
            if cur is not None:
                spells.append(tuple(cur))
                cur = None
    if cur is not None:
        spells.append(tuple(cur))
    got = _run(spark, "drawdown_spells_daily").iloc[0]
    assert got.n_spells == len(spells)
    assert got.longest_days == max(s[1] for s in spells)
    longest = sorted(spells, key=lambda s: (-s[1], s[0]))[0]
    assert got.longest_start_x == longest[0]
    assert got.deepest_cents == max(s[2] for s in spells)
    assert got.total_underwater_days == sum(s[1] for s in spells)


def test_arch_lm_brute(spark):
    rets = [r for _, r in _returns(_daily_cents())]
    sq = [r * r // 10**6 for r in rets]
    ys, zs = sq[1:], sq[:-1]
    m = len(ys)
    sy, sz = sum(ys), sum(zs)
    syy = sum(y * y for y in ys)
    szz = sum(z * z for z in zs)
    szy = sum(z * y for z, y in zip(zs, ys))
    dzy = m * szy - sz * sy
    dzz = m * szz - sz * sz
    dyy = m * syy - sy * sy
    got = _run(spark, "arch_lm_test_daily").iloc[0]
    assert got.n_obs == m
    r2 = (
        math.floor(float(dzy) * float(dzy) * 10**6
                   / (float(dzz) * float(dyy)))
        if dzz > 0 and dyy > 0
        else None
    )
    assert got.r2_ppm == r2
    assert got.lm_stat_milli == m * r2 // 1000
    assert 0 <= r2 <= 10**6


# ---------------------------------------------------------------------------
# Qini + streak census
# ---------------------------------------------------------------------------


def test_qini_brute(spark):
    rows = _sql("""
        WITH lab AS (
          SELECT o.o_orderkey,
                 CAST(round(o.o_totalprice * 100) AS BIGINT) AS score,
                 max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                     AS pos,
                 max(o.o_custkey) AS ck
          FROM '{SF}/orders.parquet' o
          JOIN '{SF}/lineitem.parquet' l
            ON l.l_orderkey = o.o_orderkey
          GROUP BY 1, 2
        )
        SELECT lab.score, lab.pos,
               CASE WHEN cu.c_mktsegment = 'BUILDING' THEN 1 ELSE 0
               END,
               lab.o_orderkey
        FROM lab JOIN '{SF}/customer.parquet' cu
          ON cu.c_custkey = lab.ck
    """)
    # replicate ntile(10) over (score DESC, treated, pos, okey)
    order = sorted(rows, key=lambda r: (-r[0], r[2], r[1], r[3]))
    n = len(order)
    base, rem = n // 10, n % 10
    deciles = []
    idx = 0
    for d in range(1, 11):
        size = base + (1 if d <= rem else 0)
        deciles.append(order[idx: idx + size])
        idx += size
    cyt = cnt_t = cyc = cnc = 0
    got = _run(spark, "qini_uplift_deciles").set_index("decile")
    for d, chunk in enumerate(deciles, start=1):
        cyt += sum(p for _, p, t, _k in chunk if t == 1)
        cnt_t += sum(1 for _, _p, t, _k in chunk if t == 1)
        cyc += sum(p for _, p, t, _k in chunk if t == 0)
        cnc += sum(1 for _, _p, t, _k in chunk if t == 0)
        row = got.loc[d]
        assert (row.cum_treated_pos, row.cum_treated) == (cyt, cnt_t)
        assert (row.cum_control_pos, row.cum_control) == (cyc, cnc)
        want = cyt - cyc * cnt_t // cnc if cnc > 0 else None
        assert row.qini_scaled == want


def test_updown_streak_census_brute(spark):
    rets = [r for _, r in _returns(_daily_cents())]
    signs = [1 if r > 0 else (-1 if r < 0 else 0) for r in rets]
    census = defaultdict(int)
    i = 0
    while i < len(signs):
        j = i
        while j < len(signs) and signs[j] == signs[i]:
            j += 1
        census[(signs[i], j - i)] += 1
        i = j
    got = _run(spark, "updown_streak_census_daily")
    assert [
        (r.direction, r.run_length, r.n_runs)
        for r in got.itertuples(index=False)
    ] == [
        (d, ln, c) for (d, ln), c in sorted(census.items())
    ]


# ---------------------------------------------------------------------------
# RMST
# ---------------------------------------------------------------------------


def test_rmst_brute(spark):
    per_cust = {}
    for ck, od in _sql(
        "SELECT o_custkey, o_orderdate FROM '{SF}/orders.parquet'"
    ):
        d = od.date() if hasattr(od, "date") else od
        if ck in per_cust:
            lo, hi = per_cust[ck]
            per_cust[ck] = (min(lo, d), max(hi, d))
        else:
            per_cust[ck] = (d, d)
    end_d = max(hi for _, hi in per_cust.values())
    buckets = defaultdict(lambda: [0, 0])
    for lo, hi in per_cust.values():
        b = (hi - lo).days // 90
        churned = 1 if (end_d - hi).days >= 180 else 0
        buckets[b][0] += churned
        buckets[b][1] += 1 - churned
    order = sorted(buckets)
    suffix = 0
    n_at = {}
    for b in reversed(order):
        suffix += sum(buckets[b])
        n_at[b] = suffix
    s = 10**6
    rmst = 0
    got = _run(spark, "rmst_customer_tenure").set_index("bucket")
    assert len(got) == len(order)
    for b in order:
        d = buckets[b][0]
        n = n_at[b]
        s = (s * (n - d)) // n
        rmst += s * 90
        row = got.loc[b]
        assert (row.n_risk, row.n_events) == (n, d)
        assert row.survival_ppm == s
        assert row.rmst_ppm_days == rmst
    # survival is non-increasing
    assert all(
        a >= b for a, b in zip(
            got.survival_ppm.tolist(), got.survival_ppm.tolist()[1:]
        )
    )


# ---------------------------------------------------------------------------
# Dunn post-hoc
# ---------------------------------------------------------------------------


def test_dunn_posthoc_brute(spark):
    vals = defaultdict(list)
    for pri, tp in _sql(
        "SELECT o_orderpriority, o_totalprice FROM '{SF}/orders.parquet'"
    ):
        vals[pri].append(_cents(tp))
    # doubled midranks over the pooled sample
    pooled = sorted(
        (x, pri) for pri, xs in vals.items() for x in xs
    )
    from itertools import groupby
    pos = 0
    rank2 = {}
    tie_T = 0
    for x, grp_iter in groupby(pooled, key=lambda p: p[0]):
        grp_list = list(grp_iter)
        t = len(grp_list)
        tie_T += t ** 3 - t
        rank2[x] = 2 * pos + t + 1
        pos += t
    s2r = {
        pri: sum(rank2[x] for x in xs) for pri, xs in vals.items()
    }
    nn = sum(len(xs) for xs in vals.values())
    pris = sorted(vals)
    got = _run(spark, "dunn_posthoc_priorities").set_index(
        ["pri_a", "pri_b"]
    )
    for i, pa in enumerate(pris):
        for pb in pris[i + 1:]:
            ni, nj = len(vals[pa]), len(vals[pb])
            num = s2r[pa] * nj - s2r[pb] * ni
            row = got.loc[(pa, pb)]
            assert (row.ni, row.nj) == (ni, nj)
            assert row.mean_rank_diff_x1 == math.floor(
                float(num) / float(2 * ni * nj)
            )
            den = (
                float(nn) * (nn + 1) * (nn - 1) - float(tie_T)
            ) * ni * nj * (ni + nj) / (12.0 * (nn - 1))
            want_z = math.floor(float(num) * 1000 / (2 * math.sqrt(den)))
            assert row.dunn_z_milli == want_z


# ---------------------------------------------------------------------------
# Pivot points + forecast monitors
# ---------------------------------------------------------------------------


def test_pivot_points_brute(spark):
    from datetime import date, timedelta as td
    months = defaultdict(list)
    for x, v in sorted(_daily_cents().items()):
        d = date(1970, 1, 1) + td(days=x)
        months[d.year * 100 + d.month].append((x, v))
    got = _run(spark, "pivot_points_monthly").set_index("ym")
    assert len(got) == len(months)
    for ym, xs in months.items():
        h = max(v for _, v in xs)
        l = min(v for _, v in xs)
        c = max(xs)[1]  # value at the max day
        p = (h + l + c) * 1000 // 3
        row = got.loc[ym]
        assert (row.high_cents, row.low_cents, row.close_cents) == (
            h, l, c,
        )
        assert row.pivot_milli == p
        assert row.r1_milli == 2 * p - l * 1000
        assert row.s1_milli == 2 * p - h * 1000
        assert row.r2_milli == p + (h - l) * 1000
        assert row.s2_milli == p - (h - l) * 1000


def test_theil_u_brute(spark):
    vs = [v for _, v in sorted(_daily_cents().items())]
    es = [b - a for a, b in zip(vs, vs[1:])]
    n = len(es)
    se = sum(e * e for e in es)
    sa = sum(v * v for v in vs[1:])
    sp = sum(v * v for v in vs[:-1])
    got = _run(spark, "theil_u_naive_daily").iloc[0]
    assert got.n == n
    want = math.floor(
        math.sqrt(float(se) / n) * 10**6
        / (math.sqrt(float(sa) / n) + math.sqrt(float(sp) / n))
    )
    assert got.theil_u1_ppm == want
    assert 0 <= want <= 10**6


def test_tracking_signal_brute(spark):
    rets = _returns(_daily_cents())
    got = _run(spark, "tracking_signal_naive_daily").set_index("x")
    assert len(got) == len(rets)
    cfe = sae = cnt = 0
    for x, e in rets:
        cfe += e
        sae += abs(e)
        cnt += 1
        row = got.loc[x]
        assert (row.error_cents, row.cum_error_cents) == (e, cfe)
        want = _ssdiv(cfe * cnt, sae, 1000) if sae > 0 else None
        assert row.tracking_signal_milli == want


# ---------------------------------------------------------------------------
# Causal diagnostics
# ---------------------------------------------------------------------------


def test_smd_balance_brute(spark):
    rows = _sql("""
        SELECT CASE WHEN cu.c_mktsegment = 'BUILDING' THEN 1 ELSE 0
               END,
               CAST(round(o.o_totalprice * 100) AS BIGINT),
               EXTRACT(month FROM CAST(o.o_orderdate AS DATE)),
               CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT)
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' cu ON cu.c_custkey = o.o_custkey
    """)
    covs = {
        "price_cents": [(t, p) for t, p, _, _ in rows],
        "order_month": [(t, m) for t, _, m, _ in rows],
        "priority_proxy": [(t, pr) for t, _, _, pr in rows],
    }
    got = _run(spark, "smd_covariate_balance_building").set_index(
        "covariate"
    )
    for cov, pairs in covs.items():
        tvals = [v for t, v in pairs if t == 1]
        cvals = [v for t, v in pairs if t == 0]
        nt, nc = len(tvals), len(cvals)
        st, sc = sum(tvals), sum(cvals)
        qt = sum(v * v for v in tvals)
        qc = sum(v * v for v in cvals)
        vt = (float(qt) * nt - float(st) * st) / (
            float(nt) * nt * (nt - 1)
        )
        vc = (float(qc) * nc - float(sc) * sc) / (
            float(nc) * nc * (nc - 1)
        )
        row = got.loc[cov]
        assert (row.n_treated, row.n_control) == (nt, nc)
        want = math.floor(
            (float(st) / nt - float(sc) / nc) * 1000
            / math.sqrt((vt + vc) / 2)
        )
        assert row.smd_milli == want


def test_evalue_brute(spark):
    got_or = _run(spark, "odds_risk_ratio_building_returns").iloc[0]
    a, b, c, d = got_or.a, got_or.b, got_or.c, got_or.d
    rr_ppm = a * (c + d) * 10**6 // (c * (a + b))
    got = _run(spark, "evalue_building_returns").iloc[0]
    assert (got.a, got.b, got.c, got.d) == (a, b, c, d)
    assert got.rr_ppm == rr_ppm
    # replicate the exact CASE tree
    if rr_ppm >= 10**6:
        want = math.floor(
            rr_ppm / 1000
            + math.sqrt(rr_ppm / 10**6 * (rr_ppm / 10**6 - 1)) * 1000
        )
    else:
        want = math.floor(
            10**9 / rr_ppm
            + math.sqrt(10**6 / rr_ppm * (10**6 / rr_ppm - 1)) * 1000
        )
    assert got.evalue_milli == want
    assert got.evalue_milli >= 1000  # E-value is always >= 1


# ---------------------------------------------------------------------------
# Double-sweep diameter
# ---------------------------------------------------------------------------


def test_diameter_double_sweep_brute(spark):
    edges = _copurchase_edges()
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)

    def bfs(seed):
        dist = {seed: 0}
        frontier = [seed]
        for hop in range(1, 5):
            nxt = set()
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        nxt.add(w)
            for w in nxt:
                dist[w] = hop
            frontier = sorted(nxt)
        far = max(dist.items(), key=lambda p: (p[1], -p[0]))
        # deterministic tie-break: max hop, MIN vertex
        best_hop = max(dist.values())
        far_v = min(v for v, h in dist.items() if h == best_hop)
        return far_v, best_hop, len(dist)

    start = min(adj)
    turn_v, d1, _ = bfs(start)
    far_v, d2, n2 = bfs(turn_v)
    got = _run(spark, "diameter_double_sweep_copurchase").iloc[0]
    assert (got.start_vertex, got.turn_vertex, got.first_sweep_dist) \
        == (start, turn_v, d1)
    assert (got.far_vertex, got.diameter_lower_bound, got.n_reached) \
        == (far_v, d2, n2)


# ---------------------------------------------------------------------------
# Markov predictability
# ---------------------------------------------------------------------------


def test_markov_predictability_brute(spark):
    seqs = defaultdict(list)
    for uid, ts, eid, et in _sql(
        "SELECT user_id, ts, event_id, event_type"
        " FROM '{SF}/events.parquet' ORDER BY ts, event_id"
    ):
        seqs[uid].append(et)
    trans = defaultdict(lambda: defaultdict(int))
    for types in seqs.values():
        for a, b in zip(types, types[1:]):
            trans[a][b] += 1
    got = _run(spark, "markov_predictability_event_types").set_index(
        "from_type"
    )
    tot_n = tot_max = 0
    weighted = 0
    for ft, tos in trans.items():
        n_s = sum(tos.values())
        c_max = max(tos.values())
        rep2 = sum(c * (c - 1) for c in tos.values())
        row = got.loc[ft]
        assert (row.n_transitions, row.modal_count) == (n_s, c_max)
        assert row.greedy_acc_ppm == c_max * 10**6 // n_s
        r2 = rep2 * 10**6 // (n_s * (n_s - 1)) if n_s > 1 else None
        assert row.renyi2_ppm == r2
        if n_s > 1:
            tot_n += n_s
            tot_max += c_max
            weighted += r2 * n_s
    row = got.loc["__ALL__"]
    assert (row.n_transitions, row.modal_count) == (tot_n, tot_max)
    assert row.greedy_acc_ppm == tot_max * 10**6 // tot_n
    assert row.renyi2_ppm == weighted // tot_n


# ---------------------------------------------------------------------------
# Seasonal strength
# ---------------------------------------------------------------------------


def test_seasonal_strength_brute(spark):
    from datetime import date, timedelta as td
    xs = sorted(_daily_cents().items())
    n = len(xs)
    s = sum(v for _, v in xs)
    q = sum(v * v for _, v in xs)
    sst_n = n * q - s * s
    got = _run(spark, "seasonal_strength_eta_daily").set_index(
        "seasonality"
    )

    def eta(keyfn):
        groups = defaultdict(lambda: [0, 0])
        for x, v in xs:
            g = keyfn(x)
            groups[g][0] += 1
            groups[g][1] += v
        b = 0
        for n_g, s_g in groups.values():
            dev = n * s_g - n_g * s
            b += dev * dev // n_g
        return len(groups), b * 10**6 // (n * sst_n)

    ng_dow, eta_dow = eta(lambda x: x % 7)
    ng_mon, eta_mon = eta(
        lambda x: (date(1970, 1, 1) + td(days=x)).month
    )
    row = got.loc["dow"]
    assert (row.n_groups, row.eta_sq_ppm) == (ng_dow, eta_dow)
    row = got.loc["month"]
    assert (row.n_groups, row.eta_sq_ppm) == (ng_mon, eta_mon)
    assert 0 <= eta_dow <= 10**6 and 0 <= eta_mon <= 10**6


# ---------------------------------------------------------------------------
# Matryoshka prefix recall
# ---------------------------------------------------------------------------


def test_matryoshka_recall_brute(spark):
    vecs = {}
    for vid, emb in _sql(
        "SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    ):
        vecs[vid] = [math.floor(float(v) * 1000 + 0.5) for v in emb]
    got = _run(spark, "matryoshka_prefix_recall").set_index("query_id")
    qids = sorted(v for v in vecs if v < 20)
    assert len(got) == len(qids)
    for qid in qids:
        qv = vecs[qid]
        scored = []
        for cid, cv in vecs.items():
            if cid == qid:
                continue
            full = sum(a * b for a, b in zip(qv, cv))
            p16 = sum(a * b for a, b in zip(qv[:16], cv[:16]))
            scored.append((cid, full, p16))
        top_full = {
            cid for cid, *_ in sorted(
                scored, key=lambda t: (-t[1], t[0])
            )[:10]
        }
        top_16 = {
            cid for cid, *_ in sorted(
                scored, key=lambda t: (-t[2], t[0])
            )[:10]
        }
        ov = len(top_full & top_16)
        row = got.loc[qid]
        assert row.overlap_at_10 == ov
        assert row.recall_ppm == ov * 100000


# ---------------------------------------------------------------------------
# A/D line + Force Index
# ---------------------------------------------------------------------------


def _event_bars_py():
    bars = {}
    for ts, eid, val in _sql(
        "SELECT ts, event_id, value FROM '{SF}/events.parquet'"
    ):
        d = _day(ts)
        c = _cents(val)
        if d not in bars:
            bars[d] = [c, c, (eid, c), 0]
        b = bars[d]
        b[0] = max(b[0], c)
        b[1] = min(b[1], c)
        if eid > b[2][0]:
            b[2] = (eid, c)
        b[3] += 1
    return {
        d: (hi, lo, cl[1], vol)
        for d, (hi, lo, cl, vol) in bars.items()
    }


def test_adl_brute(spark):
    bars = _event_bars_py()
    got = _run(spark, "accumulation_distribution_daily").set_index("d")
    assert len(got) == len(bars)
    adl = 0
    for d in sorted(bars):
        hi, lo, cl, vol = bars[d]
        mf = (
            _ssdiv((2 * cl - lo - hi) * vol, hi - lo, 10**6)
            if hi > lo
            else 0
        )
        adl += mf
        row = got.loc[d]
        assert (row.high_cents, row.low_cents, row.close_cents,
                row.volume) == (hi, lo, cl, vol)
        assert row.money_flow_micro == mf
        assert row.adl_micro == adl


def test_force_index_brute(spark):
    bars = _event_bars_py()
    days = sorted(bars)
    raw = []
    for a, b in zip(days, days[1:]):
        raw.append((b, (bars[b][2] - bars[a][2]) * bars[b][3]))
    got = _run(spark, "force_index_13_daily").set_index("d")
    cnt = 0
    for i in range(12, len(raw)):
        s13 = sum(f for _, f in raw[i - 12: i + 1])
        row = got.loc[raw[i][0]]
        assert row.force_cents_vol == raw[i][1]
        assert row.force_index_sma13 == _ssdiv(s13, 13, 1)
        cnt += 1
    assert len(got) == cnt


# ---------------------------------------------------------------------------
# Cowles-Jones + Buishand range
# ---------------------------------------------------------------------------


def test_cowles_jones_brute(spark):
    signs = [
        1 if r > 0 else -1
        for _, r in _returns(_daily_cents())
        if r != 0
    ]
    cont = sum(1 for a, b in zip(signs, signs[1:]) if a == b)
    rev = sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    got = _run(spark, "cowles_jones_daily").iloc[0]
    assert (got.continuations, got.reversals) == (cont, rev)
    assert got.cj_ratio_ppm == (
        cont * 10**6 // rev if rev > 0 else None
    )


def test_buishand_brute(spark):
    vs = [v for _, v in sorted(_daily_cents().items())]
    n = len(vs)
    s, q = sum(vs), sum(v * v for v in vs)
    vv = n * q - s * s
    pt = 0
    pmax = pmin = None
    for v in vs:
        pt += n * v - s
        pmax = pt if pmax is None else max(pmax, pt)
        pmin = pt if pmin is None else min(pmin, pt)
    got = _run(spark, "buishand_range_daily").iloc[0]
    assert (got.n, got.max_partial_sum, got.min_partial_sum) == (
        n, pmax, pmin,
    )
    want = math.floor(
        float(pmax - pmin) * 1000
        / (math.sqrt(float(vv)) * math.sqrt(float(n)))
    )
    assert got.rescaled_range_milli == want
    # float cross-check vs the textbook R/(sigma*sqrt(n))
    import statistics
    mean = s / n
    sig = math.sqrt(sum((v - mean) ** 2 for v in vs) / n)
    parts = []
    acc = 0.0
    for v in vs:
        acc += v - mean
        parts.append(acc)
    r_classic = (max(parts) - min(parts)) / (sig * math.sqrt(n))
    assert abs(want / 1000 - r_classic) < 2e-3
