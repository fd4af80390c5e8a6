"""Independent-reference checks for the round-12 operator batch —
the house "simulator equality" pattern: the DuckDB oracle is the
driver's gate; these tests re-derive the same answers from plain
Python (sorted lists, dict aggregation, Fraction-free integer
arithmetic), so a shared SQL-side misconception cannot hide in both
engines.
"""

from __future__ import annotations

import math
import re
from collections import defaultdict
from datetime import date, datetime, timedelta

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


def _floor_secs(dt: datetime) -> int:
    return (dt - EPOCH) // timedelta(seconds=1)


# ---------------------------------------------------------------------------
# Sessionization shared by three operators: 30-min strict gap, (ts,
# event_id) order — returns per-session event lists.
# ---------------------------------------------------------------------------


def _sessions():
    rows = _sql(
        "SELECT user_id, ts, event_id, event_type FROM "
        "read_parquet('{SF}/events.parquet') ORDER BY user_id, ts, event_id"
    )
    by_user: dict = defaultdict(list)
    for u, ts, eid, et in rows:
        by_user[u].append((ts, eid, et))
    out = []
    gap = timedelta(minutes=30)
    for u in by_user:
        cur = []
        prev = None
        for ev in by_user[u]:
            if prev is not None and ev[0] - prev > gap:
                out.append(cur)
                cur = []
            cur.append(ev)
            prev = ev[0]
        out.append(cur)
    return out


# ---------------------------------------------------------------------------
# Kendall's W: dense grid + textbook formula
# ---------------------------------------------------------------------------


def test_kendall_w_brute_grid(spark):
    got = _run(spark, "kendall_w_nation_months").iloc[0]
    per = dict()
    for ym, nname, rev in [
        (r[0], r[1], _cents_sum(r[2]))
        for r in _sql(
            "SELECT CAST(EXTRACT(year FROM o.o_orderdate)*100"
            " + EXTRACT(month FROM o.o_orderdate) AS BIGINT),"
            " n.n_name, list(o.o_totalprice)"
            " FROM read_parquet('{SF}/orders.parquet') o"
            " JOIN read_parquet('{SF}/customer.parquet') c"
            "   ON c.c_custkey = o.o_custkey"
            " JOIN read_parquet('{SF}/nation.parquet') n"
            "   ON n.n_nationkey = c.c_nationkey"
            " GROUP BY 1, 2"
        )
    ]:
        per[(ym, nname)] = rev
    months = sorted({ym for ym, _ in per})
    nations = [r[0] for r in _sql(
        "SELECT n_name FROM read_parquet('{SF}/nation.parquet')"
    )]
    n, m = len(nations), len(months)
    r_sum: dict = defaultdict(int)
    for ym in months:
        board = sorted(
            ((-per.get((ym, na), 0), na) for na in nations)
        )
        for rk, (_, na) in enumerate(board, start=1):
            r_sum[na] += rk
    sum_d2 = sum(
        (2 * r_sum[na] - m * (n + 1)) ** 2 for na in nations
    )
    w_ppm = sum_d2 * 3000000 // (4 * m * m * (n**3 - n))
    assert int(got.n_nations) == n and int(got.m_months) == m
    assert int(got.sum_d2_x4) == sum_d2
    assert int(got.w_ppm) == w_ppm


def _cents_sum(vals) -> int:
    return sum(_cents(v) for v in vals)


# ---------------------------------------------------------------------------
# Monetary-unit sampling: cumulative strike scan
# ---------------------------------------------------------------------------


def test_monetary_unit_sampling_brute_scan(spark):
    got = _run(spark, "monetary_unit_sampling_orders")
    rows = sorted(
        (k, _cents(p))
        for k, p in _sql(
            "SELECT o_orderkey, o_totalprice FROM "
            "read_parquet('{SF}/orders.parquet')"
        )
    )
    tot = sum(v for _, v in rows)
    j, off = tot // 100, (tot // 100) // 2
    cum, exp = 0, []
    for k, v in rows:
        cum += v
        hits = (cum - off + j) // j - (cum - v - off + j) // j
        if hits > 0:
            exp.append((k, v, cum, hits))
    assert [
        (r.o_orderkey, r.order_cents, r.cum_cents, r.n_hits)
        for r in got.itertuples()
    ] == exp
    # every order >= one full interval is selected with certainty
    for k, v in rows:
        if v >= j:
            assert k in {e[0] for e in exp}


# ---------------------------------------------------------------------------
# Quartile shape: sorted-list quartiles + fences
# ---------------------------------------------------------------------------


def test_robust_quartile_shape_brute(spark):
    got = _run(spark, "robust_quartile_shape_by_priority")
    per: dict = defaultdict(list)
    for pr, p in _sql(
        "SELECT o_orderpriority, o_totalprice FROM "
        "read_parquet('{SF}/orders.parquet')"
    ):
        per[pr].append(_cents(p))
    assert list(got.priority) == sorted(per)
    for r in got.itertuples():
        xs = sorted(per[r.priority])
        n = len(xs)
        q1 = xs[(n + 3) // 4 - 1]
        q2 = xs[(n + 1) // 2 - 1]
        q3 = xs[(3 * n + 1) // 4 - 1]
        assert (r.n, r.q1_cents, r.q2_cents, r.q3_cents) == (n, q1, q2, q3)
        iqr = q3 - q1
        assert r.bowley_milli == (q3 + q1 - 2 * q2) * 1000 // iqr
        assert r.qcd_milli == iqr * 1000 // (q3 + q1)
        lo, hi = q1 - 3 * iqr // 2, q3 + 3 * iqr // 2
        assert r.n_low_outliers == sum(1 for x in xs if x < lo)
        assert r.n_high_outliers == sum(1 for x in xs if x > hi)


# ---------------------------------------------------------------------------
# Kruskal-Wallis: midrank replay on the pooled sorted values
# ---------------------------------------------------------------------------


def test_kruskal_wallis_midrank_replay(spark):
    got = _run(spark, "kruskal_wallis_priorities")
    per: dict = defaultdict(list)
    for pr, p in _sql(
        "SELECT o_orderpriority, o_totalprice FROM "
        "read_parquet('{SF}/orders.parquet')"
    ):
        per[pr].append(_cents(p))
    pooled = sorted(x for xs in per.values() for x in xs)
    n_tot = len(pooled)
    before: dict = {}
    t_of: dict = defaultdict(int)
    for x in pooled:
        t_of[x] += 1
    run = 0
    for x in sorted(t_of):
        before[x] = run
        run += t_of[x]
    r2 = {
        g: sum(2 * before[x] + t_of[x] + 1 for x in xs)
        for g, xs in per.items()
    }
    contrib = {
        g: r2[g] ** 2 * 3000 // (len(per[g]) * n_tot * (n_tot + 1))
        for g in per
    }
    h_milli = sum(contrib.values()) - 3000 * (n_tot + 1)
    tie_c = 1000000 - sum(
        t**3 - t for t in t_of.values()
    ) * 1000000 // (n_tot**3 - n_tot)
    for r in got.itertuples():
        assert r.n_g == len(per[r.priority])
        assert r.rank2_sum == r2[r.priority]
        assert r.n_tot == n_tot
        assert r.h_milli == h_milli
        assert r.tie_c_ppm == tie_c
    # the rank sums of all groups must account for every pooled rank
    assert sum(r2.values()) == n_tot * (n_tot + 1)


# ---------------------------------------------------------------------------
# Cramer-von Mises: CDF-gap replay
# ---------------------------------------------------------------------------


def test_cramer_von_mises_cdf_replay(spark):
    got = _run(spark, "cramer_von_mises_sources").iloc[0]
    xs = {
        "src0": sorted(
            v for (v,) in _sql(
                "SELECT n_chars FROM read_parquet('{SF}/documents.parquet')"
                " WHERE source = 'src0'"
            )
        ),
        "src1": sorted(
            v for (v,) in _sql(
                "SELECT n_chars FROM read_parquet('{SF}/documents.parquet')"
                " WHERE source = 'src1'"
            )
        ),
    }
    n1, n2 = len(xs["src0"]), len(xs["src1"])
    vals = sorted(set(xs["src0"]) | set(xs["src1"]))
    u = f1 = f2 = 0
    c1 = defaultdict(int)
    c2 = defaultdict(int)
    for v in xs["src0"]:
        c1[v] += 1
    for v in xs["src1"]:
        c2[v] += 1
    for v in vals:
        f1 += c1[v]
        f2 += c2[v]
        u += (c1[v] + c2[v]) * (f1 * n2 - f2 * n1) ** 2
    n = n1 + n2
    assert (int(got.n1), int(got.n2)) == (n1, n2)
    assert int(got.t_cvm_micro) == u * 1000000 // (n1 * n2 * n * n)


# ---------------------------------------------------------------------------
# Shift-share: dict replay + to-the-cent reconciliation
# ---------------------------------------------------------------------------


def test_shift_share_reconciles_to_the_cent(spark):
    # round 13: base year is DERIVED (min order year, vs min+1) — the
    # hardcoded-1994 fixture assumption went vacuous when the testdata
    # date span moved; t = yr - yr0 in {0, 1} mirrors the operator.
    got = _run(spark, "shift_share_nation_brandmix")
    yr0 = _sql(
        "SELECT CAST(min(EXTRACT(year FROM o_orderdate)) AS BIGINT)"
        " FROM read_parquet('{SF}/orders.parquet')"
    )[0][0]
    cell: dict = defaultdict(int)
    for nname, brand, yr, price in _sql(
        "SELECT n.n_name, p.p_brand,"
        " CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT),"
        " l.l_extendedprice"
        " FROM read_parquet('{SF}/lineitem.parquet') l"
        " JOIN read_parquet('{SF}/orders.parquet') o"
        "   ON o.o_orderkey = l.l_orderkey"
        " JOIN read_parquet('{SF}/customer.parquet') c"
        "   ON c.c_custkey = o.o_custkey"
        " JOIN read_parquet('{SF}/nation.parquet') n"
        "   ON n.n_nationkey = c.c_nationkey"
        " JOIN read_parquet('{SF}/part.parquet') p"
        "   ON p.p_partkey = l.l_partkey"
    ):
        t = yr - yr0
        if t in (0, 1):
            cell[(nname, brand, t)] += _cents(price)
    b = defaultdict(int)
    rn = defaultdict(int)
    for (nname, brand, t), v in cell.items():
        b[(brand, t)] += v
        rn[t] += v
    seen = set()
    for r in got.itertuples():
        key = (r.n_name, r.p_brand)
        seen.add(key)
        r0 = cell[(r.n_name, r.p_brand, 0)]
        r1 = cell[(r.n_name, r.p_brand, 1)]
        ns = r0 * rn[1] // rn[0] - r0
        bg = r0 * b[(r.p_brand, 1)] // b[(r.p_brand, 0)] - r0
        assert (r.rev_base_cents, r.rev_next_cents) == (r0, r1)
        assert r.national_effect_cents == ns
        assert r.mix_effect_cents == bg - ns
        assert r.competitive_effect_cents == (r1 - r0) - bg
        assert (
            r.national_effect_cents
            + r.mix_effect_cents
            + r.competitive_effect_cents
            == r1 - r0
        )
    both = {
        (na, br)
        for (na, br, t) in cell
        if t == 0 and (na, br, 1) in cell
    }
    assert seen == both
    assert seen  # non-vacuous: the derived base year must exist


# ---------------------------------------------------------------------------
# Hodges-Lehmann: full pair-list median
# ---------------------------------------------------------------------------


def test_hodges_lehmann_pair_median(spark):
    got = _run(spark, "hodges_lehmann_daily_value").iloc[0]
    daily: dict = defaultdict(int)
    for d, p in _sql(
        "SELECT CAST(o_orderdate AS DATE), o_totalprice FROM "
        "read_parquet('{SF}/orders.parquet')"
    ):
        daily[(d - date(1970, 1, 1)).days] += _cents(p)
    ds = sorted(daily)
    pairs = sorted(
        (daily[ds[i]] + daily[ds[j]], ds[i], ds[j])
        for i in range(len(ds))
        for j in range(i, len(ds))
    )
    m = len(pairs)
    w = pairs[(m + 1) // 2 - 1][0]
    assert int(got.n_days) == len(ds)
    assert int(got.n_pairs) == m
    assert int(got.hl_doubled_cents) == w
    assert int(got.hl_cents) == w // 2


# ---------------------------------------------------------------------------
# Apdex: threshold replay
# ---------------------------------------------------------------------------


def test_apdex_threshold_replay(spark):
    got = _run(spark, "apdex_ship_latency_monthly")
    agg: dict = defaultdict(lambda: [0, 0, 0, 0])  # n, sat, tol, fru
    for od, sd in _sql(
        "SELECT CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)"
        " FROM read_parquet('{SF}/lineitem.parquet') l"
        " JOIN read_parquet('{SF}/orders.parquet') o"
        "   ON o.o_orderkey = l.l_orderkey"
    ):
        d = (sd - od).days
        a = agg[od.year * 100 + od.month]
        a[0] += 1
        a[1 if d <= 30 else (2 if d <= 120 else 3)] += 1
    assert list(got.yyyymm) == sorted(agg)
    for r in got.itertuples():
        n, sat, tol, fru = agg[r.yyyymm]
        assert (r.n, r.satisfied, r.tolerating, r.frustrated) == (
            n, sat, tol, fru,
        )
        assert r.apdex_milli == 1000 * (2 * sat + tol) // (2 * n)


# ---------------------------------------------------------------------------
# Price indexes: matched-basket replay, Fisher between L and P
# ---------------------------------------------------------------------------


def test_price_index_matched_basket_replay(spark):
    got = _run(spark, "price_index_laspeyres_fisher_monthly")
    bm: dict = defaultdict(lambda: [0, 0])  # q, r
    for brand, sd, qty, price in _sql(
        "SELECT p.p_brand, CAST(l.l_shipdate AS DATE), l.l_quantity,"
        " l.l_extendedprice"
        " FROM read_parquet('{SF}/lineitem.parquet') l"
        " JOIN read_parquet('{SF}/part.parquet') p"
        "   ON p.p_partkey = l.l_partkey"
    ):
        a = bm[(brand, sd.year * 100 + sd.month)]
        a[0] += int(qty + 0.5)
        a[1] += _cents(price)
    m0 = min(ym for _, ym in bm)
    base = {
        br: tuple(v)
        for (br, ym), v in bm.items()
        if ym == m0 and v[0] > 0
    }
    exp = {}
    for (br, ym), (qt, rt) in bm.items():
        if qt <= 0 or br not in base:
            continue
        q0, r0 = base[br]
        e = exp.setdefault(ym, [0, 0, 0, 0, 0])
        e[0] += 1
        e[1] += r0
        e[2] += rt
        e[3] += rt * q0 // qt
        e[4] += r0 * qt // q0
    assert list(got.yyyymm) == sorted(exp)
    for r in got.itertuples():
        nb, sum_r0, sum_rt, l_num, p_den = exp[r.yyyymm]
        lasp = l_num * 1000000 // sum_r0
        paas = sum_rt * 1000000 // p_den
        assert r.n_brands == nb
        assert r.laspeyres_ppm == lasp
        assert r.paasche_ppm == paas
        assert r.fisher_ppm == int(math.sqrt(lasp * paas) + 0.5)
        # Fisher is the geometric mean: it must lie between L and P
        assert min(lasp, paas) <= r.fisher_ppm <= max(lasp, paas) + 1
    # base month indexes at exactly 1e6 by construction
    base_row = got[got.yyyymm == m0].iloc[0]
    assert base_row.laspeyres_ppm == 1000000
    assert base_row.paasche_ppm == 1000000


# ---------------------------------------------------------------------------
# Stochastic oscillator: trailing range-window replay
# ---------------------------------------------------------------------------


def test_stochastic_oscillator_range_window_replay(spark):
    got = _run(spark, "stochastic_oscillator_daily")
    daily: dict = defaultdict(int)
    for d, p in _sql(
        "SELECT CAST(o_orderdate AS DATE), o_totalprice FROM "
        "read_parquet('{SF}/orders.parquet')"
    ):
        daily[(d - date(1970, 1, 1)).days] += _cents(p)
    ds = sorted(daily)
    ks = []
    for d in ds:
        win = [daily[x] for x in ds if d - 13 <= x <= d]
        lo, hi = min(win), max(win)
        k = (
            (daily[d] - lo) * 1000000 // (hi - lo) if hi > lo else None
        )
        ks.append((d, daily[d], lo, hi, k))
    assert list(got.d) == ds
    for i, r in enumerate(got.itertuples()):
        d, x, lo, hi, k = ks[i]
        assert (r.value_cents, r.low14, r.high14) == (x, lo, hi)
        assert (None if r.k_ppm != r.k_ppm else r.k_ppm) == k  # NaN-safe
        trio = [ks[j][4] if j >= 0 else None for j in (i, i - 1, i - 2)]
        exp_d = (
            None
            if any(t is None for t in trio)
            else sum(trio) // 3
        )
        assert (None if r.d_ppm != r.d_ppm else r.d_ppm) == exp_d


# ---------------------------------------------------------------------------
# Bounce rate / entry-exit / Little's law: python sessionizer replay
# ---------------------------------------------------------------------------


def test_bounce_rate_session_replay(spark):
    got = _run(spark, "bounce_rate_daily_sessions")
    agg: dict = defaultdict(lambda: [0, 0])
    for sess in _sessions():
        day = sess[0][0].replace(
            hour=0, minute=0, second=0, microsecond=0
        )
        a = agg[day]
        a[0] += 1
        a[1] += 1 if len(sess) == 1 else 0
    assert list(got.day) == sorted(agg)
    for r in got.itertuples():
        s, b = agg[r.day.to_pydatetime()]
        assert (r.n_sessions, r.n_bounces) == (s, b)
        assert r.bounce_milli == 1000 * b // s


def test_entry_exit_matrix_session_replay(spark):
    got = _run(spark, "entry_exit_matrix_sessions")
    m: dict = defaultdict(int)
    for sess in _sessions():
        m[(sess[0][2], sess[-1][2])] += 1
    rows = {(r.entry_type, r.exit_type): r for r in got.itertuples()}
    assert set(rows) == set(m)
    row_tot: dict = defaultdict(int)
    for (en, _), c in m.items():
        row_tot[en] += c
    for key, c in m.items():
        assert rows[key].n_sessions == c
        assert rows[key].row_share_ppm == c * 1000000 // row_tot[key[0]]
    # matrix totals == session count
    assert sum(m.values()) == len(_sessions())


def test_littles_law_interval_replay(spark):
    got = _run(spark, "littles_law_daily_events")
    arrivals: dict = defaultdict(lambda: [0, 0])
    occupied: dict = defaultdict(int)
    for sess in _sessions():
        s, e = sess[0][0], sess[-1][0]
        day0 = s.replace(hour=0, minute=0, second=0, microsecond=0)
        a = arrivals[day0]
        a[0] += 1
        a[1] += _floor_secs(e) - _floor_secs(s)
        day = day0
        while day <= e:
            lo = max(s, day)
            hi = min(e, day + timedelta(days=1))
            occupied[day] += _floor_secs(hi) - _floor_secs(lo)
            day += timedelta(days=1)
    assert list(got.day) == sorted(arrivals)
    for r in got.itertuples():
        n, dur = arrivals[r.day.to_pydatetime()]
        occ = occupied.get(r.day.to_pydatetime(), 0)
        assert (r.n_started, r.started_dur_secs) == (n, dur)
        assert r.occupied_secs == occ
        if dur > 0:
            assert r.littles_ratio_ppm == occ * 1000000 // dur
        else:
            assert r.littles_ratio_ppm != r.littles_ratio_ppm  # NULL


# ---------------------------------------------------------------------------
# ARI readability: regex replay
# ---------------------------------------------------------------------------


def test_readability_ari_regex_replay(spark):
    got = _run(spark, "readability_ari_by_source")
    agg: dict = defaultdict(lambda: [0, 0, 0, 0])
    for src, text in _sql(
        "SELECT source, text FROM read_parquet('{SF}/documents.parquet')"
    ):
        c = len(re.sub(r"[^A-Za-z0-9]", "", text))
        w = len([t for t in re.split(r"\s+", text) if t != ""])
        s = max(len(re.findall(r"[.!?]+", text)), 1)
        if w == 0:
            continue
        a = agg[src]
        a[0] += 1
        a[1] += c
        a[2] += w
        a[3] += s
    assert list(got.source) == sorted(agg)
    for r in got.itertuples():
        n, c, w, s = agg[r.source]
        assert (r.n_docs, r.n_chars_alnum, r.n_words, r.n_sentences) == (
            n, c, w, s,
        )
        assert r.ari_centi == (471 * c * s + 50 * w * w) // (w * s) - 2143
        assert r.words_per_sentence_milli == 1000 * w // s


# ---------------------------------------------------------------------------
# Join-view IVM: incremental == python snapshot recompute
# ---------------------------------------------------------------------------


def test_matview_join_ivm_snapshot_recompute(spark):
    got = _run(spark, "matview_join_ivm_orders")
    nation_of = dict(
        _sql(
            "SELECT c.c_custkey, n.n_name"
            " FROM read_parquet('{SF}/customer.parquet') c"
            " JOIN read_parquet('{SF}/nation.parquet') n"
            "   ON n.n_nationkey = c.c_nationkey"
        )
    )
    agg: dict = defaultdict(lambda: [0, 0])
    for k, cust, p in _sql(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM "
        "read_parquet('{SF}/orders.parquet')"
    ):
        na = nation_of[cust]
        if k % 97 != 0:
            a = agg[na]
            a[0] += 1
            a[1] += _cents(p)
        if k % 101 == 0:
            a = agg[na]
            a[0] += 1
            a[1] += int(p * 1.07 * 100 + 0.5)
    assert list(got.n_name) == sorted(na for na in agg if agg[na][0] > 0)
    for r in got.itertuples():
        n, rev = agg[r.n_name]
        assert (r.n_orders, r.rev_cents) == (n, rev)


# ---------------------------------------------------------------------------
# Durbin-Watson: shift-invariant numerator + floored-mean denominator
# ---------------------------------------------------------------------------


def test_durbin_watson_brute(spark):
    got = _run(spark, "durbin_watson_daily_revenue").iloc[0]
    daily: dict = defaultdict(int)
    for d, p in _sql(
        "SELECT CAST(o_orderdate AS DATE), o_totalprice FROM "
        "read_parquet('{SF}/orders.parquet')"
    ):
        daily[d] += _cents(p)
    xs = [daily[d] for d in sorted(daily)]
    n, s = len(xs), sum(xs)
    m0 = s // n
    num = sum((xs[i] - xs[i - 1]) ** 2 for i in range(1, n))
    den = sum((x - m0) ** 2 for x in xs)
    assert int(got.n_days) == n
    assert int(got.dw_milli) == num * 1000 // den
    # white-noise-ish revenue: DW must land in the open (0, 4) band
    assert 0 < got.dw_milli < 4000


# ---------------------------------------------------------------------------
# Ratio-to-moving-average seasonal index
# ---------------------------------------------------------------------------


def test_seasonal_index_ratio_to_ma_brute(spark):
    got = _run(spark, "monthly_seasonal_index_ratio_to_ma")
    monthly: dict = defaultdict(int)
    for d, p in _sql(
        "SELECT CAST(o_orderdate AS DATE), o_totalprice FROM "
        "read_parquet('{SF}/orders.parquet')"
    ):
        monthly[(d.year * 12 + d.month - 1, d.month)] += _cents(p)
    keys = sorted(monthly)
    by_mx = {mx: r for (mx, _), r in monthly.items()}
    ratios: dict = defaultdict(list)
    for mx, cal in keys:
        w13 = [by_mx[x] for x in by_mx if mx - 6 <= x <= mx + 6]
        if len(w13) != 13:
            continue
        s13 = sum(w13)
        s11 = sum(by_mx[x] for x in by_mx if mx - 5 <= x <= mx + 5)
        ratios[cal].append(by_mx[mx] * 24000000 // (s13 + s11))
    assert list(got.cal_month) == sorted(ratios)
    for r in got.itertuples():
        rs = ratios[r.cal_month]
        assert r.n_obs == len(rs)
        assert r.seasonal_index_ppm == sum(rs) // len(rs)
    # multiplicative indexes must average near 1e6 across the year
    mean_idx = sum(
        r.seasonal_index_ppm for r in got.itertuples()
    ) / len(got)
    assert 900000 < mean_idx < 1100000


# ---------------------------------------------------------------------------
# Cochran-Armitage: moment replay + identical IEEE tree
# ---------------------------------------------------------------------------


def test_cochran_armitage_moment_replay(spark):
    got = _run(spark, "cochran_armitage_trend_returns").iloc[0]
    per: dict = {}
    for k, w, pos in _sql(
        "SELECT o.o_orderkey,"
        " CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT),"
        " max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)"
        " FROM read_parquet('{SF}/orders.parquet') o"
        " JOIN read_parquet('{SF}/lineitem.parquet') l"
        "   ON l.l_orderkey = o.o_orderkey"
        " GROUP BY 1, 2"
    ):
        per[k] = (w, pos)
    n = len(per)
    r = sum(p for _, p in per.values())
    swn = sum(w for w, _ in per.values())
    swr = sum(w for w, p in per.values() if p)
    sw2n = sum(w * w for w, _ in per.values())
    assert (int(got.n_total), int(got.n_returned)) == (n, r)
    assert (int(got.sum_w_n), int(got.sum_w_r), int(got.sum_w2_n)) == (
        swn, swr, sw2n,
    )
    t = float(n * swr - r * swn)
    z2 = t * t / float(r * (n - r)) * n / float(n * sw2n - swn * swn)
    assert got.z_squared == int(z2 * 1000000 + 0.5) / 1000000


# ---------------------------------------------------------------------------
# Flesch vowel-run proxy: regex + identical IEEE tree
# ---------------------------------------------------------------------------


def test_flesch_vowel_proxy_regex_replay(spark):
    got = _run(spark, "flesch_vowel_proxy_by_source")
    agg: dict = defaultdict(lambda: [0, 0, 0, 0])
    for src, text in _sql(
        "SELECT source, text FROM read_parquet('{SF}/documents.parquet')"
    ):
        w = len([t for t in re.split(r"\s+", text) if t != ""])
        s = max(len(re.findall(r"[.!?]+", text)), 1)
        y = len(re.findall(r"[aeiouyAEIOUY]+", text))
        if w == 0:
            continue
        a = agg[src]
        a[0] += 1
        a[1] += w
        a[2] += s
        a[3] += y
    assert list(got.source) == sorted(agg)
    for rrow in got.itertuples():
        n, w, s, y = agg[rrow.source]
        assert (
            rrow.n_docs, rrow.n_words, rrow.n_sentences,
            rrow.n_vowel_runs,
        ) == (n, w, s, y)
        fl = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        assert rrow.flesch_milli == int(fl * 1000 + (0.5 if fl >= 0 else -0.5)) / 1000


# ---------------------------------------------------------------------------
# Nelson-Aalen: per-customer replay + overlay invariant vs KM table
# ---------------------------------------------------------------------------


def test_nelson_aalen_customer_replay(spark):
    got = _run(spark, "nelson_aalen_tenure")
    per: dict = {}
    for cust, fd, ld in _sql(
        "SELECT o_custkey, min(CAST(o_orderdate AS DATE)),"
        " max(CAST(o_orderdate AS DATE))"
        " FROM read_parquet('{SF}/orders.parquet') GROUP BY 1"
    ):
        per[cust] = (fd, ld)
    end_d = max(ld for _, ld in per.values())
    buckets: dict = defaultdict(lambda: [0, 0])  # events, censored
    for fd, ld in per.values():
        b = (ld - fd).days // 90
        buckets[b][0 if (end_d - ld).days >= 180 else 1] += 1
    bs = sorted(buckets)
    risk = {}
    run = 0
    for b in reversed(bs):
        run += sum(buckets[b])
        risk[b] = run
    cum = 0
    exp = []
    for b in bs:
        hz = buckets[b][0] * 1000000 // risk[b]
        cum += hz
        exp.append((b, risk[b], buckets[b][0], hz, cum))
    assert [
        (r.bucket, r.n_risk, r.n_events, r.hazard_ppm, r.cum_hazard_ppm)
        for r in got.itertuples()
    ] == exp
    # overlay invariant: NA per-bucket hazard equals the KM life table's
    km = _run(spark, "km_life_table_customer_tenure")
    assert list(km.hazard_ppm) == list(got.hazard_ppm)


# ---------------------------------------------------------------------------
# Cliff's delta: brute pair scan
# ---------------------------------------------------------------------------


def _source_lengths():
    out = {}
    for src in ("src0", "src1"):
        out[src] = [
            v for (v,) in _sql(
                "SELECT n_chars FROM read_parquet('{SF}/documents.parquet')"
                f" WHERE source = '{src}'"
            )
        ]
    return out


def test_cliffs_delta_brute_pairs(spark):
    got = _run(spark, "cliffs_delta_sources").iloc[0]
    xs = _source_lengths()
    gt = sum(1 for x in xs["src0"] for y in xs["src1"] if x > y)
    lt = sum(1 for x in xs["src0"] for y in xs["src1"] if x < y)
    n1, n2 = len(xs["src0"]), len(xs["src1"])
    assert (int(got.n1), int(got.n2)) == (n1, n2)
    assert (int(got.n_pairs_greater), int(got.n_pairs_less)) == (gt, lt)
    assert int(got.cliffs_delta_ppm) == (
        ((gt - lt) + n1 * n2) * 1000000 // (n1 * n2) - 1000000
    )


# ---------------------------------------------------------------------------
# Page trend: block-rank replay
# ---------------------------------------------------------------------------


def test_page_trend_block_replay(spark):
    got = _run(spark, "page_trend_test_priorities").iloc[0]
    cells: dict = defaultdict(lambda: [0, 0])
    for d, pr, p in _sql(
        "SELECT CAST(o_orderdate AS DATE), o_orderpriority, o_totalprice"
        " FROM read_parquet('{SF}/orders.parquet')"
    ):
        a = cells[(d.year * 100 + d.month, int(pr[0]))]
        a[0] += _cents(p)
        a[1] += 1
    by_month: dict = defaultdict(dict)
    for (ym, j), (s, n) in cells.items():
        by_month[ym][j] = s // n
    m = 0
    big_l = 0
    for ym, d in by_month.items():
        if len(d) != 5:
            continue
        m += 1
        board = sorted((x, j) for j, x in d.items())
        for r, (_, j) in enumerate(board, start=1):
            big_l += j * r
    assert int(got.n_blocks) == m
    assert int(got.page_l) == big_l
    assert int(got.e_l) == m * 5 * 36 // 4
    e = m * 5 * 36 / 4
    z2 = (big_l - e) * (big_l - e) / (m * 25 * 6 * 24 / 144)
    assert abs(got.z_squared - z2) <= 2e-6


# ---------------------------------------------------------------------------
# Cohen's d / Hedges g: moment replay
# ---------------------------------------------------------------------------


def test_effect_size_moment_replay(spark):
    import math

    got = _run(spark, "effect_size_cohens_d_segments").iloc[0]
    per: dict = defaultdict(list)
    for seg, p in _sql(
        "SELECT c.c_mktsegment, o.o_totalprice"
        " FROM read_parquet('{SF}/orders.parquet') o"
        " JOIN read_parquet('{SF}/customer.parquet') c"
        "   ON c.c_custkey = o.o_custkey"
        " WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')"
    ):
        per[seg].append(_cents(p))
    x1, x2 = per["BUILDING"], per["MACHINERY"]
    n1, n2 = len(x1), len(x2)
    m1, m2 = sum(x1) / n1, sum(x2) / n2
    css1 = sum(x * x for x in x1) - sum(x1) ** 2 / n1
    css2 = sum(x * x for x in x2) - sum(x2) ** 2 / n2
    sp = math.sqrt((css1 + css2) / (n1 + n2 - 2))
    d = (m1 - m2) / sp
    g = d * (1 - 3 / (4 * (n1 + n2 - 2) - 1))
    assert (int(got.n1), int(got.n2)) == (n1, n2)
    assert abs(got.cohens_d - d) <= 2e-6
    assert abs(got.hedges_g - g) <= 2e-6
    assert abs(got.hedges_g) < abs(got.cohens_d)  # J < 1 shrinks


# ---------------------------------------------------------------------------
# Bland-Altman: per-doc replay
# ---------------------------------------------------------------------------


def test_bland_altman_per_doc_replay(spark):
    import math

    got = _run(spark, "bland_altman_token_counters").iloc[0]
    ds = []
    for (text,) in _sql(
        "SELECT text FROM read_parquet('{SF}/documents.parquet')"
    ):
        a = len([t for t in re.split(r"\s+", text) if t != ""])
        b = len(re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", text))
        ds.append(a - b)
    n, s = len(ds), sum(ds)
    mean = s / n
    sd = math.sqrt((n * sum(d * d for d in ds) - s * s) / (n * (n - 1)))
    lo, hi = mean - 1.96 * sd, mean + 1.96 * sd
    assert (int(got.n_docs), int(got.sum_diff)) == (n, s)
    assert abs(got.mean_diff - mean) <= 2e-6
    assert abs(got.sd_diff - sd) <= 2e-6
    assert int(got.n_outside_loa) == sum(1 for d in ds if d < lo or d > hi)
    # the LoA band must contain ~95% of differences
    assert got.n_outside_loa <= 0.1 * n


# ---------------------------------------------------------------------------
# Neyman allocation: replay + exact-budget invariant
# ---------------------------------------------------------------------------


def test_neyman_allocation_replay(spark):
    import math

    got = _run(spark, "neyman_allocation_segments")
    per: dict = defaultdict(list)
    for seg, p in _sql(
        "SELECT c.c_mktsegment, o.o_totalprice"
        " FROM read_parquet('{SF}/orders.parquet') o"
        " JOIN read_parquet('{SF}/customer.parquet') c"
        "   ON c.c_custkey = o.o_custkey"
    ):
        per[seg].append(_cents(p))
    wts = {}
    for seg, xs in per.items():
        n = len(xs)
        if n < 2:
            wts[seg] = (n, 0)
            continue
        s = sum(xs)
        css = n * sum(x * x for x in xs) - s * s
        sd_milli = int(math.sqrt(css / (n * (n - 1))) * 1000)
        wts[seg] = (n, sd_milli)
    w_tot = sum(n * sm for n, sm in wts.values())
    shares = {
        seg: (1000 * n * sm // w_tot, 1000 * n * sm % w_tot)
        for seg, (n, sm) in wts.items()
    }
    leftover = 1000 - sum(fl for fl, _ in shares.values())
    order = sorted(shares, key=lambda g: (-shares[g][1], g))
    alloc = {
        seg: shares[seg][0] + (1 if i < leftover else 0)
        for i, seg in enumerate(order)
    }
    assert list(got.segment) == sorted(per)
    for r in got.itertuples():
        n, sm = wts[r.segment]
        assert (r.n_h, r.sd_milli_cents) == (n, sm)
        assert r.alloc_n == alloc[r.segment]
    assert int(got.alloc_n.sum()) == 1000  # exact-budget invariant


# ---------------------------------------------------------------------------
# Ansari-Bradley: per-observation score replay under the tie policy
# ---------------------------------------------------------------------------


def test_ansari_bradley_score_replay(spark):
    got = _run(spark, "ansari_bradley_sources").iloc[0]
    xs = _source_lengths()
    pooled = sorted(
        [(v, 1) for v in xs["src0"]] + [(v, 2) for v in xs["src1"]]
    )  # ties: sample 1 first — the documented deterministic policy
    nt = len(pooled)
    ab1 = t_all = 0
    for r, (_, src) in enumerate(pooled, start=1):
        sc = min(r, nt + 1 - r)
        t_all += sc
        if src == 1:
            ab1 += sc
    n1, n2 = len(xs["src0"]), len(xs["src1"])
    assert (int(got.n1), int(got.n2)) == (n1, n2)
    assert int(got.ab1_score_sum) == ab1
    assert int(got.total_score_sum) == t_all
    assert int(got.ab1_share_ppm) == ab1 * 1000000 // t_all
    assert int(got.expected_share_ppm) == n1 * 1000000 // nt


# ---------------------------------------------------------------------------
# Blocking quality: brute sorted-neighborhood replay
# ---------------------------------------------------------------------------


def test_blocking_quality_brute_replay(spark):
    import hashlib

    got = _run(spark, "blocking_quality_sorted_neighborhood").iloc[0]
    rows = _sql(
        "SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    )
    recs = []
    for doc_id, text in rows:
        fp = hashlib.md5(text[:100].encode()).hexdigest()
        pre = text[:7].lower()
        k = 0
        for i in range(7):
            k = k * 256 + (min(ord(pre[i]), 255) if i < len(pre) else 0)
        recs.append((k, doc_id, fp))
    recs.sort()
    n = len(recs)
    cand = found = 0
    for i in range(n):
        for j in range(i + 1, min(i + 10, n)):
            cand += 1
            if recs[i][2] == recs[j][2]:
                found += 1
    from collections import Counter

    cl = Counter(fp for _, _, fp in recs)
    true_pairs = sum(c * (c - 1) // 2 for c in cl.values())
    assert int(got.n_docs) == n
    assert int(got.n_candidate_pairs) == cand
    assert int(got.n_true_pairs) == true_pairs
    assert int(got.n_true_found) == found
    assert int(got.reduction_ratio_ppm) == (
        1000000 - cand * 1000000 // (n * (n - 1) // 2)
    )
    if true_pairs:
        assert int(got.pair_completeness_ppm) == (
            found * 1000000 // true_pairs
        )
        # prefix-sharers share the packed key: the blocker must
        # recover a substantial share of the truth
        assert got.pair_completeness_ppm >= 500000


# ---------------------------------------------------------------------------
# ABC-XYZ matrix: dict replay
# ---------------------------------------------------------------------------


def test_abc_xyz_matrix_brute_replay(spark):
    got = _run(spark, "abc_xyz_matrix_parts")
    rev: dict = defaultdict(int)
    mq: dict = defaultdict(lambda: defaultdict(int))
    for pk, sd, qty, price in _sql(
        "SELECT l_partkey, CAST(l_shipdate AS DATE), l_quantity,"
        " l_extendedprice FROM read_parquet('{SF}/lineitem.parquet')"
    ):
        rev[pk] += _cents(price)
        mq[pk][sd.year * 100 + sd.month] += int(qty + 0.5)
    order = sorted(rev, key=lambda p: (-rev[p], p))
    tot = sum(rev.values())
    cum = 0
    abc = {}
    for p in order:
        cum += rev[p]
        abc[p] = "A" if cum * 5 <= tot * 4 else (
            "B" if cum * 20 <= tot * 19 else "C"
        )
    xyz = {}
    for p, months in mq.items():
        qs = list(months.values())
        n = len(qs)
        if n < 2:
            xyz[p] = "Z"
            continue
        s = sum(qs)
        css = n * sum(q * q for q in qs) - s * s
        if 4 * n * css <= (n - 1) * s * s:
            xyz[p] = "X"
        elif n * css <= (n - 1) * s * s:
            xyz[p] = "Y"
        else:
            xyz[p] = "Z"
    cells: dict = defaultdict(lambda: [0, 0])
    for p in rev:
        c = cells[(abc[p], xyz[p])]
        c[0] += 1
        c[1] += rev[p]
    assert {
        (r.abc_class, r.xyz_class): (r.n_parts, r.rev_cents)
        for r in got.itertuples()
    } == {k: tuple(v) for k, v in cells.items()}
    for r in got.itertuples():
        assert r.rev_share_ppm == cells[(r.abc_class, r.xyz_class)][1] \
            * 1000000 // tot
    assert int(got.n_parts.sum()) == len(rev)


# ---------------------------------------------------------------------------
# Raking: integer IPF replay + exact row-margin-then-column order
# ---------------------------------------------------------------------------


def test_raking_integer_ipf_replay(spark):
    got = _run(spark, "raking_calibration_segment_priority")
    pop: dict = defaultdict(lambda: [0, 0])
    for seg, pri, k in _sql(
        "SELECT c.c_mktsegment, o.o_orderpriority, o.o_orderkey"
        " FROM read_parquet('{SF}/orders.parquet') o"
        " JOIN read_parquet('{SF}/customer.parquet') c"
        "   ON c.c_custkey = o.o_custkey"
    ):
        a = pop[(seg, pri)]
        a[0] += 1
        a[1] += 1 if k % 10 == 7 else 0
    cells = {kk: v for kk, v in pop.items() if v[1] > 0}
    p_seg: dict = defaultdict(int)
    s_seg: dict = defaultdict(int)
    for (seg, _), (np_, ns) in cells.items():
        p_seg[seg] += np_
        s_seg[seg] += ns
    w1 = {
        kk: 1000000 * p_seg[kk[0]] * 1000000
        // (s_seg[kk[0]] * 1000000)
        for kk in cells
    }
    p_pri: dict = defaultdict(int)
    ws_pri: dict = defaultdict(int)
    for kk, (np_, ns) in cells.items():
        p_pri[kk[1]] += np_
        ws_pri[kk[1]] += ns * w1[kk]
    w2 = {
        kk: w1[kk] * (p_pri[kk[1]] * 1000000) // ws_pri[kk[1]]
        for kk in cells
    }
    assert {
        (r.segment, r.priority): (
            r.n_pop, r.n_sample, r.weight_ppm, r.weighted_n,
        )
        for r in got.itertuples()
    } == {
        kk: (v[0], v[1], w2[kk], v[1] * w2[kk] // 1000000)
        for kk, v in cells.items()
    }
    # after the column step, priority margins match within floor slack
    for pri in p_pri:
        wsum = sum(
            r.weighted_n for r in got.itertuples() if r.priority == pri
        )
        assert abs(wsum - p_pri[pri]) <= len(cells)


# ---------------------------------------------------------------------------
# Technical indicators on the daily revenue series: one shared daily
# (day-index -> (cents, volume)) base, then per-indicator brute loops.
# ---------------------------------------------------------------------------


def _daily_series():
    rows = _sql(
        "SELECT date_diff('day', DATE '1970-01-01', "
        "CAST(o_orderdate AS DATE)), o_totalprice FROM "
        "read_parquet('{SF}/orders.parquet')"
    )
    cents_by_d: dict = defaultdict(int)
    vol_by_d: dict = defaultdict(int)
    for d, p in rows:
        cents_by_d[d] += _cents(p)
        vol_by_d[d] += 1
    days = sorted(cents_by_d)
    return days, cents_by_d, vol_by_d


def test_rsi_cutler_brute(spark):
    got = _run(spark, "rsi_cutler_daily")
    days, x, _ = _daily_series()
    dx = {
        d: x[d] - x[dp] for dp, d in zip(days, days[1:])
    }
    for r in got.itertuples():
        d = int(r.d)
        win = [
            dd for dd in days if d - 13 <= dd <= d and dd in dx
        ]
        gain = sum(max(dx[dd], 0) for dd in win)
        loss = sum(max(-dx[dd], 0) for dd in win)
        assert int(r.n_diffs) == len(win)
        assert int(r.gain14) == gain and int(r.loss14) == loss
        if gain + loss > 0:
            assert int(r.rsi_ppm) == gain * 1000000 // (gain + loss)
        else:
            assert r.rsi_ppm is None or r.rsi_ppm != r.rsi_ppm  # NaN


def test_obv_brute(spark):
    got = _run(spark, "obv_daily").sort_values("d")
    days, x, v = _daily_series()
    obv = 0
    expect = {}
    for dp, d in zip([None] + days, days):
        if dp is not None:
            if x[d] > x[dp]:
                obv += v[d]
            elif x[d] < x[dp]:
                obv -= v[d]
        expect[d] = obv
    for r in got.itertuples():
        assert int(r.obv) == expect[int(r.d)]
        assert int(r.volume) == v[int(r.d)]


def test_aroon_brute(spark):
    got = _run(spark, "aroon_25_daily")
    days, x, _ = _daily_series()
    for r in got.itertuples():
        d = int(r.d)
        win = [dd for dd in days if d - 24 <= dd <= d]
        hi = max(x[dd] for dd in win)
        lo = min(x[dd] for dd in win)
        # ties break toward the LATEST day on both sides
        d_high = max(dd for dd in win if x[dd] == hi)
        d_low = max(dd for dd in win if x[dd] == lo)
        assert int(r.n_win) == len(win)
        assert int(r.days_since_high) == d - d_high
        assert int(r.days_since_low) == d - d_low
        assert int(r.aroon_up_pct) == (25 - (d - d_high)) * 4
        assert int(r.aroon_down_pct) == (25 - (d - d_low)) * 4


def test_chaikin_money_flow_brute(spark):
    got = _run(spark, "chaikin_money_flow_daily")
    rows = _sql(
        "SELECT date_diff('day', DATE '1970-01-01', "
        "CAST(o_orderdate AS DATE)), o_orderkey % 24, o_totalprice "
        "FROM read_parquet('{SF}/orders.parquet')"
    )
    bars: dict = defaultdict(lambda: defaultdict(int))
    vol: dict = defaultdict(int)
    for d, h, p in rows:
        bars[d][h] += _cents(p)
        vol[d] += 1
    days = sorted(bars)
    mfm_pos = {}
    for d in days:
        hi = max(bars[d].values())
        lo = min(bars[d].values())
        cl = bars[d][max(bars[d])]
        mfm_pos[d] = (
            (cl - lo) * 2000000 // (hi - lo) if hi > lo else 1000000
        )
    for r in got.itertuples():
        d = int(r.d)
        win = [dd for dd in days if d - 19 <= dd <= d]
        s_mfv = sum(mfm_pos[dd] * vol[dd] for dd in win)
        s_vol = sum(vol[dd] for dd in win)
        assert int(r.volume20) == s_vol
        assert int(r.cmf_ppm) == s_mfv // s_vol - 1000000


# ---------------------------------------------------------------------------
# Mann-Kendall: textbook pairwise loop over the monthly series
# ---------------------------------------------------------------------------


def test_mann_kendall_brute(spark):
    got = _run(spark, "mann_kendall_trend_monthly").iloc[0]
    rows = _sql(
        "SELECT EXTRACT(year FROM o_orderdate) * 12 "
        "+ EXTRACT(month FROM o_orderdate), o_totalprice "
        "FROM read_parquet('{SF}/orders.parquet')"
    )
    by_m: dict = defaultdict(int)
    for m, p in rows:
        by_m[m] += _cents(p)
    xs = [by_m[m] for m in sorted(by_m)]
    m = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        for i in range(m)
        for j in range(i + 1, m)
    )
    tie_counts = defaultdict(int)
    for x in xs:
        tie_counts[x] += 1
    var18 = m * (m - 1) * (2 * m + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in tie_counts.values()
    )
    assert int(got.n_months) == m
    assert int(got.s_stat) == s
    assert int(got.var18) == var18
    if var18 > 0:
        zc = s - 1 if s > 0 else s + 1 if s < 0 else 0
        z = zc / math.sqrt(var18 / 18.0)
        assert abs(float(got.z_stat) - z) < 2e-6


# ---------------------------------------------------------------------------
# Cochran's Q: dense day x type grid, exceeds-own-mean successes
# ---------------------------------------------------------------------------


def test_cochran_q_brute(spark):
    got = _run(spark, "cochran_q_event_types").iloc[0]
    rows = _sql(
        "SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)),"
        " event_type FROM read_parquet('{SF}/events.parquet')"
    )
    c: dict = defaultdict(int)
    for d, j in rows:
        c[(d, j)] += 1
    days = sorted({d for d, _ in c})
    types = sorted({j for _, j in c})
    D, k = len(days), len(types)
    tot = {j: sum(c.get((d, j), 0) for d in days) for j in types}
    x = {
        (d, j): 1 if c.get((d, j), 0) * D > tot[j] else 0
        for d in days
        for j in types
    }
    C = {j: sum(x[(d, j)] for d in days) for j in types}
    R = {d: sum(x[(d, j)] for j in types) for d in days}
    N = sum(C.values())
    q_num = (k - 1) * (k * sum(v * v for v in C.values()) - N * N)
    q_den = k * N - sum(v * v for v in R.values())
    assert int(got.k_types) == k and int(got.n_days) == D
    assert int(got.n_succ) == N
    assert int(got.q_num) == q_num and int(got.q_den) == q_den
    if q_den > 0:
        assert int(got.q_milli) == q_num * 1000 // q_den


# ---------------------------------------------------------------------------
# Mood's median: brute pooled-median split + residual formula
# ---------------------------------------------------------------------------


def test_moods_median_brute(spark):
    got = _run(spark, "moods_median_test_segments")
    rows = _sql(
        "SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice "
        "FROM read_parquet('{SF}/orders.parquet') o "
        "JOIN read_parquet('{SF}/customer.parquet') c "
        "ON c.c_custkey = o.o_custkey"
    )
    vals = sorted((_cents(p), ok) for _, ok, p in rows)
    med = vals[(len(vals) + 1) // 2 - 1][0]
    per: dict = defaultdict(lambda: [0, 0])
    for seg, _, p in rows:
        per[seg][0] += 1
        per[seg][1] += 1 if _cents(p) > med else 0
    n = sum(v[0] for v in per.values())
    a = sum(v[1] for v in per.values())
    for r in got.itertuples():
        no, na = per[r.segment]
        assert int(r.n_orders) == no and int(r.n_above) == na
        e = no * a / n
        resid = (na - e) / math.sqrt(e * (1 - no / n) * (1 - a / n))
        assert abs(float(r.adj_residual) - resid) < 2e-6


# ---------------------------------------------------------------------------
# Lorenz deciles: brute sort + cumulative shares
# ---------------------------------------------------------------------------


def test_lorenz_deciles_brute(spark):
    got = _run(spark, "lorenz_curve_customer_deciles")
    rows = _sql(
        "SELECT o_custkey, o_totalprice FROM "
        "read_parquet('{SF}/orders.parquet')"
    )
    rev: dict = defaultdict(int)
    for ck, p in rows:
        rev[ck] += _cents(p)
    ordered = sorted((r, ck) for ck, r in rev.items())
    n = len(ordered)
    s_tot = sum(r for r, _ in ordered)
    cum = 0
    per_decile: dict = defaultdict(lambda: [0, 0, 0, 0])
    for i, (r, ck) in enumerate(ordered):
        cum += r
        dec = i * 10 // n + 1
        per_decile[dec][0] += 1
        per_decile[dec][1] += r
        per_decile[dec][2] = cum
        per_decile[dec][3] = i + 1
    assert len(got) == len(per_decile)
    for r in got.itertuples():
        nc, rv, cm, rk = per_decile[int(r.decile)]
        assert int(r.n_customers) == nc
        assert int(r.rev_cents) == rv
        assert int(r.cum_rev_cents) == cm
        assert int(r.cum_share_ppm) == cm * 1000000 // s_tot
        assert int(r.cum_pop_ppm) == rk * 1000000 // n
