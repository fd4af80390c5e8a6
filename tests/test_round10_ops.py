"""Independent-reference checks for the round-10 operator batches —
the house "simulator equality" pattern: each operator's DuckDB oracle
is the driver's gate; these tests re-derive the same answers from
plain-Python references (hashlib, dict-BFS, brute-force pair scans),
so a shared SQL-side misconception cannot hide in both engines.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb
import pytest

from spark_lever_spark import registry

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return registry.all_queries()[name].fn(spark, SF).toPandas()


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, lang, text FROM read_parquet('{SF}/documents.parquet')"
        " ORDER BY doc_id"
    ).fetchall()


def test_weighted_sample_units_python_identity(spark):
    """The md5 unit-race ticket is a pure row property: a from-scratch
    hashlib replication of (weights, tickets, bottom-100) must equal
    the Spark output byte-for-byte."""
    rows = duckdb.sql(
        f"SELECT o_orderkey, o_totalprice FROM "
        f"read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    sim = []
    for k, price in rows:
        cents = int(price * 100 + (0.5 if price >= 0 else -0.5))
        wt = 1 + min(25, cents // 2000000)
        ticket = min(
            hashlib.md5(f"{k}:{u}".encode()).hexdigest()
            for u in range(1, wt + 1)
        )
        sim.append((ticket, k, wt))
    sim.sort()
    expect = [(k, wt, t) for t, k, wt in sim[:100]]
    got = [
        (r.o_orderkey, r.weight, r.ticket)
        for r in _run(spark, "weighted_sample_units").itertuples()
    ]
    assert got == expect


def test_weighted_sample_units_weight_monotone():
    """More lottery units can only IMPROVE (never worsen) a row's
    ticket — min over a superset of hashes."""
    for key in (3, 77, 1234):
        tickets = [
            min(
                hashlib.md5(f"{key}:{u}".encode()).hexdigest()
                for u in range(1, w + 1)
            )
            for w in range(1, 27)
        ]
        assert all(
            tickets[i + 1] <= tickets[i] for i in range(len(tickets) - 1)
        )


def _shingle_sets():
    sets: dict[int, set[str]] = {}
    lang: dict[int, str] = {}
    for doc_id, lg, text in _docs():
        ws = text.split(" ")
        sets[doc_id] = {
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        } if len(ws) >= 3 else set()
        lang[doc_id] = lg
    return sets, lang


def test_containment_prefix_filter_lossless(spark):
    """Brute-force all-pairs shingle containment (no prefix filter, no
    blocking) must produce exactly the pair set the prefix-filtered
    Spark plan emits — the filter is lossless by construction."""
    sets, lang = _shingle_sets()
    expect = set()
    for a, sa in sets.items():
        if not sa:
            continue
        for b, sb in sets.items():
            if a == b or lang[a] != lang[b]:
                continue
            if 5 * len(sa & sb) >= 4 * len(sa):
                expect.add((a, b))
    got = {
        (r.id_contained, r.id_container)
        for r in _run(spark, "dedup_shingle_containment").itertuples()
    }
    assert got == expect


def test_bfs_hops_python_identity(spark):
    """Dict-based BFS over the same support>=2 co-purchase edges must
    reproduce the hop histogram (including the -1 unreachable row)."""
    edges = duckdb.sql(
        f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey
               FROM read_parquet('{SF}/lineitem.parquet'))
SELECT a.l_partkey, b.l_partkey FROM items a JOIN items b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 HAVING count(*) >= 2
"""
    ).fetchall()
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    seed = min(adj)
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
    hist = defaultdict(int)
    for h in dist.values():
        hist[h] += 1
    hist[-1] = len(adj) - len(dist)
    got = {
        int(r.hop): int(r.n_vertices)
        for r in _run(spark, "bfs_hops_copurchase").itertuples()
    }
    assert got == dict(hist)


def test_theil_sen_numpy_identity(spark):
    """Median-of-pairwise-slopes recomputed in plain Python (exact
    same one-division doubles) matches to the published 1e-6
    rounding."""
    daily = duckdb.sql(
        f"""
SELECT event_type,
       date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS yc
FROM read_parquet('{SF}/events.parquet')
GROUP BY event_type, CAST(ts AS DATE)
"""
    ).fetchall()
    series = defaultdict(list)
    for et, x, yc in daily:
        series[et].append((x, yc))
    expect = {}
    for et, pts in series.items():
        pts.sort()
        slopes = sorted(
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1 :]
        )
        n = len(slopes)
        med = (slopes[(n - 1) // 2] + slopes[n // 2]) / 2
        expect[et] = (n, round(med * 1000000) / 1000000)
    got = {
        r.event_type: (r.n_pairs, r.ts_slope_cents_per_day)
        for r in _run(spark, "theil_sen_daily_trend").itertuples()
    }
    assert set(got) == set(expect)
    for et in expect:
        assert got[et][0] == expect[et][0]
        assert got[et][1] == pytest.approx(expect[et][1], abs=2e-6)


def test_time_decay_credit_exact_invariants(spark):
    """Per purchase: credit sums to exactly 1000 milli-units; weights
    are powers of two halving per 10-minute step; later touches never
    carry smaller weight than earlier ones with larger decay."""
    pdf = _run(spark, "attribution_time_decay")
    by_p = pdf.groupby("purchase_id")
    assert (by_p["credit_milli"].sum() == 1000).all()
    assert set(pdf["wt"]) <= {1, 2, 4, 8, 16, 32}
    assert ((32 // (2 ** pdf["decay_k"])) == pdf["wt"]).all()


def test_max_drawdown_python_identity(spark):
    daily = duckdb.sql(
        f"""
SELECT event_type,
       date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS yc
FROM read_parquet('{SF}/events.parquet')
GROUP BY 1, 2 ORDER BY 1, 2
"""
    ).fetchall()
    series = defaultdict(list)
    for et, x, yc in daily:
        series[et].append((x, yc))
    expect = {}
    for et, pts in series.items():
        cum = peak = 0
        best = (-1, None, None)  # (dd, x, peak)
        for x, yc in pts:
            cum += yc
            peak = max(peak, cum)
            dd = peak - cum
            if dd > best[0]:
                best = (dd, x, peak)
        expect[et] = best
    got = {
        r.event_type: (
            r.max_drawdown_cents,
            r.trough_x,
            r.peak_cents,
        )
        for r in _run(spark, "max_drawdown_daily_value").itertuples()
    }
    assert got == expect


def test_fluency_rank_one_is_modal_continuation(spark):
    """A document made only of the corpus's modal continuations would
    score mean rank 1; verify rank bookkeeping: sum_rank >= n_trigrams
    and equality holds iff every continuation is modal. Also check one
    exact doc score against a pure-python model."""
    pdf = _run(spark, "trigram_rank_fluency")
    assert (pdf["sum_rank"] >= pdf["n_trigrams"]).all()
    model = defaultdict(lambda: defaultdict(int))
    per_doc = defaultdict(list)
    for doc_id, lg, text in _docs():
        ws = text.split(" ")
        for i in range(len(ws) - 2):
            ctx, nxt = (lg, ws[i] + " " + ws[i + 1]), ws[i + 2]
            model[ctx][nxt] += 1
            per_doc[doc_id].append((ctx, nxt))
    ranks = {}
    for ctx, conts in model.items():
        ordered = sorted(conts.items(), key=lambda kv: (-kv[1], kv[0]))
        ranks[ctx] = {w: i + 1 for i, (w, _) in enumerate(ordered)}
    doc_id = min(per_doc)
    tris = per_doc[doc_id]
    sum_rank = sum(ranks[c][n] for c, n in tris)
    row = pdf[pdf.doc_id == doc_id].iloc[0]
    assert row.n_trigrams == len(tris)
    assert row.sum_rank == sum_rank


def test_ledger_partitions_and_keepers(spark):
    """Ledger invariants: keepers keep themselves; exact-drop totals
    agree with dedup_exact_md5's n_copies; near-drops only among
    exact survivors."""
    pdf = _run(spark, "dedup_decision_ledger")
    keep = pdf[pdf.decision == "keep"]
    assert (keep.keeper_id == keep.doc_id).all()
    kept_ids = set(pdf[pdf.decision != "drop_exact"].doc_id)
    # every keeper of a drop is itself kept (never a dropped doc)
    for r in pdf[pdf.decision == "drop_near"].itertuples():
        assert r.keeper_id in set(keep.doc_id)
    exact = _run(spark, "dedup_exact_md5")
    assert (exact.n_copies.sum() - len(exact)) == (
        pdf.decision == "drop_exact"
    ).sum()
    assert set(exact.keep_id) == kept_ids


def test_fd_audit_verdicts(spark):
    pdf = _run(spark, "functional_dependency_audit").set_index("fd")
    assert bool(pdf.loc["event_id->user_id", "holds"])
    assert pdf.loc["event_id->user_id", "n_violating"] == 0
    for rule in ("p_name->p_brand", "p_brand->p_size"):
        assert not bool(pdf.loc[rule, "holds"])
        assert pdf.loc[rule, "n_violating"] > 0


def test_seasonal_ratio_cross_multiplication(spark):
    """The published ratio must equal the cross-multiplied exact
    integer formulation (not a double-over-double quotient)."""
    pdf = _run(spark, "seasonal_naive_error_ratio")
    for r in pdf.itertuples():
        exact = (r.sae7_cents * r.n1) / (r.sae1_cents * r.n7)
        assert r.seasonal_vs_naive_ratio == round(exact * 1000000) / 1000000


def test_kmeans_assign_python_identity(spark):
    """NumPy-free python argmin over the same |c|^2 - 2<x,c> scores
    (ordered summation) must reproduce every per-centroid count."""
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    vecs = {vid: [float(x) for x in v] for vid, v in rows}
    cents = {vid: v for vid, v in vecs.items() if vid < 8}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    counts = defaultdict(int)
    mins: dict[int, int] = {}
    maxs: dict[int, int] = {}
    for vid, v in vecs.items():
        if vid < 8:
            continue
        best = min(
            (dot(c, c) - 2 * dot(v, c), cid) for cid, c in cents.items()
        )[1]
        counts[best] += 1
        mins[best] = min(mins.get(best, vid), vid)
        maxs[best] = max(maxs.get(best, vid), vid)
    got = {
        r.centroid_id: (r.n_points, r.min_vec_id, r.max_vec_id)
        for r in _run(spark, "kmeans_assign_embeddings").itertuples()
    }
    assert got == {
        cid: (counts[cid], mins[cid], maxs[cid]) for cid in counts
    }


def test_interval_overlap_grid_equals_bruteforce(spark):
    """The grid-bucketed overlap join must emit each overlapping
    (click, purchase) burst pair exactly once with the brute-force
    overlap duration."""
    rows = duckdb.sql(
        f"""
SELECT event_id, user_id, event_type,
       date_diff('second', TIMESTAMP '1970-01-01', ts) AS sec
FROM read_parquet('{SF}/events.parquet')
WHERE user_id < 50 AND event_type IN ('click', 'purchase')
"""
    ).fetchall()
    clicks = [(e, u, s - 600, s + 600) for e, u, t, s in rows if t == "click"]
    purch = [(e, u, s - 600, s + 600) for e, u, t, s in rows if t == "purchase"]
    expect = {}
    for a_id, ua, sa, ea in clicks:
        for b_id, ub, sb, eb in purch:
            if ua == ub and min(ea, eb) > max(sa, sb):
                expect[(a_id, b_id)] = (ua, min(ea, eb) - max(sa, sb))
    got = {
        (r.a_id, r.b_id): (r.user_id, r.overlap_seconds)
        for r in _run(spark, "interval_overlap_join_bursts").itertuples()
    }
    assert got == expect


def test_rolling_ols_python_identity(spark):
    """Trailing-14-calendar-day OLS slopes recomputed in pure python
    (same exact-int sufficient statistics) match every emitted row."""
    daily = duckdb.sql(
        f"""
SELECT o_orderpriority,
       date_diff('day', DATE '1970-01-01', o_orderdate) AS x,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS yc
FROM read_parquet('{SF}/orders.parquet') GROUP BY 1, 2 ORDER BY 1, 2
"""
    ).fetchall()
    series = defaultdict(list)
    for pr, x, yc in daily:
        series[pr].append((x, yc))
    expect = {}
    for pr, pts in series.items():
        for i, (x, _) in enumerate(pts):
            frame = [(u, v) for u, v in pts if x - 13 <= u <= x]
            n = len(frame)
            if n < 10:
                continue
            sx = sum(u for u, _ in frame)
            sy = sum(v for _, v in frame)
            sxy = sum(u * v for u, v in frame)
            sxx = sum(u * u for u, _ in frame)
            slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            expect[(pr, x)] = (n, round(slope * 1000000) / 1000000)
    got = {
        (r.priority, r.x): (r.n, r.slope_cents_per_day)
        for r in _run(spark, "rolling_ols_trend_14d").itertuples()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][0] == expect[k][0]
        assert got[k][1] == pytest.approx(expect[k][1], abs=2e-6)


def test_business_seconds_python_identity(spark):
    rows = duckdb.sql(
        f"SELECT event_type,"
        f" date_diff('second', TIMESTAMP '1970-01-01', ts) AS sec"
        f" FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    agg = defaultdict(lambda: [0, 0, 0])
    for et, sec in rows:
        s, e = sec - 600, sec + 600
        biz = 0
        for d in range(s // 86400, e // 86400 + 1):
            if 1 <= (d + 4) % 7 <= 5:
                biz += max(
                    0, min(e, d * 86400 + 61200) - max(s, d * 86400 + 32400)
                )
        a = agg[et]
        a[0] += 1
        a[1] += 1 if biz > 0 else 0
        a[2] += biz
    got = {
        r.event_type: [r.n_events, r.n_in_business, r.total_biz_seconds]
        for r in _run(spark, "business_seconds_click_bursts").itertuples()
    }
    assert got == dict(agg)


def test_impurity_bounds_and_exactness(spark):
    """Impurity in [0, 1e6); single-type users score exactly 0; the
    ppm value is the exact floor of the rational."""
    pdf = _run(spark, "event_type_diversity_impurity")
    assert (pdf.impurity_ppm >= 0).all()
    assert (pdf.impurity_ppm < 1000000).all()
    assert (pdf.loc[pdf.n_types == 1, "impurity_ppm"] == 0).all()
    counts = duckdb.sql(
        f"SELECT user_id, count(*) FROM "
        f"read_parquet('{SF}/events.parquet') GROUP BY user_id, event_type"
    ).fetchall()
    per_user = defaultdict(list)
    for u, c in counts:
        per_user[u].append(c)
    for r in pdf.sample(min(50, len(pdf)), random_state=7).itertuples():
        cs = per_user[r.user_id]
        n = sum(cs)
        assert r.impurity_ppm == (n * n - sum(c * c for c in cs)) * 1000000 // (
            n * n
        )


def test_newcombe_python_identity(spark):
    """Python replication of the full Newcombe-hybrid expression tree
    (same Wilson bounds, z = 1.96) over the same four integers."""
    import math

    rows = duckdb.sql(
        f"SELECT DISTINCT user_id, event_type FROM "
        f"read_parquet('{SF}/events.parquet')"
        f" WHERE event_type IN ('click', 'purchase')"
    ).fetchall()
    clickers = {u for u, t in rows if t == "click"}
    buyers = {u for u, t in rows if t == "purchase"}
    n1 = sum(1 for u in clickers if u % 2 == 0)
    x1 = sum(1 for u in clickers if u % 2 == 0 and u in buyers)
    n2 = sum(1 for u in clickers if u % 2 == 1)
    x2 = sum(1 for u in clickers if u % 2 == 1 and u in buyers)

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
    delta = p2 - p1
    lo = delta - math.sqrt((p2 - l2) ** 2 + (u1 - p1) ** 2)
    hi = delta + math.sqrt((u2 - p2) ** 2 + (p1 - l1) ** 2)
    r = _run(spark, "newcombe_diff_ci_ab").iloc[0]
    assert (r.n1, r.x1, r.n2, r.x2) == (n1, x1, n2, x2)
    assert r.delta == pytest.approx(delta, abs=1e-12)
    assert r.ci_lo == pytest.approx(lo, abs=1e-9)
    assert r.ci_hi == pytest.approx(hi, abs=1e-9)
    assert r.ci_lo <= r.delta <= r.ci_hi
    assert bool(r.significant) == (lo > 0 or hi < 0)


def test_hypothetical_rank_python_identity(spark):
    rows = duckdb.sql(
        f"SELECT o_orderpriority,"
        f" CAST(round(o_totalprice * 100) AS BIGINT)"
        f" FROM read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    groups = defaultdict(list)
    for pr, c in rows:
        groups[pr].append(c)
    probes = [500000, 1500000, 5000000, 15000000, 30000000]
    pdf = _run(spark, "hypothetical_rank_order_value")
    assert len(pdf) == len(groups) * len(probes)
    for r in pdf.itertuples():
        xs = groups[r.priority]
        n = len(xs)
        n_lt = sum(1 for x in xs if x < r.v_cents)
        nd_lt = len({x for x in xs if x < r.v_cents})
        n_le = sum(1 for x in xs if x <= r.v_cents)
        assert r.hyp_rank == n_lt + 1
        assert r.hyp_dense_rank == nd_lt + 1
        assert r.hyp_percent_rank == round(n_lt / n * 1000000) / 1000000
        assert r.hyp_cume_dist == round(
            (n_le + 1) / (n + 1) * 1000000
        ) / 1000000


def test_golden_record_python_identity(spark):
    rows = duckdb.sql(
        f"SELECT p_partkey, p_name, p_brand, p_size,"
        f" CAST(round(p_retailprice * 100) AS BIGINT)"
        f" FROM read_parquet('{SF}/part.parquet')"
    ).fetchall()
    clusters = defaultdict(list)
    for pk, name, brand, size, cents in rows:
        clusters[name].append((pk, brand, size, cents))
    expect = {}
    for name, members in clusters.items():
        if len(members) < 2:
            continue
        votes = defaultdict(int)
        for _, brand, _, _ in members:
            votes[brand] += 1
        modal = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        expect[min(m[0] for m in members)] = (
            name,
            len(members),
            modal,
            max(m[2] for m in members),
            max(m[3] for m in members),
        )
    got = {
        r.golden_id: (
            r.p_name,
            r.n_listings,
            r.modal_brand,
            r.max_size,
            r.max_price_cents,
        )
        for r in _run(spark, "golden_record_survivorship").itertuples()
    }
    assert got == expect
    assert got, "part catalog must produce real clusters at every SF"


def test_relational_division_python_identity(spark):
    """Set-cover reduction == python FOR-ALL over the raw pair sets."""
    pairs = duckdb.sql(
        f"""
SELECT DISTINCT l.l_partkey, o.o_orderpriority
FROM read_parquet('{SF}/lineitem.parquet') l
JOIN read_parquet('{SF}/orders.parquet') o ON o.o_orderkey = l.l_orderkey
"""
    ).fetchall()
    all_pri = {pr for _, pr in pairs}
    cover = defaultdict(set)
    for pk, pr in pairs:
        cover[pk].add(pr)
    expect = sorted(pk for pk, ps in cover.items() if ps == all_pri)
    got = list(_run(spark, "relational_division_priorities").p_partkey)
    assert got == expect
    assert expect, "division result must be non-empty on this corpus"


def test_xmr_python_identity(spark):
    daily = duckdb.sql(
        f"""
SELECT event_type,
       date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS yc
FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2 ORDER BY 1, 2
"""
    ).fetchall()
    series = defaultdict(list)
    for et, x, yc in daily:
        series[et].append(yc)
    pdf = _run(spark, "xmr_control_chart_daily").set_index("event_type")
    for et, ys in series.items():
        n = len(ys)
        sx = sum(ys)
        smr = sum(abs(b - a) for a, b in zip(ys, ys[1:]))
        xbar = sx / n
        mrbar = smr / (n - 1)
        ucl, lcl = xbar + 2.66 * mrbar, xbar - 2.66 * mrbar
        r = pdf.loc[et]
        assert r.n == n
        assert r.xbar_cents == pytest.approx(xbar, abs=1e-6)
        assert r.ucl_cents == pytest.approx(ucl, abs=1e-6)
        assert r.n_out_of_control == sum(
            1 for y in ys if y > ucl or y < lcl
        )


def test_stream_top2_leaderboard_invariants(spark):
    pdf = _run(spark, "stream_hourly_top2_event_types")
    per_hour = pdf.groupby("hour_start")
    assert (per_hour.size() <= 2).all()
    assert set(pdf.rnk) <= {1, 2}
    for _, g in per_hour:
        g = g.sort_values("rnk")
        if len(g) == 2:
            a, b = g.iloc[0], g.iloc[1]
            assert (a.events, b.event_type) >= (b.events, a.event_type)


def test_lsh_eval_truth_is_unblocked_bruteforce(spark):
    """Ground-truth pair set must equal the unfiltered all-pairs exact
    Jaccard >= 0.5 (python sets), and the confusion counts must
    partition pred/truth accordingly."""
    rows = _docs()
    toks = {
        d: set(t for t in text.split() if t) for d, _, text in rows
    }
    truth = set()
    ids = sorted(toks)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(toks[a] & toks[b])
            if 2 * inter >= len(toks[a]) + len(toks[b]) - inter:
                truth.add((a, b))
    pred = {
        (r.id_a, r.id_b)
        for r in registry.all_queries()["dedup_minhash_lsh"]
        .fn(spark, SF)
        .toPandas()
        .itertuples()
        if r.est_jaccard >= 0.5
    }
    r = _run(spark, "lsh_eval_confusion").iloc[0]
    assert r.tp == len(pred & truth)
    assert r.fp == len(pred - truth)
    assert r.fn == len(truth - pred)
    assert r.precision_ppm == r.tp * 1000000 // (r.tp + r.fp)
    assert r.recall_ppm == r.tp * 1000000 // (r.tp + r.fn)


def test_kfold_balance_and_determinism(spark):
    """Every stratum's five folds differ by at most one row; fold
    sizes sum back to the stratum size; assignment is a pure row
    property (two runs identical)."""
    pdf = _run(spark, "stratified_kfold_assignment")
    for _, g in pdf.groupby("stratum"):
        assert len(g) == 5
        assert g.n_rows.max() - g.n_rows.min() <= 1
    pdf2 = _run(spark, "stratified_kfold_assignment")
    assert pdf.equals(pdf2)


def test_k_anonymity_python_identity(spark):
    rows = duckdb.sql(
        f"SELECT c_nationkey,"
        f" CAST(round(c_acctbal * 100) AS BIGINT) // 100000,"
        f" c_mktsegment FROM read_parquet('{SF}/customer.parquet')"
    ).fetchall()
    groups = defaultdict(list)
    for nk, band, seg in rows:
        groups[(nk, band)].append(seg)
    sizes = [len(v) for v in groups.values()]
    ldivs = [len(set(v)) for v in groups.values()]
    r = _run(spark, "k_anonymity_audit_customers").iloc[0]
    assert r.n_rows == sum(sizes)
    assert r.n_groups == len(groups)
    assert r.k_anonymity == min(sizes)
    assert r.n_groups_below_k5 == sum(1 for s in sizes if s < 5)
    assert r.n_rows_below_k5 == sum(s for s in sizes if s < 5)
    assert r.l_diversity == min(ldivs)
    assert r.n_groups_below_l3 == sum(1 for d in ldivs if d < 3)


def test_rle_patterns_python_identity(spark):
    rows = duckdb.sql(
        f"SELECT user_id, CAST(ts AS DATE), ts, event_id, event_type"
        f" FROM read_parquet('{SF}/events.parquet')"
        f" ORDER BY user_id, CAST(ts AS DATE), ts, event_id"
    ).fetchall()
    sessions = defaultdict(list)
    for u, day, ts, eid, et in rows:
        sessions[(u, day)].append(et)
    counts = defaultdict(int)
    for seq in sessions.values():
        parts = []
        run_type, run_len = seq[0], 1
        for t in seq[1:]:
            if t == run_type:
                run_len += 1
            else:
                parts.append(f"{run_type}*{run_len}")
                run_type, run_len = t, 1
        parts.append(f"{run_type}*{run_len}")
        counts[">".join(parts)] += 1
    expect = sorted(
        ((p, n) for p, n in counts.items() if n >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:50]
    got = [
        (r.pattern, r.n_sessions)
        for r in _run(spark, "session_path_rle_patterns").itertuples()
    ]
    assert got == expect


def test_degree_histogram_python_identity(spark):
    edges = duckdb.sql(
        f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey
               FROM read_parquet('{SF}/lineitem.parquet'))
SELECT a.l_partkey, b.l_partkey FROM items a JOIN items b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 HAVING count(*) >= 2
"""
    ).fetchall()
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    hist = defaultdict(int)
    for d in deg.values():
        hist[d] += 1
    nv = sum(hist.values())
    expect = {}
    cum = 0
    for d in sorted(hist, reverse=True):
        cum += hist[d]
        expect[d] = (hist[d], cum * 1000000 // nv)
    got = {
        r.degree: (r.n_vertices, r.tail_share_ppm)
        for r in _run(spark, "graph_degree_histogram").itertuples()
    }
    assert got == expect


def test_growth_accounting_python_identity(spark):
    """Python replay of the monthly flow decomposition plus the
    accounting identity actives(m) - actives(m-1) = new + resurrected
    - churned for every month after the first."""
    rows = duckdb.sql(
        f"SELECT DISTINCT o_custkey,"
        f" EXTRACT(year FROM o_orderdate) * 12"
        f" + EXTRACT(month FROM o_orderdate) - 1"
        f" FROM read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    by_month = defaultdict(set)
    for cust, mi in rows:
        by_month[mi].add(cust)
    first = {}
    for mi in sorted(by_month):
        for c in by_month[mi]:
            first.setdefault(c, mi)
    expect = {}
    for mi in sorted(by_month):
        act, prev = by_month[mi], by_month.get(mi - 1, set())
        n_new = sum(1 for c in act if first[c] == mi)
        n_ret = len(act & prev)
        n_res = len(act) - n_new - n_ret
        n_churn = len(prev - act)
        yyyymm = (mi // 12) * 100 + (mi % 12) + 1
        expect[yyyymm] = (len(act), n_new, n_ret, n_res, n_churn)
    got = {
        r.yyyymm: (
            r.n_active,
            r.n_new,
            r.n_retained,
            r.n_resurrected,
            r.n_churned,
        )
        for r in _run(spark, "growth_accounting_monthly").itertuples()
    }
    assert got == expect
    months = sorted(expect)
    for a, b in zip(months, months[1:]):
        na, nb = expect[a][0], expect[b][0]
        assert nb - na == expect[b][1] + expect[b][3] - expect[b][4]


def test_discount_curve_python_identity(spark):
    rows = duckdb.sql(
        f"SELECT CAST(round(l_discount * 100) AS BIGINT),"
        f" CAST(round(l_quantity) AS BIGINT)"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()
    bands = defaultdict(lambda: [0, 0])
    for pct, qty in rows:
        bands[pct][0] += 1
        bands[pct][1] += qty
    n0, q0 = bands[0][0], bands[0][1]
    pdf = _run(spark, "discount_response_curve").set_index("disc_pct")
    for pct, (n, q) in bands.items():
        r = pdf.loc[pct]
        assert r.n_lines == n and r.total_qty == q
        assert r.qty_index_ppm == q * n0 * 1000000 // (q0 * n)
    assert pdf.loc[0, "qty_index_ppm"] == 1000000


def test_langid_confusion_python_identity(spark):
    """The confusion matrix must re-aggregate the per-doc predictions
    exactly, and each actual-language row's shares must sum to ~1e6."""
    pred = (
        registry.all_queries()["text_lang_id"]
        .fn(spark, SF)
        .toPandas()[["lang_actual", "lang_pred"]]
    )
    cells = defaultdict(int)
    totals = defaultdict(int)
    for r in pred.itertuples():
        cells[(r.lang_actual, r.lang_pred)] += 1
        totals[r.lang_actual] += 1
    got = _run(spark, "langid_eval_confusion")
    assert {
        (r.lang_actual, r.lang_pred): r.n_docs for r in got.itertuples()
    } == dict(cells)
    for r in got.itertuples():
        assert (
            r.row_share_ppm
            == r.n_docs * 1000000 // totals[r.lang_actual]
        )
        assert bool(r.is_correct) == (r.lang_actual == r.lang_pred)


def test_bayesian_avg_shrinks_small_samples(spark):
    """Python replay of the cleared-denominator formula; plus the
    shrinkage property: every published shrunk mean lies between the
    part's raw mean and the global mean."""
    rows = duckdb.sql(
        f"SELECT l_partkey, count(*),"
        f" SUM(CAST(round(l_quantity) AS BIGINT))"
        f" FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1"
    ).fetchall()
    ng = sum(r[1] for r in rows)
    sg = sum(r[2] for r in rows)
    scored = sorted(
        (
            (-(10 * sg + sq * ng) / (ng * (10 + n)), pk, n, sq)
            for pk, n, sq in rows
        )
    )[:20]
    pdf = _run(spark, "bayesian_avg_part_quantity")
    assert [r.l_partkey for r in pdf.itertuples()] == [
        pk for _, pk, _, _ in scored
    ]
    gmean = sg / ng
    for r in pdf.itertuples():
        raw = r.sq / r.n
        lo, hi = sorted((raw, gmean))
        assert lo - 1e-9 <= r.shrunk_mean <= hi + 1e-9


def test_sorted_neighborhood_python_identity(spark):
    """Python SNM over the sorted distinct-name domain (w = 3,
    edit <= 4) must equal the Spark pair set; and SNM must surface at
    least one pair (the method is non-degenerate on this catalog)."""

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    rows = duckdb.sql(
        f"SELECT p_name, count(*) FROM read_parquet('{SF}/part.parquet')"
        f" GROUP BY 1 ORDER BY 1"
    ).fetchall()
    expect = {}
    for i, (na, ca) in enumerate(rows):
        for off in (1, 2, 3):
            if i + off >= len(rows):
                continue
            nb, cb = rows[i + off]
            d = lev(na, nb)
            if d <= 4:
                expect[(na, nb)] = (off, d, ca, cb)
    got = {
        (r.name_a, r.name_b): (
            r.window_offset,
            r.edit_dist,
            r.n_parts_a,
            r.n_parts_b,
        )
        for r in _run(spark, "sorted_neighborhood_pairs").itertuples()
    }
    assert got == expect
    assert expect, "SNM must find adjacent near-names on this catalog"


def test_dispersion_index_python_identity(spark):
    sizes = [
        r[0]
        for r in duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{SF}/lineitem.parquet')"
            f" GROUP BY l_orderkey"
        ).fetchall()
    ]
    n, sx = len(sizes), sum(sizes)
    sxx = sum(x * x for x in sizes)
    r = _run(spark, "basket_dispersion_index").iloc[0]
    assert (r.n, r.sx, r.min_items, r.max_items) == (
        n,
        sx,
        min(sizes),
        max(sizes),
    )
    assert r.dispersion_ppm == (n * sxx - sx * sx) * 1000000 // (
        (n - 1) * sx
    )


def test_cascade_audit_python_identity(spark):
    keys = {
        t: set(
            r[0]
            for r in duckdb.sql(
                f"SELECT {k} FROM read_parquet('{SF}/{t}.parquet')"
            ).fetchall()
        )
        for t, k in [
            ("orders", "o_orderkey"),
            ("customer", "c_custkey"),
            ("nation", "n_nationkey"),
            ("region", "r_regionkey"),
        ]
    }
    links = {
        "lineitem->orders": ("lineitem", "l_orderkey", "orders"),
        "orders->customer": ("orders", "o_custkey", "customer"),
        "customer->nation": ("customer", "c_nationkey", "nation"),
        "nation->region": ("nation", "n_regionkey", "region"),
    }
    got = {
        r.link: (r.n_rows, r.n_orphans)
        for r in _run(spark, "referential_cascade_audit").itertuples()
    }
    for link, (child, fk, parent) in links.items():
        fks = [
            r[0]
            for r in duckdb.sql(
                f"SELECT {fk} FROM read_parquet('{SF}/{child}.parquet')"
            ).fetchall()
        ]
        orphans = sum(1 for v in fks if v not in keys[parent])
        assert got[link] == (len(fks), orphans)


def test_concentration_share_python_identity(spark):
    rows = duckdb.sql(
        f"""
SELECT EXTRACT(year FROM o_orderdate) * 100
         + EXTRACT(month FROM o_orderdate),
       o_custkey,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
FROM read_parquet('{SF}/orders.parquet') GROUP BY 1, 2
"""
    ).fetchall()
    months = defaultdict(list)
    for ym, ck, rev in rows:
        months[ym].append((-rev, ck))
    got = {
        r.yyyymm: (
            r.n_customers,
            r.total_rev_cents,
            r.top_decile_rev_cents,
            r.top_decile_share_ppm,
        )
        for r in _run(
            spark, "monthly_concentration_top_decile"
        ).itertuples()
    }
    for ym, lst in months.items():
        lst.sort()
        n = len(lst)
        total = sum(-r for r, _ in lst)
        top = sum(
            -lst[i][0] for i in range(n) if (i + 1) * 10 <= n
        )
        assert got[ym] == (n, total, top, top * 1000000 // total)


def test_conversion_sensitivity_monotone_and_exact(spark):
    rows = duckdb.sql(
        f"SELECT event_id, user_id, event_type,"
        f" date_diff('second', TIMESTAMP '1970-01-01', ts)"
        f" FROM read_parquet('{SF}/events.parquet')"
        f" WHERE event_type IN ('click', 'purchase')"
    ).fetchall()
    purch = defaultdict(list)
    for eid, u, t, s in rows:
        if t == "purchase":
            purch[u].append(s)
    n_clicks = 0
    conv = {900: 0, 3600: 0, 14400: 0}
    for eid, u, t, s in rows:
        if t != "click":
            continue
        n_clicks += 1
        deltas = [p - s for p in purch[u] if 0 < p - s <= 14400]
        if not deltas:
            continue
        d = min(deltas)
        for w in conv:
            if d <= w:
                conv[w] += 1
    r = _run(spark, "conversion_window_sensitivity").iloc[0]
    assert r.n_clicks == n_clicks
    assert (r.conv_15m, r.conv_1h, r.conv_4h) == (
        conv[900],
        conv[3600],
        conv[14400],
    )
    assert r.conv_15m <= r.conv_1h <= r.conv_4h


def test_spearman_python_identity(spark):
    """Tie-averaged-rank Pearson recomputed with plain python ints
    (doubled ranks stay integers) matches the published rho."""
    import math

    rows = duckdb.sql(
        f"SELECT o_custkey,"
        f" CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),"
        f" count(*) FROM read_parquet('{SF}/orders.parquet') GROUP BY 1"
    ).fetchall()

    def doubled_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        d = [0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            two_avg = (i + 1) + j  # 2*rank_min + cnt - 1 with 1-based
            for k in range(i, j):
                d[order[k]] = two_avg
            i = j
        return d

    revs = [r[1] for r in rows]
    cnts = [r[2] for r in rows]
    x2, y2 = doubled_ranks(revs), doubled_ranks(cnts)
    n = len(rows)
    sx, sy = sum(x2), sum(y2)
    sxy = sum(a * b for a, b in zip(x2, y2))
    sxx = sum(a * a for a in x2)
    syy = sum(b * b for b in y2)
    rho = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    r = _run(spark, "spearman_rank_revenue_orders").iloc[0]
    assert r.n == n
    assert r.spearman_rho == pytest.approx(
        round(rho * 1000000) / 1000000, abs=2e-6
    )
    assert -1 <= r.spearman_rho <= 1


def test_reconciliation_python_identity(spark):
    lines = duckdb.sql(
        f"SELECT l_orderkey,"
        f" SUM(CAST(round(l_extendedprice * 100) AS BIGINT))"
        f" FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1"
    ).fetchall()
    sums = dict(lines)
    orders = duckdb.sql(
        f"SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT)"
        f" FROM read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    n_no, n_exact, n_1, n_10, mx = 0, 0, 0, 0, 0
    for ok, hdr in orders:
        ls = sums.get(ok)
        if ls is None:
            n_no += 1
            continue
        d = abs(ls - hdr)
        mx = max(mx, d)
        n_exact += ls == hdr
        n_1 += d * 100 <= hdr
        n_10 += d * 10 <= hdr
    r = _run(spark, "order_total_reconciliation").iloc[0]
    assert (
        r.n_orders,
        r.n_no_lines,
        r.n_exact,
        r.n_within_1pct,
        r.n_within_10pct,
        r.max_abs_delta_cents,
    ) == (len(orders), n_no, n_exact, n_1, n_10, mx)


def test_autocorr_python_identity(spark):
    import math

    daily = duckdb.sql(
        f"""
SELECT event_type,
       date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS yc
FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2 ORDER BY 1, 2
"""
    ).fetchall()
    series = defaultdict(dict)
    for et, x, yc in daily:
        series[et][x] = yc
    got = {
        r.event_type: (r.n, r.autocorr_lag1)
        for r in _run(spark, "autocorr_lag1_daily").itertuples()
    }
    for et, by_x in series.items():
        pairs = [
            (by_x[x], by_x[x + 1]) for x in by_x if x + 1 in by_x
        ]
        n = len(pairs)
        sa = sum(a for a, _ in pairs)
        sb = sum(b for _, b in pairs)
        sab = sum(a * b for a, b in pairs)
        saa = sum(a * a for a, _ in pairs)
        sbb = sum(b * b for _, b in pairs)
        r1 = (n * sab - sa * sb) / (
            math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb)
        )
        assert got[et][0] == n
        assert got[et][1] == pytest.approx(
            round(r1 * 1000000) / 1000000, abs=2e-6
        )


def test_erasure_footprint_python_identity(spark):
    cust = duckdb.sql(
        f"SELECT c_custkey, c_acctbal FROM read_parquet('{SF}/customer.parquet')"
    ).fetchall()
    cohort = {c for c, b in cust if b < 0}
    orders = duckdb.sql(
        f"SELECT o_orderkey, o_custkey FROM read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    okeys = {ok for ok, ck in orders if ck in cohort}
    li = duckdb.sql(
        f"SELECT l_orderkey FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()
    n_li = sum(1 for (lk,) in li if lk in okeys)
    got = {
        r.tbl: (r.n_rows_to_erase, r.n_rows_total)
        for r in _run(spark, "erasure_footprint_audit").itertuples()
    }
    assert got == {
        "customer": (len(cohort), len(cust)),
        "orders": (len(okeys), len(orders)),
        "lineitem": (n_li, len(li)),
    }
    assert len(cohort) > 0, "cohort must be non-empty on this corpus"


def test_ffill_ttl_python_identity(spark):
    daily = duckdb.sql(
        f"""
SELECT o_orderpriority,
       date_diff('day', DATE '1970-01-01', o_orderdate),
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
FROM read_parquet('{SF}/orders.parquet') GROUP BY 1, 2
"""
    ).fetchall()
    series = defaultdict(dict)
    xs = []
    for pr, x, yc in daily:
        series[pr][x] = yc
        xs.append(x)
    mn, mx = min(xs), max(xs)
    expect = {}
    for pr, by_x in series.items():
        n_obs = n_fill = n_exp = n_lead = 0
        total = 0
        last_x = None
        for x in range(mn, mx + 1):
            if x in by_x:
                last_x = x
                n_obs += 1
                total += by_x[x]
            elif last_x is None:
                n_lead += 1
            elif x - last_x <= 3:
                n_fill += 1
                total += by_x[last_x]
            else:
                n_exp += 1
        expect[pr] = (mx - mn + 1, n_obs, n_fill, n_exp, n_lead, total)
    got = {
        r.priority: (
            r.n_days,
            r.n_observed,
            r.n_filled,
            r.n_expired,
            r.n_leading_null,
            r.sum_series_cents,
        )
        for r in _run(spark, "ffill_ttl_daily_revenue").itertuples()
    }
    assert got == expect


def test_hysteresis_python_identity(spark):
    daily = duckdb.sql(
        f"""
SELECT event_type,
       date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS yc
FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2 ORDER BY 1, 2
"""
    ).fetchall()
    series = defaultdict(list)
    for et, x, yc in daily:
        series[et].append((x, yc))
    expect = {}
    for et, pts in series.items():
        n = len(pts)
        sx = sum(y for _, y in pts)
        armed = True
        n_high = n_alerts = 0
        first = None
        for x, y in pts:
            if 10 * y * n > 12 * sx:
                n_high += 1
                if armed:
                    n_alerts += 1
                    armed = False
                    if first is None:
                        first = x
            elif 10 * y * n < 8 * sx:
                armed = True
        expect[et] = (n, n_high, n_alerts, first)
    got = {
        r.event_type: (
            r.n_days,
            r.n_above_high,
            r.n_alerts,
            None if r.first_alert_x != r.first_alert_x else r.first_alert_x,
        )
        for r in _run(spark, "hysteresis_alerts_daily").itertuples()
    }
    assert got == expect
    assert any(v[2] < v[1] for v in expect.values()) or all(
        v[1] == 0 for v in expect.values()
    )


def test_slo_burn_rate_python_identity(spark):
    daily = duckdb.sql(
        f"""
SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
       count(*),
       SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
FROM read_parquet('{SF}/events.parquet') GROUP BY 1 ORDER BY 1
"""
    ).fetchall()
    by_x = {x: (n, e) for x, n, e in daily}
    got = {
        r.x: (
            r.n_events,
            r.n_errors,
            r.burn_1d_ppm,
            r.burn_7d_ppm,
            bool(r.page_alert),
        )
        for r in _run(spark, "slo_burn_rate_daily").itertuples()
    }
    for x, (n, e) in by_x.items():
        n7 = sum(by_x[d][0] for d in range(x - 6, x + 1) if d in by_x)
        e7 = sum(by_x[d][1] for d in range(x - 6, x + 1) if d in by_x)
        expect = (
            n,
            e,
            e * 5 * 1000000 // n,
            e7 * 5 * 1000000 // n7,
            e * 50 > n * 12 and e7 * 5 > n7,
        )
        assert got[x] == expect
    alerts = {v[4] for v in got.values()}
    assert alerts == {True, False}, "page_alert must discriminate"


def test_cuped_python_identity_and_reduces_variance(spark):
    rows = duckdb.sql(
        f"SELECT user_id, event_type,"
        f" date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))"
        f" FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    split = min(d for _, _, d in rows) + 15
    xs = defaultdict(int)
    ys = defaultdict(int)
    users = set()
    for u, t, d in rows:
        users.add(u)
        if t == "purchase":
            if d < split:
                xs[u] += 1
            else:
                ys[u] += 1
    ulist = sorted(users)
    n = len(ulist)
    sx = sum(xs[u] for u in ulist)
    sy = sum(ys[u] for u in ulist)
    sxy = sum(xs[u] * ys[u] for u in ulist)
    sxx = sum(xs[u] * xs[u] for u in ulist)
    th = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    xbar_pool = sx / n
    pdf = _run(spark, "cuped_adjusted_ab").set_index("arm")
    for arm in (0, 1):
        au = [u for u in ulist if u % 2 == arm]
        an = len(au)
        asx = sum(xs[u] for u in au)
        asy = sum(ys[u] for u in au)
        asxy = sum(xs[u] * ys[u] for u in au)
        asxx = sum(xs[u] * xs[u] for u in au)
        asyy = sum(ys[u] * ys[u] for u in au)
        ybar = asy / an
        xbar = asx / an
        var_y = (an * asyy - asy * asy) / (an * an)
        cov = (an * asxy - asx * asy) / (an * an)
        var_x = (an * asxx - asx * asx) / (an * an)
        r = pdf.loc[arm]
        assert r.n == an
        assert r.ybar == pytest.approx(ybar, abs=2e-6)
        assert r.ybar_cuped == pytest.approx(
            ybar - th * (xbar - xbar_pool), abs=2e-6
        )
        assert r.var_y == pytest.approx(var_y, abs=2e-6)
        assert r.var_y_cuped == pytest.approx(
            var_y - 2 * th * cov + th * th * var_x, abs=2e-6
        )
    # the point of CUPED: theta = cov/var minimizes the POOLED
    # adjusted variance, so pooled var(y_adj) <= pooled var(y)
    # (per-ARM variance can legitimately rise on a tiny arm)
    syy = sum(ys[u] * ys[u] for u in ulist)
    var_y_pool = (n * syy - sy * sy) / (n * n)
    cov_pool = (n * sxy - sx * sy) / (n * n)
    var_x_pool = (n * sxx - sx * sx) / (n * n)
    adj = var_y_pool - 2 * th * cov_pool + th * th * var_x_pool
    assert adj <= var_y_pool + 1e-12


def test_assortativity_python_identity(spark):
    import math

    edges = duckdb.sql(
        f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey
               FROM read_parquet('{SF}/lineitem.parquet'))
SELECT a.l_partkey, b.l_partkey FROM items a JOIN items b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 HAVING count(*) >= 2
"""
    ).fetchall()
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    ends = []
    for u, v in edges:
        ends.append((deg[u], deg[v]))
        ends.append((deg[v], deg[u]))
    n = len(ends)
    sx = sum(x for x, _ in ends)
    sy = sum(y for _, y in ends)
    sxy = sum(x * y for x, y in ends)
    sxx = sum(x * x for x, _ in ends)
    syy = sum(y * y for _, y in ends)
    r = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    row = _run(spark, "degree_assortativity_copurchase").iloc[0]
    assert row.n == n
    assert row.assortativity == pytest.approx(
        round(r * 1000000) / 1000000, abs=2e-6
    )
    assert sx == sy and sxx == syy  # symmetrization invariant


def test_cents_ending_python_identity(spark):
    rows = duckdb.sql(
        f"SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 100"
        f" FROM read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    counts = defaultdict(int)
    for (e,) in rows:
        counts[e] += 1
    n = len(rows)
    chi_num = sum((100 * o - n) ** 2 for o in counts.values())
    # cells with zero observations contribute n^2 each
    chi_num += (100 - len(counts)) * n * n if len(counts) < 100 else 0
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    r = _run(spark, "cents_ending_uniformity_audit").iloc[0]
    assert r.n_rows == n
    assert r.n_distinct_endings == len(counts)
    assert (r.top_ending, r.top_ending_count) == top
    # the operator's chi-square covers OBSERVED endings only (absent
    # endings are visible via n_distinct_endings < 100)
    chi_obs = sum((100 * o - n) ** 2 for o in counts.values())
    assert r.chi_square_uniform == pytest.approx(
        round(chi_obs / (100 * n) * 1000000) / 1000000, abs=2e-6
    )


def test_entity_resolution_python_identity(spark):
    """Python union-find over the union of both python pair
    generators must reproduce the clusters."""

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rows = duckdb.sql(
        f"SELECT p_name, count(*), min(p_partkey)"
        f" FROM read_parquet('{SF}/part.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    nid = {n: k for n, _, k in rows}
    nparts = {n: c for n, c, _ in rows}
    pairs = set()
    by_noun = defaultdict(list)
    for n, _, _ in rows:
        by_noun[n.split()[-1]].append(n)
    for noun, ns in by_noun.items():
        for i, a in enumerate(ns):
            for b in ns[i + 1 :]:
                x, y = sorted((a, b))
                if lev(x, y) <= 3:
                    pairs.add((x, y))
    ordered = [n for n, _, _ in rows]
    for i, a in enumerate(ordered):
        for off in (1, 2, 3):
            if i + off < len(ordered) and lev(a, ordered[i + off]) <= 4:
                pairs.add((a, ordered[i + off]))
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(nid[a]), find(nid[b])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = defaultdict(list)
    for a, b in pairs:
        for n in (a, b):
            clusters[find(nid[n])]
    members = defaultdict(set)
    for n in {x for p in pairs for x in p}:
        members[find(nid[n])].add(n)
    expect = {}
    for comp, ns in members.items():
        canonical = next(n for n in ns if nid[n] == comp)
        expect[comp] = (
            len(ns),
            sum(nparts[n] for n in ns),
            canonical,
        )
    got = {
        r.component: (r.n_names, r.n_listings, r.canonical_name)
        for r in _run(spark, "entity_resolution_clusters").itertuples()
    }
    assert got == expect
    assert any(v[0] > 2 for v in expect.values()) or expect


def test_epoch_overlap_python_identity(spark):
    docs = [d for d, _, _ in _docs()]

    def member(salt, d):
        return hashlib.md5(f"{salt}:{d}".encode()).hexdigest()[:4] < "2000"

    e1 = {d for d in docs if member("ep1", d)}
    e2 = {d for d in docs if member("ep2", d)}
    r = _run(spark, "epoch_sample_overlap_audit").iloc[0]
    assert (r.n_docs, r.n_ep1, r.n_ep2, r.n_both) == (
        len(docs),
        len(e1),
        len(e2),
        len(e1 & e2),
    )
    assert r.overlap_ppm == len(e1 & e2) * 1000000 // len(e1)
    # independence sanity: overlap share must sit far from 100%
    assert r.overlap_ppm < 500000


def test_lsh_calibration_monotone_and_consistent(spark):
    """The calibration curve must re-aggregate the candidate pairs'
    exact-ppm floors, and mean exact similarity must be
    non-decreasing in the estimate bucket (a sane estimator)."""
    pred = (
        registry.all_queries()["dedup_minhash_lsh"]
        .fn(spark, SF)
        .toPandas()
    )
    toks = {
        d: set(t for t in text.split() if t) for d, _, text in _docs()
    }
    buckets = defaultdict(list)
    for r in pred.itertuples():
        inter = len(toks[r.id_a] & toks[r.id_b])
        union = len(toks[r.id_a]) + len(toks[r.id_b]) - inter
        ppm = inter * 1000000 // union
        # SQL round is half-away-from-zero; python round is banker's
        b = int(r.est_jaccard * 8 + 0.5)
        buckets[b].append(ppm)
    got = {
        r.est_bucket: (r.n_pairs, r.sum_exact_ppm, r.mean_exact_ppm)
        for r in _run(spark, "lsh_calibration_curve").itertuples()
    }
    assert got == {
        b: (len(v), sum(v), sum(v) // len(v)) for b, v in buckets.items()
    }
    means = [got[b][2] for b in sorted(got)]
    assert means == sorted(means), "estimator must be monotone here"


def test_diff_in_diff_python_identity(spark):
    rows = duckdb.sql(
        f"SELECT user_id, event_type,"
        f" date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))"
        f" FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    split = min(d for _, _, d in rows) + 15
    pre = defaultdict(int)
    post = defaultdict(int)
    users = set()
    for u, t, d in rows:
        users.add(u)
        if t == "purchase":
            (pre if d < split else post)[u] += 1
    cells = {0: [0, 0, 0], 1: [0, 0, 0]}  # n, s_pre, s_post
    for u in users:
        c = cells[u % 2]
        c[0] += 1
        c[1] += pre[u]
        c[2] += post[u]
    did = (
        cells[1][2] / cells[1][0]
        - cells[1][1] / cells[1][0]
        - (cells[0][2] / cells[0][0] - cells[0][1] / cells[0][0])
    )
    r = _run(spark, "diff_in_diff_purchases").iloc[0]
    assert (r.n0, r.s_pre0, r.s_post0) == tuple(cells[0])
    assert (r.n1, r.s_pre1, r.s_post1) == tuple(cells[1])
    assert r.did_per_user == pytest.approx(
        round(did * 1000000) / 1000000, abs=2e-6
    )


def test_runs_test_python_identity(spark):
    import math

    daily = duckdb.sql(
        f"""
SELECT event_type,
       date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS yc
FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2 ORDER BY 1, 2
"""
    ).fetchall()
    series = defaultdict(list)
    for et, x, yc in daily:
        series[et].append(yc)
    got = {
        r.event_type: (r.n_runs, r.n_plus, r.n_minus, r.runs_z)
        for r in _run(spark, "runs_test_daily_value").itertuples()
    }
    for et, ys in series.items():
        m = sorted(ys)[(len(ys) + 1) // 2 - 1]
        signs = [1 if y > m else 0 for y in ys if y != m]
        n_runs = 1 + sum(
            1 for a, b in zip(signs, signs[1:]) if a != b
        )
        np_, nm = sum(signs), len(signs) - sum(signs)
        mu = 2.0 * np_ * nm / (np_ + nm) + 1
        var = (
            2.0 * np_ * nm * (2.0 * np_ * nm - np_ - nm)
            / ((np_ + nm) ** 2 * (np_ + nm - 1))
        )
        z = (n_runs - mu) / math.sqrt(var)
        assert got[et][0] == n_runs, (et, got[et], n_runs)
        assert got[et][1] == np_ and got[et][2] == nm
        assert got[et][3] == pytest.approx(
            round(z * 1000000) / 1000000, abs=2e-6
        )


def test_mcnemar_sign_python_identity(spark):
    rows = duckdb.sql(
        f"SELECT user_id, event_type,"
        f" date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))"
        f" FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    split = min(d for _, _, d in rows) + 15
    pre = defaultdict(int)
    post = defaultdict(int)
    users = set()
    for u, t, d in rows:
        users.add(u)
        if t == "purchase":
            (pre if d < split else post)[u] += 1
    up = sum(1 for u in users if post[u] > pre[u])
    down = sum(1 for u in users if post[u] < pre[u])
    tie = len(users) - up - down
    r = _run(spark, "mcnemar_paired_conversion").iloc[0]
    assert (r.n_up, r.n_down, r.n_tie) == (up, down, tie)
    chi2 = (up - down) ** 2 / (up + down)
    assert r.mcnemar_chi2 == pytest.approx(
        round(chi2 * 1000000) / 1000000, abs=2e-6
    )
    assert bool(r.significant_05) == (
        (up - down) ** 2 > 4 * (up + down)
    )
    assert up + down > 0, "discordant cells must be populated"
