"""Independent-reference checks for the round-16 additions — plain-
Python replays per the house simulator-equality pattern, so a shared
SQL-side misconception cannot hide in both engines."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

from spark_lever_spark import registry

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return registry.all_queries()[name].fn(spark, SF).toPandas()


def _sql(q: str):
    return duckdb.sql(q.replace("{SF}", SF)).fetchall()


def _shingles3(text: str) -> list[str]:
    w = text.split(" ")
    return [" ".join(w[i : i + 3]) for i in range(len(w) - 2)]


def _docs():
    return _sql(
        "SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    )


# ---------------------------------------------------------------------------
# hash-family health
# ---------------------------------------------------------------------------


def test_simhash_bit_balance_brute(spark):
    ones = Counter()
    n_docs = 0
    for _did, text in _docs():
        toks = {t for t in text.split() if t}
        if not toks:
            continue
        n_docs += 1
        for j in range(60):
            s = 0
            for t in toks:
                h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                s += 1 if (h >> j) & 1 else -1
            if s > 0:
                ones[j] += 1
    got = _run(spark, "simhash_bit_balance_audit")
    assert len(got) == 60
    for row in got.itertuples():
        assert row.n_docs == n_docs
        assert row.n_ones == ones[row.bit_idx]
        assert row.imbalance_ppm == (
            abs(2 * ones[row.bit_idx] - n_docs) * 1_000_000 // n_docs
        )


# ---------------------------------------------------------------------------
# greedy set cover
# ---------------------------------------------------------------------------


def test_greedy_coverage_brute(spark):
    doc_sh = {
        did: set(_shingles3(text))
        for did, text in _docs()
        if _shingles3(text)
    }
    covered: set[str] = set()
    selected: list[int] = []
    want = []
    for r in range(1, 7):
        best = None
        for did in sorted(doc_sh):
            if did in selected:
                continue
            gain = len(doc_sh[did] - covered)
            if best is None or gain > best[1]:
                best = (did, gain)
        selected.append(best[0])
        covered |= doc_sh[best[0]]
        want.append((r, best[0], best[1], len(covered)))
    got = _run(spark, "greedy_coverage_doc_selection")
    assert [
        (int(a), int(b), int(c), int(d))
        for a, b, c, d in zip(
            got["selection_rank"],
            got["doc_id"],
            got["gain"],
            got["covered_cum"],
        )
    ] == want
    # submodularity sanity: marginal gains never increase
    gains = [g for _, _, g, _ in want]
    assert gains == sorted(gains, reverse=True)


# ---------------------------------------------------------------------------
# multimodal features
# ---------------------------------------------------------------------------


def test_ppm_color_quantize_brute(spark):
    got = _run(spark, "multimodal_ppm_color_quantize")
    doc_ids = [d for (d, _t) in _docs() if d < 150]
    assert list(got["doc_id"]) == doc_ids
    for row in got.itertuples():
        did = int(row.doc_id)
        w, h = did % 12 + 4, did % 8 + 4
        bins = Counter()
        for i in range(w * h):
            r = (did * 37 + i * 11) % 256
            g = (did * 37 + i * 11 + 71) % 256
            b = (did * 37 + i * 11 + 142) % 256
            bins[(r // 64) * 16 + (g // 64) * 4 + b // 64] += 1
        dom = max(bins, key=lambda k: (bins[k], -k))
        assert row.n_pixels == w * h
        assert row.dominant_bin == dom
        assert row.dominant_count == bins[dom]
        assert row.n_bins == len(bins)


def test_wav_zero_crossings_brute(spark):
    got = _run(spark, "multimodal_wav_zero_crossings")
    for row in got.itertuples():
        did = int(row.doc_id)
        n = did % 200 + 50
        s = [(did * 131 + i * 17) % 2048 - 1024 for i in range(n)]
        crossings = [i for i in range(1, n) if s[i] * s[i - 1] < 0]
        assert row.n_samples == n
        assert row.n_crossings == len(crossings)
        assert row.n_zeros == sum(1 for v in s if v == 0)
        if crossings:
            assert row.first_crossing_idx == crossings[0]


# ---------------------------------------------------------------------------
# Gries' DP dispersion
# ---------------------------------------------------------------------------


def test_gries_dp_brute(spark):
    wc: dict[tuple[str, str], int] = Counter()
    for source, text in _sql(
        "SELECT source, text FROM '{SF}/documents.parquet'"
    ):
        for t in text.split():
            if t:
                wc[(source, t)] += 1
    t_all = sum(wc.values())
    t_s = Counter()
    c_t = Counter()
    for (source, w), c in wc.items():
        t_s[source] += c
        c_t[w] += c
    top = sorted(c_t, key=lambda w: (-c_t[w], w))[:20]
    got = _run(spark, "term_dispersion_gries_dp")
    assert list(got["term"]) == top
    for row in got.itertuples():
        w = row.term
        num = sum(
            abs(wc.get((s, w), 0) * t_all - t_s[s] * c_t[w]) for s in t_s
        )
        assert row.total_count == c_t[w]
        assert row.dp_ppm == num * 1_000_000 // (2 * c_t[w] * t_all)


# ---------------------------------------------------------------------------
# stratified ATE + EB shrinkage
# ---------------------------------------------------------------------------


def test_stratified_ate_brute(spark):
    rows = _sql(
        "SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority,"
        " l.l_returnflag"
        " FROM '{SF}/lineitem.parquet' l"
        " JOIN '{SF}/orders.parquet' o ON o.o_orderkey = l.l_orderkey"
        " JOIN '{SF}/customer.parquet' c ON c.c_custkey = o.o_custkey"
    )
    cells = defaultdict(lambda: [0, 0, 0, 0])  # n1, x1, n0, x0
    tot = [0, 0, 0, 0]
    for nk, seg, pri, rf in rows:
        t = 1 if pri in ("1-URGENT", "2-HIGH") else 0
        y = 1 if rf == "R" else 0
        c = cells[(nk, seg)]
        if t:
            c[0] += 1
            c[1] += y
            tot[0] += 1
            tot[1] += y
        else:
            c[2] += 1
            c[3] += y
            tot[2] += 1
            tot[3] += y
    num = 0
    den = 0
    n_cells = 0
    for n1, x1, n0, x0 in cells.values():
        if n1 > 0 and n0 > 0:
            r1 = x1 * 1_000_000 // n1
            r0 = x0 * 1_000_000 // n0
            num += (n1 + n0) * (r1 - r0)
            den += n1 + n0
            n_cells += 1
    ate = num // den if num >= 0 else -((-num) // den)
    naive = (
        tot[1] * 1_000_000 // tot[0] - tot[3] * 1_000_000 // tot[2]
    )
    got = _run(spark, "stratified_ate_priority_returns").iloc[0]
    assert got["n_cells"] == n_cells
    assert got["n_units"] == den
    assert got["naive_diff_ppm"] == naive
    assert got["ate_ppm"] == ate


def test_eb_shrinkage_brute(spark):
    rows = _sql(
        "SELECT p.p_brand, l.l_returnflag FROM '{SF}/lineitem.parquet' l"
        " JOIN '{SF}/part.parquet' p ON p.p_partkey = l.l_partkey"
    )
    per = defaultdict(lambda: [0, 0])
    for brand, rf in rows:
        per[brand][0] += 1
        per[brand][1] += 1 if rf == "R" else 0
    nn = sum(n for n, _ in per.values())
    xx = sum(x for _, x in per.values())
    got = _run(spark, "eb_shrunk_brand_return_rates")
    assert list(got["brand"]) == sorted(per)
    for row in got.itertuples():
        n, x = per[row.brand]
        assert row.n_items == n
        assert row.raw_ppm == x * 1_000_000 // n
        assert row.shrunk_ppm == (x * nn + 200 * xx) * 1_000_000 // (
            nn * (n + 200)
        )
        assert row.grand_ppm == xx * 1_000_000 // nn
        # shrinkage pulls BETWEEN raw and grand (inclusive)
        lo, hi = sorted((row.raw_ppm, row.grand_ppm))
        assert lo - 1 <= row.shrunk_ppm <= hi + 1  # floor slack


def test_good_turing_brute(spark):
    wc = defaultdict(Counter)
    for source, text in _sql(
        "SELECT source, text FROM '{SF}/documents.parquet'"
    ):
        for t in text.split():
            if t:
                wc[source][t] += 1
    got = _run(spark, "good_turing_unseen_mass_by_source")
    assert list(got["source"]) == sorted(wc)
    for row in got.itertuples():
        c = wc[row.source]
        t = sum(c.values())
        n1 = sum(1 for v in c.values() if v == 1)
        n2 = sum(1 for v in c.values() if v == 2)
        assert row.total_tokens == t
        assert row.vocab == len(c)
        assert row.n1 == n1 and row.n2 == n2
        assert row.unseen_ppm == n1 * 1_000_000 // t
        if n1 > 0:
            assert row.r1_star_milli == 2 * n2 * 1000 // n1


def test_kendall_tau_brute(spark):
    days = defaultdict(lambda: [0, 0])
    for d, et in _sql(
        "SELECT CAST(ts AS DATE), event_type FROM '{SF}/events.parquet'"
        " WHERE event_type IN ('error', 'click')"
    ):
        if et == "error":
            days[d][0] += 1
        else:
            days[d][1] += 1
    # days with neither error nor click still count (x=y=0) — mirror
    # the query's full-calendar grouping
    for (d,) in _sql(
        "SELECT DISTINCT CAST(ts AS DATE) FROM '{SF}/events.parquet'"
    ):
        days.setdefault(d, [0, 0])
    ds = sorted(days)
    conc = disc = ties = 0
    for i in range(len(ds)):
        for j in range(i + 1, len(ds)):
            xa, ya = days[ds[i]]
            xb, yb = days[ds[j]]
            p = (xa - xb) * (ya - yb)
            if p > 0:
                conc += 1
            elif p < 0:
                disc += 1
            if xa == xb or ya == yb:
                ties += 1
    npairs = len(ds) * (len(ds) - 1) // 2
    num = conc - disc
    tau = (
        num * 1_000_000 // npairs
        if num >= 0
        else -((-num) * 1_000_000 // npairs)
    )
    got = _run(spark, "kendall_tau_daily_error_click").iloc[0]
    assert got["n_days"] == len(ds)
    assert got["concordant"] == conc
    assert got["discordant"] == disc
    assert got["tied_pairs"] == ties
    assert got["tau_a_ppm"] == tau


def test_config_model_triangle_excess_brute(spark):
    rows = _sql(
        "SELECT DISTINCT l_orderkey, l_partkey FROM '{SF}/lineitem.parquet'"
    )
    by_order = defaultdict(list)
    for ok, pk in rows:
        by_order[ok].append(pk)
    pair_count = Counter()
    for parts in by_order.values():
        ps = sorted(set(parts))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_count[(ps[i], ps[j])] += 1
    edges = {p for p, c in pair_count.items() if c >= 2}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = 0
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:
                tri += 1
    s1 = sum(len(v) for v in adj.values())
    s2 = sum(len(v) * (len(v) - 1) for v in adj.values())
    got = _run(spark, "config_model_triangle_excess_copurchase").iloc[0]
    assert got["n_vertices"] == len(adj)
    assert got["n_edges"] == len(edges)
    assert got["s2"] == s2
    assert got["t_obs"] == tri
    assert got["expected_milli"] == s2**3 * 1000 // (6 * s1**3)
    if s2 > 0:
        assert got["excess_ratio_milli"] == tri * 6000 * s1**3 // (
            s2**3
        )
