"""As-of and bucketed range joins (operators/temporal.py) against
independent references: pandas.merge_asof for as-of semantics, a
naive O(n*m) Python double loop for the interval join."""

from __future__ import annotations

import random

import pandas as pd

from spark_lever_spark.operators.temporal import asof_join, range_join_bucketed


def _random_frames(seed):
    rng = random.Random(seed)
    left = [
        (rng.randrange(4), float(rng.randrange(0, 1000)), i)
        for i in range(120)
    ]
    # unique (key, t) on the right — the determinism precondition
    right_keys = {(rng.randrange(4), float(rng.randrange(0, 1000))) for _ in range(80)}
    right = [(k, t, 1000 + j) for j, (k, t) in enumerate(sorted(right_keys))]
    return left, right


def _pandas_asof(left, right, allow_exact):
    lpd = pd.DataFrame(left, columns=["k", "t", "lid"]).sort_values("t", kind="stable")
    rpd = pd.DataFrame(right, columns=["k", "rt", "rid"]).sort_values("rt", kind="stable")
    merged = pd.merge_asof(
        lpd,
        rpd,
        left_on="t",
        right_on="rt",
        by="k",
        direction="backward",
        allow_exact_matches=allow_exact,
    )
    return {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged.itertuples()
    }


def test_asof_join_matches_pandas_merge_asof(spark):
    left, right = _random_frames(7)
    ldf = spark.createDataFrame(left, ["k", "t", "lid"])
    rdf = spark.createDataFrame(right, ["k", "rt", "rid"])
    for allow_exact in (True, False):
        got = asof_join(
            ldf,
            rdf,
            by=["k"],
            left_on="t",
            right_on="rt",
            value_cols=["rt", "rid"],
            allow_exact_matches=allow_exact,
        ).collect()
        want = _pandas_asof(left, right, allow_exact)
        assert {r.lid: r.rid for r in got} == want, f"allow_exact={allow_exact}"


def test_asof_join_null_right_value_does_not_bleed_older_row(spark):
    # right row at t=20 has a NULL payload; the t=30 left row must see
    # that NULL, not the non-null payload of the older t=10 row
    ldf = spark.createDataFrame([(1, 30.0, 0)], ["k", "t", "lid"])
    rdf = spark.createDataFrame(
        [(1, 10.0, "old"), (1, 20.0, None)], ["k", "rt", "payload"]
    )
    row = asof_join(
        ldf, rdf, by=["k"], left_on="t", right_on="rt",
        value_cols=["rt", "payload"],
    ).collect()[0]
    assert row.rt == 20.0 and row.payload is None


def test_range_join_bucketed_matches_naive(spark):
    rng = random.Random(11)
    left = [(rng.randrange(3), float(rng.randrange(0, 500)), i) for i in range(60)]
    right = [(rng.randrange(3), float(rng.randrange(0, 500)), 1000 + j) for j in range(90)]
    width = 40.0
    ldf = (
        spark.createDataFrame(left, ["k", "t", "lid"])
        .selectExpr("k", "t - 37 AS lo", "t AS hi", "lid")
    )
    rdf = spark.createDataFrame(right, ["k", "rt", "rid"])
    got = {
        (r.lid, r.rid)
        for r in range_join_bucketed(
            ldf, rdf, by=["k"], lo="lo", hi="hi", right_on="rt",
            bucket_width=int(width), lo_inclusive=True, hi_inclusive=False,
        ).collect()
    }
    want = {
        (lid, rid)
        for (lk, lt, lid) in left
        for (rk, rt, rid) in right
        if lk == rk and lt - 37 <= rt < lt
    }
    assert got == want


def test_asof_join_empty_sides(spark):
    ldf = spark.createDataFrame([(1, 5.0, 0)], ["k", "t", "lid"])
    rdf = spark.createDataFrame([], "k long, rt double, rid long")
    # empty right: left rows survive with null matches
    out = asof_join(ldf, rdf, by=["k"], left_on="t", right_on="rt",
                    value_cols=["rt", "rid"]).collect()
    assert len(out) == 1 and out[0].rt is None and out[0].rid is None
    # empty left: empty result, schema intact
    out2 = asof_join(rdf.selectExpr("k", "rt as t", "rid as lid"), ldf.selectExpr("k", "t as rt", "lid as rid"),
                     by=["k"], left_on="t", right_on="rt",
                     value_cols=["rt", "rid"])
    assert out2.count() == 0
    assert set(out2.columns) == {"k", "t", "lid", "rt", "rid"}


def test_range_join_bucketed_empty_right(spark):
    ldf = spark.createDataFrame([(1, 0.0, 10.0, 7)], ["k", "lo", "hi", "lid"])
    rdf = spark.createDataFrame([], "k long, rt double, rid long")
    assert range_join_bucketed(
        ldf, rdf, by=["k"], lo="lo", hi="hi", right_on="rt", bucket_width=5
    ).count() == 0
