"""Approximate-sketch operators whose contract is an error bound, not
value equality: GK percentile rank error vs the exact quantile."""

from __future__ import annotations

from spark_lever_spark import registry
from spark_lever_spark.catalog import load_table


def test_approx_percentile_rank_error(spark, sf_correct):
    # the registered query now emits the rank-bound booleans directly
    # (driver-hashable invariant form) — they must all hold
    for row in (
        registry.all_queries()["approx_percentile_prices"]
        .fn(spark, sf_correct)
        .collect()
    ):
        assert row.p50_ok and row.p90_ok and row.p99_ok, row

    # independent deep check of the GK guarantee on the raw sketch values
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_correct, "orders")
    apx = {
        r.o_orderstatus: r.pct
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.percentile_approx(
                "o_totalprice", [0.5, 0.9, 0.99], 10000
            ).alias("pct")
        )
        .collect()
    }
    for status, pct in apx.items():
        vals = sorted(
            x.o_totalprice
            for x in orders.filter(orders.o_orderstatus == status)
            .select("o_totalprice")
            .collect()
        )
        n = len(vals)
        for q, v in zip((0.5, 0.9, 0.99), pct):
            # GK guarantee: returned value's rank within n/accuracy of
            # the target rank (accuracy=10000; allow +1 for ties)
            import bisect

            lo = bisect.bisect_left(vals, v)
            hi = bisect.bisect_right(vals, v)
            target = q * (n - 1)
            tol = n / 10000 + 1
            assert lo - tol <= target <= hi + tol, (status, q, v, lo, hi, target)


def test_random_split_invariants_hold(spark, sf_correct):
    from spark_lever_spark import registry

    row = (
        registry.all_queries()["random_split_sizes"]
        .fn(spark, sf_correct)
        .collect()[0]
    )
    assert row.disjoint_exhaustive and row.train_le_total and row.holdout_le_total
