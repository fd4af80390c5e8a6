"""Unit contracts for the 2-pass distributed rank/cumsum helpers
(operators/grank.py): each must be BIT-IDENTICAL to the single-task
global window it replaces, including the degenerate inputs the
oracle-checked queries never hit (all-equal keys -> one bin; negative
keys; empty groups)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_lever_spark.operators.grank import (
    ntile_from_rank,
    with_global_rank,
    with_grouped_cumsum,
    with_grouped_prefix_max,
)


def _frame(spark, n=500, groups=3):
    # deterministic, collision-heavy keys: many ties, negative values
    return spark.range(n).select(
        (F.col("id") % groups).cast("string").alias("g"),
        ((F.col("id") * 37) % 101 - 50).cast("long").alias("k"),
        F.col("id").alias("tid"),
        ((F.col("id") * 13) % 29 - 7).cast("long").alias("val"),
    )


def test_global_rank_matches_window(spark):
    df = _frame(spark)
    got = with_global_rank(df, F.col("k"), ["tid"], value="val")
    w = Window.orderBy("k", "tid")
    ref = df.select(
        "tid",
        F.row_number().over(w).cast("long").alias("rk"),
        F.sum("val")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    joined = got.select("tid", "_rk", "_cum", "_n_tot", "_s_tot").join(
        ref, "tid"
    )
    bad = joined.filter(
        (F.col("_rk") != F.col("rk")) | (F.col("_cum") != F.col("cum"))
    )
    assert bad.count() == 0
    row = joined.limit(1).collect()[0]
    assert row["_n_tot"] == 500
    assert row["_s_tot"] == df.agg(F.sum("val")).collect()[0][0]


def test_global_rank_degenerate_single_bin(spark):
    # all keys equal -> every row lands in one bin; ranks still exact
    df = spark.range(100).select(
        F.lit(5).cast("long").alias("k"), F.col("id").alias("tid")
    )
    got = with_global_rank(df, F.col("k"), ["tid"])
    rows = {r["tid"]: r["_rk"] for r in got.collect()}
    assert rows == {i: i + 1 for i in range(100)}


def test_ntile_matches_builtin(spark):
    df = _frame(spark, n=103)  # non-divisible n exercises remainders
    got = with_global_rank(df, F.col("k"), ["tid"]).select(
        "tid", ntile_from_rank(F.col("_rk"), F.col("_n_tot"), 7).alias("q")
    )
    w = Window.orderBy("k", "tid")
    ref = df.select("tid", F.ntile(7).over(w).cast("long").alias("q"))
    diff = (
        got.withColumnRenamed("q", "q1")
        .join(ref.withColumnRenamed("q", "q2"), "tid")
        .filter(F.col("q1") != F.col("q2"))
    )
    assert diff.count() == 0


def test_grouped_cumsum_matches_window(spark):
    df = _frame(spark)
    got = with_grouped_cumsum(df, ["g"], F.col("k"), ["k", "tid"], "val")
    w = (
        Window.partitionBy("g")
        .orderBy("k", "tid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ref = df.select("tid", F.sum("val").over(w).alias("cum"))
    diff = got.select("tid", "_cum").join(ref, "tid").filter(
        F.col("_cum") != F.col("cum")
    )
    assert diff.count() == 0


def test_grouped_cumsum_multi_value(spark):
    df = _frame(spark).withColumn("v2", F.col("val") * 2 + 1)
    got = with_grouped_cumsum(
        df, ["g"], F.col("k"), ["k", "tid"], ["val", "v2"]
    )
    w = (
        Window.partitionBy("g")
        .orderBy("k", "tid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ref = df.select(
        "tid",
        F.sum("val").over(w).alias("c1"),
        F.sum("v2").over(w).alias("c2"),
    )
    diff = (
        got.select("tid", "_cum_val", "_cum_v2")
        .join(ref, "tid")
        .filter(
            (F.col("_cum_val") != F.col("c1"))
            | (F.col("_cum_v2") != F.col("c2"))
        )
    )
    assert diff.count() == 0


def test_global_rank_exact_with_exchange_reuse_disabled(spark):
    """ADVICE r7 (medium): correctness must NOT depend on exchange
    reuse making both consumers of the binned lineage share one
    percentile_approx evaluation. With literal driver-collected bounds
    (grank.py::_bin_expr) the bins are provably identical in both
    branches even when spark.sql.exchangeReuseEnabled is off."""
    prev = spark.conf.get("spark.sql.exchangeReuseEnabled", "true")
    spark.conf.set("spark.sql.exchangeReuseEnabled", "false")
    try:
        df = _frame(spark)
        got = with_global_rank(df, F.col("k"), ["tid"], value="val")
        w = Window.orderBy("k", "tid")
        ref = df.select(
            "tid",
            F.row_number().over(w).cast("long").alias("rk"),
            F.sum("val")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum"),
        )
        joined = got.select("tid", "_rk", "_cum").join(ref, "tid")
        bad = joined.filter(
            (F.col("_rk") != F.col("rk")) | (F.col("_cum") != F.col("cum"))
        )
        assert bad.count() == 0
    finally:
        spark.conf.set("spark.sql.exchangeReuseEnabled", prev)


def test_grouped_prefix_max_matches_window(spark):
    df = _frame(spark)
    got = with_grouped_prefix_max(df, ["g"], F.col("k"), ["k", "tid"], "val")
    w = (
        Window.partitionBy("g")
        .orderBy("k", "tid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ref = df.select("tid", F.max("val").over(w).alias("pm"))
    joined = got.select("tid", "_pmax").join(ref, "tid")
    # null-safe comparison: first row of each group has no predecessor
    diff = joined.filter(~F.col("_pmax").eqNullSafe(F.col("pm")))
    assert diff.count() == 0


def test_percentile_cont_formula_matches_duckdb_builtin():
    """The bracket-rank interpolation percentile_cont_lineitem uses
    (lo = value at (n-1)p div 1 + 1, frac = the binary-rational
    remainder) must equal DuckDB's built-in quantile_cont at
    p in {.25, .5, .75} on odd/even/duplicate-heavy inputs — the same
    engine-identity proof style as the ntile closed form."""
    import duckdb

    con = duckdb.connect()
    cases = [
        list(range(1, 8)),                      # odd n
        list(range(1, 9)),                      # even n
        [5] * 9,                                # all-equal
        [1, 1, 2, 2, 3, 100],                   # duplicates + outlier
        [3],                                    # n = 1
        [10, 20],                               # n = 2
        [7, 1, 9, 4, 4, 4, 2, 8, 8, 6, 5, 0],   # unsorted, dups
    ]
    for vals in cases:
        rows = ", ".join(f"({v})" for v in vals)
        ours = con.execute(
            f"""
WITH v(c) AS (VALUES {rows}),
r AS (SELECT c, row_number() OVER (ORDER BY c) AS rk,
             count(*) OVER () AS n FROM v),
picked AS (
  SELECT max(n) AS n,
         max(CASE WHEN rk = (n-1)//4 + 1 THEN c END) AS lo25,
         max(CASE WHEN rk = (n-1)//4 + 2 THEN c END) AS hi25,
         max(CASE WHEN rk = (n-1)//2 + 1 THEN c END) AS lo50,
         max(CASE WHEN rk = (n-1)//2 + 2 THEN c END) AS hi50,
         max(CASE WHEN rk = (3*(n-1))//4 + 1 THEN c END) AS lo75,
         max(CASE WHEN rk = (3*(n-1))//4 + 2 THEN c END) AS hi75
  FROM r)
SELECT lo25 + (coalesce(hi25, lo25) - lo25)
           * (CAST((n-1) % 4 AS DOUBLE) / 4) AS p25,
       lo50 + (coalesce(hi50, lo50) - lo50)
           * (CAST((n-1) % 2 AS DOUBLE) / 2) AS p50,
       lo75 + (coalesce(hi75, lo75) - lo75)
           * (CAST((3*(n-1)) % 4 AS DOUBLE) / 4) AS p75
FROM picked
"""
        ).fetchone()
        theirs = con.execute(
            f"""
SELECT quantile_cont(c, 0.25), quantile_cont(c, 0.5),
       quantile_cont(c, 0.75)
FROM (VALUES {rows}) t(c)
"""
        ).fetchone()
        assert ours == tuple(theirs), (vals, ours, theirs)


def test_percentile_disc_rank_matches_duckdb_builtin():
    """percentile_disc_order_priority's integer target ranks
    (ceil(p*n) = (n + k-1) div k family) must equal DuckDB's built-in
    quantile_disc at p in {.25, .5, .75} on odd/even/duplicate-heavy
    inputs."""
    import duckdb

    con = duckdb.connect()
    cases = [
        list(range(1, 8)),
        list(range(1, 9)),
        [5] * 9,
        [1, 1, 2, 2, 3, 100],
        [3],
        [10, 20],
        [7, 1, 9, 4, 4, 4, 2, 8, 8, 6, 5, 0],
    ]
    for vals in cases:
        rows = ", ".join(f"({v})" for v in vals)
        ours = con.execute(
            f"""
WITH v(c) AS (VALUES {rows}),
r AS (SELECT c, row_number() OVER (ORDER BY c) AS rk,
             count(*) OVER () AS n FROM v)
SELECT max(CASE WHEN rk = (n + 3) // 4 THEN c END),
       max(CASE WHEN rk = (n + 1) // 2 THEN c END),
       max(CASE WHEN rk = (3 * n + 3) // 4 THEN c END)
FROM r
"""
        ).fetchone()
        theirs = con.execute(
            f"""
SELECT quantile_disc(c, 0.25), quantile_disc(c, 0.5),
       quantile_disc(c, 0.75)
FROM (VALUES {rows}) t(c)
"""
        ).fetchone()
        assert ours == tuple(theirs), (vals, ours, theirs)
