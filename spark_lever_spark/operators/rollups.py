"""Multi-dimensional aggregation: CUBE / ROLLUP / GROUPING SETS.

Reference: logical Expand/GroupingSets/Cube/Rollup nodes
(catalyst/plans/logical/basicOperators.scala:174-243) executed by
execution/Expand.scala:35; surfaced only through the reference's HiveQL
dialect (HiveQl.scala:729-739). Here they are first-class DataFrame
ops (`df.cube`, `df.rollup`) and SQL `GROUPING SETS`.

Scale note: Expand multiplies input rows by the number of grouping
sets *before* the shuffle; partial aggregation keeps the shuffle
volume at O(groups x sets), which is why these stay cheap even on
100 TB fact tables with low-cardinality grouping columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_lever_spark.catalog import load_table
from spark_lever_spark.registry import register


@register(
    "cube_flag_status",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty,
       CAST(grouping(l_returnflag) AS INT) AS g_flag,
       CAST(grouping(l_linestatus) AS INT) AS g_status
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY g_flag, g_status, l_returnflag, l_linestatus
""",
    category="rollups",
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping() indicators (reference Expand.scala:35 +
    Cube logical node)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


@register(
    "rollup_region_nation",
    oracle="""
SELECT r_name, n_name, count(*) AS n_cust,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
""",
    category="rollups",
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over a dim hierarchy (region > nation) after broadcast joins."""
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        cust.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy(
            F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


@register(
    "grouping_sets_explicit",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
    category="rollups",
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (reference GroupingSets logical node,
    HiveQl.scala:729) via spark.sql on a registered view."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@register(
    "pivot_event_type_daily",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
       COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS view
FROM events
GROUP BY 1 ORDER BY 1
""",
    category="rollups",
)
def pivot_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (reference had only GROUP BY + CASE; pivot is the modern
    sugar for the same Expand-style plan). Pivot values are given
    EXPLICITLY — at scale, omitting them adds a blocking distinct scan
    just to discover the columns."""
    ev = load_table(spark, sf_dir, "events")
    piv = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .orderBy("day")
    )
    return piv.fillna(0)


@register(
    "rollup_hourly_to_daily_mergeable",
    oracle="""
SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day, event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents,
       min(value) AS min_value, max(value) AS max_value,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
         / count(*) AS avg_cents
FROM events
GROUP BY day, event_type
ORDER BY day, event_type
""",
    category="rollups",
)
def rollup_hourly_to_daily_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate (hypertable) rollup: daily stats derived
    ONLY from hourly partial aggregates, never re-reading raw events —
    the pattern that lets a 100 TB pipeline maintain hour partials
    incrementally and serve day/week/month by merging 24/168/720 tiny
    rows instead of rescanning. Every partial is mergeable: counts and
    integer-cents sums add, min/max fold; avg is re-derived at the end
    from the merged sums (never averaged-of-averages).

    The oracle computes the daily stats straight from raw events —
    equality IS the proof that the hourly layer loses nothing. Exact
    by construction: all merged quantities are 64-bit integers
    (functions/exact.py doctrine), so partial-aggregation order cannot
    perturb a single bit."""
    from spark_lever_spark.functions.exact import cents

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(cents(F.col("value"))).alias("value_cents"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    return (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", "hour"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .withColumn(
            "avg_cents",
            F.col("value_cents").cast("double") / F.col("n_events"),
        )
        .orderBy("day", "event_type")
    )
