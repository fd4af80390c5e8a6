"""Set operators (reference §2.E set ops / §2.F Union/Intersect/Except).

Reference physical ops: Union (execution/basicOperators.scala:77),
Except (:238), Intersect (:252); RDD union/intersection/subtract
(rdd/RDD.scala:474,:506,:857). Modern Spark adds the *ALL variants
(unionByName, intersectAll, exceptAll) — exposed as superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_lever_spark.catalog import load_table
from spark_lever_spark.registry import register


def _poles(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two overlapping custkey sets: high-balance customers vs customers
    with at least one urgent order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = cust.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    return rich, urgent


_POLES_SQL = """
WITH rich AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000),
     urgent AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                WHERE o_orderpriority = '1-URGENT')
"""


@register(
    "set_union_all",
    oracle=_POLES_SQL
    + """
SELECT custkey, count(*) AS cnt FROM (
  SELECT custkey FROM rich UNION ALL SELECT custkey FROM urgent
) GROUP BY custkey ORDER BY custkey
""",
    category="setops",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (reference basicOperators.scala:77 — bag semantics,
    no shuffle: partitions concatenate)."""
    rich, urgent = _poles(spark, sf_dir)
    return (
        rich.unionAll(urgent)
        .groupBy("custkey")
        .agg(F.count("*").alias("cnt"))
        .orderBy("custkey")
    )


@register(
    "set_union_distinct",
    oracle=_POLES_SQL
    + """
SELECT custkey FROM rich UNION SELECT custkey FROM urgent ORDER BY custkey
""",
    category="setops",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT (reference SqlParser UNION [DISTINCT]) = union + dedup."""
    rich, urgent = _poles(spark, sf_dir)
    return rich.union(urgent).distinct().orderBy("custkey")


@register(
    "set_intersect",
    oracle=_POLES_SQL
    + """
SELECT custkey FROM rich INTERSECT SELECT custkey FROM urgent ORDER BY custkey
""",
    category="setops",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (reference basicOperators.scala:252)."""
    rich, urgent = _poles(spark, sf_dir)
    return rich.intersect(urgent).orderBy("custkey")


@register(
    "set_except",
    oracle=_POLES_SQL
    + """
SELECT custkey FROM rich EXCEPT SELECT custkey FROM urgent ORDER BY custkey
""",
    category="setops",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / subtract (reference basicOperators.scala:238,
    rdd/RDD.scala:857)."""
    rich, urgent = _poles(spark, sf_dir)
    return rich.exceptAll(urgent).distinct().orderBy("custkey")


@register(
    "zip_with_index",
    oracle="""
SELECT n_name, CAST(row_number() OVER (ORDER BY n_nationkey) - 1 AS BIGINT) AS idx
FROM nation ORDER BY idx
""",
    category="setops",
)
def zip_with_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zipWithIndex (reference rdd/RDD.scala:1133) in its deterministic
    order-defined form — a window row_number over a total order.
    (`monotonically_increasing_id` is the partition-local analog and is
    exercised in tests, where only uniqueness is asserted.)"""
    from pyspark.sql import Window

    nation = load_table(spark, sf_dir, "nation")
    w = Window.orderBy("n_nationkey")
    return (
        nation.select(
            "n_name", (F.row_number().over(w) - 1).cast("long").alias("idx")
        ).orderBy("idx")
    )
