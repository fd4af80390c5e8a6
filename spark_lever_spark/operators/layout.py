"""Z-order data layout: multi-dimensional clustering for file pruning.

At 100 TB a table sorted on one column prunes scans on that column
only; interleaving the bits of two (or more) dimension columns into a
single Z-value and range-partitioning + sorting on it gives every
interleaved dimension locality, so parquet min/max stats prune on ANY
of them (the technique behind Delta/Iceberg Z-ORDER clustering —
public Morton-order layout, not present in the reference, whose only
layout control was partitioner choice).

The Z-value is pure integer bit arithmetic, generated once as a SQL
expression string and used verbatim by both the Spark plan and the
DuckDB oracle — zero cross-dialect drift by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_lever_spark.catalog import load_table
from spark_lever_spark.registry import register


def zorder_expr(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """SQL expression interleaving the low ``bits`` of two integer
    expressions (Morton order). Operands are masked and cast to BIGINT
    so shifts up to 2*bits-1 never overflow 32-bit ints."""
    mask = (1 << bits) - 1
    x = f"(CAST({x_expr} AS BIGINT) & {mask})"
    y = f"(CAST({y_expr} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    x_expr: str,
    y_expr: str,
    path: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Cluster ``df`` by the Z-value of (x, y) and write ``n_files``
    parquet files: range-partition on z (each file owns a contiguous
    Z-range = a block of the space-filling curve) and sort within
    partitions so row-group min/max stats are tight on BOTH dims."""
    z = F.expr(zorder_expr(x_expr, y_expr, bits)).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


_Z_EVENTS = zorder_expr("user_id", "dayofyear(ts)", bits=16)


@register(
    "layout_zorder_events",
    oracle=f"""
SELECT event_id, {_Z_EVENTS} AS zval
FROM events
ORDER BY event_id
""",
    category="layout",
)
def layout_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton Z-value per event over (user_id, day-of-year) — the
    clustering key zorder_write lays files out by. Identical expression
    text runs on both engines (dayofyear exists in Spark SQL and DuckDB
    with identical semantics under the pinned UTC session)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.expr(_Z_EVENTS).alias("zval")
    ).orderBy("event_id")
