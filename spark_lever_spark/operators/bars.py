"""Time-series bar aggregation (OHLC) over the events stream.

The classic downsampling operator finance/monitoring pipelines run over
tick streams: per (series, time bucket), the first/last/extreme values
and volume. The reference's DStream surface could express only the
associative pieces (min/max/sum via reduceByKeyAndWindow) — open/close
need ORDER-aware aggregation, which this engine gets from ranked
windows partitioned by the (series, bucket) key: high-cardinality
partitions, no global sort, scale-linear.

Exactness: prices ride as exact integer cents; open/close are
first_value/last_value under the unique (ts, event_id) order, identical
in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_lever_spark.catalog import load_table
from spark_lever_spark.registry import register


@register(
    "ohlc_hourly_bars",
    bench=True,
    oracle="""
WITH e AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
         ts, event_id, CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
w AS (
  SELECT event_type, h, c,
         first_value(c) OVER (PARTITION BY event_type, h
                              ORDER BY ts, event_id) AS o,
         last_value(c) OVER (PARTITION BY event_type, h
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND UNBOUNDED FOLLOWING) AS cl
  FROM e
)
SELECT event_type, h AS window_start,
       CAST(max(o) AS BIGINT) AS open_c,
       CAST(max(c) AS BIGINT) AS high_c,
       CAST(min(c) AS BIGINT) AS low_c,
       CAST(max(cl) AS BIGINT) AS close_c,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(c) AS BIGINT) AS volume_c
FROM w GROUP BY event_type, h
ORDER BY event_type, h
""",
    category="temporal",
    tags=("defer-window",),
)
def ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event_type: open/close = first/last value
    (exact cents, unique (ts, event_id) order), high/low = extremes,
    plus count and volume. One shuffle on the (series, hour) key; the
    ordered window runs inside each bucket — at 100 TB the bucket
    count scales with series x time, never a global sort."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("h"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    w = Window.partitionBy("event_type", "h").orderBy("ts", "event_id")
    ranked = ev.select(
        "event_type",
        "h",
        "c",
        F.first("c").over(w).alias("o"),
        F.last("c")
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("cl"),
    )
    return (
        ranked.groupBy("event_type", F.col("h").alias("window_start"))
        .agg(
            F.max("o").alias("open_c"),
            F.max("c").alias("high_c"),
            F.min("c").alias("low_c"),
            F.max("cl").alias("close_c"),
            F.count("*").alias("n_events"),
            F.sum("c").alias("volume_c"),
        )
        .orderBy("event_type", "window_start")
    )
