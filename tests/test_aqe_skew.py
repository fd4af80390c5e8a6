"""AQE runtime adaptivity: the built-in half of what the reference's
Lever runtime did by migrating receiver blocks (SURVEY.md §4.3) —
verify skew-join splitting and partition coalescing actually engage on
a skewed workload when thresholds are scaled to test data size."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_confs(spark):
    keys = [
        ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"),
        ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"),
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB"),
    ]
    prev = {k: spark.conf.get(k) for k, _ in keys}
    for k, v in keys:
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_confs):
    # 95% of left rows share one key -> one reducer partition dwarfs the
    # rest; AQE must split it into parallel sub-tasks. Three traps this
    # test dodges: (1) the right side uses UNIQUE keys, else the skewed
    # key explodes the join output combinatorially; (2) the incompressible
    # `pad` column must survive column pruning into the shuffle, else the
    # skewed partition is a run of identical 7s that LZ4 squeezes under
    # the threshold; (3) the post-join agg must be GLOBAL — a groupBy on
    # the join key would reuse the join's hash partitioning, and AQE
    # refuses to split a skewed partition when that adds a shuffle
    # (absent forceOptimizeSkewedJoin).
    left = spark.range(0, 200_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("payload_"), F.col("id")).alias("pad"),
    )
    right = spark.range(0, 50_000).select(
        F.col("id").alias("k"),
        F.col("id").alias("rv"),
    )
    joined = left.join(right, "k").agg(
        F.count("*").alias("n"), F.max("pad").alias("mp")
    )
    joined.collect()  # AQE decisions appear in the final plan
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]


def test_aqe_coalesces_small_partitions(spark):
    # 32 configured shuffle partitions over a tiny agg -> AQE merges
    # them instead of running 32 near-empty reducers
    df = spark.range(0, 1000).groupBy((F.col("id") % 5).alias("g")).count()
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan
