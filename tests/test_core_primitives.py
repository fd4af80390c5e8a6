"""SparkContext-level primitives of the reference (§2.E core): broadcast
variables, accumulators, and observable metrics — their modern
DataFrame-era forms."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def test_broadcast_variable_in_pandas_udf(spark):
    # reference sc.broadcast: ship a read-only lookup once per executor
    lookup = spark.sparkContext.broadcast({0: "even", 1: "odd"})

    @F.pandas_udf("string")
    def parity(v: pd.Series) -> pd.Series:
        m = lookup.value
        return (v % 2).map(m)

    got = dict(
        spark.range(0, 4).select("id", parity("id").alias("p")).collect()
    )
    assert got == {0: "even", 1: "odd", 2: "even", 3: "odd"}


def test_accumulator_counts_rows_in_map_in_pandas(spark):
    # reference sc.accumulator: side-channel counters from executors
    acc = spark.sparkContext.accumulator(0)

    def count_rows(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    df = spark.range(0, 100, 1, 4)
    assert df.mapInPandas(count_rows, df.schema).count() == 100
    assert acc.value == 100


def test_observation_metrics_piggyback_on_action(spark):
    # modern observable metrics: aggregates computed DURING the action,
    # no second scan — the DataFrame-era accumulator
    from pyspark.sql import Observation

    obs = Observation("stats")
    df = spark.range(0, 50).observe(
        obs, F.count(F.lit(1)).alias("n"), F.sum("id").alias("s")
    )
    assert df.count() == 50
    assert obs.get == {"n": 50, "s": 1225}
