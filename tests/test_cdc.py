"""Unit pins for MERGE/CDC semantics on literal inputs — the edge
cases the oracle's aggregate summary could mask: delete removes,
upsert inserts AND updates, compaction makes U->D->U resurrect."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_lever_spark.operators.cdc import compact_cdc, merge_apply


def _base(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )


def test_merge_update_delete_insert(spark):
    batch = spark.createDataFrame(
        [(2, "U", "b2"), (3, "D", None), (4, "U", "d")],
        ["k", "op", "v"],
    )
    got = {
        r["k"]: r["v"]
        for r in merge_apply(_base(spark), batch, "k").collect()
    }
    assert got == {1: "a", 2: "b2", 4: "d"}


def test_merge_noop_batch_passthrough(spark):
    batch = spark.createDataFrame([], "k long, op string, v string")
    got = {
        r["k"]: r["v"]
        for r in merge_apply(_base(spark), batch, "k").collect()
    }
    assert got == {1: "a", 2: "b", 3: "c"}


def test_compact_last_writer_wins_and_resurrect(spark):
    feed = spark.createDataFrame(
        [
            (1, 1, "U", "x1"),
            (2, 1, "D", None),
            (3, 1, "U", "x3"),  # U -> D -> U: key survives with x3
            (1, 2, "U", "y1"),
            (2, 2, "D", None),  # U -> D: key 2 deleted
        ],
        ["seq", "k", "op", "v"],
    )
    latest = compact_cdc(feed, "k")
    assert {(r["k"], r["op"], r["v"]) for r in latest.collect()} == {
        (1, "U", "x3"),
        (2, "D", None),
    }
    merged = merge_apply(_base(spark), latest, "k")
    got = {r["k"]: r["v"] for r in merged.collect()}
    assert got == {1: "x3", 3: "c"}


def test_merge_single_shuffle(spark):
    base = _base(spark)
    batch = spark.createDataFrame([(2, "U", "b2")], ["k", "op", "v"])
    plan = merge_apply(base, batch, "k")._jdf.queryExecution().executedPlan().toString()
    # merge itself must not add exchanges beyond the join's own (AQE may
    # broadcast the tiny side: then zero shuffle-exchanges on the probe)
    assert plan.count("Exchange") <= 2
