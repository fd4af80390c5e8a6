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


def test_compact_merge_equals_sequential_merges(spark):
    """The compaction theorem the module claims: applying N ordered
    batches one merge at a time == compacting to latest-op-per-key and
    applying ONE merge. Property-checked over randomized feeds
    (hypothesis), driven through the real Spark operators on small
    frames."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    ops = st.tuples(
        st.integers(min_value=1, max_value=4),     # seq / batch id
        st.integers(min_value=0, max_value=5),     # key
        st.sampled_from(["U", "D"]),
        st.text(alphabet="abc", min_size=0, max_size=2),
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(ops, min_size=0, max_size=12))
    def run(feed):
        base = spark.createDataFrame(
            [(0, "base0"), (2, "base2"), (4, "base4")], ["k", "v"]
        )
        # within one batch, keep at most one op per key (CDC feeds are
        # keyed per commit) — latest row in list order wins
        dedup = {}
        for seq, k, op, v in feed:
            dedup[(seq, k)] = (seq, k, op, v)
        feed = sorted(dedup.values())
        feed_df = spark.createDataFrame(
            feed, "seq int, k long, op string, v string"
        )
        # sequential: one merge per batch in seq order
        seq_state = base
        for s in sorted({f[0] for f in feed}):
            batch = feed_df.filter(F.col("seq") == s).drop("seq")
            seq_state = merge_apply(seq_state, batch, "k")
        sequential = {(r["k"], r["v"]) for r in seq_state.collect()}
        # compacted: one merge total
        compacted_state = merge_apply(base, compact_cdc(feed_df, "k"), "k")
        compacted = {(r["k"], r["v"]) for r in compacted_state.collect()}
        assert sequential == compacted, (feed, sequential, compacted)

    run()
