"""Sequence packing (llm/packing.py): capacity/coverage invariants that
hold for ANY partitioning, since bin assignment itself is
partition-dependent."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_lever_spark.llm.packing import pack_documents


def test_packing_invariants(spark):
    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37, F.lit(900)) + 1).alias("n_tokens"),
    )
    packed = pack_documents(docs, "doc_id", "n_tokens", capacity=1000)
    rows = packed.collect()
    # every doc packed exactly once
    assert sorted(r.doc_id for r in rows) == list(range(300))
    # no bin over capacity; bin_fill is consistent with its members
    by_bin = {}
    for r in rows:
        by_bin.setdefault(r.bin_id, []).append(r)
    for b, members in by_bin.items():
        fill = sum(m.n_tokens for m in members)
        assert fill <= 1000, (b, fill)
        assert all(m.bin_fill == fill for m in members)


def test_packing_empty_partitions(spark):
    # regression: 3 rows spread over 8 partitions leaves >=5 empty
    # partitions — the streaming packer must not choke on them
    # (r01 ADVICE: pd.concat([]) crash)
    docs = (
        spark.createDataFrame([(1, 10), (2, 20), (3, 30)], ["doc_id", "n_tokens"])
        .repartition(8)
    )
    rows = pack_documents(docs, "doc_id", "n_tokens", 100).collect()
    assert {r.doc_id for r in rows} == {1, 2, 3}


def test_packing_max_partition_tokens_contract(spark):
    # skewed corpus: 50k tokens total, all initially in ONE partition.
    # with a 10k-token budget the packer must spread the load over >=5
    # hash partitions before packing, and every invariant still holds.
    docs = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), F.lit(100).alias("n_tokens")
    ).coalesce(1)
    packed = pack_documents(
        docs, "doc_id", "n_tokens", capacity=1000, max_partition_tokens=10_000
    )
    rows = packed.collect()
    assert sorted(r.doc_id for r in rows) == list(range(500))
    by_bin = {}
    for r in rows:
        by_bin.setdefault(r.bin_id, []).append(r)
    for b, members in by_bin.items():
        fill = sum(m.n_tokens for m in members)
        assert fill <= 1000, (b, fill)
        assert all(m.bin_fill == fill for m in members)
    # bin ids from >=5 distinct partitions (base = pid * 10_000_000)
    pids = {r.bin_id // 10_000_000 for r in rows}
    assert len(pids) >= 5, pids


def test_packing_oversized_doc_gets_own_bin(spark):
    docs = spark.createDataFrame(
        [(1, 5000), (2, 10), (3, 20)], ["doc_id", "n_tokens"]
    ).coalesce(1)
    rows = pack_documents(docs, "doc_id", "n_tokens", 100).collect()
    big = next(r for r in rows if r.doc_id == 1)
    others = [r for r in rows if r.doc_id != 1]
    assert all(r.bin_id != big.bin_id for r in others)
    assert {r.doc_id for r in rows} == {1, 2, 3}
