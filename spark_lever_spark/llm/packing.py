"""Training-sequence preparation: sliding-window chunking and greedy
sequence packing — the two ops that turn a cleaned document corpus into
fixed-capacity training rows (SURVEY.md §7 P5 extension; no reference
equivalent).

Scale shapes:
- chunking is pure per-row expression work (split -> index sequence ->
  slice), no shuffle at all, fully inside whole-stage codegen;
- packing is partition-local greedy first-fit via ``mapInPandas`` — no
  shuffle either, bin ids are made globally unique by offsetting with
  the partition id. Packing quality is per-partition (a global optimum
  would need a sort + sequential pass, inherently serial); first-fit
  over docs <= capacity guarantees >50 % utilization of every bin but
  the last per partition, which is the accepted trade at corpus scale.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_lever_spark.catalog import load_table
from spark_lever_spark.registry import register


@register(
    "text_chunk_sliding",
    oracle="""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
chunks AS (
  SELECT t.doc_id,
         CAST(s.s AS BIGINT) // 48 AS chunk_idx,
         list_slice(t.l, CAST(s.s AS INT) + 1, CAST(s.s AS INT) + 64) AS c
  FROM tok t,
       LATERAL (SELECT unnest(range(0, len(t.l), 48)) AS s) s
)
SELECT doc_id, chunk_idx,
       CAST(len(c) AS BIGINT) AS n_chunk_tokens,
       array_to_string(c, ' ') AS chunk_text
FROM chunks
ORDER BY doc_id, chunk_idx
""",
    category="llm_text",
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: 64-token windows at stride 48 (16-token
    overlap) — the pre-tokenization split for long documents. Start
    offsets come from ``sequence(0, n-1, stride)`` so the tail is
    always covered by a (possibly short) final chunk; everything is
    array expressions on the already-split tokens, zero shuffles before
    the presentation sort."""
    chunk, stride = 64, 48
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("l")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("l") - 1, F.lit(0)), F.lit(stride)
    )
    return (
        tok.select("doc_id", F.explode(starts).alias("s"), "l")
        .select(
            "doc_id",
            (F.col("s") / stride).cast("long").alias("chunk_idx"),
            F.slice("l", F.col("s") + 1, chunk).alias("c"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("c").cast("long").alias("n_chunk_tokens"),
            F.concat_ws(" ", "c").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


def pack_documents(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    capacity: int,
) -> DataFrame:
    """Greedy first-fit sequence packing: assign each document to a
    bin so no bin exceeds ``capacity`` tokens (documents larger than
    the capacity get a dedicated bin — truncation is the tokenizer's
    job, not the packer's). Partition-local and shuffle-free; bins are
    globally unique via (partition_id, local_bin). Deterministic for a
    deterministic input partitioning: docs are processed in ascending
    id order within each partition."""

    out_schema = f"{id_col} long, {n_tokens_col} long, bin_id long, bin_fill long"

    def pack(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = pid * 10_000_000
        bins: list[int] = []  # current fill per local bin
        rows: list[tuple] = []
        pdf_all = pd.concat(list(batches), ignore_index=True) if batches else None
        if pdf_all is None or pdf_all.empty:
            return
        for r in pdf_all.sort_values(id_col).itertuples(index=False):
            need = int(getattr(r, n_tokens_col))
            target = None
            for i, fill in enumerate(bins):
                if fill + need <= capacity:
                    target = i
                    break
            if target is None:
                bins.append(0)
                target = len(bins) - 1
            bins[target] += need
            rows.append((int(getattr(r, id_col)), need, base + target))
        fills = {base + i: f for i, f in enumerate(bins)}
        yield pd.DataFrame(
            [
                {
                    id_col: d,
                    n_tokens_col: n,
                    "bin_id": b,
                    "bin_fill": fills[b],
                }
                for d, n, b in rows
            ]
        )

    return df.select(id_col, n_tokens_col).mapInPandas(pack, out_schema)


@register(
    "pack_documents_2048",
    oracle=None,  # bin assignment depends on partitioning; the packing
    # INVARIANTS are pinned in tests/test_packing.py
    category="llm_text",
)
def pack_documents_2048(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into 2048-token bins by whitespace token count;
    emits per-doc bin assignment plus the bin's final fill so the
    capacity invariant is visible in the output."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return pack_documents(docs, "doc_id", "n_tokens", capacity=2048).orderBy(
        "doc_id"
    )
