"""Deterministic golden-output streaming harness.

Re-creates the reference's test pattern (TestSuiteBase.scala:
TestInputStream feeds a queue of per-batch Seqs under a manual clock;
TestOutputStream collects per-batch output; verifyOutput compares to
golden expected batches) on Structured Streaming:

- each logical input batch is written as ONE file with a strictly
  increasing mtime;
- the file source reads with maxFilesPerTrigger=1, so micro-batch i
  consumes exactly input batch i (files are ordered by mtime);
- Trigger.AvailableNow drains all batches then stops — the manual-clock
  equivalent;
- a foreachBatch collector plays TestOutputStream.

This is how every §2.B/§2.C operator parity test drives its pipeline.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class BatchCollector:
    """foreachBatch sink collecting (batch_id, sorted row tuples).

    ``batch_transform`` runs *inside* foreachBatch on the micro-batch
    DataFrame — the exact semantics of the reference's per-batch
    ``transform``/``foreachRDD`` (DStream.scala:516-606): recomputed
    from scratch every batch, no cross-batch state."""

    def __init__(
        self, batch_transform: Callable[[DataFrame], DataFrame] | None = None
    ) -> None:
        self.batches: list[tuple[int, list[tuple]]] = []
        self._batch_transform = batch_transform

    def __call__(self, df: DataFrame, epoch_id: int) -> None:
        if self._batch_transform is not None:
            df = self._batch_transform(df)
        rows = sorted(tuple(r) for r in df.collect())
        self.batches.append((int(epoch_id), rows))

    @property
    def rows_per_batch(self) -> list[list[tuple]]:
        return [rows for _, rows in sorted(self.batches)]

    @property
    def all_rows(self) -> list[tuple]:
        return sorted(t for _, rows in self.batches for t in rows)


def write_input_batches(
    input_dir: str, batches: Sequence[Sequence[dict[str, Any]]]
) -> None:
    """One JSONL file per logical batch, mtimes strictly increasing so
    the file source's (mtime, path) ordering matches batch order."""
    base = time.time() - len(batches) * 10
    for i, batch in enumerate(batches):
        path = os.path.join(input_dir, f"batch_{i:05d}.json")
        with open(path, "w") as f:
            for rec in batch:
                f.write(json.dumps(rec) + "\n")
        os.utime(path, (base + i * 10, base + i * 10))


def run_file_batches(
    spark: SparkSession,
    batches: Sequence[Sequence[dict[str, Any]]],
    schema: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    output_mode: str = "append",
    batch_transform: Callable[[DataFrame], DataFrame] | None = None,
) -> BatchCollector:
    """Drive the pipeline over the batch sequence; returns the collector
    with per-batch golden-comparable output. ``transform`` builds the
    streaming plan (stateful, incremental); ``batch_transform`` runs
    per-batch inside foreachBatch (stateless, recomputed — reference
    transform/foreachRDD semantics)."""
    with tempfile.TemporaryDirectory() as workdir:
        input_dir = os.path.join(workdir, "in")
        ckpt_dir = os.path.join(workdir, "ckpt")
        os.makedirs(input_dir)
        write_input_batches(input_dir, batches)

        from spark_lever_spark.streaming.core import file_stream

        sdf = file_stream(
            spark, input_dir, schema, fmt="json", max_files_per_trigger=1
        )
        out = transform(sdf) if transform is not None else sdf
        collector = BatchCollector(batch_transform)
        query = (
            out.writeStream.foreachBatch(collector)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt_dir)
            .start()
        )
        query.awaitTermination()
        return collector
