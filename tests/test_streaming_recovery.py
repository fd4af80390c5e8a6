"""Fault tolerance: checkpoint recovery (reference CheckpointSuite /
DStreamCheckpointData — SURVEY.md §5.2) on Structured Streaming: a
stopped stateful query restarted on the same checkpoint resumes its
state and source offsets exactly; no input is lost or double-counted."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from spark_lever_spark.streaming.core import file_stream
from spark_lever_spark.streaming.harness import BatchCollector


def _write_batch(input_dir: str, i: int, records: list[dict]) -> None:
    path = os.path.join(input_dir, f"batch_{i:05d}.json")
    with open(path, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    ts = time.time() - 100 + i * 5
    os.utime(path, (ts, ts))


def _run_until_drained(spark, input_dir, ckpt, collector):
    sdf = file_stream(
        spark, input_dir, "k string, v long", max_files_per_trigger=1
    )
    out = sdf.groupBy("k").agg(F.sum("v").alias("s"))
    q = (
        out.writeStream.foreachBatch(collector)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()


def test_stateful_recovery_from_checkpoint(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    os.makedirs(input_dir)

    # phase 1: two batches, then the query stops (drained)
    _write_batch(input_dir, 0, [{"k": "a", "v": 1}, {"k": "b", "v": 2}])
    _write_batch(input_dir, 1, [{"k": "a", "v": 3}])
    col1 = BatchCollector()
    _run_until_drained(spark, input_dir, ckpt, col1)
    assert col1.rows_per_batch == [[("a", 1), ("b", 2)], [("a", 4)]]

    # phase 2: new input arrives while "down"; restart on the SAME
    # checkpoint — running sums continue from recovered state, and the
    # already-processed batches are NOT re-emitted
    _write_batch(input_dir, 2, [{"k": "a", "v": 10}, {"k": "c", "v": 7}])
    col2 = BatchCollector()
    _run_until_drained(spark, input_dir, ckpt, col2)
    assert col2.rows_per_batch == [[("a", 14), ("c", 7)]]


def test_recovery_is_exactly_once_per_file(spark, tmp_path):
    """Restarting with no new input produces no batches at all (source
    offsets are durable — the WAL guarantee of the reference's
    ReceivedBlockTracker, free in Structured Streaming)."""
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    os.makedirs(input_dir)
    _write_batch(input_dir, 0, [{"k": "x", "v": 5}])
    col1 = BatchCollector()
    _run_until_drained(spark, input_dir, ckpt, col1)
    assert col1.rows_per_batch == [[("x", 5)]]

    col2 = BatchCollector()
    _run_until_drained(spark, input_dir, ckpt, col2)
    assert col2.rows_per_batch == []


def test_sessionize_state_survives_restart_without_double_emit(spark, tmp_path):
    """Arbitrary keyed state (open sessions + armed timeouts) is part
    of the checkpoint: after a restart, a pre-restart session closed by
    a post-restart event is emitted exactly once, with its start
    timestamp recovered from before the restart."""
    from spark_lever_spark.streaming import sessionize_stream

    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    os.makedirs(input_dir)

    def run(collector):
        sdf = file_stream(
            spark, input_dir, "u long, ts timestamp", max_files_per_trigger=1
        )
        out = sessionize_stream(
            sdf.withWatermark("ts", "10 minutes"), "u", "ts",
            gap_ms=30 * 60 * 1000,
        )
        q = (
            out.writeStream.foreachBatch(collector)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    # phase 1: u1 opens a session; stream drains with it still open
    _write_batch(input_dir, 0, [{"u": 1, "ts": "2024-01-01T00:00:00"}])
    _write_batch(input_dir, 1, [{"u": 1, "ts": "2024-01-01T00:10:00"}])
    col1 = BatchCollector()
    run(col1)
    assert [r for b in col1.rows_per_batch for r in b] == []

    # phase 2: restart on the same checkpoint; a far-future u1 event
    # closes the RECOVERED session (start 00:00, 2 events) exactly once
    _write_batch(input_dir, 2, [{"u": 1, "ts": "2024-01-01T05:00:00"}])
    _write_batch(input_dir, 3, [{"u": 2, "ts": "2024-01-01T06:00:00"}])
    col2 = BatchCollector()
    run(col2)
    t0 = 1704067200000
    flat = sorted(r for b in col2.rows_per_batch for r in b)
    # u1's recovered session closed once; its 05:00 session closed by
    # timeout once wm reached 05:50; u2 still open
    assert flat == [
        (1, t0, t0 + 10 * 60_000, 2),
        (1, t0 + 300 * 60_000, t0 + 300 * 60_000, 1),
    ]
