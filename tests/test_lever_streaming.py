"""Lever <-> Structured Streaming integration: real
StreamingQueryProgress events flow through the metrics adapter into the
controller (the L12 feedback loop of the reference, JobScheduler.scala:
184-206, re-created on the public listener API)."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

from spark_lever_spark.lever import DynamicBatchSizer
from spark_lever_spark.lever.metrics import progress_to_report
from spark_lever_spark.streaming import run_file_batches


class _ProgressTap(StreamingQueryListener):
    def __init__(self) -> None:
        self.progresses: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        self.progresses.append(json.loads(event.progress.json))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def test_progress_feeds_controller(spark):
    tap = _ProgressTap()
    spark.streams.addListener(tap)
    try:
        batches = [
            [{"k": "a", "v": i}, {"k": "b", "v": i * 2}] for i in range(3)
        ]
        col = run_file_batches(
            spark,
            batches,
            "k string, v long",
            transform=lambda df: df.groupBy("k").agg(F.sum("v").alias("s")),
            output_mode="update",
        )
        assert len(col.batches) == 3
        # listener delivery is async; wait briefly for all events
        deadline = time.time() + 10
        while len(tap.progresses) < 3 and time.time() < deadline:
            time.sleep(0.2)
        assert len(tap.progresses) >= 3
    finally:
        spark.streams.removeListener(tap)

    reports = [progress_to_report(p) for p in tap.progresses]
    # batch ids are the micro-batch sequence; durations are real
    assert [r.batch_id for r in reports[:3]] == [0, 1, 2]
    assert all(r.processing_delay_ms > 0 for r in reports[:3])
    assert all(r.samples["local"].handled_bytes > 0 for r in reports[:3])

    # the measured batch durations drive the SoCC'14 sizer exactly as
    # the reference's JobSetFinished loop drove RecurringTimer
    sizer = DynamicBatchSizer(initial_ms=1000.0, warmup=1)
    last = 1000.0
    for r in reports:
        last = sizer.on_batch(r.processing_delay_ms)
    assert last >= sizer.min_ms
