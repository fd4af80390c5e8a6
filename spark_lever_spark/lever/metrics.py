"""Metrics plane: adapt Spark telemetry into ``BatchReport``s.

The reference's metrics plane was three actor systems (executor ->
WorkerMonitor -> JobMonitor; SURVEY.md §2.A L1-L3, L12). Modern Spark
surfaces the same signals in-driver:

- ``StreamingQueryProgress`` (per micro-batch): batch duration,
  per-source input rate -> ``progress_to_report`` below.
- ``SparkListener.onTaskEnd`` task metrics grouped by ``taskInfo.host``
  (per-host runtime + bytesRead). Attaching a Java listener from Python
  requires the py4j callback server; to stay robust in embedded/headless
  runs we instead expose ``TraceCollector.record_task`` with the exact
  fields a listener would forward — a thin bridge can feed it from
  py4j, tests feed it synthetic traces, and local[k] runs have a single
  host anyway.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any

from spark_lever_spark.lever.model import BatchReport, HostSample


class TraceCollector:
    """Accumulates per-task observations and rolls them up into one
    ``BatchReport`` per batch (reference WorkerMonitor.scala:147-210
    aggregation, minus the actors)."""

    def __init__(self) -> None:
        self._runtime: dict[str, float] = defaultdict(float)
        self._bytes: dict[str, float] = defaultdict(float)
        self._rates: dict[str, float] = {}

    def record_task(self, host: str, runtime_ms: float, bytes_read: float) -> None:
        # per-host runtime is the max over its tasks (tasks run in
        # parallel on a host; the host is done when its last task is)
        self._runtime[host] = max(self._runtime[host], runtime_ms)
        self._bytes[host] += bytes_read

    def record_input_rate(self, host: str, bytes_per_sec: float) -> None:
        self._rates[host] = bytes_per_sec

    def flush(
        self, batch_id: int, total_delay_ms: float, processing_delay_ms: float
    ) -> BatchReport:
        samples = {
            h: HostSample(
                host=h,
                runtime_ms=self._runtime.get(h, 0.0),
                handled_bytes=self._bytes.get(h, 0.0),
                input_rate=self._rates.get(h, 0.0),
            )
            for h in set(self._runtime) | set(self._bytes) | set(self._rates)
        }
        self._runtime.clear()
        self._bytes.clear()
        self._rates.clear()
        return BatchReport(
            batch_id=batch_id,
            total_delay_ms=total_delay_ms,
            processing_delay_ms=processing_delay_ms,
            samples=samples,
        )


def progress_to_report(progress: dict[str, Any]) -> BatchReport:
    """Convert a ``StreamingQueryProgress`` JSON dict (as handed to
    ``StreamingQueryListener.onQueryProgress`` / ``query.lastProgress``)
    into a single-host ``BatchReport`` — the local-mode view, where the
    interesting signal is batch duration vs trigger interval (drives
    ``DynamicBatchSizer`` and admission control)."""
    duration = progress.get("durationMs", {}) or {}
    total = float(duration.get("triggerExecution", 0.0))
    rate = 0.0
    for src in progress.get("sources", []) or []:
        rate += float(src.get("inputRowsPerSecond") or 0.0)
    batch_id = int(progress.get("batchId", 0))
    sample = HostSample(
        host="local",
        runtime_ms=total,
        handled_bytes=float(progress.get("numInputRows", 0) or 0),
        input_rate=rate,
    )
    return BatchReport(
        batch_id=batch_id,
        total_delay_ms=total,
        processing_delay_ms=total,
        samples={"local": sample},
    )
