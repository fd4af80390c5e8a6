"""Lever-equivalent adaptive load balancer (SURVEY.md §2.A, §7 P4).

The reference fork's novel contribution is a feedback control loop that
re-places *input* data across heterogeneous nodes between micro-batches
(JobMonitor.scala / WorkerMonitor.scala / TaskSetManager.scala in the
reference tree). Structured Streaming owns source->partition placement,
so this re-creation actuates at the shuffle boundary instead: the same
controller (metrics -> capability -> straggler sets -> reassignment
plan) drives a *weighted repartition* injected ahead of heavy stages,
plus rate-based admission control and speculation/exclusion knobs.

Modules:
- model:        config + metric dataclasses (flags mirror the reference)
- classifier:   quartile straggler classification + rate-drift
                confirmation (TaskSetManager.scala:787-819,
                JobMonitor.scala:204-297)
- capability:   per-host capability estimation (JobMonitor.scala:303-332)
- strategies:   proportion / greedy / two-choice / power-of-two plans +
                escalation selector (JobMonitor.scala:353-547)
- balancer:     the per-batch control loop tying the above together
- actuator:     weighted repartition / admission control / dynamic batch
                sizing (RecurringTimer.scala:64-86) on the Spark side
- metrics:      StreamingQueryProgress -> BatchReport adapters
"""

from spark_lever_spark.lever.model import (
    BatchReport,
    HostSample,
    LeverConfig,
    Plan,
)
from spark_lever_spark.lever.balancer import LeverBalancer
from spark_lever_spark.lever.actuator import (
    DynamicBatchSizer,
    admission_limits,
    partition_counts,
    weighted_repartition,
)

__all__ = [
    "BatchReport",
    "DynamicBatchSizer",
    "HostSample",
    "LeverBalancer",
    "LeverConfig",
    "Plan",
    "admission_limits",
    "partition_counts",
    "weighted_repartition",
]
