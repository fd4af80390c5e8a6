"""SparkSession construction with scale-oriented defaults.

The reference engine's runtime knobs (SQLConf.scala:26-47 in the
reference tree) map to modern Spark configs; we set the modern
equivalents plus the adaptive-execution family that subsumes much of
the reference's hand-rolled rebalancing (SURVEY.md §4.3).

Defaults are chosen for the 100 TB design point and scale *down*
gracefully to local[k] test runs:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting:
  the built-in half of what the reference's Lever runtime did by
  migrating receiver blocks).
- Arrow on (every Python-side operator in this engine that cannot be
  expressed in built-in functions uses pandas UDFs, never row-at-a-time
  Python UDFs).
- shuffle partitions default to a small multiple of local cores for
  tests; on a real cluster you'd set ``spark_lever.shuffle.partitions``
  to ~2-3x total executor cores and let AQE coalesce.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # Adaptivity: subsumes reference Exchange sizing + part of Lever.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas-UDF boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Broadcast threshold: reference default was 10MB
    # (SQLConf.scala:29); modern default 10MB too — raise a bit since
    # dim tables (region/nation/supplier/part) are tiny relative to
    # fact tables at every scale we target.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Timestamps: parquet test data is timezone-naive; pin session TZ
    # so results agree with the DuckDB oracle byte-for-byte.
    "spark.sql.session.timeZone": "UTC",
    # Don't let tiny test files produce one giant partition each.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # The synthetic `events` table stores TIMESTAMP(NANOS) which the
    # vectorized reader rejects; read as long and convert in the
    # catalog (catalog.load_table) — DuckDB truncates nanos->micros the
    # same way.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_session(
    app_name: str = "spark_lever_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*])
    when no cluster master is configured — on a real deployment the
    master comes from spark-submit and this argument is ignored.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # Local test default: match core count so no partition sits idle
        # and AQE has room to coalesce. Cluster deployments override.
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if master.startswith("local"):
        # local mode: the driver JVM IS the executor; Spark's 1g default
        # heap OOMs on wide-shuffle workloads long before the machine
        # does. Only effective at JVM launch — a pre-existing session
        # keeps its heap. Cluster deployments size executors explicitly.
        conf.setdefault("spark.driver.memory", "8g")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return spark


def stop_session() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
