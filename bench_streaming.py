"""Streaming + balancer micro-bench (SURVEY.md §7 P6's second half).

Complements bench.py (the driver's batch headline suite) with the two
P6 scenarios that don't belong in the frozen batch suite total:

1. streaming micro-bench: drained incremental aggregations at
   $SPARK_GRAFT_SF_DIR — wall-clock and source-rows/sec for a keyed
   agg (reduceByKey parity) and an event-time tumbling window.
2. skew scenario: a zipf-skewed aggregation measured naive vs salted
   (the engine's skew answer), plus the lever weighted-repartition
   actuator's placement accuracy under a 4:2:1 capability plan —
   max partition-share deviation from the plan target.

Prints ONE JSON line:
    {"metric": "bench_streaming", "value": <total sec>, "unit": "sec",
     "scenarios": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from spark_lever_spark import registry
    from spark_lever_spark.session import get_session

    spark = get_session(
        app_name="spark_lever_spark-bench-streaming",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm: parquet footers + one trivial drain-shaped agg
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n_events = ev.count()
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n_orders = orders.count()
    n_docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).count()

    qs = registry.all_queries()
    scenarios: dict[str, dict] = {}

    # 1) streaming micro-bench: drained incremental aggs
    for name, rows in (
        ("stream_agg_orders_status", n_orders),
        ("stream_windowed_events_hourly", n_events),
        ("stream_session_window_events", n_events),
        ("stream_foreachbatch_upsert_users", n_events),
        ("stream_minhash_near_dup", n_docs),  # round 17: incremental
        # band-index near-dup — per-batch work vs a persistent index
    ):
        t0 = time.perf_counter()
        qs[name].fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        scenarios[name] = {
            "sec": round(dt, 3),
            "source_rows_per_sec": round(rows / dt),
        }

    # 1b) trigger-overhead decomposition: identical rows and identical
    # final state, batch count swept 1 -> 8 -> 32 by pre-splitting the
    # source into N files (maxFilesPerTrigger=1 => ~N micro-batches).
    # The slope is the per-batch scheduling constant the L13 adaptive
    # batch sizer needs (its fixed-point model assumes t(batch) =
    # c0 + rate*rows; this measures c0 directly), and the intercept is
    # the data-volume cost. Recorded in BASELINE.md.
    import shutil
    import tempfile

    from spark_lever_spark.streaming.queries import _drain_complete

    split_times: dict[int, float] = {}
    for nfiles in (1, 8, 32):
        d = tempfile.mkdtemp(prefix=f"trigsplit_{nfiles}_")
        try:
            orders.repartition(nfiles).write.mode("overwrite").parquet(d)
            sdf = (
                spark.readStream.schema(orders.schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(d)
            )
            agg = sdf.groupBy("o_orderstatus").agg(
                F.count("*").alias("cnt"), F.sum("o_totalprice").alias("total")
            )
            t0 = time.perf_counter()
            _drain_complete(agg, f"trig_overhead_{nfiles}").collect()
            split_times[nfiles] = time.perf_counter() - t0
        finally:
            shutil.rmtree(d, ignore_errors=True)
    per_batch = (split_times[32] - split_times[1]) / 31
    scenarios["trigger_overhead"] = {
        "sec": round(sum(split_times.values()), 3),
        "batches_1_sec": round(split_times[1], 3),
        "batches_8_sec": round(split_times[8], 3),
        "batches_32_sec": round(split_times[32], 3),
        "per_batch_overhead_sec": round(per_batch, 4),
        "rows": n_orders,
    }

    # 1c) L13 adaptive drain (VERDICT r7 task #4): DynamicBatchSizer
    # gating batch size across a 32-file backlog vs the fixed
    # 1-file-per-trigger drain — same files, same keyed agg, same sink.
    # Predicted margin = (32 - n_segments) * c0 with c0 the per-batch
    # constant measured in 1b above; measured margin = fixed_sec -
    # adaptive_sec. Recorded in BASELINE.md (predicted vs measured).
    from spark_lever_spark.lever.actuator import adaptive_file_drain

    d = tempfile.mkdtemp(prefix="adaptive_backlog_")
    try:
        orders.repartition(32).write.mode("overwrite").parquet(d)
        backlog = sorted(
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        transform = lambda sdf: sdf.groupBy("o_orderstatus").agg(  # noqa: E731
            F.count("*").alias("cnt"), F.sum("o_totalprice").alias("total")
        )
        # fixed 1-file-per-trigger drain: one availableNow run, 32 batches
        ck = tempfile.mkdtemp(prefix="fixed_drain_ck_")
        sdf = (
            spark.readStream.schema(orders.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
        )
        t0 = time.perf_counter()
        q = (
            transform(sdf)
            .writeStream.foreachBatch(lambda df, _eid: df.count())
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        q.awaitTermination()
        fixed_sec = time.perf_counter() - t0
        shutil.rmtree(ck, ignore_errors=True)

        adaptive = adaptive_file_drain(
            spark, backlog, orders.schema, transform
        )
        n_seg = len(adaptive["segments"])
        predicted_margin = (len(backlog) - n_seg) * per_batch
        scenarios["adaptive_drain"] = {
            "sec": round(adaptive["sec"], 3),
            "fixed_1fpt_sec": round(fixed_sec, 3),
            "n_segments": n_seg,
            "segment_sizes": [s for s, _ in adaptive["segments"]],
            "c0_sec": round(per_batch, 3),
            "predicted_margin_sec": round(predicted_margin, 3),
            "measured_margin_sec": round(fixed_sec - adaptive["sec"], 3),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)

    # 2a) skew scenario: zipf-skewed agg, naive vs salted.
    # ~90% of rows share one key — the straggler-partition shape the
    # lever exists for. Both sides compute identical results (the
    # salted form is oracle-equal, pinned by skew_salted_agg's oracle).
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    skewed = li.select(
        F.when(F.col("l_orderkey") % 10 < 9, F.lit("hot"))
        .otherwise((F.col("l_orderkey") % 10).cast("string"))
        .alias("k"),
        "l_quantity",
    )
    t0 = time.perf_counter()
    skewed.groupBy("k").agg(F.sum("l_quantity")).collect()
    naive = time.perf_counter() - t0
    t0 = time.perf_counter()
    salt = (F.abs(F.hash("l_quantity")) % 16).alias("s")
    (
        skewed.withColumn("s", salt)
        .groupBy("k", "s")
        .agg(F.sum("l_quantity").alias("p"))
        .groupBy("k")
        .agg(F.sum("p"))
        .collect()
    )
    salted = time.perf_counter() - t0
    scenarios["skew_agg"] = {
        "naive_sec": round(naive, 3),
        "salted_sec": round(salted, 3),
    }

    # 2b) balancer actuation accuracy: weighted repartition to a 4:2:1
    # capability plan — report max |achieved share − target share|.
    from spark_lever_spark.lever.actuator import weighted_repartition

    weights = {"hostA": 4 / 7, "hostB": 2 / 7, "hostC": 1 / 7}
    t0 = time.perf_counter()
    placed = weighted_repartition(li.select("l_orderkey"), weights, 14)
    sizes = (
        placed.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .count()
        .collect()
    )
    actuate = time.perf_counter() - t0
    total = sum(r["count"] for r in sizes)
    from spark_lever_spark.lever.actuator import partition_counts

    counts = partition_counts(weights, 14)
    # contiguous bucket ranges per host, in sorted host order
    achieved: dict[str, float] = {}
    start = 0
    by_part = {r["p"]: r["count"] for r in sizes}
    for host in sorted(counts):
        n = counts[host]
        achieved[host] = (
            sum(by_part.get(p, 0) for p in range(start, start + n)) / total
        )
        start += n
    max_dev = max(abs(achieved[h] - weights[h]) for h in weights)
    scenarios["lever_weighted_repartition"] = {
        "sec": round(actuate, 3),
        "max_share_deviation": round(max_dev, 4),
        "plan": {h: round(w, 4) for h, w in weights.items()},
        "achieved": {h: round(s, 4) for h, s in achieved.items()},
    }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    total_sec = sum(
        v.get("sec", 0) + v.get("naive_sec", 0) + v.get("salted_sec", 0)
        for v in scenarios.values()
    )
    print(
        json.dumps(
            {
                "metric": "bench_streaming",
                "value": round(total_sec, 3),
                "unit": "sec",
                "scenarios": scenarios,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
