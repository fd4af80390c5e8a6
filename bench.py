"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology: one warm-up execution of a trivial query to absorb JVM/
codegen startup, then each bench query is executed TWICE, timed
end-to-end (plan + execute + collect-to-driver of the small result);
the reported number is the min of the two runs. Min-of-2 matches the
v1 freeze's steady-state-warm intent and keeps a single noisy-neighbor
spike (observed inflating arbitrary queries ~2x on this host) from
reading as a plan regression. `value` is the total across queries.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from spark_lever_spark.session import get_session
    from spark_lever_spark import registry

    spark = get_session(
        app_name="spark_lever_spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footer reads + the codegen paths the suite
    # uses (hash agg, distinct-agg Expand, window, broadcast join) so
    # measured timings reflect steady-state execution, not first-compile
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.count()
    warm = li.limit(10_000)
    warm.groupBy("l_returnflag").agg(
        F.count("*"), F.countDistinct("l_orderkey"), F.sum("l_quantity")
    ).collect()
    # q1-shaped kernel: multi-column decimal sum/avg compiles the
    # arithmetic codegen q1 uses, so its first timed run isn't also the
    # first compile of those expressions (r1 showed q1 at 1.42x baseline
    # purely from warmup ordering)
    warm.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_extendedprice"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
        F.avg("l_quantity"),
    ).collect()
    # moment-stats kernel (stddev/var/skew/kurt/corr) for agg_stats_full
    # and the stat queries — measured to need 2-3 executions before the
    # JIT stabilizes, so warm it twice
    for _ in range(2):
        warm.groupBy("l_returnflag").agg(
            F.stddev("l_quantity"),
            F.variance("l_extendedprice"),
            F.skewness("l_quantity"),
            F.kurtosis("l_quantity"),
            F.corr("l_quantity", "l_extendedprice"),
        ).collect()
    from pyspark.sql.window import Window

    warm.select(
        F.row_number().over(
            Window.partitionBy("l_returnflag").orderBy("l_orderkey")
        )
    ).limit(1).collect()

    # Per-query isolation: one broken query must never cost the whole
    # suite its perf signal (BENCH_r03/r04 were both lost to a single
    # analysis-time crash aborting the loop before the JSON printed).
    timings: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name, q in sorted(registry.bench_queries().items()):
        best = None
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001 — report, keep benching
            msg = str(exc).split("\n", 1)[0][:300]
            errs[name] = f"{type(exc).__name__}: {msg}"
            print(f"[bench] {name} FAILED: {errs[name]}", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "bench_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    if errs:
        result["errs"] = errs
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
