"""Round-18 optimization probe: time selected bench queries in
isolation (noop-sink per guide §1.4 PLUS the bench's collect
methodology) and dump .explain("formatted") for each.

Usage:
  python scripts/perf_probe.py [--sf=/root/testdata/sf0.1]
      [--reps=2] [--plans-dir=plans/r18] [--suffix=before]
      [--no-plans] [--collect-only] name1 name2 ...

With no names: runs every bench query (registry.bench_queries()).
Prints one JSON line: {"queries": {name: {"collect": s, "noop": s}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from spark_lever_spark import registry  # noqa: E402
from spark_lever_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    reps = 2
    plans_dir = "plans/r18"
    suffix = "before"
    do_plans = True
    noop = True
    names: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--plans-dir="):
            plans_dir = a.split("=", 1)[1]
        elif a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
        elif a == "--no-plans":
            do_plans = False
        elif a == "--collect-only":
            noop = False
        else:
            names.append(a)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        app_name="perf-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.bench_queries()
    if names:
        qs = {n: qs[n] if n in qs else registry.all_queries()[n] for n in names}

    # same warm-up spirit as bench.py: absorb JVM/codegen startup
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.count()
    li.limit(10_000).groupBy("l_returnflag").agg(
        F.count("*"), F.sum("l_quantity")
    ).collect()

    out: dict[str, dict] = {}
    for name, q in qs.items():
        spark.sparkContext.setJobDescription(f"probe:{name}")
        rec: dict[str, float | str] = {}
        try:
            if do_plans:
                df = q.fn(spark, sf_dir)
                plan = spark._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                os.makedirs(plans_dir, exist_ok=True)
                with open(f"{plans_dir}/{name}_{suffix}.txt", "w") as fh:
                    fh.write(plan)
                spark.catalog.clearCache()
            best_c = None
            for _ in range(reps):
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                best_c = dt if best_c is None else min(best_c, dt)
            rec["collect"] = round(best_c, 3)
            if noop:
                spark.catalog.clearCache()
                best_n = None
                for _ in range(reps):
                    t0 = time.perf_counter()
                    q.fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = time.perf_counter() - t0
                    best_n = dt if best_n is None else min(best_n, dt)
                rec["noop"] = round(best_n, 3)
            spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001
            rec["error"] = f"{type(exc).__name__}: {str(exc)[:200]}"
            print(f"[probe] {name} FAILED: {rec['error']}", file=sys.stderr)
        out[name] = rec
        print(f"[probe] {name}: {rec}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"queries": out, "sf": sf_dir, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
