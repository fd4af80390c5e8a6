"""Driver simulation: run every registered query at sf0.01 against its
DuckDB oracle with driver-style canonicalization (dtype-sensitive), and
time each one. This is the pre-flight for CORRECTNESS_r{N}.json — any
red row here would be red in the driver's file.

Usage: python scripts/driver_sim.py [sf_dir] [--only=name1,name2]
       [--exclude=...] [--window=N]

--window=N restricts to the FIRST N entries of registry.all_queries()
— exactly the set the correctness driver will check with an N-query
budget (50 in every round so far), so `--window=50` is the pre-flight
for the next CORRECTNESS file.

--window composes with --only/--exclude as an INTERSECTION (the window
is sliced first); an --only name outside the window is skipped with a
warning rather than silently dropped.
"""

from __future__ import annotations

import json
import sys
import time
import traceback

sys.path.insert(0, ".")

from spark_lever_spark import registry  # noqa: E402
from spark_lever_spark.session import get_session  # noqa: E402
from tests.oracle import compare, duckdb_con  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/root/testdata/sf0.01"
    only = None
    exclude: set[str] = set()
    window = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        if a.startswith("--exclude="):
            exclude = set(a.split("=", 1)[1].split(","))
        if a.startswith("--window="):
            window = int(a.split("=", 1)[1])
    spark = get_session(app_name="driver-sim", shuffle_partitions=32)
    con = duckdb_con(sf_dir)
    results: dict[str, dict] = {}
    qs = registry.all_queries()
    if window is not None:
        qs = dict(list(qs.items())[:window])
        if only:
            dropped = only - set(qs)
            if dropped:
                print(
                    f"WARNING: --only names outside the first {window} "
                    f"window are skipped: {sorted(dropped)}",
                    file=sys.stderr,
                )
    for name, q in qs.items():
        if (only and name not in only) or name in exclude:
            continue
        t0 = time.time()
        status = "green"
        err = None
        try:
            sp = q.fn(spark, sf_dir).toPandas()
            if q.oracle:
                oracle_df = con.execute(q.oracle).df()
                compare_t0 = time.time()
                # reuse the pytest comparator (mirrors driver semantics
                # incl. the dtype-token check added after r01's q12)
                import pandas as pd  # noqa: F401

                class _W:  # wrap the already-collected pandas frame
                    def __init__(self, pdf):
                        self._pdf = pdf

                    def toPandas(self):
                        return self._pdf

                compare(_W(sp), oracle_df, name)
            else:
                status = "rows_only"
                assert len(sp.columns) > 0
        except Exception:
            status = "RED"
            err = traceback.format_exc(limit=3).splitlines()[-1]
        dt = time.time() - t0
        results[name] = {"status": status, "sec": round(dt, 2), "err": err}
        print(f"{name:45s} {status:9s} {dt:6.2f}s" + (f"  {err}" if err else ""),
              flush=True)
    reds = {n: r for n, r in results.items() if r["status"] == "RED"}
    total = sum(r["sec"] for r in results.values())
    print(f"\n{len(results)} queries, {len(reds)} RED, total {total:.1f}s")
    slow = sorted(results.items(), key=lambda kv: -kv[1]["sec"])[:15]
    print("slowest:", json.dumps({n: r["sec"] for n, r in slow}))
    if reds:
        print("RED:", json.dumps(reds, indent=2))
        sys.exit(1)


if __name__ == "__main__":
    main()
