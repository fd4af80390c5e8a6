"""Core relational operators (reference §2.E RDD ops / §2.F DataFrame ops).

Each query demonstrates one operator family from the reference's
inventory — projection/filter (reference execution/basicOperators.scala:35,50),
distinct (:208), limit/top-k (:92,:130), sort (:155), aggregation
(Aggregate.scala:41), sampling (:64), numeric stats
(core/.../rdd/DoubleRDDFunctions.scala) — expressed as DataFrame plans.

Determinism notes:
- top-k queries always carry a unique tiebreaker key in the sort.
- "sampling" for oracle parity is hash/modulo-based (deterministic in
  both engines); `df.sample` itself is exercised in tests/ where only
  statistical properties are asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_lever_spark.catalog import load_table
from spark_lever_spark.functions.exact import cents, round_to
from spark_lever_spark.operators.grank import (
    ntile_from_rank,
    with_global_rank,
    with_grouped_cumsum,
    with_grouped_prefix_max,
)
from spark_lever_spark.registry import register


@register(
    "scan_project_filter",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(round(l_extendedprice*100) AS BIGINT)
            * (100 - CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE) / 10000
           AS net_price
FROM lineitem
WHERE l_quantity > 45 AND l_returnflag = 'R'
ORDER BY l_orderkey, l_linenumber
""",
    category="relational",
    bench=True,
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project + Filter (reference basicOperators.scala:35,:50).

    Both predicates and the 4-column projection reach the parquet scan
    (PushedFilters + ReadSchema pruning)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .select(
            "l_orderkey",
            "l_linenumber",
            (
                (
                    cents(F.col("l_extendedprice"))
                    * (100 - cents(F.col("l_discount")))
                ).cast("double")
                / 10000
            ).alias("net_price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "distinct_pairs",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
ORDER BY l_returnflag, l_linestatus
""",
    category="relational",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (reference basicOperators.scala:208 — partial+final dedup)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "dropduplicates_orders",
    oracle="""
SELECT o_custkey, min(o_orderkey) AS first_orderkey
FROM orders GROUP BY o_custkey ORDER BY o_custkey
""",
    category="relational",
)
def dropduplicates_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup with a deterministic representative (min orderkey) —
    the deterministic form of `dropDuplicates(subset)` (RDD `distinct`
    reference rdd/RDD.scala:322)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.min("o_orderkey").alias("first_orderkey"))
        .orderBy("o_custkey")
    )


@register(
    "topk_orders",
    oracle="""
SELECT o_orderkey, round(o_totalprice*100)/100 AS o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50
""",
    category="relational",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k (reference TakeOrdered, basicOperators.scala:130): orderBy+limit
    plans as TakeOrderedAndProject — per-partition heaps, no full sort."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(50)
        .select(
            "o_orderkey",
            round_to(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "o_orderpriority",
        )
    )


@register(
    "agg_stats_full",
    oracle="""
WITH l AS (
  SELECT l_returnflag, l_orderkey,
         CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_extendedprice*100) AS BIGINT) AS price_c
  FROM lineitem
)
SELECT l_returnflag,
       count(*)                                   AS cnt,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       CAST(sum(q) AS DOUBLE)                     AS sum_qty,
       round(CAST(sum(price_c) AS DOUBLE) / count(*)) / 100 AS avg_price,
       CAST(min(price_c) AS DOUBLE) / 100         AS min_price,
       CAST(max(price_c) AS DOUBLE) / 100         AS max_price,
       round(sqrt((CAST(sum(q*q) AS DOUBLE) - CAST(sum(q) AS DOUBLE)*sum(q)/count(*))
                  / (count(*) - 1)) * 10000) / 10000 AS sd_qty,
       round((CAST(sum(q*q) AS DOUBLE) - CAST(sum(q) AS DOUBLE)*sum(q)/count(*))
             / (count(*) - 1) * 10000) / 10000    AS var_qty
FROM l
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    category="relational",
    bench=True,
)
def agg_stats_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate function surface (reference
    catalyst/expressions/aggregates.scala: Min:91 Max:122 Count:153
    CountDistinct:167 Average:286 Sum:329; stddev/variance are
    beyond-reference superset).

    Moment stats use the exact sum-of-squares form over integer inputs
    so results are partitioning-independent (the built-in streaming
    stddev_samp is order-dependent at ulp level; it is exercised in
    tests/test_operators.py against this exact form).

    The exact count-distinct runs as a separate pre-dedup aggregation
    joined back on the group key, not as an inline ``countDistinct``:
    the inline form plans an Expand that doubles every input row before
    the partial aggregate, while the two-stage form keeps the moment
    stats fully map-side-combinable and shuffles only the deduplicated
    (flag, orderkey) pairs — measurably faster warm at sf0.1 (~1.2s vs
    ~1.45s) and the shape that survives a 100x scale-up. The 3-row
    dedup-count side joins back via broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    base = li.select(
        "l_returnflag",
        "l_orderkey",
        q.alias("q"),
        cents(F.col("l_extendedprice")).alias("price_c"),
    )
    n = F.count("*")
    var_exact = (
        F.sum(F.col("q") * F.col("q")).cast("double")
        - F.sum("q").cast("double") * F.sum("q") / n
    ) / (n - 1)
    stats = base.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.sum("q").cast("double").alias("sum_qty"),
        (F.round(F.sum("price_c").cast("double") / n) / 100).alias("avg_price"),
        (F.min("price_c").cast("double") / 100).alias("min_price"),
        (F.max("price_c").cast("double") / 100).alias("max_price"),
        (F.round(F.sqrt(var_exact) * 10000) / 10000).alias("sd_qty"),
        (F.round(var_exact * 10000) / 10000).alias("var_qty"),
    )
    n_orders = (
        base.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        stats.join(F.broadcast(n_orders), "l_returnflag")
        .select(
            "l_returnflag", "cnt", "n_orders", "sum_qty", "avg_price",
            "min_price", "max_price", "sd_qty", "var_qty",
        )
        .orderBy("l_returnflag")
    )


@register(
    "first_last_per_group",
    oracle="""
SELECT o_orderpriority,
       min(o_orderdate) AS first_date,
       max(o_orderdate) AS last_date,
       count(*) AS cnt
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    category="relational",
)
def first_last_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/Last aggregates (reference aggregates.scala:427,:441) in their
    deterministic min/max-by-time form."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
            F.count("*").alias("cnt"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "approx_count_distinct",
    oracle="""
SELECT COUNT(DISTINCT l_orderkey) AS exact_orders,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS orders_within_3rsd,
       TRUE AS parts_within_3rsd
FROM lineitem
""",
    category="relational",
)
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (reference
    ApproxCountDistinct, aggregates.scala:249-284 — HLL with rsd).
    Sketch values aren't SQL-reproducible, so the hash-checked output is
    the HLL accuracy *invariant*: |approx-exact|/exact <= 3*rsd (true
    with overwhelming probability and deterministic for a fixed Spark
    hash), alongside the exact counts the oracle recomputes."""
    li = load_table(spark, sf_dir, "lineitem")
    rsd = 0.01
    # approx + exact kept in SEPARATE aggregations: combining two
    # countDistincts in one agg forces an Expand (row-multiplying)
    # plan — measured 4x slower than three simple hash aggs joined on
    # their 1-row outputs, and the Expand multiplies at 100 TB too
    apx = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=rsd).alias("a_orders"),
        F.approx_count_distinct("l_partkey", rsd=rsd).alias("a_parts"),
    )
    e_orders = (
        li.select("l_orderkey").distinct().agg(F.count("*").alias("exact_orders"))
    )
    e_parts = (
        li.select("l_partkey").distinct().agg(F.count("*").alias("exact_parts"))
    )
    agg = apx.crossJoin(F.broadcast(e_orders)).crossJoin(F.broadcast(e_parts))
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)).cast("double") / F.col(e) <= 3 * rsd
    )
    return agg.select(
        "exact_orders",
        "exact_parts",
        within("a_orders", "exact_orders").alias("orders_within_3rsd"),
        within("a_parts", "exact_parts").alias("parts_within_3rsd"),
    )


@register(
    "sketch_hll_mergeable",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS within_5pct
FROM events GROUP BY event_type
UNION ALL
SELECT '__ALL__' AS event_type, COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS within_5pct
FROM events
ORDER BY event_type
""",
    category="relational",
)
def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable DataSketches HLL aggregates (hll_sketch_agg /
    hll_union_agg, Spark 3.5+) — the at-scale successor to the scalar
    approx_count_distinct above: per-group sketches are REUSABLE partial
    aggregates (store per-day/per-source sketch tables, roll any
    combination up later by unioning binary sketches — no second pass
    over 100 TB of raw data). Superset of the reference's HLL
    (aggregates.scala:249-284), which could only produce a final
    scalar. Sketch bytes aren't SQL-reproducible, so the hash-checked
    output is the accuracy invariant per group AND for the two-level
    union rollup (default lgConfigK=12 -> rsd ~1.6 %; 5 % is a ~3-sigma
    bound, deterministic for Spark's fixed hash)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sk = ev.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
    # exact side via pre-dedup count (no Expand, same doctrine as
    # approx_count_distinct above)
    exact = (
        ev.distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("exact_users"))
    )
    ok = (
        F.abs(F.hll_sketch_estimate("sk") - F.col("exact_users")).cast("double")
        / F.col("exact_users")
        <= 0.05
    )
    per_group = sk.join(exact, "event_type").select(
        "event_type", "exact_users", ok.alias("within_5pct")
    )
    g_sk = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_all")
    )
    g_exact = (
        ev.select("user_id").distinct().agg(F.count("*").alias("exact_users"))
    )
    g_ok = (
        F.abs(F.col("est_all") - F.col("exact_users")).cast("double")
        / F.col("exact_users")
        <= 0.05
    )
    rollup = (
        g_sk.crossJoin(F.broadcast(g_exact))
        .select(
            F.lit("__ALL__").alias("event_type"),
            "exact_users",
            g_ok.alias("within_5pct"),
        )
    )
    return per_group.unionByName(rollup).orderBy("event_type")


@register(
    "bitmap_exact_distinct",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
UNION ALL
SELECT '__ALL__' AS event_type, COUNT(DISTINCT user_id) AS n_users
FROM events
ORDER BY event_type
""",
    category="relational",
)
def bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting through mergeable bitmap partials
    (bitmap_bucket_number / bitmap_construct_agg / bitmap_or_agg /
    bitmap_count, Spark 3.5+) — the integer-key counterpart to the HLL
    sketch rollup above with zero approximation error. The two-level
    shape is the point at 100 TB: level 1 builds one compact bitmap per
    (group, 32k-bucket) — a partial aggregate you can persist per
    day/source — and any later rollup ORs bitmaps instead of re-shuffling
    raw ids (the global row here merges the per-type bitmaps it already
    built). Unlike count(DISTINCT), which shuffles every distinct id,
    the shuffle carries fixed-size bitmaps."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sub = ev.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("bkt")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm")
    )
    per_type = sub.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users")
    )
    global_row = (
        sub.groupBy("bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).alias("n_users"))
        .select(F.lit("__ALL__").alias("event_type"), "n_users")
    )
    return per_type.unionByName(global_row).orderBy("event_type")


@register(
    "sample_deterministic",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice*100)/100 AS o_totalprice
FROM orders WHERE o_orderkey % 7 = 0
ORDER BY o_orderkey
""",
    category="relational",
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic systematic sample (modulo on the key) — the
    oracle-checkable analog of `df.sample` (reference rdd/RDD.scala:390;
    randomized `sample`/`randomSplit`/`sampleBy` are exercised
    statistically in tests/test_sampling.py)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            round_to(F.col("o_totalprice"), 2).alias("o_totalprice"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "histogram_fixed_buckets",
    oracle="""
SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
       count(*) AS cnt
FROM orders
GROUP BY 1 ORDER BY 1
""",
    category="relational",
)
def histogram_fixed_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram (reference DoubleRDDFunctions.histogram :96-143) as a
    bucketed group-by — fully parallel, no driver-side bucketing."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket")
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket")
    )


@register(
    "percentiles_exact",
    oracle="""
WITH l AS (SELECT l_returnflag,
                  CAST(round(l_extendedprice*100) AS BIGINT) AS price_c
           FROM lineitem)
SELECT l_returnflag,
       round(CAST(quantile_cont(price_c, 0.5)  AS DOUBLE)) / 100 AS p50,
       round(CAST(quantile_cont(price_c, 0.9)  AS DOUBLE)) / 100 AS p90,
       round(CAST(quantile_cont(price_c, 0.99) AS DOUBLE)) / 100 AS p99
FROM l
GROUP BY l_returnflag ORDER BY l_returnflag
""",
    category="relational",
)
def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (beyond-reference superset of
    DoubleRDD stats; approx variant = `approx_percentile`, covered
    rows-only in tests). Interpolation runs on exact integer cents so
    the midpoint arithmetic is reproducible across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    price_c = cents(F.col("l_extendedprice"))
    base = li.select("l_returnflag", price_c.alias("price_c"))
    return (
        base.groupBy("l_returnflag")
        .agg(
            (F.round(F.percentile("price_c", 0.5)) / 100).alias("p50"),
            (F.round(F.percentile("price_c", 0.9)) / 100).alias("p90"),
            (F.round(F.percentile("price_c", 0.99)) / 100).alias("p99"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "count_by_value",
    oracle="""
SELECT event_type, count(*) AS cnt
FROM events GROUP BY event_type ORDER BY event_type
""",
    category="relational",
)
def count_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countByValue (reference rdd/RDD.scala:1044) as groupBy().count()."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count("*").alias("cnt")).orderBy("event_type")


@register(
    "values_collected_sorted",
    oracle="""
SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',') AS nations
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
""",
    category="relational",
)
def values_collected_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupByKey-with-values (reference PairRDDFunctions.groupByKey :444)
    as collect_list + sort. Emitted as a joined string (not array<string>)
    because the driver's pandas canonicalization can't sort/hash list
    cells — semantics identical."""
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations")
        )
        .orderBy("n_regionkey")
    )


@register(
    "sample_by_key_stratified",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS total, TRUE AS frac_ok
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
    category="relational",
)
def sample_by_key_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sampleByKey / df.stat.sampleBy (reference PairRDDFunctions.scala:
    214-262): per-stratum Bernoulli sampling with per-key fractions.
    Sampled rows are Spark-RNG-specific, so the hash-checked output is
    the per-stratum *invariant*: fraction 0.0 samples nothing, 1.0
    samples everything, intermediate fractions land within a wide
    (>5 sigma) binomial tolerance — plus the exact per-segment totals
    the oracle recomputes. Statistical contract also asserted in
    tests/test_sampling.py."""
    cust = load_table(spark, sf_dir, "customer")
    fractions = {
        "AUTOMOBILE": 0.5,
        "BUILDING": 0.25,
        "FURNITURE": 0.1,
        "HOUSEHOLD": 1.0,
        "MACHINERY": 0.0,
    }
    sampled = cust.stat.sampleBy("c_mktsegment", fractions, seed=42)
    totals = cust.groupBy("c_mktsegment").agg(F.count("*").alias("total"))
    picked = sampled.groupBy("c_mktsegment").agg(F.count("*").alias("sampled"))
    frac = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )[F.col("c_mktsegment")]
    ok = (
        F.when(frac == 0.0, F.col("sampled") == 0)
        .when(frac == 1.0, F.col("sampled") == F.col("total"))
        .otherwise(
            F.abs(F.col("sampled").cast("double") / F.col("total") - frac) <= 0.15
        )
    )
    return (
        totals.join(picked, "c_mktsegment", "left")
        .fillna(0, subset=["sampled"])
        .select("c_mktsegment", "total", ok.alias("frac_ok"))
        .orderBy("c_mktsegment")
    )


@register(
    "map_in_pandas_partition_stats",
    oracle="""
SELECT CAST(8 AS BIGINT) AS partitions,
       COUNT(*) AS total_rows,
       MIN(l_orderkey) AS min_key,
       MAX(l_orderkey) AS max_key
FROM lineitem
""",
    category="relational",
)
def map_in_pandas_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapPartitions/glom parity (reference RDD.scala:641,:544) via
    mapInPandas: Arrow-batched per-partition Python access. The demo
    computes per-partition (rows, min_key, max_key) and re-aggregates to
    a stable 1-row summary — the pattern for partition-local algorithms
    (reservoir sampling, per-shard model scoring) without a shuffle.
    The explicit repartition(8) round-robins 60k+ rows, so all 8
    partitions are non-empty and the re-aggregated summary (8, total,
    min, max) is layout-independent — the oracle recomputes it from the
    table directly."""
    import pandas as pd

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")

    def per_partition(batches):
        rows = 0
        lo = None
        hi = None
        for pdf in batches:
            rows += len(pdf)
            if len(pdf):
                lo = pdf.l_orderkey.min() if lo is None else min(lo, pdf.l_orderkey.min())
                hi = pdf.l_orderkey.max() if hi is None else max(hi, pdf.l_orderkey.max())
        if rows:
            yield pd.DataFrame(
                {"part_rows": [rows], "min_key": [lo], "max_key": [hi]}
            )

    per_part = li.repartition(8).mapInPandas(
        per_partition, "part_rows long, min_key long, max_key long"
    )
    return per_part.agg(
        F.count("*").alias("partitions"),
        F.sum("part_rows").alias("total_rows"),
        F.min("min_key").alias("min_key"),
        F.max("max_key").alias("max_key"),
    )


def pipe_partitions(
    df: DataFrame, command: list[str], input_col: str, output_col: str = "value"
) -> DataFrame:
    """RDD.pipe parity (reference core/src/main/scala/.../RDD.scala:
    596-623): fork one external process per partition, stream the
    partition's values to its stdin as lines, and emit its stdout lines
    as the output rows — the classic escape hatch for legacy CLI
    transforms (tokenizers, scorers) in a distributed scan.

    Shape notes for scale: the subprocess is per-PARTITION (fork cost
    amortized over the whole partition, as in the reference); a writer
    thread feeds stdin while the task thread reads stdout, so the OS
    pipe can't deadlock on large outputs; output is yielded in bounded
    chunks so Python memory is O(chunk), not O(partition output).
    """
    import subprocess
    import threading

    import pandas as pd

    def run(batches):
        proc = subprocess.Popen(
            command,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            text=True,
        )

        def feed() -> None:
            try:
                for pdf in batches:
                    for v in pdf[input_col]:
                        proc.stdin.write(f"{v}\n")
            finally:
                proc.stdin.close()

        writer = threading.Thread(target=feed, daemon=True)
        writer.start()
        chunk: list[str] = []
        for line in proc.stdout:
            chunk.append(line.rstrip("\n"))
            if len(chunk) >= 10_000:
                yield pd.DataFrame({output_col: chunk})
                chunk = []
        if chunk:
            yield pd.DataFrame({output_col: chunk})
        writer.join()
        rc = proc.wait()
        if rc != 0:
            raise RuntimeError(f"pipe command {command!r} exited with {rc}")

    return df.select(input_col).mapInPandas(run, f"{output_col} string")


@register(
    "pipe_partitions_tr",
    oracle="""
SELECT lower(n_name) AS value FROM nation ORDER BY value
""",
    category="relational",
)
def pipe_partitions_tr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pipe() demo: nation names lowercased by an external `tr` process
    — POSIX-portable, so the oracle can recompute it as lower()."""
    nation = load_table(spark, sf_dir, "nation")
    out = pipe_partitions(nation, ["tr", "A-Z", "a-z"], input_col="n_name")
    return out.orderBy("value")


@register(
    "skew_salted_agg",
    oracle="""
SELECT l_returnflag, COUNT(*) AS cnt,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    category="relational",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation for skewed keys: stage 1 aggregates
    on (key, salt) spreading each hot key over 16 reducers, stage 2
    merges the partials per key. Correctness-neutral for algebraic aggs
    (same result as the direct groupBy — the oracle proves it); at
    100 TB this is the standard fix when one key holds >> 1/parallelism
    of the rows and AQE skew handling cannot split an agg. l_returnflag
    (3 values over 6M rows/SF) is exactly that shape."""
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn("__salt__", F.pmod(F.xxhash64("l_orderkey"), F.lit(16)))
    partial = salted.groupBy("l_returnflag", "__salt__").agg(
        F.count("*").alias("c"), F.sum(F.col("l_quantity").cast("long")).alias("q")
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(F.sum("c").alias("cnt"), F.sum("q").alias("sum_qty"))
        .orderBy("l_returnflag")
    )


@register(
    "stat_corr_covar_by_flag",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS sx,
         SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS sy,
         SUM(CAST(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS sxy,
         SUM(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS sxx,
         SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
         - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
         AS covar_pop_qty_price_cents,
       (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
         - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
       / sqrt(
           (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
           * (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
         )
         AS corr_qty_price
FROM m ORDER BY l_returnflag
""",
    category="relational",
)
def stat_corr_covar_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation/covariance (reference DoubleRDDFunctions stats +
    MLlib stat, SURVEY.md §2.E) computed scale-exactly: built-in
    corr()/covar_pop() accumulate doubles in partition order, which is
    nondeterministic across engines AND across cluster runs — so this
    aggregates exact integer moments (DECIMAL(38,0): overflow-proof at
    any SF) and derives the statistics with one identical double
    formula on both engines. Bit-identical output, any partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = cents(F.col("l_extendedprice"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = (
        li.select(F.col("l_returnflag"), x.alias("x"), y.alias("y"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec(F.col("x"))).alias("sx"),
            F.sum(dec(F.col("y"))).alias("sy"),
            F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
            F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
            F.sum(dec(F.col("y") * F.col("y"))).alias("syy"),
        )
    )
    nd = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / nd
    my = F.col("sy").cast("double") / nd
    covp = F.col("sxy").cast("double") / nd - mx * my
    vx = F.col("sxx").cast("double") / nd - mx * mx
    vy = F.col("syy").cast("double") / nd - my * my
    return m.select(
        "l_returnflag",
        "n",
        covp.alias("covar_pop_qty_price_cents"),
        (covp / F.sqrt(vx * vy)).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


@register(
    "approx_percentile_prices",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n,
       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
    category="relational",
)
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) p50/p90/p99 of
    o_totalprice per order status. The sketch is mergeable — partials
    combine across partitions without a global sort, the property that
    makes it the 100 TB percentile path (exact percentile_cont needs a
    full sort per group). Sketch values are algorithm-specific (DuckDB
    uses t-digest), so the hash-checked output is the GK *guarantee*
    itself: the returned value's rank is within eps*n (+ tie/rounding
    slack) of q*n — computed by joining the sketch output back and
    counting rows <= value. Deeper rank-error tests in
    tests/test_approx_stats.py."""
    eps = 1.0 / 10000
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    )
    apx = orders.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000).alias("pct")
    )
    joined = orders.join(F.broadcast(apx), "o_orderstatus")
    ranks = joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        *[
            F.sum(
                (F.col("o_totalprice") <= F.col("pct")[i]).cast("long")
            ).alias(f"r{int(q * 100)}")
            for i, q in enumerate((0.5, 0.9, 0.99))
        ],
    )
    slack = F.col("n").cast("double") * eps + 2.0
    ok = lambda r, q: (  # noqa: E731
        F.abs(F.col(r).cast("double") - q * F.col("n")) <= slack
    )
    return ranks.select(
        "o_orderstatus",
        "n",
        ok("r50", 0.5).alias("p50_ok"),
        ok("r90", 0.9).alias("p90_ok"),
        ok("r99", 0.99).alias("p99_ok"),
    ).orderBy("o_orderstatus")


@register(
    "random_split_sizes",
    oracle="""
SELECT TRUE AS disjoint_exhaustive,
       TRUE AS train_le_total, TRUE AS holdout_le_total
""",
    category="relational",
)
def random_split_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """randomSplit (reference RDD.scala:409) train/holdout split:
    per-partition Bernoulli draws, no shuffle. Output is one row of
    invariant booleans — counts summing exactly to the table count
    (disjoint + exhaustive) and each split bounded by it — so any
    regression to overlapping or lossy splits flips a value instead of
    hiding in seed-dependent sizes."""
    orders = load_table(spark, sf_dir, "orders")
    train, test = orders.randomSplit([0.7, 0.3], seed=42)
    a = train.agg(F.count("*").alias("n_train"))
    b = test.agg(F.count("*").alias("n_holdout"))
    total = orders.agg(F.count("*").alias("total"))
    return (
        a.crossJoin(b)
        .crossJoin(F.broadcast(total))
        .select(
            (F.col("n_train") + F.col("n_holdout") == F.col("total")).alias(
                "disjoint_exhaustive"
            ),
            (F.col("n_train") <= F.col("total")).alias("train_le_total"),
            (F.col("n_holdout") <= F.col("total")).alias("holdout_le_total"),
        )
    )


@register(
    "skew_salted_join",
    oracle="""
WITH flag_dim AS (
  SELECT l_returnflag AS f, COUNT(*) AS flag_rows
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, COUNT(*) AS cnt,
       CAST(SUM(CAST(l_quantity AS BIGINT) * flag_rows) AS BIGINT)
         AS weighted_qty
FROM lineitem JOIN flag_dim ON l_returnflag = f
GROUP BY l_returnflag ORDER BY l_returnflag
""",
    category="relational",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join for skewed keys, oracle-equal to the plain
    join. l_returnflag has 3 values over every lineitem row — the
    degenerate case where a hash join puts ~1/3 of the fact table on
    single reducers. The fact side gets a deterministic per-row salt
    (xxhash64 of the row's unique key), the dim side is replicated
    once per salt, and the join key becomes (key, salt): each hot key
    spreads over 16 reducers. AQE's skew-join split handles the cases
    it can see; salting is the manual fallback when the partitioning is
    pinned (e.g. reused by a downstream agg) — here forced to a
    sort-merge join via hint to prove the technique, since a 3-row dim
    would otherwise broadcast."""
    n_salts = 16
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_orderkey", "l_linenumber"
    )
    flag_dim = (
        li.groupBy(F.col("l_returnflag").alias("f"))
        .agg(F.count("*").alias("flag_rows"))
    )
    salted_fact = li.withColumn(
        "__salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salts))
    )
    replicated_dim = flag_dim.crossJoin(
        spark.range(n_salts).select(F.col("id").alias("__salt"))
    )
    return (
        salted_fact.join(
            replicated_dim.hint("merge"),
            (F.col("l_returnflag") == F.col("f"))
            & (salted_fact["__salt"] == replicated_dim["__salt"]),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("l_quantity").cast("long") * F.col("flag_rows")).alias(
                "weighted_qty"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "stat_freq_items",
    oracle="""
WITH d AS (SELECT list_sort(list(DISTINCT l_returnflag)) AS fl FROM lineitem)
SELECT array_to_string(fl, ',') AS flags_found,
       len(list_intersect(fl, ['A','N','R'])) = 3 AS all_flags_present
FROM d
""",
    category="relational",
)
def stat_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.stat.freqItems (heavy hitters, single pass, no shuffle —
    KPS'03 streaming algorithm; superset guarantee: every item with
    frequency > support is present). l_returnflag has exactly 3 distinct
    values, each above 10% support, so the sketch's superset-of-frequent
    / subset-of-observed guarantees pin the output to exactly the
    distinct set — which is what the oracle computes. Emitted as a
    joined string (driver canonicalization can't hash list cells)."""
    li = load_table(spark, sf_dir, "lineitem")
    freq = li.stat.freqItems(["l_returnflag"], support=0.1)
    found = F.array_sort(F.col("l_returnflag_freqItems"))
    return freq.select(
        F.concat_ws(",", found).alias("flags_found"),
        (
            F.size(F.array_intersect(
                found, F.array(F.lit("A"), F.lit("N"), F.lit("R"))
            )) == 3
        ).alias("all_flags_present"),
    )


@register(
    "reservoir_per_key",
    oracle="""
SELECT event_type, event_id, CAST(rk AS INT) AS rk FROM (
  SELECT event_type, event_id,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
         ) AS rk
  FROM events
)
WHERE rk <= 3
ORDER BY event_type, rk
""",
    category="relational",
)
def reservoir_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic reservoir-style k-per-group sampling: rank rows
    within each key by a keyed hash (md5 of the row id — uniform and
    identical in both engines) and keep the top k. Unlike
    sampleByKey's Bernoulli draw this yields EXACTLY k rows per group,
    reproducibly, with no RNG state — the form a training pipeline
    uses for per-source spot-check samples.

    Scale shape: one shuffle on the group key; the rank filter is a
    running top-k, and Spark 3.5+ inserts WindowGroupLimit so each
    map task pre-prunes to k rows before the exchange — the shuffle
    carries O(k x groups), not the full table."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "event_id")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .orderBy("event_type", "rk")
    )


@register(
    "pareto_frontier_parts",
    oracle="""
SELECT p_partkey, p_retailprice, p_size
FROM part y
WHERE NOT EXISTS (
  SELECT 1 FROM part x
  WHERE (x.p_retailprice < y.p_retailprice AND x.p_size >= y.p_size)
     OR (x.p_retailprice = y.p_retailprice AND x.p_size > y.p_size)
)
ORDER BY p_retailprice, p_size, p_partkey
""",
    category="relational",
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier: parts not dominated on
    (minimize price, maximize size). The oracle states the spec as the
    O(n^2) NOT EXISTS; this implementation is the O(n log n) scalable
    form — collapse to per-price maxima, one running max over the
    price-sorted per-price table (tiny relative to the fact table),
    broadcast the qualifying (price, size) pairs back. Ties on both
    axes are mutually non-dominating and all kept, exactly as the
    NOT-EXISTS spec implies.

    Scale note: the running max runs over DISTINCT prices (collapsed
    grain), 2-passed over price buckets (grank.with_grouped_prefix_max)
    — no single-task sort even on an unbounded price domain."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    per_price = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("max_size")
    )
    frontier_prices = (
        with_grouped_prefix_max(
            per_price,
            [],
            F.col("p_retailprice"),
            ["p_retailprice"],
            "max_size",
        )
        .withColumnRenamed("_pmax", "m_cheaper")
        .filter(
            F.col("m_cheaper").isNull()
            | (F.col("max_size") > F.col("m_cheaper"))
        )
        # renamed so the join back to `part` (its own ancestor) is
        # unambiguous
        .select(
            F.col("p_retailprice").alias("fp_price"),
            F.col("max_size").alias("fp_size"),
        )
    )
    return (
        part.join(
            F.broadcast(frontier_prices),
            (F.col("p_retailprice") == F.col("fp_price"))
            & (F.col("p_size") == F.col("fp_size")),
        )
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_size", "p_partkey")
    )


@register(
    "dq_audit_orders",
    oracle="""
WITH checks AS (
  SELECT 'status_domain' AS check_name,
         count(*) FILTER (o_orderstatus NOT IN ('F', 'O', 'P')) AS n_violations,
         count(*) AS n_checked
  FROM orders
  UNION ALL
  SELECT 'negative_totalprice',
         count(*) FILTER (o_totalprice <= 0), count(*)
  FROM orders
  UNION ALL
  SELECT 'orphan_custkey',
         count(*) FILTER (c_custkey IS NULL), count(*)
  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
  UNION ALL
  SELECT 'lineitem_orphan_orderkey',
         count(*) FILTER (o.o_orderkey IS NULL), count(*)
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT check_name, n_violations, n_checked,
       n_violations = 0 AS passed
FROM checks
ORDER BY check_name
""",
    category="relational",
)
def dq_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: null-rate, value-range, and referential-
    integrity checks as one declarative union — the expectation-suite
    primitive run before any table is trusted downstream. Each check
    is a count-filter aggregate; the referential checks are left-join
    + null-count (the broadcast-or-shuffle choice is Catalyst's by
    dim size). One pass per check; at scale the single-table checks
    share one scan via the union."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def check(name: str, df: DataFrame, violation) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count_if(violation).alias("n_violations"),
            F.count("*").alias("n_checked"),
        )

    checks = (
        check(
            "status_domain",
            orders,
            ~F.col("o_orderstatus").isin("F", "O", "P"),
        )
        .unionAll(
            check(
                "negative_totalprice", orders, F.col("o_totalprice") <= 0
            )
        )
        .unionAll(
            check(
                "orphan_custkey",
                orders.join(
                    cust, orders.o_custkey == cust.c_custkey, "left"
                ),
                F.col("c_custkey").isNull(),
            )
        )
        .unionAll(
            check(
                "lineitem_orphan_orderkey",
                li.join(orders, li.l_orderkey == orders.o_orderkey, "left"),
                F.col("o_orderkey").isNull(),
            )
        )
    )
    return checks.withColumn(
        "passed", F.col("n_violations") == 0
    ).orderBy("check_name")


@register(
    "stat_mad_by_flag",
    oracle="""
WITH med AS (
  SELECT l_returnflag, median(l_extendedprice) AS med
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       round(m.med * 100) / 100 AS median_price,
       round(median(abs(l.l_extendedprice - m.med)) * 100) / 100
         AS mad_price,
       count(*) AS n
FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
GROUP BY l.l_returnflag, m.med
ORDER BY l.l_returnflag
""",
    category="relational",
)
def stat_mad_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion
    companion to the exact-moment stddev in agg_stats_full (outliers
    move stddev, not MAD). Two grouped exact medians: per-group median,
    broadcast back, median of absolute deviations. Both engines
    interpolate even-count medians as the midpoint of identical
    doubles, so the values agree bit-for-bit before the presentation
    rounding (probed; the round_to form absorbs interpolation ulps)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    med = li.groupBy("l_returnflag").agg(
        F.median("l_extendedprice").alias("med")
    )
    j = li.join(F.broadcast(med), "l_returnflag")
    return (
        j.groupBy("l_returnflag", "med")
        .agg(
            F.median(F.abs(F.col("l_extendedprice") - F.col("med"))).alias(
                "mad"
            ),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            (F.round(F.col("med") * 100) / 100).alias("median_price"),
            (F.round(F.col("mad") * 100) / 100).alias("mad_price"),
            "n",
        )
        .orderBy("l_returnflag")
    )


@register(
    "snapshot_diff_cdc",
    oracle="""
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
),
v2 AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 13 = 0
              THEN round(o_totalprice * 1.1 * 100) / 100
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 97 <> 0
),
diff AS (
  SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS k,
         CASE
           WHEN v1.o_orderkey IS NULL THEN 'inserted'
           WHEN v2.o_orderkey IS NULL THEN 'deleted'
           WHEN v1.o_orderstatus <> v2.o_orderstatus
             OR v1.o_totalprice <> v2.o_totalprice THEN 'changed'
           ELSE 'unchanged'
         END AS change_type
  FROM v1 FULL JOIN v2 ON v1.o_orderkey = v2.o_orderkey
)
SELECT change_type, count(*) AS n,
       CAST(min(k) AS BIGINT) AS min_key, CAST(max(k) AS BIGINT) AS max_key
FROM diff
GROUP BY change_type
ORDER BY change_type
""",
    category="relational",
)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / CDC derivation: classify every key across two
    table versions as inserted / deleted / changed / unchanged with
    one full outer join on the key — how a warehouse derives a change
    feed when the source can't emit one. The second version is derived
    deterministically here (drop keys % 97, bump price on % 13) so
    both engines diff identical snapshots. At scale the join shuffles
    both sides once on the key; bucketed snapshots make it
    zero-exchange (test_bucketing.py's co-location contract)."""
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    v2 = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(
                F.col("o_orderkey") % 13 == 0,
                F.round(F.col("o_totalprice") * 1.1 * 100) / 100,
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    a, b = v1.alias("a"), v2.alias("b")
    j = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full")
    change = (
        F.when(F.col("a.o_orderkey").isNull(), "inserted")
        .when(F.col("b.o_orderkey").isNull(), "deleted")
        .when(
            (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
            | (F.col("a.o_totalprice") != F.col("b.o_totalprice")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        j.select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("k"),
            change.alias("change_type"),
        )
        .groupBy("change_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
        .orderBy("change_type")
    )


@register(
    "equidepth_histogram_broadcast_bounds",
    oracle="""
WITH l AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem
),
b AS (
  SELECT list_value(
    CAST(round(quantile_cont(c, 0.1)) AS BIGINT),
    CAST(round(quantile_cont(c, 0.2)) AS BIGINT),
    CAST(round(quantile_cont(c, 0.3)) AS BIGINT),
    CAST(round(quantile_cont(c, 0.4)) AS BIGINT),
    CAST(round(quantile_cont(c, 0.5)) AS BIGINT),
    CAST(round(quantile_cont(c, 0.6)) AS BIGINT),
    CAST(round(quantile_cont(c, 0.7)) AS BIGINT),
    CAST(round(quantile_cont(c, 0.8)) AS BIGINT),
    CAST(round(quantile_cont(c, 0.9)) AS BIGINT)) AS bounds
  FROM l
)
SELECT CAST(len(list_filter(b.bounds, x -> l.c > x)) AS INT) AS bin,
       count(*) AS n,
       CAST(min(l.c) AS BIGINT) AS lo_cents,
       CAST(max(l.c) AS BIGINT) AS hi_cents
FROM l, b
GROUP BY bin
ORDER BY bin
""",
    category="relational",
)
def equidepth_histogram_broadcast_bounds(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Equi-depth (decile) histogram WITHOUT a global sort: compute the
    9 exact decile boundaries in one aggregation, broadcast them as a
    single array, and bin every row map-side by counting boundaries
    below it. ntile needs a full sort + single ordered pass; this
    two-phase form is the 100 TB shape — one agg + one scan, no
    ordering anywhere. Boundaries are exact integer cents (interpolated
    on integers, rounded back to integers) so bin edges are identical
    across engines; ties go to the lower bin (strict >)."""
    li = load_table(spark, sf_dir, "lineitem")
    c = cents(F.col("l_extendedprice"))
    base = li.select(c.alias("c"))
    bounds = base.agg(
        F.array(
            *[
                F.round(F.percentile("c", i / 10.0)).cast("long")
                for i in range(1, 10)
            ]
        ).alias("bounds")
    )
    return (
        base.crossJoin(F.broadcast(bounds))
        .select(
            F.size(
                F.filter(F.col("bounds"), lambda b: F.col("c") > b)
            ).alias("bin"),
            "c",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.min("c").alias("lo_cents"),
            F.max("c").alias("hi_cents"),
        )
        .orderBy("bin")
    )


@register(
    "topk_orders_with_ties",
    oracle="""
SELECT o_orderpriority, o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents, 
       CAST(rk AS INT) AS rk
FROM (
  SELECT o_orderpriority, o_orderkey,
         o_totalprice,
         dense_rank() OVER (
           PARTITION BY o_orderpriority
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC
         ) AS rk
  FROM orders
)
WHERE rk <= 3
ORDER BY o_orderpriority, rk, o_orderkey
""",
    category="relational",
)
def topk_orders_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH ties per group (dense_rank cut): every order whose
    price reaches the top-3 distinct price levels survives — the
    'WITH TIES' semantics row_number silently breaks (topk_orders is
    the without-ties twin). Ranking runs on exact integer cents so tie
    groups are identical across engines; WindowGroupLimit still
    pre-prunes map-side for dense_rank."""
    orders = load_table(spark, sf_dir, "orders")
    price_c = cents(F.col("o_totalprice"))
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc(price_c))
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            price_c.alias("price_cents"),
            F.dense_rank().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .orderBy("o_orderpriority", "rk", "o_orderkey")
    )


@register(
    "profile_orders_columns",
    oracle="""
WITH s AS (SELECT 'o_orderstatus' AS col, o_orderstatus AS v FROM orders
           UNION ALL
           SELECT 'o_orderpriority', o_orderpriority FROM orders),
counts AS (
  SELECT col, v, count(*) AS n FROM s GROUP BY col, v
),
ranked AS (
  SELECT col, v, n,
         SUM(n) OVER (PARTITION BY col) AS total,
         COUNT(*) OVER (PARTITION BY col) AS n_distinct,
         row_number() OVER (PARTITION BY col ORDER BY n DESC, v) AS rk
  FROM counts
)
SELECT col, CAST(n_distinct AS BIGINT) AS n_distinct,
       v AS top_value,
       round(CAST(n AS DOUBLE) / total * 1000000) / 1000000 AS top_share
FROM ranked WHERE rk = 1
ORDER BY col
""",
    category="relational",
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (data-catalog statistics): distinct count, most
    frequent value, and its share for each profiled column — computed
    over ONE pass by unpivoting the columns into (col, value) rows and
    sharing a single count aggregate. The profile every warehouse
    catalog shows next to a table. Exact counts; share is one rounded
    division."""
    orders = load_table(spark, sf_dir, "orders")
    s = orders.select(
        F.lit("o_orderstatus").alias("col"),
        F.col("o_orderstatus").alias("v"),
    ).unionAll(
        orders.select(
            F.lit("o_orderpriority").alias("col"),
            F.col("o_orderpriority").alias("v"),
        )
    )
    counts = s.groupBy("col", "v").agg(F.count("*").alias("n"))
    w_col = Window.partitionBy("col")
    w_rk = Window.partitionBy("col").orderBy(F.desc("n"), "v")
    return (
        counts.withColumn("total", F.sum("n").over(w_col))
        .withColumn("n_distinct", F.count("*").over(w_col))
        .withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") == 1)
        .select(
            "col",
            "n_distinct",
            F.col("v").alias("top_value"),
            (F.round(F.col("n").cast("double") / F.col("total") * 1000000) / 1000000).alias(
                "top_share"
            ),
        )
        .orderBy("col")
    )


@register(
    "sketch_rolling_distinct_3d",
    bench=True,
    oracle="""
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM du)
SELECT CAST(d.day AS VARCHAR) AS day,
       CAST(count(DISTINCT u.user_id) AS BIGINT) AS exact_rolling_users,
       TRUE AS within_5pct
FROM days d JOIN du u
  ON u.day BETWEEN d.day - 2 AND d.day
GROUP BY d.day
ORDER BY day
""",
    category="relational",
)
def sketch_rolling_distinct_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-day distinct users via MERGEABLE daily HLL sketches —
    the scale answer to COUNT(DISTINCT) OVER a sliding window, which
    engines cannot compute incrementally (distinct does not subtract).
    One sketch per day (a few KB), each rolling window unions 3
    sketches off the tiny daily table instead of re-deduplicating the
    window's raw events; the same daily sketches serve 7-day or
    30-day windows for free. Hash-checked output is the exact count
    (computed independently) plus the sketch-accuracy invariant, the
    sketch_hll_mergeable doctrine."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily_sk = ev.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    days = daily_sk.select(F.col("day").alias("d"))
    rolled = (
        days.join(
            daily_sk,
            (F.col("day") >= F.date_sub(F.col("d"), 2))
            & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    exact = (
        days.join(
            ev.distinct(),
            (F.col("day") >= F.date_sub(F.col("d"), 2))
            & (F.col("day") <= F.col("d")),
        )
        .select("d", "user_id")
        .distinct()
        .groupBy("d")
        .agg(F.count("*").alias("exact_rolling_users"))
    )
    ok = (
        F.abs(F.col("est") - F.col("exact_rolling_users")).cast("double")
        / F.col("exact_rolling_users")
        <= 0.05
    )
    return (
        rolled.join(exact, "d")
        .select(
            F.col("d").cast("string").alias("day"),
            "exact_rolling_users",
            ok.alias("within_5pct"),
        )
        .orderBy("day")
    )


@register(
    "sketch_cms_heavy_hitters",
    bench=True,
    oracle="""
WITH rows_ AS (SELECT CAST(unnest(range(4)) AS VARCHAR) AS r),
cells AS (
  SELECT r,
         ('0x' || substr(md5(r || ':' || CAST(user_id AS VARCHAR)), 1, 12))
           ::BIGINT % 256 AS c,
         count(*) AS cnt
  FROM events CROSS JOIN rows_
  GROUP BY 1, 2
),
exact AS (SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY 1),
top10 AS (SELECT * FROM exact ORDER BY exact_cnt DESC, user_id LIMIT 10),
est AS (
  SELECT t.user_id, t.exact_cnt, min(cl.cnt) AS cms_est
  FROM top10 t
  CROSS JOIN rows_ rr
  JOIN cells cl
    ON cl.r = rr.r
   AND cl.c = ('0x' || substr(md5(rr.r || ':' || CAST(t.user_id AS VARCHAR)),
                              1, 12))::BIGINT % 256
  GROUP BY t.user_id, t.exact_cnt
)
SELECT user_id, exact_cnt, cms_est, cms_est - exact_cnt AS overcount
FROM est ORDER BY exact_cnt DESC, user_id
""",
    category="relational",
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan '05): d=4 rows x w=256
    counters built in ONE map-side-combinable pass (groupBy (row, col)
    -> at most 1024 cells regardless of input size), then point
    estimates for the top-10 keys = min over rows of the hashed cell.
    The md5-affine cell hash is engine-portable, so DuckDB rebuilds the
    identical sketch and the estimates hash-match exactly — including
    the overcount column (CMS guarantees est >= exact; equality breaks
    only by collision, which w=256 forces at this key cardinality so
    the one-sided-error property is actually exercised). At 100 TB the
    sketch is the mergeable 4x256 grid — partial-aggregated on every
    executor, merged by cell sum, never reshuffling raw keys; real
    deployments size w ~ e/eps for the wanted error, the doctrine of
    sketch_hll_mergeable."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    d, w = 4, 256
    rows_ = F.array(*[F.lit(str(i)) for i in range(d)])

    def cell(r_col, user_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.encode(
                            F.concat(r_col, F.lit(":"), user_col.cast("string")),
                            "UTF-8",
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            % w
        )

    cells = (
        ev.select("user_id", F.explode(rows_).alias("r"))
        .groupBy("r", cell(F.col("r"), F.col("user_id")).alias("c"))
        .agg(F.count("*").alias("cnt"))
    )
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_cnt"))
    top10 = exact.orderBy(F.col("exact_cnt").desc(), "user_id").limit(10)
    probes = top10.select(
        "user_id", "exact_cnt", F.explode(rows_).alias("r")
    ).withColumn("c", cell(F.col("r"), F.col("user_id")))
    est = (
        probes.join(F.broadcast(cells), ["r", "c"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        "user_id",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    ).orderBy(F.col("exact_cnt").desc(), "user_id")


@register(
    "skew_key_diagnostics_lineitem",
    oracle="""
WITH kc AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(max(c) AS BIGINT) AS max_rows_per_key,
       round(CAST(quantile_cont(c, 0.5) AS DOUBLE) * 100) / 100 AS p50,
       round(CAST(quantile_cont(c, 0.9) AS DOUBLE) * 100) / 100 AS p90,
       round(CAST(quantile_cont(c, 0.99) AS DOUBLE) * 100) / 100 AS p99,
       round(CAST(max(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) * 1000000)
         / 1000000 AS top_key_share
FROM kc
""",
    category="relational",
)
def skew_key_diagnostics_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key skew diagnostics — the pre-flight a 100 TB
    pipeline runs BEFORE choosing salted-vs-plain aggregation (the
    skew_salted_* operators above are the remedies; this is the
    detector). One count-by-key pass, then scalar stats over the
    (much smaller) key-count table: key cardinality, exact interpolated
    p50/p90/p99 of rows-per-key, and the hottest key's share of all
    rows — the number that says whether one task will own the shuffle
    tail. The exact percentile gathers the key-count table into one
    reducer — fine up to ~1e8 keys; beyond that swap F.percentile for
    approx_percentile (GK, mergeable) and keep the rest unchanged."""
    li = load_table(spark, sf_dir, "lineitem")
    kc = li.groupBy("l_orderkey").agg(F.count("*").alias("c"))
    return kc.agg(
        F.count("*").alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_rows_per_key"),
        (F.round(F.percentile("c", 0.5) * 100) / 100).alias("p50"),
        (F.round(F.percentile("c", 0.9) * 100) / 100).alias("p90"),
        (F.round(F.percentile("c", 0.99) * 100) / 100).alias("p99"),
        (
            F.round(
                F.max("c").cast("double") / F.sum("c").cast("double") * 1000000
            )
            / 1000000
        ).alias("top_key_share"),
    )


@register(
    "sketch_hll_intersection_pairs",
    oracle="""
WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM (SELECT DISTINCT event_type FROM u) a
  JOIN (SELECT DISTINCT event_type FROM u) b ON a.event_type < b.event_type
),
ex AS (
  SELECT p.type_a, p.type_b,
         CAST((SELECT count(*) FROM u x JOIN u y
               ON x.user_id = y.user_id
              AND x.event_type = p.type_a AND y.event_type = p.type_b)
           AS BIGINT) AS exact_common
  FROM pairs p
)
SELECT type_a, type_b, exact_common, TRUE AS within_bound
FROM ex ORDER BY type_a, type_b
""",
    category="relational",
)
def sketch_hll_intersection_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch ALGEBRA: intersection cardinality of user sets per
    event-type pair via inclusion-exclusion over mergeable sketches
    (|A∩B| = est(A) + est(B) − est(A∪B)) — the query you can answer
    from STORED per-type sketches alone, no second pass over raw data.
    Inclusion–exclusion amplifies HLL error relative to small
    intersections, so the hash-checked invariant bounds the absolute
    error against the union size (3x the ~1.6 % rsd of lgConfigK=12),
    alongside the exact intersection both engines compute
    independently."""
    u = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    sk = u.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count("*").alias("exact_n"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("exact_n").alias("n_a"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("exact_n").alias("n_b"),
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    est = (
        F.hll_sketch_estimate("sk_a")
        + F.hll_sketch_estimate("sk_b")
        - F.hll_sketch_estimate(
            F.hll_union("sk_a", "sk_b")
        )
    )
    ua = u.select(F.col("event_type").alias("type_a"), "user_id")
    ub = u.select(F.col("event_type").alias("type_b"), "user_id")
    exact = (
        ua.join(ub, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("exact_common"))
    )
    union_sz = F.col("n_a") + F.col("n_b") - F.col("exact_common")
    ok = F.abs(est - F.col("exact_common")) <= 0.05 * union_sz
    return (
        pairs.join(exact, ["type_a", "type_b"])
        .select("type_a", "type_b", "exact_common", ok.alias("within_bound"))
        .orderBy("type_a", "type_b")
    )


@register(
    "secondary_sort_first_last_delta",
    bench=True,
    oracle="""
WITH e AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS cnt
  FROM events
)
SELECT user_id, CAST(max(cnt) AS BIGINT) AS n,
       max(CASE WHEN rn = 1 THEN value END) AS first_value,
       max(CASE WHEN rn = cnt THEN value END) AS last_value,
       round((max(CASE WHEN rn = cnt THEN value END)
              - max(CASE WHEN rn = 1 THEN value END)) * 1000000) / 1000000
         AS delta
FROM e GROUP BY user_id ORDER BY user_id
""",
    category="relational",
)
def secondary_sort_first_last_delta(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """repartitionAndSortWithinPartitions parity (reference
    OrderedRDDFunctions.scala — THE RDD idiom for secondary sort):
    repartition by user, sort each partition by (user, ts, event_id),
    then a single O(n) streaming pass per partition (mapInPandas with
    run carry-over across Arrow batches) computes first/last/count per
    user without any window function — the merge-run shape used for
    sorted-log processing where per-key state must stay O(1). One
    shuffle (the repartition); sortWithinPartitions is a partition-
    local sort, not an exchange. The oracle computes the same result
    relationally (arg_min/arg_max over the (ts, event_id) order)."""
    import pandas as pd

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
    )

    def scan(batches):
        cur = None  # [user_id, n, first_value, last_value]
        out_rows: list[list] = []
        for pdf in batches:
            for uid, n, first_v, last_v in zip(
                pdf["user_id"], pdf["n"], pdf["first"], pdf["last"]
            ):
                if cur is not None and cur[0] == uid:
                    cur[1] += n
                    cur[3] = last_v  # sorted: later batch extends the run
                else:
                    if cur is not None:
                        out_rows.append(cur)
                    cur = [uid, n, first_v, last_v]
        if cur is not None:
            out_rows.append(cur)
        yield pd.DataFrame(
            out_rows, columns=["user_id", "n", "first_value", "last_value"]
        )

    def pre_agg(batches):
        # collapse each Arrow batch to one run-summary row per user
        # (rows within a batch are already sorted): tiny pandas frames
        # flow into `scan`, so the Python-side loop touches runs, not rows
        for pdf in batches:
            if len(pdf) == 0:
                continue
            grp = pdf.groupby("user_id", sort=False)
            yield pd.DataFrame(
                {
                    "user_id": grp["user_id"].first(),
                    "n": grp["value"].size(),
                    "first": grp["value"].first(),
                    "last": grp["value"].last(),
                }
            )

    runs = ev.mapInPandas(
        pre_agg, "user_id long, n long, first double, last double"
    )
    final = runs.mapInPandas(
        scan, "user_id long, n long, first_value double, last_value double"
    )
    return final.select(
        "user_id",
        "n",
        "first_value",
        "last_value",
        (
            F.round((F.col("last_value") - F.col("first_value")) * 1000000)
            / 1000000
        ).alias("delta"),
    ).orderBy("user_id")


@register(
    "ks_statistic_sources",
    oracle="""
WITH s1 AS (SELECT n_chars AS v FROM documents WHERE source = 'src0'),
s2 AS (SELECT n_chars AS v FROM documents WHERE source = 'src1'),
n AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
         (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2
),
pts AS (
  SELECT v, CAST(count(*) FILTER (WHERE src = 1) AS BIGINT) AS c1,
         CAST(count(*) FILTER (WHERE src = 2) AS BIGINT) AS c2
  FROM (SELECT v, 1 AS src FROM s1 UNION ALL SELECT v, 2 FROM s2)
  GROUP BY v
),
cum AS (
  SELECT v,
         SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f1,
         SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f2
  FROM pts
),
d AS (
  SELECT v, abs(CAST(f1 AS BIGINT) * n.n2 - CAST(f2 AS BIGINT) * n.n1)
           AS num
  FROM cum CROSS JOIN n
),
best AS (
  SELECT num AS mnum, v AS at_v FROM (
    SELECT num, v, row_number() OVER (ORDER BY num DESC, v ASC) AS rn FROM d
  ) WHERE rn = 1
)
SELECT n.n1, n.n2,
       round(CAST(best.mnum AS DOUBLE) / CAST(n.n1 * n.n2 AS DOUBLE)
             * 1000000) / 1000000 AS ks,
       best.at_v AS at_value
FROM best CROSS JOIN n
""",
    category="relational",
)
def ks_statistic_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between src0's and
    src1's document-length distributions — the continuous-variable
    drift test beside token_drift_tv_distance's categorical one.
    KS = max_x |F1(x) − F2(x)| evaluated over observed points via ONE
    merged cumulative window: the supremum's numerator |F1·n2 − F2·n1|
    stays exact int64 (counts only; the division by n1·n2 happens once
    at the end), so both engines agree bit-for-bit including the argmax
    location (ties broken to the smallest value). Scale shape: a
    value-grain pre-aggregation collapses the corpus before the sort —
    the cumulative sums run over DISTINCT lengths, 2-passed over value
    buckets (grank.with_grouped_cumsum) so even a huge observed-value
    domain never funnels through one task."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.filter(F.col("source").isin("src0", "src1")).select(
        F.col("n_chars").alias("v"),
        F.when(F.col("source") == "src0", 1).otherwise(2).alias("src"),
    )
    pts = s.groupBy("v").agg(
        F.sum(F.when(F.col("src") == 1, 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("src") == 2, 1).otherwise(0)).cast("long").alias("c2"),
    )
    totals = pts.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    cum = with_grouped_cumsum(
        pts, [], F.col("v"), ["v"], ["c1", "c2"]
    ).select(
        "v",
        F.col("_cum_c1").alias("f1"),
        F.col("_cum_c2").alias("f2"),
    )
    d = cum.crossJoin(F.broadcast(totals)).select(
        "v",
        "n1",
        "n2",
        F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")).alias("num"),
    )
    best = d.groupBy("n1", "n2").agg(
        F.max("num").alias("mnum"),
        F.min(F.struct((-F.col("num")).alias("nn"), F.col("v").alias("v")))[
            "v"
        ].alias("at_value"),
    )
    return best.select(
        "n1",
        "n2",
        (
            F.round(
                F.col("mnum").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double")
                * 1000000
            )
            / 1000000
        ).alias("ks"),
        "at_value",
    )


@register(
    "mann_whitney_u_sources",
    oracle="""
WITH pts AS (
  SELECT n_chars AS v,
         CAST(count(*) FILTER (WHERE source = 'src0') AS BIGINT) AS c1,
         CAST(count(*) FILTER (WHERE source = 'src1') AS BIGINT) AS c2
  FROM documents WHERE source IN ('src0', 'src1')
  GROUP BY n_chars
),
cum AS (
  SELECT v, c1, c2,
         CAST(SUM(c1 + c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              - (c1 + c2) AS BIGINT) AS before_all
  FROM pts
),
agg AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
         CAST(SUM(c1 * (2 * before_all + (c1 + c2) + 1)) AS BIGINT) AS r1x2
  FROM cum
)
SELECT n1, n2,
       r1x2 - n1 * (n1 + 1) AS u1_doubled,
       round(CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE)
             / CAST(2 * n1 * n2 AS DOUBLE) * 1000000) / 1000000 AS auc
FROM agg
""",
    category="relational",
)
def mann_whitney_u_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test statistic between src0's and
    src1's document-length distributions — the nonparametric
    location-shift companion to ks_statistic_sources' shape test, and
    (as AUC = U/(n1·n2)) the probability a random src0 doc is longer
    than a random src1 doc. Tie-corrected midranks make rank sums
    half-integers, so the DOUBLED rank sum stays exact int64
    end-to-end: 2·R1 = Σ_v c1(v)·(2·before(v) + ties(v) + 1) over the
    value-grain count table (one cumulative window over DISTINCT
    lengths — the bounded domain, not documents), and U appears as
    u1_doubled with the single closing division producing the AUC.
    Zero floating point until the final presentation ratio. The
    cumulative window is 2-passed over value buckets
    (grank.with_grouped_cumsum) — no single-task sort at any domain
    size."""
    docs = load_table(spark, sf_dir, "documents")
    pts = (
        docs.filter(F.col("source").isin("src0", "src1"))
        .groupBy(F.col("n_chars").alias("v"))
        .agg(
            F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
            .cast("long")
            .alias("c1"),
            F.sum(F.when(F.col("source") == "src1", 1).otherwise(0))
            .cast("long")
            .alias("c2"),
        )
    )
    both = pts.withColumn("ct", F.col("c1") + F.col("c2"))
    cum = with_grouped_cumsum(both, [], F.col("v"), ["v"], "ct").select(
        "c1",
        "c2",
        (F.col("_cum") - F.col("ct")).alias("before_all"),
    )
    agg = cum.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(
            F.col("c1")
            * (2 * F.col("before_all") + (F.col("c1") + F.col("c2")) + 1)
        ).alias("r1x2"),
    )
    u1_doubled = F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)
    return agg.select(
        "n1",
        "n2",
        u1_doubled.alias("u1_doubled"),
        (
            F.round(
                u1_doubled.cast("double")
                / (F.lit(2) * F.col("n1") * F.col("n2")).cast("double")
                * 1000000
            )
            / 1000000
        ).alias("auc"),
    )


@register(
    "benford_first_digit_audit",
    oracle="""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders WHERE o_totalprice > 0
),
c AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit
),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
SELECT c.digit, c.n,
       round(CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE) * 1000000)
         / 1000000 AS observed_freq
FROM c CROSS JOIN t ORDER BY c.digit
""",
    category="relational",
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit distribution of order amounts —
    the classic fabricated-data / fraud screen (natural multiplicative
    amounts follow log10(1+1/d); uniform synthetic prices do NOT, and
    the audit shows exactly that). Digit extraction runs on the exact
    integer-cents string (leading digit of cents == leading significant
    digit of the amount for positive 2-decimal money), so grouping is
    pure integer work and the only float is the final frequency ratio
    of exact counts. One map-side-combinable digit aggregation —
    9-row result at any scale."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 0
    )
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
    ).cast("int")
    c = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    t = c.agg(F.sum("n").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            (
                F.round(
                    F.col("n").cast("double") / F.col("total").cast("double")
                    * 1000000
                )
                / 1000000
            ).alias("observed_freq"),
        )
        .orderBy("digit")
    )


@register(
    "pareto_concentration_customers",
    oracle="""
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents DESC, o_custkey) AS rk,
         CAST(count(*) OVER () AS BIGINT) AS n,
         CAST(SUM(cents) OVER () AS BIGINT) AS total,
         CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM rev
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(max(CASE WHEN rk * 5 <= n THEN cum END) AS BIGINT)
         AS top20pct_cents,
       CAST(max(total) AS BIGINT) AS total_cents,
       round(CAST(max(CASE WHEN rk * 5 <= n THEN cum END) AS DOUBLE)
             / CAST(max(total) AS DOUBLE) * 1000000) / 1000000
         AS top20pct_share
FROM ranked GROUP BY n
""",
    category="relational",
)
def pareto_concentration_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) revenue concentration: the share of total order
    value contributed by the top 20% of customers — the concentration
    readout behind account prioritization and the skew intuition the
    skew_* operators quantify mechanically. Customers rank by exact
    cents (deterministic custkey tie-break); the top-20% cut is the
    largest rank with rk*5 <= n (pure integer predicate — no float
    percent threshold to disagree on), and the share divides exact
    int64 sums. The ranking runs over the customer-grain aggregate via
    the 2-pass broadcast-bounds global rank (grank.py) — descending
    order expressed as the negated key — so no single task ever sorts
    the whole customer grain; the running sum adds the same longs in
    the same order as the global-window form (bit-identical), and the
    plan is pinned in test_plans.py."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    ranked = with_global_rank(
        rev, -F.col("cents"), ["o_custkey"], value="cents"
    ).select(
        "cents",
        F.col("_rk").alias("rk"),
        F.col("_n_tot").alias("n"),
        F.col("_s_tot").alias("total"),
        F.col("_cum").alias("cum"),
    )
    top = F.max(F.when(F.col("rk") * 5 <= F.col("n"), F.col("cum")))
    return ranked.groupBy("n").agg(
        top.alias("top20pct_cents"),
        F.max("total").alias("total_cents"),
        (
            F.round(
                top.cast("double") / F.max("total").cast("double") * 1000000
            )
            / 1000000
        ).alias("top20pct_share"),
    ).select(
        F.col("n").alias("n_customers"),
        "top20pct_cents",
        "total_cents",
        "top20pct_share",
    )


@register(
    "gini_customer_revenue",
    oracle="""
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT cents,
         CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS rk,
         CAST(count(*) OVER () AS BIGINT) AS n,
         CAST(SUM(cents) OVER () AS BIGINT) AS total
  FROM rev
)
SELECT CAST(max(n) AS BIGINT) AS n_customers,
       round((2.0 * CAST(SUM(rk * cents) AS DOUBLE)
              / (CAST(max(n) AS DOUBLE) * CAST(max(total) AS DOUBLE))
              - (CAST(max(n) AS DOUBLE) + 1) / CAST(max(n) AS DOUBLE))
             * 1000000) / 1000000 AS gini
FROM ranked
""",
    category="relational",
)
def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue — the scalar inequality
    measure completing the concentration pair with the Pareto 80/20
    share: G = 2·Σ(rank·x)/(n·Σx) − (n+1)/n over ascending exact-cents
    ranks (custkey tie-break). Σ(rank·x) stays exact int64 (rank ≤ n,
    x in cents — headroom to ~1e5 customers × 1e9 cents; promote to
    DECIMAL beyond), and the closing expression is assembled from
    exact integers in identical op order. Ranks come from the 2-pass
    broadcast-bounds global rank (grank.py) — no unpartitioned window
    over the customer grain; pinned in test_plans.py."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    ranked = with_global_rank(
        rev, F.col("cents"), ["o_custkey"], value="cents"
    ).select(
        "cents",
        F.col("_rk").alias("rk"),
        F.col("_n_tot").alias("n"),
        F.col("_s_tot").alias("total"),
    )
    n_d = F.max("n").cast("double")
    gini = (
        F.lit(2.0)
        * F.sum(F.col("rk") * F.col("cents")).cast("double")
        / (n_d * F.max("total").cast("double"))
        - (n_d + 1) / n_d
    )
    return ranked.agg(
        F.max("n").alias("n_customers"),
        (F.round(gini * 1000000) / 1000000).alias("gini"),
    )


@register(
    "ship_latency_by_priority",
    oracle="""
WITH lat AS (
  SELECT o.o_orderpriority,
         CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS BIGINT) AS days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
       round(CAST(quantile_cont(days, 0.5) AS DOUBLE) * 100) / 100 AS p50_days,
       round(CAST(quantile_cont(days, 0.9) AS DOUBLE) * 100) / 100 AS p90_days,
       CAST(max(days) AS BIGINT) AS max_days
FROM lat GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    category="relational",
)
def ship_latency_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per order priority — the
    supply-chain SLA readout (does '1-URGENT' actually ship faster?).
    Day deltas are exact integers (datediff on the date grain), so the
    interpolated percentiles follow the percentiles_exact doctrine;
    one fact-fact equi-join on the order key (bucketable to
    zero-exchange) and a 5-group rollup."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship_d")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("ord_d")
    )
    lat = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff("ship_d", "ord_d").cast("long").alias("days"),
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            (F.round(F.percentile("days", 0.5) * 100) / 100).alias("p50_days"),
            (F.round(F.percentile("days", 0.9) * 100) / 100).alias("p90_days"),
            F.max("days").alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "arpu_decomposition_by_nation",
    oracle="""
WITH c AS (
  SELECT n.n_name AS nation, c.c_custkey
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
),
o AS (
  SELECT c.nation, c.c_custkey,
         CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
         CAST(COALESCE(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
              AS BIGINT) AS cents
  FROM c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.nation, c.c_custkey
),
agg AS (
  SELECT nation, CAST(count(*) AS BIGINT) AS customers,
         CAST(SUM(CASE WHEN n_orders > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS buyers,
         CAST(SUM(n_orders) AS BIGINT) AS orders,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM o GROUP BY nation
)
SELECT nation, customers, buyers, orders,
       round(CAST(buyers AS DOUBLE) / CAST(customers AS DOUBLE) * 1000000)
         / 1000000 AS conversion,
       CASE WHEN orders = 0 THEN NULL
            ELSE round(CAST(cents AS DOUBLE) / CAST(orders AS DOUBLE) / 100
                 * 1000000) / 1000000 END AS aov,
       round(CAST(cents AS DOUBLE) / CAST(customers AS DOUBLE) / 100
             * 1000000) / 1000000 AS arpu
FROM agg ORDER BY nation
""",
    category="relational",
)
def arpu_decomposition_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARPU decomposition per nation: ARPU = conversion x orders-per-
    buyer x AOV, reported as (customers, buyers, orders, conversion,
    AOV, ARPU) — the growth-accounting identity product teams track,
    with zero-order customers retained through the LEFT join so
    conversion has the true denominator. Every ratio divides exact
    int64 counts/cents in identical op order; the customer-grain
    pre-agg keeps the nation rollup bounded."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            "n_nationkey", F.col("n_name").alias("nation")
        )
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    per_cust = (
        cust.join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("nation", "c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum("cents"), F.lit(0)).alias("cents"),
        )
    )
    agg = per_cust.groupBy("nation").agg(
        F.count("*").alias("customers"),
        F.sum(F.when(F.col("n_orders") > 0, 1).otherwise(0))
        .cast("long")
        .alias("buyers"),
        F.sum("n_orders").alias("orders"),
        F.sum("cents").alias("cents"),
    )
    r6 = lambda c: F.round(c * 1000000) / 1000000  # noqa: E731
    return agg.select(
        "nation",
        "customers",
        "buyers",
        "orders",
        r6(F.col("buyers").cast("double") / F.col("customers").cast("double")).alias(
            "conversion"
        ),
        F.when(F.col("orders") == 0, F.lit(None).cast("double"))
        .otherwise(
            r6(F.col("cents").cast("double") / F.col("orders").cast("double") / 100)
        )
        .alias("aov"),
        r6(
            F.col("cents").cast("double") / F.col("customers").cast("double") / 100
        ).alias("arpu"),
    ).orderBy("nation")


@register(
    "sketch_theta_fixed_distinct",
    oracle="""
WITH h AS (
  SELECT DISTINCT event_type, user_id,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 10))::BIGINT AS hv
  FROM events
),
ret AS (  -- fixed threshold theta = 2^38 / 2^40 = 1/4 of hash space
  SELECT event_type, hv FROM h WHERE hv < 274877906944
),
per AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_retained
  FROM ret GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM (SELECT DISTINCT event_type FROM per) a
  JOIN (SELECT DISTINCT event_type FROM per) b
    ON a.event_type < b.event_type
),
inter AS (
  SELECT p.type_a, p.type_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM pairs p
  JOIN ret ra ON ra.event_type = p.type_a
  JOIN ret rb ON rb.event_type = p.type_b AND rb.hv = ra.hv
  GROUP BY p.type_a, p.type_b
),
ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_d
  FROM events GROUP BY event_type
)
SELECT p.type_a AS type_a, p.type_b AS type_b,
       pa.n_retained AS retained_a, pb.n_retained AS retained_b,
       coalesce(i.n_inter, 0) AS retained_inter,
       CAST(pa.n_retained * 4 AS BIGINT) AS est_distinct_a,
       CAST(pb.n_retained * 4 AS BIGINT) AS est_distinct_b,
       CAST(coalesce(i.n_inter, 0) * 4 AS BIGINT) AS est_intersection,
       ea.exact_d AS exact_a, eb.exact_d AS exact_b
FROM pairs p
JOIN per pa ON pa.event_type = p.type_a
JOIN per pb ON pb.event_type = p.type_b
LEFT JOIN inter i ON i.type_a = p.type_a AND i.type_b = p.type_b
JOIN ex ea ON ea.event_type = p.type_a
JOIN ex eb ON eb.event_type = p.type_b
ORDER BY 1, 2
""",
    category="relational",
    tags=("defer-window",),
)
def sketch_theta_fixed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch distinct counting with a FIXED sampling threshold
    (the theta = const special case of the KMV/theta family —
    Dasgupta et al., "Theta Sketch Framework"): retain a user hash iff
    it falls in the first 1/4 of the 40-bit hash space, estimate
    |set| = 4 x |retained|. What HLL cannot do and theta can:
    INTERSECTION estimates by literally intersecting retained sets
    (HLL only unions; sketch_hll_intersection_pairs had to route
    through inclusion-exclusion) — and because the threshold is a
    deterministic row property, the whole sketch is exactly
    reproducible in SQL, estimates included (integer x4, no floats
    anywhere). Scale shape: the retained sets are 4x-compressed
    before any shuffle, the pairwise intersection joins on (hash)
    within retained data only, and sketches merge by union — the
    mergeability contract rollup_hourly_to_daily_mergeable pins for
    counters, here for distinct sets. Exact per-type distincts ride
    along to exhibit the estimation error in-row."""
    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.select("event_type", "user_id")
        .distinct()
        .withColumn(
            "hv",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 10),
                16,
                10,
            ).cast("long"),
        )
    )
    theta = 1 << 38  # 1/4 of the 2^40 hash space
    ret = h.filter(F.col("hv") < theta).select("event_type", "hv")
    per = ret.groupBy("event_type").agg(F.count("*").alias("n_retained"))
    types = per.select("event_type").distinct()
    a = types.select(F.col("event_type").alias("type_a"))
    b = types.select(F.col("event_type").alias("type_b"))
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    # pairwise intersections come from ONE hv-keyed self-join of the
    # retained sets (all pairs fall out of the same shuffle), not a
    # per-pair re-scan of the retained table
    ra = ret.select(F.col("event_type").alias("type_a"), "hv")
    rb = ret.select(
        F.col("event_type").alias("type_b"), F.col("hv").alias("hvb")
    )
    inter = (
        ra.join(
            rb,
            (F.col("hv") == F.col("hvb"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_inter"))
    )
    ex = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_d"))
    )
    pa = per.select(
        F.col("event_type").alias("type_a"),
        F.col("n_retained").alias("retained_a"),
    )
    pb = per.select(
        F.col("event_type").alias("type_b"),
        F.col("n_retained").alias("retained_b"),
    )
    ea = ex.select(
        F.col("event_type").alias("type_a"), F.col("exact_d").alias("exact_a")
    )
    eb = ex.select(
        F.col("event_type").alias("type_b"), F.col("exact_d").alias("exact_b")
    )
    return (
        pairs.join(F.broadcast(pa), "type_a")
        .join(F.broadcast(pb), "type_b")
        .join(inter, ["type_a", "type_b"], "left")
        .join(F.broadcast(ea), "type_a")
        .join(F.broadcast(eb), "type_b")
        .select(
            "type_a",
            "type_b",
            "retained_a",
            "retained_b",
            F.coalesce(F.col("n_inter"), F.lit(0)).alias("retained_inter"),
            (F.col("retained_a") * 4).cast("long").alias("est_distinct_a"),
            (F.col("retained_b") * 4).cast("long").alias("est_distinct_b"),
            (F.coalesce(F.col("n_inter"), F.lit(0)) * 4)
            .cast("long")
            .alias("est_intersection"),
            "exact_a",
            "exact_b",
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "join_cardinality_estimate",
    oracle="""
WITH co AS (
  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY o_custkey
),
cc AS (
  SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS c
  FROM customer GROUP BY c_custkey
),
exact AS (
  SELECT CAST(sum(co.c * cc.c) AS BIGINT) AS exact_rows
  FROM co JOIN cc ON cc.k = co.k
),
ho AS (
  SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT % 256
             AS b,
         CAST(sum(c) AS BIGINT) AS c
  FROM co GROUP BY 1
),
hc AS (
  SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT % 256
             AS b,
         CAST(sum(c) AS BIGINT) AS c
  FROM cc GROUP BY 1
),
est AS (
  SELECT CAST(sum(ho.c * hc.c) AS BIGINT) AS est_rows
  FROM ho JOIN hc ON hc.b = ho.b
)
SELECT exact_rows, est_rows,
       CAST(est_rows AS DOUBLE) / exact_rows AS overestimate_ratio
FROM exact, est
""",
    category="relational",
    tags=("defer-window",),
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-SIZE ESTIMATION from mergeable key histograms — the
    statistic a cost-based optimizer consults before picking a join
    strategy, computed as its own operator: the exact join cardinality
    |orders JOIN customer ON custkey| = sum over keys of c1(k)*c2(k),
    versus the 256-bucket hashed-histogram estimate sum over buckets
    of C1(b)*C2(b) (an upper bound — cross terms inside a bucket
    collide). Both are pure int64 sums; the overestimate ratio is one
    double division. At 100 TB the histograms are 256-row mergeable
    summaries a planner keeps per table/column — the whole estimate
    costs two tiny aggregations and a 256-row join, no fact data
    moves; the exact side here exists only to exhibit the error."""
    co = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("c"))
    )
    cc = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_custkey").alias("k"))
        .agg(F.count("*").alias("c"))
    )
    exact = (
        co.join(cc.withColumnsRenamed({"k": "k2", "c": "c2"}), F.col("k") == F.col("k2"))
        .agg(F.sum(F.col("c") * F.col("c2")).alias("exact_rows"))
    )

    def hist(df):
        return df.groupBy(
            (
                F.conv(
                    F.substring(F.md5(F.col("k").cast("string")), 1, 8), 16, 10
                ).cast("long")
                % 256
            ).alias("b")
        ).agg(F.sum("c").alias("c"))

    ho, hc = hist(co), hist(cc)
    est = (
        ho.join(hc.withColumnsRenamed({"b": "b2", "c": "c2"}), F.col("b") == F.col("b2"))
        .agg(F.sum(F.col("c") * F.col("c2")).alias("est_rows"))
    )
    return exact.crossJoin(est).select(
        "exact_rows",
        "est_rows",
        (
            F.col("est_rows").cast("double") / F.col("exact_rows")
        ).alias("overestimate_ratio"),
    )


@register(
    "cusum_changepoint_daily",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(x) AS BIGINT) AS tx
  FROM daily GROUP BY event_type
),
dev AS (
  SELECT d.event_type, d.d,
         SUM(d.x * t.nd - t.tx) OVER (PARTITION BY d.event_type
                                      ORDER BY d.d) AS cum
  FROM daily d JOIN tot t ON t.event_type = d.event_type
),
s AS (
  SELECT event_type, d, cum,
         cum - least(min(cum) OVER (PARTITION BY event_type ORDER BY d), 0)
             AS cusum
  FROM dev
),
best AS (
  SELECT event_type, d, cusum,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cusum DESC, d) AS rn
  FROM s
)
SELECT b.event_type, b.d AS changepoint_day,
       CAST(b.cusum AS BIGINT) AS max_cusum_scaled,
       t.nd AS n_days
FROM best b JOIN tot t ON t.event_type = b.event_type
WHERE b.rn = 1 ORDER BY b.event_type
""",
    category="events",
    tags=("defer-window",),
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily event volumes: per type,
    the day maximizing the one-sided CUSUM statistic
    S_t = max(0, S_{t-1} + (x_t - mean)) — the classic recursive form,
    re-expressed WINDOW-ALGEBRAICALLY as
    S_t = cum_t - min_{0<=j<=t}(cum_j) of mean-centered deviations —
    the prefix-min identity INCLUDING the empty prefix cum_0 = 0
    (via least(min, 0)), which the recursion's max(0, .) floor
    requires — because the recursion itself is not expressible in one
    window pass. EXACT integers throughout: the
    mean is kept rational by scaling deviations to x_t*N - total (no
    float mean), so the argmax day can never flip on a rounding
    boundary. All windows run over the per-(type, day) AGGREGATE
    (days x types rows), never raw events — at 100 TB the raw pass is
    one count shuffle and the CUSUM machinery is a few thousand
    aggregate rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count("*").alias("x"))
    tot = daily.groupBy("event_type").agg(
        F.count("*").alias("nd"), F.sum("x").alias("tx")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    dev = daily.join(F.broadcast(tot), "event_type").withColumn(
        "cum",
        F.sum(F.col("x") * F.col("nd") - F.col("tx")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # least(…, 0) folds the EMPTY prefix cum_0 = 0 into the prefix min:
    # without it, a series whose every prefix sum is positive would
    # undershoot the true one-sided CUSUM max(0, S_{t-1} + dev) and
    # could flip the argmax day (ADVICE round 8 — fixed identically in
    # the oracle, parity preserved).
    s = dev.withColumn(
        "cusum",
        F.col("cum")
        - F.least(
            F.min("cum").over(w.rowsBetween(Window.unboundedPreceding, 0)),
            F.lit(0).cast("long"),
        ),
    )
    best = s.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.desc("cusum"), "d")
        ),
    ).filter(F.col("rn") == 1)
    return best.select(
        "event_type",
        F.col("d").alias("changepoint_day"),
        F.col("cusum").cast("long").alias("max_cusum_scaled"),
        F.col("nd").alias("n_days"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# round-9 additions: exact distribution profiling (histograms, buckets,
# robust outliers, systematic sampling)
# ---------------------------------------------------------------------------


@register(
    "histogram_equi_width_prices",
    oracle="""
WITH v AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
),
mm AS (
  SELECT min(c) AS mn, max(c) AS mx, count(*) AS n FROM v
)
SELECT CAST(((c - mn) * 20) // (mx - mn + 1) AS INT) AS bucket,
       CAST(mn + ((mx - mn + 1) * (((c - mn) * 20) // (mx - mn + 1))) // 20
            AS BIGINT) AS lo_edge_cents,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(c) AS BIGINT) AS min_cents,
       CAST(max(c) AS BIGINT) AS max_cents
FROM v, mm
GROUP BY 1, 2 ORDER BY bucket
""",
    category="relational",
    tags=("defer-window",),
)
def histogram_equi_width_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 20-bucket equal-WIDTH histogram of order value: bucket =
    ((v - min) * 20) div (max - min + 1), every boundary computed in
    int64 cents so no value can straddle a float bucket edge between
    engines. Shape: one min/max aggregate broadcast back (1 row), then
    a map-side bucket expression and one hash aggregate — two shuffles
    of aggregate-domain size at any scale, the plan a 100 TB profiling
    pass needs (contrast width_bucket on doubles: edge rows flip
    buckets on libm rounding)."""
    v = load_table(spark, sf_dir, "orders").select(
        cents(F.col("o_totalprice")).alias("c")
    )
    mm = v.agg(
        F.min("c").alias("mn"), F.max("c").alias("mx")
    )
    b = v.crossJoin(F.broadcast(mm)).withColumn(
        "bucket", F.expr("((c - mn) * 20) div (mx - mn + 1)")
    )
    return (
        b.withColumn(
            "lo_edge_cents",
            F.col("mn") + F.expr("((mx - mn + 1) * bucket) div 20"),
        )
        .groupBy(
            F.col("bucket").cast("int").alias("bucket"),
            "lo_edge_cents",
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
        )
        .orderBy("bucket")
    )


@register(
    "equal_frequency_buckets_orders",
    oracle="""
WITH v AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
r AS (
  SELECT c,
         row_number() OVER (ORDER BY c, o_orderkey) AS rk,
         count(*) OVER () AS n
  FROM v
)
SELECT CAST(((rk - 1) * 10) // n AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(c) AS BIGINT) AS lo_cents,
       CAST(max(c) AS BIGINT) AS hi_cents,
       CAST(sum(c) AS BIGINT) AS sum_cents
FROM r GROUP BY 1 ORDER BY bucket
""",
    category="relational",
    tags=("defer-window",),
)
def equal_frequency_buckets_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact equal-FREQUENCY (decile) bucketing of order value —
    bucket = ((rank-1)*10) div n over the exact global order, the
    sibling of histogram_equi_width_prices on the rank axis. The
    global rank comes from the 2-pass grank machinery
    (operators/grank.py): per-task memory flat in table size, never a
    single-partition sort — the difference between this and a naive
    ntile() at 100 TB is the one-task funnel the registry-wide plan
    sweep exists to forbid. Tie rows (equal cents) split across
    buckets deterministically by the o_orderkey tiebreak, identical to
    the oracle's row_number ordering."""
    v = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents(F.col("o_totalprice")).alias("c")
    )
    ranked = with_global_rank(v, F.col("c"), ["o_orderkey"])
    return (
        ranked.withColumn("bucket", F.expr("((_rk - 1) * 10) div _n_tot"))
        .groupBy(F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("c").alias("lo_cents"),
            F.max("c").alias("hi_cents"),
            F.sum("c").alias("sum_cents"),
        )
        .orderBy("bucket")
    )


@register(
    "mad_outlier_order_values",
    bench=True,  # v2.6 gate (round 10): two grank passes + broadcast
    oracle="""
WITH v AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
med AS (
  SELECT c AS m FROM (
    SELECT c, row_number() OVER (ORDER BY c, o_orderkey) AS rk,
           count(*) OVER () AS n
    FROM v
  ) WHERE rk = (n + 1) // 2
),
dev AS (
  SELECT v.o_orderkey, v.c, abs(v.c - med.m) AS ad, med.m FROM v, med
),
mad AS (
  SELECT ad AS md FROM (
    SELECT ad, row_number() OVER (ORDER BY ad, o_orderkey) AS rk,
           count(*) OVER () AS n
    FROM dev
  ) WHERE rk = (n + 1) // 2
)
SELECT CAST(max(d.m) AS BIGINT) AS median_cents,
       CAST(max(mad.md) AS BIGINT) AS mad_cents,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN d.ad > 5 * mad.md THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers,
       CAST(max(CASE WHEN d.ad > 5 * mad.md THEN d.ad END) AS BIGINT)
           AS worst_deviation_cents
FROM dev d, mad
""",
    category="relational",
    tags=("defer-window",),
)
def mad_outlier_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation — the
    estimator that survives the contamination that wrecks mean/stddev
    fences. Discrete-median semantics (value AT rank (n+1) div 2, ties
    by o_orderkey) on EXACT cents, twice: median of values, then
    median of absolute deviations; a row is an outlier when
    |x - med| > 5*MAD — a pure integer comparison, so the outlier SET
    is bit-identical cross-engine (the float '1.4826 sigma-consistent'
    scaling is display math, deliberately absent). Both medians ride
    the 2-pass grank machinery: no global sort, per-task memory flat;
    the MAD pass re-ranks the deviation column the same way. Three
    aggregate-domain shuffles total at any scale."""
    from pyspark import StorageLevel

    v = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents(F.col("o_totalprice")).alias("c")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    r1 = with_global_rank(v, F.col("c"), ["o_orderkey"])
    # the .agg() wrapper marks the 1-row broadcast side as
    # aggregate-derived for the registry-wide nested-loop sweep (the
    # rank filter alone already yields exactly one row)
    med = r1.filter(F.expr("_rk = (_n_tot + 1) div 2")).agg(
        F.max("c").alias("m")
    )
    # dev feeds the second rank's bounds pass, its main pass and the
    # final aggregate — without a persist each replays the first
    # median's full rank machinery (its broadcast subtree), measured
    # as the query's dominant cost (optimization r18, guide §2.4/§5).
    # v likewise feeds both passes of rank #1 and dev. Both released
    # after the 1-row result is pinned.
    dev = v.crossJoin(F.broadcast(med)).select(
        "o_orderkey", "c", "m", F.abs(F.col("c") - F.col("m")).alias("ad")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    r2 = with_global_rank(dev, F.col("ad"), ["o_orderkey"])
    mad = r2.filter(F.expr("_rk = (_n_tot + 1) div 2")).agg(
        F.max("ad").alias("md")
    )
    out = (
        dev.crossJoin(F.broadcast(mad))
        .agg(
            F.max("m").alias("median_cents"),
            F.max("md").alias("mad_cents"),
            F.count("*").alias("n_orders"),
            F.sum(
                F.when(F.col("ad") > 5 * F.col("md"), 1).otherwise(0)
            ).alias("n_outliers"),
            F.max(
                F.when(F.col("ad") > 5 * F.col("md"), F.col("ad"))
            ).alias("worst_deviation_cents"),
        )
    )
    out = out.localCheckpoint(eager=True)
    v.unpersist()
    dev.unpersist()
    return out


@register(
    "systematic_sample_orders",
    oracle="""
WITH r AS (
  SELECT o_orderkey, o_orderdate,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rk
  FROM orders
)
SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
       c AS totalprice_cents, rk AS global_rank
FROM r WHERE (rk - 1) % 500 = 0 ORDER BY rk
""",
    category="relational",
    tags=("defer-window",),
)
def systematic_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (every k-th) sampling on the exact global
    (o_orderdate, o_orderkey) order — the reproducible audit sample:
    unlike TABLESAMPLE/rand(), membership is a pure function of the
    row's position, stable across partitionings, runs, and engines,
    and evenly spread over the time axis by construction. Rank is the
    2-pass grank (no global sort); selection is a map-side modulus.
    k = 500 here; at 100 TB the same plan emits n/k rows with the only
    shuffles being grank's two aggregate-domain passes."""
    v = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        cents(F.col("o_totalprice")).alias("c"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("_ts_us"),
    )
    ranked = with_global_rank(v, F.col("_ts_us"), ["o_orderkey"])
    return (
        ranked.filter(F.expr("(_rk - 1) % 500 = 0"))
        .select(
            "o_orderkey",
            "o_orderdate",
            F.col("c").alias("totalprice_cents"),
            F.col("_rk").alias("global_rank"),
        )
        .orderBy("global_rank")
    )


# ---------------------------------------------------------------------------
# round-10 additions: ordered-set aggregates, sketch re-aggregation, RFM
# ---------------------------------------------------------------------------


@register(
    "percentile_disc_order_priority",
    oracle="""
WITH v AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
r AS (
  SELECT o_orderpriority, c,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY c, o_orderkey) AS rk,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM v
)
SELECT o_orderpriority,
       CAST(max(n) AS BIGINT) AS n_orders,
       CAST(max(CASE WHEN rk = (n + 3) // 4 THEN c END) AS BIGINT)
           AS p25_cents,
       CAST(max(CASE WHEN rk = (n + 1) // 2 THEN c END) AS BIGINT)
           AS p50_cents,
       CAST(max(CASE WHEN rk = (3 * n + 3) // 4 THEN c END) AS BIGINT)
           AS p75_cents
FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    category="relational",
    tags=("defer-window",),
)
def percentile_disc_order_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ordered-set aggregate ``percentile_disc(p) WITHIN GROUP`` per
    order priority, p in {.25, .5, .75}: the smallest value whose
    cumulative share reaches p — i.e. the value AT within-group rank
    ceil(p*n), computed as an exact integer ((n+3) div 4 etc.), never
    a float cume_dist comparison that can flip on rounding. The
    within-group rank rides with_grouped_cumsum (operators/grank.py):
    5 priority groups would otherwise each funnel through ONE task in
    a naive partitioned window — the 2-pass form stays parallel at
    any rows-per-group. One broadcast of the 5-row group counts turns
    the three target ranks into map-side predicates; the final pivot
    aggregates 15 surviving rows. percentile_disc differs from
    percentile_cont exactly at these even/odd boundaries, so the
    int64 ranks are the whole correctness story."""
    v = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        cents(F.col("o_totalprice")).alias("c"),
        F.lit(1).cast("long").alias("_one"),
    )
    ranked = with_grouped_cumsum(
        v,
        ["o_orderpriority"],
        F.col("c"),
        ["c", "o_orderkey"],
        "_one",
    ).withColumnRenamed("_cum", "rk")
    counts = v.groupBy("o_orderpriority").agg(F.count("*").alias("n"))
    targets = counts.select(
        "o_orderpriority",
        "n",
        ((F.col("n") + 3) / 4).cast("long").alias("r25"),
        ((F.col("n") + 1) / 2).cast("long").alias("r50"),
        ((3 * F.col("n") + 3) / 4).cast("long").alias("r75"),
    )
    return (
        ranked.join(F.broadcast(targets), "o_orderpriority")
        .filter(
            (F.col("rk") == F.col("r25"))
            | (F.col("rk") == F.col("r50"))
            | (F.col("rk") == F.col("r75"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n_orders"),
            F.max(F.when(F.col("rk") == F.col("r25"), F.col("c"))).alias(
                "p25_cents"
            ),
            F.max(F.when(F.col("rk") == F.col("r50"), F.col("c"))).alias(
                "p50_cents"
            ),
            F.max(F.when(F.col("rk") == F.col("r75"), F.col("c"))).alias(
                "p75_cents"
            ),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "bitmap_rollup_daily_to_monthly",
    oracle="""
SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
FROM events GROUP BY 1
UNION ALL
SELECT CAST('1970-01-01' AS TIMESTAMP) AS month,
       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
FROM events
ORDER BY month
""",
    category="relational",
    tags=("defer-window",),
)
def bitmap_rollup_daily_to_monthly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact distinct-count RE-AGGREGATION across time partitions:
    per-day user bitmaps OR-merge into months, and the monthly partials
    OR-merge again into a grand total (keyed '1970-01-01') — THREE
    grain levels from ONE raw scan, the mergeable-partials contract a
    100 TB warehouse runs on (store daily sketches; month/total
    rollups read sketches, never raw events). The oracle computes
    count(DISTINCT) directly at both output grains, so a hash match
    PROVES re-aggregation exactness — the property HLL only
    approximates, bitmaps guarantee. The daily (day, bucket) bitmap
    frame is persisted: it is aggregate-domain-sized (days x 32k-id
    buckets) and feeds both rollup consumers, which Catalyst would
    otherwise recompute from raw (no common-subplan dedup)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("month", "ts").alias("month"),
        F.date_trunc("day", "ts").alias("day"),
        "user_id",
    )
    daily = ev.groupBy(
        "month", "day", F.bitmap_bucket_number("user_id").alias("bkt")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm")
    )
    monthly_bkt = daily.groupBy("month", "bkt").agg(
        F.bitmap_or_agg("bm").alias("bm")
    ).persist()
    per_month = monthly_bkt.groupBy("month").agg(
        F.sum(F.bitmap_count("bm")).alias("distinct_users")
    )
    total = (
        monthly_bkt.groupBy("bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).alias("distinct_users"))
        .select(
            F.lit("1970-01-01").cast("timestamp").alias("month"),
            "distinct_users",
        )
    )
    out = (
        per_month.unionByName(total)
        .orderBy("month")
        # eager pin (month-domain rows), then release the bucketed
        # bitmap persist (r19 cache-leak audit)
        .localCheckpoint(eager=True)
    )
    monthly_bkt.unpersist()
    return out


@register(
    "rfm_customer_segments",
    oracle="""
WITH mx AS (SELECT max(o_orderdate) AS maxd FROM orders),
cust AS (
  SELECT o_custkey,
         date_diff('day', max(o_orderdate), (SELECT maxd FROM mx))
             AS r_days,
         CAST(count(*) AS BIGINT) AS f_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS m_cents
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT ntile(5) OVER (ORDER BY r_days, o_custkey)  AS r_score,
         ntile(5) OVER (ORDER BY f_orders, o_custkey) AS f_score,
         ntile(5) OVER (ORDER BY m_cents, o_custkey)  AS m_score,
         m_cents
  FROM cust
)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(m_cents) AS BIGINT) AS sum_monetary_cents
FROM scored GROUP BY 1, 2, 3
ORDER BY r_score, f_score, m_score
""",
    category="relational",
    tags=("defer-window",),
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the marketing-analytics workhorse: every
    customer scored 1-5 on Recency (days since last order, 1 = most
    recent), Frequency (order count), Monetary (lifetime cents), each
    an exact global quintile. The customer aggregate is corpus-scale
    (hundreds of millions of customers at 100 TB), so each quintile
    is the 2-pass grank + the closed-form ntile identity
    (ntile_from_rank == SQL ntile, proven by exact_global_deciles) —
    three rank passes, zero single-task sorts. Output collapses to
    the <=125-cell segment grid with customer counts and monetary
    mass; ties everywhere break on custkey so scores are unique and
    cross-engine stable."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", cents(F.col("o_totalprice")).alias("c")
    )
    mx = o.agg(F.max("o_orderdate").alias("maxd"))
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_d"),
            F.count("*").alias("f_orders"),
            F.sum("c").alias("m_cents"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "o_custkey",
            F.datediff("maxd", "last_d").cast("long").alias("r_days"),
            "f_orders",
            "m_cents",
        )
    )
    scored = cust
    for dim, col in (("r", "r_days"), ("f", "f_orders"), ("m", "m_cents")):
        scored = (
            with_global_rank(scored, F.col(col), ["o_custkey"])
            .withColumn(
                f"{dim}_score",
                ntile_from_rank(F.col("_rk"), F.col("_n_tot"), 5),
            )
            .drop("_rk", "_n_tot")
        )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("m_cents").alias("sum_monetary_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "listagg_nations_per_region",
    oracle="""
SELECT r_name,
       CAST(count(*) AS BIGINT) AS n_nations,
       string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
""",
    category="relational",
    tags=("defer-window",),
)
def listagg_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered LISTAGG / string_agg — the report-formatting aggregate
    (SQL:2016 ordered-set family, DuckDB string_agg ... ORDER BY):
    nations per region as one comma-joined, deterministically ORDERED
    string. Spark-first form: collect_list -> array_sort -> array_join
    (collect_list order is nondeterministic under parallel merge — the
    explicit sort is what makes the output an oracle-checkable value
    rather than a race). Group cardinality bounds memory: the
    collected list is per-group, fine for dimension-sized groups;
    corpus-sized lists would use the packing operators instead."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_nations"),
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("nations"),
        )
        .orderBy("r_name")
    )


@register(
    "not_in_null_semantics",
    oracle="""
WITH probe AS (
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
  UNION ALL SELECT NULL
),
ni AS (
  SELECT CAST(count(*) AS BIGINT) AS n_not_in FROM customer
  WHERE c_custkey NOT IN (SELECT k FROM probe)
),
ne AS (
  SELECT CAST(count(*) AS BIGINT) AS n_not_exists FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = c.c_custkey)
),
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_customers FROM customer
)
SELECT base.n_customers, ni.n_not_in, ne.n_not_exists FROM base, ni, ne
""",
    category="relational",
    tags=("defer-window",),
)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic parity: ``NOT IN`` against a set CONTAINING
    NULL is never true for any row (x <> NULL is UNKNOWN, so the
    conjunction can't reach TRUE), while the NOT EXISTS form ignores
    the NULL member and returns the real complement — the classic
    silent-empty-result trap. Emitting both counts side by side from
    the same probe set pins that the engine implements ANSI 3VL, not
    the set-difference users expect (Spark plans NOT IN as a
    null-aware anti join — one extra null-check branch, same equi
    shuffle). The probe set deliberately injects one NULL; at 100 TB
    both forms are the same anti-join shape."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_niv_o")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_niv_c")
    return spark.sql(
        """
WITH probe AS (
  SELECT o_custkey AS k FROM _niv_o WHERE o_totalprice > 400000
  UNION ALL SELECT NULL
),
ni AS (
  SELECT count(*) AS n_not_in FROM _niv_c
  WHERE c_custkey NOT IN (SELECT k FROM probe)
),
ne AS (
  SELECT count(*) AS n_not_exists FROM _niv_c c
  WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = c.c_custkey)
),
base AS (SELECT count(*) AS n_customers FROM _niv_c)
SELECT base.n_customers, ni.n_not_in, ne.n_not_exists FROM base, ni, ne
"""
    )


@register(
    "scalar_subquery_above_avg",
    oracle="""
WITH v AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
t AS (
  SELECT CAST(sum(c) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n FROM v
)
SELECT v.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_above,
       CAST(sum(v.c) AS BIGINT) AS sum_above_cents
FROM v, t
WHERE v.c * t.n > t.s
GROUP BY v.o_orderpriority
ORDER BY v.o_orderpriority
""",
    category="relational",
    tags=("defer-window",),
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter — rows above the GLOBAL average — with
    the average never materialized as a float: avg = s/n, so
    ``c > s/n`` becomes the integer cross-multiplication
    ``c * n > s`` (exact at any scale where c*n < 2^63 — ~6e7 cents x
    1.5e9 orders holds at the 100 TB point; promote to DECIMAL
    beyond). An avg-as-double predicate can flip rows whose price
    sits within one ulp of the mean, and the flip differs per engine
    because an N-ary float SUM is association-ordered. Plan: one
    1-row aggregate broadcast back over the scan — the scalar
    subquery shape — then a map-side integer filter and the group
    rollup."""
    v = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", cents(F.col("o_totalprice")).alias("c")
    )
    t = v.agg(F.sum("c").alias("s"), F.count("*").alias("n"))
    return (
        v.crossJoin(F.broadcast(t))
        .filter(F.col("c") * F.col("n") > F.col("s"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_above"),
            F.sum("c").alias("sum_above_cents"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "multi_distinct_one_pass",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(count(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT)
           AS n_days,
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    category="relational",
    tags=("defer-window",),
)
def multi_distinct_one_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIPLE count(DISTINCT ...) over different columns in ONE
    aggregation — the shape Catalyst plans with an Expand node (each
    input row fans out once per distinct group, null-padded), giving
    a single scan + one shuffle per distinct-column family instead of
    N self-joined single-distinct aggregates. The reference's 1.3-era
    planner refused multi-distinct outright (SPARK-9241 landed later)
    so this pins the modern superset. The day distinct casts through
    DATE on both engines; counts are exact int64."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count_distinct(F.to_date("o_orderdate")).alias("n_days"),
            F.count_distinct("o_orderstatus").alias("n_statuses"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "winsorize_order_values",
    oracle="""
WITH v AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
r AS (
  SELECT c, row_number() OVER (ORDER BY c, o_orderkey) AS rk,
         count(*) OVER () AS n
  FROM v
),
cuts AS (
  SELECT max(CASE WHEN rk = (n + 99) // 100 THEN c END) AS lo,
         max(CASE WHEN rk = (99 * n + 99) // 100 THEN c END) AS hi
  FROM r
)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(max(cuts.lo) AS BIGINT) AS p01_cents,
       CAST(max(cuts.hi) AS BIGINT) AS p99_cents,
       CAST(sum(CASE WHEN v.c < cuts.lo THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clamped_lo,
       CAST(sum(CASE WHEN v.c > cuts.hi THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clamped_hi,
       CAST(sum(v.c) AS BIGINT) AS sum_cents_before,
       CAST(sum(CASE WHEN v.c < cuts.lo THEN cuts.lo
                     WHEN v.c > cuts.hi THEN cuts.hi
                     ELSE v.c END) AS BIGINT) AS sum_cents_after
FROM v, cuts
""",
    category="relational",
    tags=("defer-window",),
)
def winsorize_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — the ML-feature-prep clamp: values below the
    exact 1st percentile (discrete semantics, rank ceil(n/100)) are
    raised to it, values above the exact 99th lowered to it, and the
    audit row reports both cut values, how many rows each side
    clamped, and the sum before/after (all int64 cents — the clamp
    boundary is an integer comparison, so the clamped SET is
    bit-identical cross-engine; a float quantile boundary silently
    moves edge rows between runs). The cuts ride ONE grank pass (both
    ranks filtered from the same ranked frame, aggregated to a 1-row
    broadcast), then a map-side clamp + global aggregate: two
    aggregate-domain shuffles at any scale — this is how you clip a
    100 TB feature column without sorting it."""
    v = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents(F.col("o_totalprice")).alias("c")
    )
    r = with_global_rank(v, F.col("c"), ["o_orderkey"])
    cuts = r.filter(
        F.expr("_rk = (_n_tot + 99) div 100")
        | F.expr("_rk = (99 * _n_tot + 99) div 100")
    ).agg(
        F.max(
            F.when(F.expr("_rk = (_n_tot + 99) div 100"), F.col("c"))
        ).alias("lo"),
        F.max(
            F.when(F.expr("_rk = (99 * _n_tot + 99) div 100"), F.col("c"))
        ).alias("hi"),
    )
    clamped = F.when(F.col("c") < F.col("lo"), F.col("lo")).when(
        F.col("c") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("c"))
    return v.crossJoin(F.broadcast(cuts)).agg(
        F.count("*").alias("n_orders"),
        F.max("lo").alias("p01_cents"),
        F.max("hi").alias("p99_cents"),
        F.sum(F.when(F.col("c") < F.col("lo"), 1).otherwise(0)).alias(
            "n_clamped_lo"
        ),
        F.sum(F.when(F.col("c") > F.col("hi"), 1).otherwise(0)).alias(
            "n_clamped_hi"
        ),
        F.sum("c").alias("sum_cents_before"),
        F.sum(clamped).alias("sum_cents_after"),
    )


@register(
    "percentile_cont_lineitem",
    oracle="""
WITH v AS (
  SELECT l_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem
),
r AS (
  SELECT c,
         row_number() OVER (ORDER BY c, l_orderkey, l_linenumber) AS rk,
         count(*) OVER () AS n
  FROM v
),
picked AS (
  SELECT CAST(max(n) AS BIGINT) AS n,
         max(CASE WHEN rk = (n - 1) // 4 + 1 THEN c END) AS lo25,
         max(CASE WHEN rk = (n - 1) // 4 + 2 THEN c END) AS hi25,
         max(CASE WHEN rk = (n - 1) // 2 + 1 THEN c END) AS lo50,
         max(CASE WHEN rk = (n - 1) // 2 + 2 THEN c END) AS hi50,
         max(CASE WHEN rk = (3 * (n - 1)) // 4 + 1 THEN c END) AS lo75,
         max(CASE WHEN rk = (3 * (n - 1)) // 4 + 2 THEN c END) AS hi75
  FROM r
)
SELECT n AS n_values,
       lo25 + (hi25 - lo25) * (CAST((n - 1) % 4 AS DOUBLE) / 4)
           AS p25_cents,
       lo50 + (hi50 - lo50) * (CAST((n - 1) % 2 AS DOUBLE) / 2)
           AS p50_cents,
       lo75 + (hi75 - lo75) * (CAST((3 * (n - 1)) % 4 AS DOUBLE) / 4)
           AS p75_cents
FROM picked
""",
    category="relational",
    tags=("defer-window",),
)
def percentile_cont_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``percentile_cont`` — the INTERPOLATING ordered-set aggregate
    (SQL:2003; pos = (n-1)p, value = v[k] + (v[k+1]-v[k])*frac) at
    p in {.25, .5, .75}, closing the pair with percentile_disc: these
    p make every possible frac a SMALL BINARY RATIONAL (quarters or
    halves), so the interpolation is one exact double product plus one
    two-term sum — bit-identical cross-engine per the exact.py
    doctrine (arbitrary p, e.g. 0.37, would NOT be: its frac already
    rounds). Both bracket ranks come from ONE grank pass over int64
    cents; the pick is a 1-row aggregate. A pytest proves the rank
    formula equals DuckDB's built-in quantile_cont. At 100 TB: two
    aggregate-domain shuffles, no global sort."""
    v = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", cents(F.col("l_extendedprice")).alias("c")
    )
    r = with_global_rank(v, F.col("c"), ["l_orderkey", "l_linenumber"])
    picked = r.filter(
        F.expr(
            "_rk IN ((_n_tot - 1) div 4 + 1, (_n_tot - 1) div 4 + 2,"
            " (_n_tot - 1) div 2 + 1, (_n_tot - 1) div 2 + 2,"
            " (3 * (_n_tot - 1)) div 4 + 1, (3 * (_n_tot - 1)) div 4 + 2)"
        )
    ).agg(
        F.max("_n_tot").alias("n"),
        F.max(F.expr("CASE WHEN _rk = (_n_tot-1) div 4 + 1 THEN c END")).alias("lo25"),
        F.max(F.expr("CASE WHEN _rk = (_n_tot-1) div 4 + 2 THEN c END")).alias("hi25"),
        F.max(F.expr("CASE WHEN _rk = (_n_tot-1) div 2 + 1 THEN c END")).alias("lo50"),
        F.max(F.expr("CASE WHEN _rk = (_n_tot-1) div 2 + 2 THEN c END")).alias("hi50"),
        F.max(F.expr("CASE WHEN _rk = (3*(_n_tot-1)) div 4 + 1 THEN c END")).alias("lo75"),
        F.max(F.expr("CASE WHEN _rk = (3*(_n_tot-1)) div 4 + 2 THEN c END")).alias("hi75"),
    )
    return picked.select(
        F.col("n").alias("n_values"),
        (
            F.col("lo25")
            + (F.col("hi25") - F.col("lo25"))
            * (F.expr("CAST((n - 1) % 4 AS DOUBLE)") / 4)
        ).alias("p25_cents"),
        (
            F.col("lo50")
            + (F.col("hi50") - F.col("lo50"))
            * (F.expr("CAST((n - 1) % 2 AS DOUBLE)") / 2)
        ).alias("p50_cents"),
        (
            F.col("lo75")
            + (F.col("hi75") - F.col("lo75"))
            * (F.expr("CAST((3 * (n - 1)) % 4 AS DOUBLE)") / 4)
        ).alias("p75_cents"),
    )


@register(
    "customer_order_gap_distribution",
    oracle="""
WITH d AS (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS day
  FROM orders
),
gaps AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(day) OVER (PARTITION BY o_custkey
                                  ORDER BY day, o_orderkey),
                   day) AS gap_days
  FROM d
)
SELECT CAST(gap_days // 30 AS BIGINT) AS gap_bucket_months,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_days) AS BIGINT) AS min_days,
       CAST(max(gap_days) AS BIGINT) AS max_days
FROM gaps WHERE gap_days IS NOT NULL
GROUP BY 1 ORDER BY gap_bucket_months
""",
    category="relational",
    tags=("defer-window",),
)
def customer_order_gap_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Inter-purchase interval distribution — the repeat-behavior
    signal behind churn models and replenishment reminders: per
    customer, the day gaps between consecutive orders (lag over a
    customer-keyed window, ties by orderkey), rolled into 30-day
    buckets with integer division (a float month conversion would
    straddle bucket edges differently per engine). One customer-keyed
    shuffle for the lag, then an aggregate-domain histogram — the
    same two-shuffle shape at 100 TB. Distinct from
    time_to_convert_quantiles (first view->purchase, one gap per
    user): this is EVERY consecutive pair, a distribution not a
    funnel."""
    d = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("day")
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    gaps = d.select(
        F.datediff("day", F.lag("day").over(w)).cast("long").alias(
            "gap_days"
        )
    ).filter(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy(
            F.expr("gap_days div 30").alias("gap_bucket_months")
        )
        .agg(
            F.count("*").alias("n_gaps"),
            F.min("gap_days").alias("min_days"),
            F.max("gap_days").alias("max_days"),
        )
        .orderBy("gap_bucket_months")
    )


@register(
    "repeat_purchase_distribution",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cust FROM per_cust)
SELECT p.n_orders,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST((count(*) * 1000000) // max(t.n_cust) AS BIGINT)
           AS share_ppm
FROM per_cust p, tot t
GROUP BY p.n_orders ORDER BY n_orders
""",
    category="relational",
    tags=("defer-window",),
)
def repeat_purchase_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Repeat-purchase frequency curve — how many customers placed
    exactly k orders, with each cell's share of the customer base in
    exact ppm: the one-table summary behind 'what fraction ever came
    back'. Two stacked aggregate-domain group-bys (orders -> per-
    customer counts -> count-of-counts) plus a broadcast 1-row total;
    the k domain is tiny at any scale. The frequency-of-frequencies
    shape is the same one vocabulary hapax analysis uses
    (vocab_growth_by_source) — on transactions instead of tokens."""
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    tot = per_cust.agg(F.count("*").alias("n_cust"))
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .crossJoin(F.broadcast(tot))
        .select(
            "n_orders",
            "n_customers",
            F.expr("(n_customers * 1000000) div n_cust").alias(
                "share_ppm"
            ),
        )
        .orderBy("n_orders")
    )


@register(
    "id_contiguity_audit_events",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
       CAST(min(event_id) AS BIGINT) AS min_id,
       CAST(max(event_id) AS BIGINT) AS max_id,
       CAST(max(event_id) - min(event_id) + 1 AS BIGINT) AS span,
       CAST(max(event_id) - min(event_id) + 1
            - count(DISTINCT event_id) AS BIGINT) AS n_holes,
       CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS n_dups
FROM events
""",
    category="relational",
    tags=("defer-window",),
)
def id_contiguity_audit_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Surrogate-key contiguity audit — the ingestion health check for
    any ID-sequenced feed: holes (span minus distinct — dropped or
    not-yet-arrived records) and duplicates (rows minus distinct —
    replayed records) derived purely from count/distinct/min/max, so
    the audit is ONE aggregation pass with a distinct sub-aggregate —
    no self-join against a generated sequence, which is the naive
    O(span) formulation that breaks when the span is 10^12 at 100 TB.
    All outputs exact int64."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("event_id").alias("n_distinct"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        (F.max("event_id") - F.min("event_id") + 1).alias("span"),
        (
            F.max("event_id")
            - F.min("event_id")
            + 1
            - F.count_distinct("event_id")
        ).alias("n_holes"),
        (F.count("*") - F.count_distinct("event_id")).alias("n_dups"),
    )


@register(
    "functional_dependency_audit",
    oracle="""
WITH fd AS (
  SELECT 'event_id->user_id' AS fd, CAST(event_id AS VARCHAR) AS det,
         count(DISTINCT user_id) AS n_dep
  FROM events GROUP BY event_id
  UNION ALL
  SELECT 'p_name->p_brand', p_name, count(DISTINCT p_brand)
  FROM part GROUP BY p_name
  UNION ALL
  SELECT 'p_brand->p_size', p_brand, count(DISTINCT p_size)
  FROM part GROUP BY p_brand
)
SELECT fd,
       CAST(count(*) AS BIGINT) AS n_det_values,
       CAST(SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating,
       CAST(max(n_dep) AS BIGINT) AS max_dependents,
       CAST(SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) = 0 AS BOOLEAN)
           AS holds
FROM fd GROUP BY fd ORDER BY fd
""",
    category="relational",
    tags=("defer-window",),
)
def functional_dependency_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Functional-dependency audit — the schema-profiling primitive
    behind FD discovery (TANE, Huhtala et al. 1999): for each
    candidate rule X -> Y, count determinant values whose dependent
    is NOT unique. On this corpus it proves `event_id -> user_id`
    holds (replayed event IDs at least agree on their owner — the
    check an ingestion pipeline runs before keying state by event_id)
    while both part-catalog decoy rules fail — exactly the
    hold/violate split a profiler must separate before declaring a
    derivable column. Each rule is ONE determinant-keyed aggregation
    with a distinct sub-aggregate and collapses to a per-rule summary
    before the union, so the audited relation is scanned once per
    rule and nothing wider than (rule, 4 counters) ever moves."""
    part = load_table(spark, sf_dir, "part")
    ev = load_table(spark, sf_dir, "events")

    def audit(df: DataFrame, fd_name: str, det, dep: str) -> DataFrame:
        return (
            df.groupBy(det.alias("det"))
            .agg(F.count_distinct(F.col(dep)).alias("n_dep"))
            .select(F.lit(fd_name).alias("fd"), "det", "n_dep")
        )

    fd = (
        audit(
            ev,
            "event_id->user_id",
            F.col("event_id").cast("string"),
            "user_id",
        )
        .unionByName(audit(part, "p_name->p_brand", F.col("p_name"), "p_brand"))
        .unionByName(audit(part, "p_brand->p_size", F.col("p_brand"), "p_size"))
    )
    viol = F.sum(F.when(F.col("n_dep") > 1, 1).otherwise(0))
    return (
        fd.groupBy("fd")
        .agg(
            F.count("*").alias("n_det_values"),
            viol.alias("n_violating"),
            F.max("n_dep").alias("max_dependents"),
            (viol == 0).alias("holds"),
        )
        .orderBy("fd")
    )


@register(
    "hypothetical_rank_order_value",
    oracle="""
WITH probes AS (
  SELECT unnest([500000, 1500000, 5000000, 15000000, 30000000])
      AS v_cents
),
fact AS (
  SELECT o_orderpriority AS priority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
agg AS (
  SELECT f.priority, p.v_cents,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN f.cents < p.v_cents THEN 1 ELSE 0 END)
              AS BIGINT) AS n_lt,
         CAST(count(DISTINCT CASE WHEN f.cents < p.v_cents
                                  THEN f.cents END) AS BIGINT)
             AS nd_lt,
         CAST(SUM(CASE WHEN f.cents <= p.v_cents THEN 1 ELSE 0 END)
              AS BIGINT) AS n_le
  FROM fact f CROSS JOIN probes p
  GROUP BY f.priority, p.v_cents
)
SELECT priority, CAST(v_cents AS BIGINT) AS v_cents,
       n_lt + 1 AS hyp_rank,
       nd_lt + 1 AS hyp_dense_rank,
       round(CAST(n_lt AS DOUBLE) / CAST(n AS DOUBLE) * 1000000)
           / 1000000 AS hyp_percent_rank,
       round(CAST(n_le + 1 AS DOUBLE) / CAST(n + 1 AS DOUBLE) * 1000000)
           / 1000000 AS hyp_cume_dist
FROM agg ORDER BY priority, v_cents
""",
    category="relational",
    tags=("defer-window",),
)
def hypothetical_rank_order_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SQL:2003 HYPOTHETICAL-SET aggregates — RANK(v) WITHIN GROUP
    (ORDER BY x), plus the dense_rank / percent_rank / cume_dist
    variants — for five probe order values against each priority
    class's price distribution: "where would a $150k order rank among
    1-URGENT orders". Spark has no WITHIN GROUP; the identity
    rank(v) = count(x < v) + 1 (dense: count(DISTINCT x < v) + 1;
    percent_rank: count(<)/n; cume_dist: (count(<=)+1)/(n+1))
    reduces all four to ONE conditional aggregation over the fact
    replicated onto the 5-probe literal array — map-side explode by a
    query constant, one shuffle on (priority, probe), counts exact
    int64 and each published fraction a single int64/int64 double
    division. Completes the ordered-set family next to
    percentile_cont/percentile_disc (the inverse direction: value ->
    position instead of position -> value)."""
    probes = F.array(
        *[
            F.lit(v).cast("long")
            for v in (500000, 1500000, 5000000, 15000000, 30000000)
        ]
    )
    fact = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("cents"),
        F.explode(probes).alias("v_cents"),
    )
    agg = fact.groupBy("priority", "v_cents").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("cents") < F.col("v_cents"), 1).otherwise(0)
        ).alias("n_lt"),
        F.count_distinct(
            F.when(F.col("cents") < F.col("v_cents"), F.col("cents"))
        ).alias("nd_lt"),
        F.sum(
            F.when(F.col("cents") <= F.col("v_cents"), 1).otherwise(0)
        ).alias("n_le"),
    )
    return agg.select(
        "priority",
        "v_cents",
        (F.col("n_lt") + 1).alias("hyp_rank"),
        (F.col("nd_lt") + 1).alias("hyp_dense_rank"),
        (
            F.round(
                F.col("n_lt").cast("double")
                / F.col("n").cast("double")
                * 1000000
            )
            / 1000000
        ).alias("hyp_percent_rank"),
        (
            F.round(
                (F.col("n_le") + 1).cast("double")
                / (F.col("n") + 1).cast("double")
                * 1000000
            )
            / 1000000
        ).alias("hyp_cume_dist"),
    ).orderBy("priority", "v_cents")


@register(
    "relational_division_priorities",
    oracle="""
SELECT CAST(p.p_partkey AS BIGINT) AS p_partkey
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM (SELECT DISTINCT o_orderpriority FROM orders) pr
  WHERE NOT EXISTS (
    SELECT 1 FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_partkey = p.p_partkey
      AND o.o_orderpriority = pr.o_orderpriority
  )
)
ORDER BY p_partkey
""",
    category="relational",
    tags=("defer-window",),
)
def relational_division_priorities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RELATIONAL DIVISION (Codd's ÷, the universal quantifier): parts
    that have been ordered under EVERY order priority — the "FOR ALL"
    query SQL can only express by double negation. The Spark plan
    uses the set-cover reduction (distinct (part, priority) pairs ->
    per-part distinct-count == the divisor's cardinality, divisor
    size taken from the data by a 1-row broadcast, never hardcoded):
    two hash aggregations and one broadcast — linear in the fact
    table where the textbook nested NOT EXISTS is a correlated
    re-probe per (part, priority). The ORACLE deliberately runs that
    textbook double-NOT-EXISTS formulation, so the hash compare is a
    cross-FORMULATION equivalence proof, not the same algebra run
    twice."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select("l_partkey", "o_orderpriority")
        .distinct()
    )
    divisor = o.select("o_orderpriority").distinct().agg(
        F.count("*").alias("n_pri")
    )
    per_part = pairs.groupBy("l_partkey").agg(
        F.count("*").alias("n_covered")
    )
    return (
        per_part.crossJoin(F.broadcast(divisor))
        .where(F.col("n_covered") == F.col("n_pri"))
        .select(F.col("l_partkey").cast("long").alias("p_partkey"))
        .orderBy("p_partkey")
    )


@register(
    "k_anonymity_audit_customers",
    oracle="""
WITH qi AS (
  SELECT c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS bal_band,
         c_mktsegment
  FROM customer
),
groups AS (
  SELECT c_nationkey, bal_band,
         CAST(count(*) AS BIGINT) AS grp_size,
         CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l_div
  FROM qi GROUP BY c_nationkey, bal_band
)
SELECT CAST(SUM(grp_size) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(grp_size) AS BIGINT) AS k_anonymity,
       CAST(SUM(CASE WHEN grp_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_groups_below_k5,
       CAST(SUM(CASE WHEN grp_size < 5 THEN grp_size ELSE 0 END)
            AS BIGINT) AS n_rows_below_k5,
       CAST(min(l_div) AS BIGINT) AS l_diversity,
       CAST(SUM(CASE WHEN l_div < 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_groups_below_l3
FROM groups
""",
    category="relational",
    tags=("defer-window",),
)
def k_anonymity_audit_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PRIVACY-GOVERNANCE audit: k-ANONYMITY and l-DIVERSITY of the
    customer table under the quasi-identifier (nation, account-balance
    $1000 band) with market segment as the sensitive attribute —
    the re-identification risk measurement (Sweeney 2002; Machanavajjhala
    et al. 2007) a data-release pipeline must run before publishing:
    k = the smallest QI-group size (any group below 5 is
    re-identifiable by linkage), l = the least sensitive-value
    diversity within a group (below 3, membership alone leaks the
    sensitive attribute even at high k). One QI-keyed aggregation
    with a distinct sub-aggregate, collapsed to a single exact-int64
    summary row — the QI group domain is what shuffles, never raw
    rows twice."""
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.select(
        "c_nationkey",
        F.expr(
            "CAST(round(c_acctbal * 100) AS BIGINT) div 100000"
        ).alias("bal_band"),
        "c_mktsegment",
    )
    groups = qi.groupBy("c_nationkey", "bal_band").agg(
        F.count("*").alias("grp_size"),
        F.count_distinct("c_mktsegment").alias("l_div"),
    )
    return groups.agg(
        F.sum("grp_size").alias("n_rows"),
        F.count("*").alias("n_groups"),
        F.min("grp_size").alias("k_anonymity"),
        F.sum(F.when(F.col("grp_size") < 5, 1).otherwise(0)).alias(
            "n_groups_below_k5"
        ),
        F.sum(
            F.when(F.col("grp_size") < 5, F.col("grp_size")).otherwise(0)
        ).alias("n_rows_below_k5"),
        F.min("l_div").alias("l_diversity"),
        F.sum(F.when(F.col("l_div") < 3, 1).otherwise(0)).alias(
            "n_groups_below_l3"
        ),
    )


@register(
    "discount_response_curve",
    oracle="""
WITH bands AS (
  SELECT CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
             AS total_qty,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS revenue_cents
  FROM lineitem GROUP BY 1
),
base AS (
  SELECT total_qty AS q0, n_lines AS n0 FROM bands WHERE disc_pct = 0
)
SELECT b.disc_pct, b.n_lines, b.total_qty, b.revenue_cents,
       round(CAST(b.total_qty AS DOUBLE) / CAST(b.n_lines AS DOUBLE)
             * 1000000) / 1000000 AS mean_qty,
       CAST(CAST(b.total_qty AS HUGEINT) * base.n0 * 1000000
            // (CAST(base.q0 AS HUGEINT) * b.n_lines) AS BIGINT)
           AS qty_index_ppm
FROM bands b CROSS JOIN base
ORDER BY b.disc_pct
""",
    category="relational",
    tags=("defer-window",),
)
def discount_response_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCOUNT RESPONSE CURVE: per discount percentage band, the
    mean line quantity INDEXED to the zero-discount baseline in exact
    ppm — the demand-response readout behind 'does a deeper discount
    actually move volume' (the empirical input to an elasticity
    model; q19 prices a given promotion, this measures the response
    surface). The index cross-multiplies the two (qty, lines) integer
    pairs into one exact ratio — never a double-over-double quotient;
    the qty x lines cross-product is quadratic in SF so it is carried
    in decimal(38,0) ⟷ HUGEINT and only the ppm quotient lands in
    int64 — and the baseline rides a 1-row broadcast. One
    aggregation over lineitem on the ~11-value discount domain."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = li.groupBy(
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_pct")
    ).agg(
        F.count("*").alias("n_lines"),
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("total_qty"),
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
        ).alias("revenue_cents"),
    )
    base = bands.where(F.col("disc_pct") == 0).select(
        F.col("total_qty").alias("q0"), F.col("n_lines").alias("n0")
    )
    return (
        bands.crossJoin(F.broadcast(base))
        .select(
            "disc_pct",
            "n_lines",
            "total_qty",
            "revenue_cents",
            (
                F.round(
                    F.col("total_qty").cast("double")
                    / F.col("n_lines").cast("double")
                    * 1000000
                )
                / 1000000
            ).alias("mean_qty"),
            F.expr(
                "CAST(CAST(total_qty AS DECIMAL(38,0)) * n0 * 1000000"
                " div (CAST(q0 AS DECIMAL(38,0)) * n_lines) AS BIGINT)"
            ).alias("qty_index_ppm"),
        )
        .orderBy("disc_pct")
    )


@register(
    "bayesian_avg_part_quantity",
    oracle="""
WITH per_part AS (
  SELECT l_partkey,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq
  FROM lineitem GROUP BY l_partkey
),
gm AS (
  SELECT CAST(SUM(n) AS BIGINT) AS ng, CAST(SUM(sq) AS BIGINT) AS sg
  FROM per_part
)
SELECT l_partkey, n, sq,
       round(CAST(sq AS DOUBLE) / n * 1000000) / 1000000 AS raw_mean,
       round(CAST(10 * sg + sq * ng AS DOUBLE)
             / CAST(ng * (10 + n) AS DOUBLE) * 1000000) / 1000000
           AS shrunk_mean
FROM per_part CROSS JOIN gm
ORDER BY CAST(10 * sg + sq * ng AS DOUBLE) / CAST(ng * (10 + n) AS DOUBLE)
         DESC, l_partkey
LIMIT 20
""",
    category="relational",
    tags=("defer-window",),
)
def bayesian_avg_part_quantity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BAYESIAN AVERAGE ranking (the IMDb weighted-rating formula):
    rank parts by mean order quantity SHRUNK toward the global mean
    with prior strength C = 10 — ba = (C·m + Σx)/(C + n) — so a part
    seen twice at quantity 50 cannot outrank a part seen 500 times at
    45 (the small-sample leaderboard pathology every raw top-k by
    mean ships with). Exactness: with m = Sg/Ng the formula clears
    denominators to (C·Sg + Σx·Ng) / (Ng·(C + n)) — both sides exact
    int64 products, ONE double division, and the top-20 ranks on that
    same bit-identical double before presentation rounding. One
    part-keyed aggregation plus a 1-row broadcast of the global
    moments; the top-20 is a TakeOrdered."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sq"),
    )
    glob = per_part.agg(
        F.sum("n").alias("ng"), F.sum("sq").alias("sg")
    )
    shrunk = (10 * F.col("sg") + F.col("sq") * F.col("ng")).cast(
        "double"
    ) / (F.col("ng") * (10 + F.col("n"))).cast("double")
    return (
        per_part.crossJoin(F.broadcast(glob))
        .select(
            "l_partkey",
            "n",
            "sq",
            (
                F.round(
                    F.col("sq").cast("double") / F.col("n") * 1000000
                )
                / 1000000
            ).alias("raw_mean"),
            (F.round(shrunk * 1000000) / 1000000).alias("shrunk_mean"),
            shrunk.alias("_key"),
        )
        .orderBy(F.col("_key").desc(), "l_partkey")
        .limit(20)
        .drop("_key")
    )


@register(
    "basket_dispersion_index",
    oracle="""
WITH baskets AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items
  FROM lineitem GROUP BY l_orderkey
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(n_items) AS BIGINT) AS sx,
         CAST(SUM(n_items * n_items) AS BIGINT) AS sxx,
         CAST(min(n_items) AS BIGINT) AS min_items,
         CAST(max(n_items) AS BIGINT) AS max_items
  FROM baskets
)
SELECT n, sx, min_items, max_items,
       round(CAST(sx AS DOUBLE) / n * 1000000) / 1000000 AS mean_items,
       round(CAST(CAST(n AS HUGEINT) * sxx
                  - CAST(sx AS HUGEINT) * sx AS DOUBLE)
             / (CAST(n AS DOUBLE) * (n - 1)) * 1000000) / 1000000
           AS var_items,
       CAST((CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
            * 1000000 // (CAST(n - 1 AS HUGEINT) * sx) AS BIGINT)
           AS dispersion_ppm
FROM m
""",
    category="relational",
    tags=("defer-window",),
)
def basket_dispersion_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Basket-size DISPERSION INDEX (variance-to-mean ratio): the
    one-number equidispersion test — Poisson arrivals give ratio 1,
    so ppm well above 10^6 says basket sizes are bursty/clumped and
    any Poisson-based capacity or fraud model is miscalibrated. The
    index reduces to exact integers end-to-end: Var/Mean =
    (n·Σx² − (Σx)²) / ((n−1)·Σx) — one floor division in ppm, no
    double ever accumulated (mean and variance are also published via
    single divisions of the same exact moments); the quadratic n·Σx²
    complement is carried in decimal(38,0) ⟷ HUGEINT so it never
    wraps int64 at large SF. One orderkey
    aggregation then a 1-row moment rollup; at any scale the second
    stage sees exactly one row per basket-size... per basket, i.e.
    the aggregate domain."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(F.count("*").alias("n_items"))
    m = baskets.agg(
        F.count("*").alias("n"),
        F.sum("n_items").alias("sx"),
        F.sum(F.col("n_items") * F.col("n_items")).alias("sxx"),
        F.min("n_items").alias("min_items"),
        F.max("n_items").alias("max_items"),
    )
    return m.select(
        "n",
        "sx",
        "min_items",
        "max_items",
        (
            F.round(F.col("sx").cast("double") / F.col("n") * 1000000)
            / 1000000
        ).alias("mean_items"),
        (
            F.round(
                (
                    F.col("n").cast("decimal(38,0)") * F.col("sxx")
                    - F.col("sx").cast("decimal(38,0)") * F.col("sx")
                ).cast("double")
                / (F.col("n").cast("double") * (F.col("n") - 1))
                * 1000000
            )
            / 1000000
        ).alias("var_items"),
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * sxx"
            " - CAST(sx AS DECIMAL(38,0)) * sx) * 1000000"
            " div (CAST(n - 1 AS DECIMAL(38,0)) * sx) AS BIGINT)"
        ).alias("dispersion_ppm"),
    )


@register(
    "referential_cascade_audit",
    oracle="""
WITH l AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_orphans
  FROM lineitem li LEFT JOIN orders o ON o.o_orderkey = li.l_orderkey
),
o AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_orphans
  FROM orders od LEFT JOIN customer c ON c.c_custkey = od.o_custkey
),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_orphans
  FROM customer cu LEFT JOIN nation n ON n.n_nationkey = cu.c_nationkey
),
n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_orphans
  FROM nation na LEFT JOIN region r ON r.r_regionkey = na.n_regionkey
)
SELECT 'lineitem->orders' AS link, n_rows, n_orphans FROM l
UNION ALL SELECT 'orders->customer', n_rows, n_orphans FROM o
UNION ALL SELECT 'customer->nation', n_rows, n_orphans FROM c
UNION ALL SELECT 'nation->region', n_rows, n_orphans FROM n
ORDER BY link
""",
    category="relational",
    tags=("defer-window",),
)
def referential_cascade_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Referential-integrity CASCADE audit: orphan counts for every
    foreign-key link of the schema's join spine (lineitem->orders->
    customer->nation->region) in one report — the whole-warehouse
    generalization of fk_orphan_audit's single link, and the first
    thing to run when a backfill or partial load is suspected (an
    orphan at one hop silently deflates every downstream join's row
    count). Each link is one LEFT equi-join collapsed to two exact
    int64 counters before the union — the links audit in parallel
    and nothing wider than (link, 2 counters) survives."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    def link(name, child, ck, parent, pk):
        return (
            child.select(F.col(ck))
            .join(
                parent.select(F.col(pk).alias("_pk")),
                F.col(ck) == F.col("_pk"),
                "left",
            )
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(
                    F.when(F.col("_pk").isNull(), 1).otherwise(0)
                ).alias("n_orphans"),
            )
            .select(F.lit(name).alias("link"), "n_rows", "n_orphans")
        )

    return (
        link("lineitem->orders", lineitem, "l_orderkey", orders, "o_orderkey")
        .unionByName(
            link("orders->customer", orders, "o_custkey", customer, "c_custkey")
        )
        .unionByName(
            link(
                "customer->nation", customer, "c_nationkey", nation,
                "n_nationkey",
            )
        )
        .unionByName(
            link("nation->region", nation, "n_regionkey", region, "r_regionkey")
        )
        .orderBy("link")
    )


@register(
    "monthly_concentration_top_decile",
    oracle="""
WITH per_cust AS (
  SELECT EXTRACT(year FROM o_orderdate) * 100
           + EXTRACT(month FROM o_orderdate) AS yyyymm,
         o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS rev
  FROM orders GROUP BY 1, 2
),
ranked AS (
  SELECT yyyymm, rev,
         row_number() OVER (PARTITION BY yyyymm
                            ORDER BY rev DESC, o_custkey) AS rn,
         count(*) OVER (PARTITION BY yyyymm) AS n_cust
  FROM per_cust
)
SELECT CAST(yyyymm AS BIGINT) AS yyyymm,
       CAST(max(n_cust) AS BIGINT) AS n_customers,
       CAST(SUM(rev) AS BIGINT) AS total_rev_cents,
       CAST(SUM(CASE WHEN rn * 10 <= n_cust THEN rev ELSE 0 END)
            AS BIGINT) AS top_decile_rev_cents,
       CAST(CAST(SUM(CASE WHEN rn * 10 <= n_cust THEN rev ELSE 0 END)
                 AS HUGEINT)
            * 1000000 // SUM(rev) AS BIGINT) AS top_decile_share_ppm
FROM ranked GROUP BY yyyymm ORDER BY yyyymm
""",
    category="relational",
    tags=("defer-window",),
)
def monthly_concentration_top_decile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Revenue-concentration DRIFT: the share of each month's revenue
    captured by its top decile of customers (strict rank·10 <= n
    membership, ties broken by custkey), in exact ppm — the time
    series behind 'are we growing more whale-dependent', where
    pareto_concentration_customers gives one static snapshot. Windows
    partition on (month) over the per-(month, customer) AGGREGATE
    domain — customers per month, not orders — and the share is an
    exact ratio per month (the cents x 10⁶ product in decimal(38,0)
    ⟷ HUGEINT so a large-SF month never wraps int64)."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy(
        (
            F.year(F.to_date("o_orderdate")) * 100
            + F.month(F.to_date("o_orderdate"))
        )
        .cast("long")
        .alias("yyyymm"),
        "o_custkey",
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    w = Window.partitionBy("yyyymm").orderBy(
        F.col("rev").desc(), "o_custkey"
    )
    wn = Window.partitionBy("yyyymm")
    ranked = per_cust.withColumns(
        {
            "rn": F.row_number().over(w),
            "n_cust": F.count("*").over(wn),
        }
    )
    top = F.when(F.col("rn") * 10 <= F.col("n_cust"), F.col("rev")).otherwise(
        0
    )
    return (
        ranked.groupBy("yyyymm")
        .agg(
            F.max("n_cust").alias("n_customers"),
            F.sum("rev").alias("total_rev_cents"),
            F.sum(top).alias("top_decile_rev_cents"),
        )
        .select(
            "yyyymm",
            "n_customers",
            "total_rev_cents",
            "top_decile_rev_cents",
            F.expr(
                "CAST(CAST(top_decile_rev_cents AS DECIMAL(38,0))"
                " * 1000000 div total_rev_cents AS BIGINT)"
            ).alias("top_decile_share_ppm"),
        )
        .orderBy("yyyymm")
    )


@register(
    "spearman_rank_revenue_orders",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS rev,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
),
rx AS (
  SELECT o_custkey, rev, n_orders,
         CAST(2 * rank() OVER (ORDER BY rev)
              + count(*) OVER (PARTITION BY rev) - 1 AS BIGINT) AS x2,
         CAST(2 * rank() OVER (ORDER BY n_orders)
              + count(*) OVER (PARTITION BY n_orders) - 1 AS BIGINT) AS y2
  FROM per_cust
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(x2) AS BIGINT) AS sx, CAST(SUM(y2) AS BIGINT) AS sy,
         CAST(SUM(x2 * y2) AS BIGINT) AS sxy,
         CAST(SUM(x2 * x2) AS BIGINT) AS sxx,
         CAST(SUM(y2 * y2) AS BIGINT) AS syy
  FROM rx
)
SELECT n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
             * 1000000) / 1000000 AS spearman_rho
FROM m
""",
    category="relational",
    tags=("defer-window",),
)
def spearman_rank_revenue_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SPEARMAN rank correlation between customer revenue and order
    count — the robust monotone-association measure (Pearson on
    tie-averaged ranks) that survives the heavy-tailed revenue
    distribution Pearson is dragged around by (stat_corr_covar_by_flag
    is the Pearson sibling). Tie handling is exact: doubled average
    rank = 2·rank_min + tie_count − 1 is an INTEGER, so every moment
    (Σx, Σxy, Σx², …) is exact int64 and ρ is one fixed IEEE tree
    (two sqrts, one division). Scale shape: ranks come from
    `with_global_rank` (binned two-pass grank — never a
    single-partition sort of the customer domain) with per-value
    min/max ranks aggregated to tie averages; the oracle's plain
    rank()/count() windows are the small-data semantic mirror."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "rev"
        ),
        F.count("*").alias("n_orders"),
    )

    def doubled_avg_rank(df: DataFrame, col: str, out: str) -> DataFrame:
        ranked = with_global_rank(df, F.col(col), ["o_custkey"])
        per_val = ranked.groupBy(col).agg(
            (F.min("_rk") + F.max("_rk")).alias(out)
        )
        return ranked.drop("_rk", "_n_tot").join(per_val, col)

    rx = doubled_avg_rank(per_cust, "rev", "x2")
    rxy = doubled_avg_rank(rx, "n_orders", "y2")
    m = rxy.agg(
        F.count("*").alias("n"),
        F.sum("x2").alias("sx"),
        F.sum("y2").alias("sy"),
        F.sum(F.col("x2") * F.col("y2")).alias("sxy"),
        F.sum(F.col("x2") * F.col("x2")).alias("sxx"),
        F.sum(F.col("y2") * F.col("y2")).alias("syy"),
    )
    rho = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (
        F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        )
        * F.sqrt(
            (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                "double"
            )
        )
    )
    return m.select(
        "n", (F.round(rho * 1000000) / 1000000).alias("spearman_rho")
    )


@register(
    "order_total_reconciliation",
    oracle="""
WITH li AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS line_sum_cents
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS header_cents,
         li.line_sum_cents
  FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN line_sum_cents IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_no_lines,
       CAST(SUM(CASE WHEN line_sum_cents = header_cents
                THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN line_sum_cents IS NOT NULL
                 AND abs(line_sum_cents - header_cents) * 100
                     <= header_cents
                THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1pct,
       CAST(SUM(CASE WHEN line_sum_cents IS NOT NULL
                 AND abs(line_sum_cents - header_cents) * 10
                     <= header_cents
                THEN 1 ELSE 0 END) AS BIGINT) AS n_within_10pct,
       CAST(max(abs(line_sum_cents - header_cents)) AS BIGINT)
           AS max_abs_delta_cents
FROM j
""",
    category="relational",
    tags=("defer-window",),
)
def order_total_reconciliation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SOURCE RECONCILIATION audit: does the order header total agree
    with the sum of its line amounts — the two-derivations check
    every finance pipeline runs between systems of record (here it
    reports total divergence: zero exact matches on this corpus, so
    the header is NOT derivable from the lines — exactly the fact a
    consumer must learn before joining them interchangeably).
    Tolerance tiers are exact integer CROSS-MULTIPLICATIONS
    (|Δ|·100 <= header for 1%), never float ratios; missing-lines
    orders are counted, not silently dropped (LEFT join). One
    orderkey aggregation plus one keyed join, collapsed to a 1-row
    exact-int64 report."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    line_sums = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
        ).alias("line_sum_cents")
    )
    j = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("header_cents"),
    ).join(
        line_sums, o["o_orderkey"] == line_sums["l_orderkey"], "left"
    )
    delta = F.abs(F.col("line_sum_cents") - F.col("header_cents"))
    has_lines = F.col("line_sum_cents").isNotNull()
    return j.agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(~has_lines, 1).otherwise(0)).alias("n_no_lines"),
        F.sum(
            F.when(F.col("line_sum_cents") == F.col("header_cents"), 1)
            .otherwise(0)
        ).alias("n_exact"),
        F.sum(
            F.when(has_lines & (delta * 100 <= F.col("header_cents")), 1)
            .otherwise(0)
        ).alias("n_within_1pct"),
        F.sum(
            F.when(has_lines & (delta * 10 <= F.col("header_cents")), 1)
            .otherwise(0)
        ).alias("n_within_10pct"),
        F.max(delta).alias("max_abs_delta_cents"),
    )


@register(
    "autocorr_lag1_daily",
    oracle="""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS yc
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
pairs AS (
  SELECT d.event_type, d.yc AS a, p.yc AS b
  FROM daily d JOIN daily p
    ON p.event_type = d.event_type AND p.x = d.x + 1
),
m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
         CAST(SUM(a * b) AS BIGINT) AS sab,
         CAST(SUM(a * a) AS BIGINT) AS saa,
         CAST(SUM(b * b) AS BIGINT) AS sbb
  FROM pairs GROUP BY event_type
)
SELECT event_type, n,
       round(CAST(n * sab - sa * sb AS DOUBLE)
             / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                * sqrt(CAST(n * sbb - sb * sb AS DOUBLE)))
             * 1000000) / 1000000 AS autocorr_lag1
FROM m ORDER BY event_type
""",
    category="temporal",
    tags=("defer-window",),
)
def autocorr_lag1_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG-1 AUTOCORRELATION of daily value per event type — the
    serial-dependence statistic that separates a random-walk series
    from white noise (high r1 means yesterday predicts today, so the
    XmR chart's independence assumption is violated and the naive
    predictor in seasonal_naive_error_ratio is strong; near 0 means
    the series is memoryless). Pairs come from a calendar equi-join
    at x+1 (gaps produce NO pair rather than a silently shifted one);
    Pearson over the pairs is exact int64 moment sums into one fixed
    IEEE tree (two sqrts, one division), 1e-6 presentation rounding."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("yc"))
        .select(
            "event_type",
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("x"),
            "yc",
        )
    )
    d, p = daily.alias("d"), daily.alias("p")
    pairs = d.join(
        p,
        (F.col("p.event_type") == F.col("d.event_type"))
        & (F.col("p.x") == F.col("d.x") + 1),
    ).select(
        F.col("d.event_type").alias("event_type"),
        F.col("d.yc").alias("a"),
        F.col("p.yc").alias("b"),
    )
    m = pairs.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
    )
    r1 = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast(
        "double"
    ) / (
        F.sqrt(
            (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast(
                "double"
            )
        )
        * F.sqrt(
            (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast(
                "double"
            )
        )
    )
    return (
        m.select(
            "event_type",
            "n",
            (F.round(r1 * 1000000) / 1000000).alias("autocorr_lag1"),
        )
        .orderBy("event_type")
    )


@register(
    "erasure_footprint_audit",
    oracle="""
WITH cohort AS (
  SELECT c_custkey FROM customer WHERE c_acctbal < 0
),
o AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM cohort)
),
li AS (
  SELECT count(*) AS n FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM o)
)
SELECT 'customer' AS tbl,
       (SELECT CAST(count(*) AS BIGINT) FROM cohort) AS n_rows_to_erase,
       (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_rows_total
UNION ALL
SELECT 'orders', (SELECT CAST(count(*) AS BIGINT) FROM o),
       (SELECT CAST(count(*) AS BIGINT) FROM orders)
UNION ALL
SELECT 'lineitem', (SELECT CAST(n AS BIGINT) FROM li),
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem)
ORDER BY tbl
""",
    category="relational",
    tags=("defer-window",),
)
def erasure_footprint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERASURE-FOOTPRINT audit (GDPR right-to-be-forgotten planning):
    given a deletion cohort (here the deterministic negative-balance
    customers), chase the FK spine and report how many rows each
    table must erase BEFORE any delete runs — the impact assessment a
    compliance pipeline files, and the row-count ground truth the
    post-delete verification compares against. Completes the privacy
    family: k_anonymity_audit_customers measures re-identification
    risk of what you keep, this measures the blast radius of what you
    remove. Each hop is one LEFT-SEMI equi-join (cohort -> orders ->
    lineitems) collapsed to counters — the cohort key set flows
    forward, full rows never move."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cohort = customer.where(F.col("c_acctbal") < 0).select("c_custkey")
    o = orders.join(
        cohort, orders["o_custkey"] == cohort["c_custkey"], "left_semi"
    ).select("o_orderkey")
    li = lineitem.join(
        o, lineitem["l_orderkey"] == o["o_orderkey"], "left_semi"
    )

    def row(tbl: str, erase_df: DataFrame, total_df: DataFrame) -> DataFrame:
        return erase_df.agg(F.count("*").alias("n_rows_to_erase")).crossJoin(
            total_df.agg(F.count("*").alias("n_rows_total"))
        ).select(F.lit(tbl).alias("tbl"), "n_rows_to_erase", "n_rows_total")

    return (
        row("customer", cohort, customer)
        .unionByName(row("orders", o, orders))
        .unionByName(row("lineitem", li, lineitem))
        .orderBy("tbl")
    )


@register(
    "cents_ending_uniformity_audit",
    oracle="""
WITH endings AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 100 AS ending,
         CAST(count(*) AS BIGINT) AS o
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS k
        FROM endings),
chi AS (
  SELECT CAST(SUM((100 * e.o - t.n) * (100 * e.o - t.n)) AS BIGINT)
             AS chi_num,
         CAST(max(t.n) AS BIGINT) AS n, CAST(max(t.k) AS BIGINT) AS k
  FROM endings e CROSS JOIN tot t
),
top AS (
  SELECT ending, o,
         row_number() OVER (ORDER BY o DESC, ending) AS rn
  FROM endings
)
SELECT c.n AS n_rows, c.k AS n_distinct_endings,
       round(CAST(c.chi_num AS DOUBLE) / CAST(100 * c.n AS DOUBLE)
             * 1000000) / 1000000 AS chi_square_uniform,
       (SELECT CAST(ending AS BIGINT) FROM top WHERE rn = 1)
           AS top_ending,
       (SELECT o FROM top WHERE rn = 1) AS top_ending_count
FROM chi c
""",
    category="relational",
    tags=("defer-window",),
)
def cents_ending_uniformity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CENT-ENDING uniformity audit — the last-two-digits sibling of
    benford_first_digit_audit: organic amounts spread their cent
    endings ~uniformly, psychological pricing piles onto .99/.95, and
    FABRICATED amounts are often too-round (.00) or too-uniform —
    both tails of the χ² statistic are fraud-screening signal
    (Nigrini's last-digits test). χ² against uniform is kept EXACT:
    with expected = n/100 per cell, χ² = Σ(100·o − n)² / (100·n) —
    integer numerator, ONE double division (never per-cell float
    expected values). One aggregation on the 100-value ending domain
    plus a deterministic top-ending pick."""
    o = load_table(spark, sf_dir, "orders")
    endings = o.groupBy(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT) % 100").alias(
            "ending"
        )
    ).agg(F.count("*").alias("o"))
    tot = endings.agg(
        F.sum("o").alias("n"), F.count("*").alias("k")
    )
    joined = endings.crossJoin(F.broadcast(tot))
    chi = joined.agg(
        F.sum(
            (100 * F.col("o") - F.col("n"))
            * (100 * F.col("o") - F.col("n"))
        ).alias("chi_num"),
        F.max("n").alias("n"),
        F.max("k").alias("k"),
    )
    w = Window.orderBy(F.col("o").desc(), "ending")
    top = (
        endings.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("ending").cast("long").alias("top_ending"),
            F.col("o").alias("top_ending_count"),
        )
    )
    return chi.crossJoin(F.broadcast(top)).select(
        F.col("n").alias("n_rows"),
        F.col("k").alias("n_distinct_endings"),
        (
            F.round(
                F.col("chi_num").cast("double")
                / (100 * F.col("n")).cast("double")
                * 1000000
            )
            / 1000000
        ).alias("chi_square_uniform"),
        "top_ending",
        "top_ending_count",
    )


@register(
    "kendall_tau_monthly_rev_orders",
    oracle="""
WITH m AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
             AS yyyymm,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS rev,
         CAST(count(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1
),
p AS (
  SELECT (a.rev - b.rev) AS dx, (a.cnt - b.cnt) AS dy
  FROM m a JOIN m b ON a.yyyymm > b.yyyymm
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS concordant,
         CAST(SUM(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS discordant,
         CAST(SUM(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS ties_x,
         CAST(SUM(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS ties_y
  FROM p
)
SELECT n0, concordant, discordant, ties_x, ties_y,
       round(CAST(concordant - discordant AS DOUBLE)
             / sqrt(CAST((n0 - ties_x) * (n0 - ties_y) AS DOUBLE))
             * 1000000) / 1000000 AS kendall_tau_b
FROM s
""",
    category="relational",
    tags=("defer-window",),
)
def kendall_tau_monthly_rev_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KENDALL tau-b rank correlation between monthly revenue and
    monthly order count — the pairwise-concordance association
    measure completing the correlation family (Pearson:
    stat_corr_covar_by_flag, Spearman: spearman_rank_revenue_orders).
    Tau needs every PAIR of observations, which is quadratic — so it
    runs on the MONTH aggregate domain (bounded by the calendar, not
    by data volume: ~10^2 rows at any SF), where the pair grid is a
    broadcast join of two aggregate-derived frames the nested-loop
    sweep sanctions. Concordant/discordant/tied counts are exact
    int64; tau-b's tie correction divides by one sqrt of an exact
    integer product — a single IEEE tree, rounded at 1e-6. At 100 TB
    the month domain is unchanged; only the first aggregation scans
    the fact table."""
    from spark_lever_spark.functions.exact import cents

    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("yyyymm")
    ).agg(
        F.sum(cents(F.col("o_totalprice"))).alias("rev"),
        F.count("*").alias("cnt"),
    )
    b = m.select(
        F.col("yyyymm").alias("yyyymm_b"),
        F.col("rev").alias("rev_b"),
        F.col("cnt").alias("cnt_b"),
    )
    p = (
        m.join(F.broadcast(b), F.col("yyyymm") > F.col("yyyymm_b"))
        .select(
            (F.col("rev") - F.col("rev_b")).alias("dx"),
            (F.col("cnt") - F.col("cnt_b")).alias("dy"),
        )
    )
    s = p.agg(
        F.count("*").alias("n0"),
        F.sum(F.when(F.col("dx") * F.col("dy") > 0, 1).otherwise(0)).alias(
            "concordant"
        ),
        F.sum(F.when(F.col("dx") * F.col("dy") < 0, 1).otherwise(0)).alias(
            "discordant"
        ),
        F.sum(F.when(F.col("dx") == 0, 1).otherwise(0)).alias("ties_x"),
        F.sum(F.when(F.col("dy") == 0, 1).otherwise(0)).alias("ties_y"),
    )
    tau = (F.col("concordant") - F.col("discordant")).cast("double") / F.sqrt(
        (
            (F.col("n0") - F.col("ties_x"))
            * (F.col("n0") - F.col("ties_y"))
        ).cast("double")
    )
    return s.select(
        "n0",
        "concordant",
        "discordant",
        "ties_x",
        "ties_y",
        (F.round(tau * 1000000) / 1000000).alias("kendall_tau_b"),
    )


@register(
    "t_closeness_ordered_emd",
    oracle="""
WITH s AS (
  SELECT c.c_nationkey,
         CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS sens
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
cell AS (
  SELECT c_nationkey, sens, CAST(count(*) AS BIGINT) AS cnt
  FROM s GROUP BY 1, 2
),
g_tot AS (
  SELECT sens, CAST(SUM(cnt) AS BIGINT) AS tot FROM cell GROUP BY 1
),
n AS (SELECT CAST(SUM(tot) AS BIGINT) AS n_all FROM g_tot),
grid AS (
  SELECT nk.c_nationkey, g.sens, g.tot,
         COALESCE(c.cnt, 0) AS cnt
  FROM (SELECT DISTINCT c_nationkey FROM cell) nk
  CROSS JOIN g_tot g
  LEFT JOIN cell c
    ON c.c_nationkey = nk.c_nationkey AND c.sens = g.sens
),
cums AS (
  SELECT c_nationkey, sens,
         CAST(SUM(cnt) OVER (PARTITION BY c_nationkey ORDER BY sens)
              AS BIGINT) AS cum_g,
         CAST(SUM(tot) OVER (PARTITION BY c_nationkey ORDER BY sens)
              AS BIGINT) AS cum_t,
         CAST(SUM(cnt) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n_g
  FROM grid
)
SELECT c_nationkey, max(n_g) AS n_orders,
       CAST(CAST(SUM(CASE WHEN sens < 5
                     THEN abs(CAST((SELECT n_all FROM n) AS HUGEINT)
                              * cum_g
                              - CAST(n_g AS HUGEINT) * cum_t)
                     ELSE 0 END) * 1000000 AS HUGEINT)
            // (CAST(n_g AS HUGEINT)
                * (SELECT n_all FROM n) * 4) AS BIGINT) AS emd_ppm
FROM cums
GROUP BY c_nationkey, n_g
ORDER BY c_nationkey
""",
    category="relational",
    tags=("defer-window",),
)
def t_closeness_ordered_emd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-CLOSENESS audit (Li, Li & Venkatasubramanian 2007) — the
    third rung of the privacy ladder after k_anonymity_audit_customers
    (k, then l-diversity): how far each QI group's SENSITIVE-attribute
    distribution (order priority, an ORDERED 1..5 ordinal) drifts from
    the table-wide distribution, measured by the ordered-domain Earth
    Mover's Distance = mean absolute difference of the two cumulative
    distributions. Kept exact by cross-multiplying the two rationals
    onto a common integer numerator |N*cum_g - N_g*cum_t|, accumulated
    in decimal(38,0) on the Spark side and HUGEINT on the oracle side
    (N*cum_g is quadratic in the fact count, so int64 would wrap near
    sf~5); published as ppm by one floor-division — Spark `div` ==
    DuckDB `//` on non-negative values, and the ppm quotient itself
    always fits int64. Shape: one fact-table aggregation onto the (nation x 5
    priorities) cell domain, a dense re-grid so EMPTY cells still
    contribute their cumulative gap, prefix sums via per-nation
    windows over that 125-row domain. Nothing quadratic, nothing
    float-accumulated."""
    from spark_lever_spark.catalog import load_table as _lt

    o = load_table(spark, sf_dir, "orders")
    cust = _lt(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    # customer is fact-sized at target scale (see hhi_concentration_monthly)
    # — shuffled equi-join, never broadcast.
    s = o.join(cust, o.o_custkey == cust.c_custkey).select(
        "c_nationkey",
        F.substring("o_orderpriority", 1, 1).cast("long").alias("sens"),
    )
    cell = s.groupBy("c_nationkey", "sens").agg(F.count("*").alias("cnt"))
    glob = cell.groupBy("sens").agg(F.sum("cnt").alias("tot"))
    n_all = glob.agg(F.sum("tot").alias("n_all"))
    nk = cell.select("c_nationkey").distinct()
    grid = (
        nk.join(F.broadcast(glob))
        .join(cell, ["c_nationkey", "sens"], "left")
        .na.fill({"cnt": 0})
    )
    w = Window.partitionBy("c_nationkey").orderBy("sens")
    wg = Window.partitionBy("c_nationkey")
    cums = grid.select(
        "c_nationkey",
        "sens",
        F.sum("cnt").over(w).alias("cum_g"),
        F.sum("tot").over(w).alias("cum_t"),
        F.sum("cnt").over(wg).alias("n_g"),
    ).join(F.broadcast(n_all))
    dec = "decimal(38,0)"
    term = F.when(
        F.col("sens") < 5,
        F.abs(
            F.col("n_all").cast(dec) * F.col("cum_g").cast(dec)
            - F.col("n_g").cast(dec) * F.col("cum_t").cast(dec)
        ),
    ).otherwise(F.lit(0).cast(dec))
    return (
        cums.groupBy("c_nationkey", "n_g", "n_all")
        .agg(F.sum(term).alias("num"))
        .select(
            "c_nationkey",
            F.col("n_g").alias("n_orders"),
            F.expr(
                "CAST(num * CAST(1000000 AS DECIMAL(38,0))"
                " div (CAST(n_g AS DECIMAL(38,0)) * n_all * 4)"
                " AS BIGINT)"
            ).alias("emd_ppm"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "hhi_concentration_monthly",
    oracle="""
WITH per_nation AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) * 100
              + EXTRACT(month FROM o.o_orderdate) AS BIGINT) AS yyyymm,
         n.n_name,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS rev
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
shares AS (
  SELECT yyyymm, n_name, rev,
         CAST(CAST(rev AS HUGEINT) * 1000000
              // SUM(rev) OVER (PARTITION BY yyyymm) AS BIGINT)
             AS share_ppm
  FROM per_nation
)
SELECT yyyymm,
       CAST(count(*) AS BIGINT) AS n_nations,
       CAST(SUM(rev) AS BIGINT) AS total_rev_cents,
       CAST(SUM(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm,
       CAST(1000000000 // (SUM(share_ppm * share_ppm) // 1000000)
            AS BIGINT) AS effective_n_milli
FROM shares GROUP BY yyyymm ORDER BY yyyymm
""",
    category="relational",
    tags=("defer-window",),
)
def hhi_concentration_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HERFINDAHL–HIRSCHMAN INDEX of monthly revenue across nations —
    the antitrust-style concentration measure that complements
    gini_customer_revenue (inequality) and
    monthly_concentration_top_decile (top-slice share): HHI = Σ s_i²
    over per-nation revenue shares, plus its reciprocal (the
    'effective number of nations', in millis). Shares are FLOOR-
    DIVIDED to int64 ppm BEFORE squaring so every term stays exact
    int64 (share_ppm ≤ 1e6 → square ≤ 1e12 → a 25-nation sum is
    ~1e13, no overflow at ANY fact-table scale — the squares live on
    the ppm grid, never on raw cent totals whose squares would
    overflow at 100 TB). Orders↔customer meet on the shuffled custkey
    equi-join (customer is fact-sized at 100 TB — never broadcast);
    only the 25-row nation table is broadcast. One aggregation to the
    (month, nation) domain, one tiny window over ≤25 rows per month."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_nation = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            (
                F.year(F.to_date("o_orderdate")) * 100
                + F.month(F.to_date("o_orderdate"))
            )
            .cast("long")
            .alias("yyyymm"),
            "n_name",
        )
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("rev"))
    )
    shares = per_nation.withColumn(
        "share_ppm",
        F.expr(
            "CAST(CAST(rev AS DECIMAL(38,0)) * 1000000"
            " div (sum(rev) over (partition by yyyymm)) AS BIGINT)"
        ),
    )
    return (
        shares.groupBy("yyyymm")
        .agg(
            F.count("*").alias("n_nations"),
            F.sum("rev").alias("total_rev_cents"),
            F.sum(F.col("share_ppm") * F.col("share_ppm")).alias("ss"),
        )
        .select(
            "yyyymm",
            "n_nations",
            "total_rev_cents",
            F.expr("ss div 1000000").alias("hhi_ppm"),
            F.expr("1000000000 div (ss div 1000000)").alias(
                "effective_n_milli"
            ),
        )
        .orderBy("yyyymm")
    )


@register(
    "roc_auc_price_predicts_return",
    oracle="""
WITH lab AS (
  SELECT o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS score,
         CAST(max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
per_score AS (
  SELECT score,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(SUM(pos) AS BIGINT) AS np
  FROM lab GROUP BY score
),
cum AS (
  SELECT score, cnt, np,
         CAST(SUM(cnt) OVER (ORDER BY score) AS BIGINT) AS cum_incl
  FROM per_score
),
agg AS (
  SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
         CAST(SUM(cnt - np) AS BIGINT) AS n_neg,
         CAST(SUM(CAST(np AS HUGEINT)
                  * (2 * (cum_incl - cnt) + cnt + 1)) AS HUGEINT)
             AS r1x2
  FROM cum
)
SELECT n_pos, n_neg,
       CAST((r1x2 - CAST(n_pos AS HUGEINT) * (n_pos + 1)) * 1000000
            // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
           AS auc_ppm,
       CAST((r1x2 - CAST(n_pos AS HUGEINT) * (n_pos + 1)) * 1000000
            // (CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
           - 1000000 AS gini_ppm
FROM agg
""",
    category="relational",
    tags=("defer-window",),
)
def roc_auc_price_predicts_return(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT ROC-AUC of 'order value predicts a return' — the
    classifier-evaluation primitive (AUC = P(score⁺ > score⁻) +
    ½P(tie), the Mann-Whitney identity) that mann_whitney_u_sources
    states as a test statistic but never as the ranking metric ML
    pipelines actually report. Tie-corrected via the doubled-midrank
    idiom (2·midrank = 2·cum_before + cnt + 1 — integer ALWAYS, the
    same trick spearman_rank_revenue_orders uses), so AUC and its
    Gini twin (2·AUC−1) are EXACT ppm ratios, no float anywhere; the
    rank-sum r1x2 ≈ 2·n_pos·n grows quadratically with SF, so it is
    accumulated in decimal(38,0) (HUGEINT on the oracle side) and only
    the final ppm quotient — which always fits — lands in int64. The rank pass runs on the per-SCORE aggregate domain —
    but cent prices are nearly unique per order, so that domain scales
    WITH the fact table: the cumulative is therefore grank's binned
    2-pass cumsum (with_grouped_cumsum, empty partition set), never a
    single-task global window."""
    from spark_lever_spark.operators.grank import with_grouped_cumsum

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag"
    )
    lab = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("score"),
        )
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("pos")
        )
    )
    per_score = lab.groupBy("score").agg(
        F.count("*").alias("cnt"), F.sum("pos").alias("np")
    )
    cum = with_grouped_cumsum(
        per_score, [], F.col("score"), ["score"], "cnt"
    ).withColumnRenamed("_cum", "cum_incl")
    dec = "decimal(38,0)"
    agg = cum.agg(
        F.sum("np").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("np")).alias("n_neg"),
        F.sum(
            F.col("np").cast(dec)
            * (2 * (F.col("cum_incl") - F.col("cnt")) + F.col("cnt") + 1)
        ).alias("r1x2"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.expr(
            "CAST((r1x2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1))"
            " * 1000000"
            " div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"
        ).alias("auc_ppm"),
        (
            F.expr(
                "CAST((r1x2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1))"
                " * 1000000"
                " div (CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"
            )
            - 1000000
        ).alias("gini_ppm"),
    )


@register(
    "abc_classification_parts",
    oracle="""
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS rev
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT l_partkey, rev,
         CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey)
              AS BIGINT) AS cum,
         CAST(SUM(rev) OVER () AS BIGINT) AS tot,
         CAST(row_number() OVER (ORDER BY rev DESC, l_partkey)
              AS BIGINT) AS rk
  FROM rev
),
cls AS (
  SELECT rk, rev,
         CASE WHEN cum * 5 <= tot * 4 THEN 'A'
              WHEN cum * 20 <= tot * 19 THEN 'B'
              ELSE 'C' END AS abc_class,
         tot
  FROM ranked
)
SELECT abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS rev_cents,
       CAST(CAST(SUM(rev) AS HUGEINT) * 1000000 // max(tot)
            AS BIGINT) AS share_ppm,
       min(rk) AS first_rank, max(rk) AS last_rank
FROM cls GROUP BY abc_class ORDER BY abc_class
""",
    category="relational",
    tags=("defer-window",),
)
def abc_classification_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC INVENTORY CLASSIFICATION of parts by revenue — the 80/95
    cumulative-share cut every materials planner runs (A: parts
    inside the first 80% of revenue, B: to 95%, C: the tail), the
    per-item class assignment that pareto_concentration_customers
    (fixed top-k share) and monthly_concentration_top_decile (fixed
    top-decile) do not give. The descending cumulative revenue is
    grank's BINNED 2-pass global cumsum over the per-part aggregate
    — the part domain grows with SF, so no single-task global window
    ever appears; class boundaries are exact integer
    cross-multiplications (cum·5 ≤ tot·4, cum·20 ≤ tot·19) on int64
    cents. Output is the 3-row class summary with exact rank spans."""
    from spark_lever_spark.operators.grank import with_global_rank

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
        ).alias("rev")
    )
    ranked = with_global_rank(
        rev, -F.col("rev"), ["l_partkey"], value="rev"
    )
    cls = ranked.select(
        F.col("_rk").alias("rk"),
        "rev",
        F.col("_s_tot").alias("tot"),
        F.when(F.col("_cum") * 5 <= F.col("_s_tot") * 4, "A")
        .when(F.col("_cum") * 20 <= F.col("_s_tot") * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return (
        cls.groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("rev").alias("rev_cents"),
            F.expr(
                "CAST(CAST(sum(rev) AS DECIMAL(38,0)) * 1000000"
                " div max(tot) AS BIGINT)"
            ).alias("share_ppm"),
            F.min("rk").alias("first_rank"),
            F.max("rk").alias("last_rank"),
        )
        .orderBy("abc_class")
    )


@register(
    "mahalanobis_outliers_2d",
    oracle="""
WITH feat AS (
  SELECT c.c_mktsegment AS segment, o.o_orderkey,
         CAST(round(o.o_totalprice / 100.0) AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2, 3
),
m AS (
  SELECT segment,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy
  FROM feat GROUP BY 1
),
scored AS (
  SELECT f.segment, f.o_orderkey, f.x, f.y, m.n,
         CAST(m.n * f.x - m.sx AS DOUBLE) AS dx,
         CAST(m.n * f.y - m.sy AS DOUBLE) AS dy,
         CAST(m.n * m.sxx - CAST(m.sx AS HUGEINT) * m.sx AS DOUBLE) AS a,
         CAST(m.n * m.syy - CAST(m.sy AS HUGEINT) * m.sy AS DOUBLE) AS b,
         CAST(m.n * m.sxy - CAST(m.sx AS HUGEINT) * m.sy AS DOUBLE) AS c
  FROM feat f JOIN m ON m.segment = f.segment
),
md AS (
  SELECT segment, o_orderkey, x, y, n,
         dx * dx * b - 2 * dx * dy * c + dy * dy * a AS num,
         n * (a * b - c * c) AS den
  FROM scored
),
top AS (
  SELECT segment, o_orderkey, x, y,
         round(num * (n - 1) / den * 1000000) / 1000000 AS md2,
         row_number() OVER (PARTITION BY segment
                            ORDER BY num DESC, o_orderkey) AS rn
  FROM md
)
SELECT segment, CAST(rn AS BIGINT) AS rnk, o_orderkey,
       x AS total_dollars, y AS n_items, md2
FROM top WHERE rn <= 3 ORDER BY segment, rnk
""",
    category="relational",
    tags=("defer-window",),
)
def mahalanobis_outliers_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIVARIATE (2-D Mahalanobis) outliers per market segment —
    the covariance-aware anomaly score that mad_outlier_order_values
    cannot see: an order that is unremarkable in value AND in item
    count but IMPOSSIBLE in their combination (high value, one item)
    only shows up once the price-basket correlation is inverted.
    With the 2x2 covariance inverted ANALYTICALLY, d² collapses to
    (n−1)·(dx²·B − 2·dx·dy·C + dy²·A) / (n·(AB−C²)) over the exact
    moment complements A,B,C (accumulated in DECIMAL(38,0) ⟷
    HUGEINT — 128-bit exact at ANY SF, probed bit-identical across
    engines this round) and exact int64 per-row deviations dx,dy;
    the doubles enter only in ONE fixed-shape IEEE tree, identical
    in both engines — the oracle-parity composed-expression
    doctrine. Ranking uses the numerator only (the
    denominator is constant per segment), ties to the orderkey.
    Scale: one fact aggregation for moments (a 5-row broadcast),
    one map-side score pass, and a per-segment top-3 window over
    5 bounded groups."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    feat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            "o_orderkey",
            F.round(F.col("o_totalprice") / 100.0)
            .cast("long")
            .alias("x"),
        )
        .agg(F.count("*").alias("y"))
    )
    m = feat.groupBy(F.col("segment").alias("mseg")).agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias(
            "sxx"
        ),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias(
            "syy"
        ),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias(
            "sxy"
        ),
    )
    dx = (F.col("n") * F.col("x") - F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("y") - F.col("sy")).cast("double")
    dec = "decimal(38,0)"
    a = (
        F.col("n").cast(dec) * F.col("sxx")
        - F.col("sx").cast(dec) * F.col("sx")
    ).cast("double")
    b = (
        F.col("n").cast(dec) * F.col("syy")
        - F.col("sy").cast(dec) * F.col("sy")
    ).cast("double")
    cc = (
        F.col("n").cast(dec) * F.col("sxy")
        - F.col("sx").cast(dec) * F.col("sy")
    ).cast("double")
    num = dx * dx * b - 2 * dx * dy * cc + dy * dy * a
    den = F.col("n") * (a * b - cc * cc)
    md = feat.join(F.broadcast(m), F.col("mseg") == F.col("segment")).select(
        "segment",
        "o_orderkey",
        "x",
        "y",
        "n",
        num.alias("num"),
        den.alias("den"),
    )
    w = Window.partitionBy("segment").orderBy(
        F.col("num").desc(), "o_orderkey"
    )
    return (
        md.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "segment",
            F.col("rn").cast("long").alias("rnk"),
            "o_orderkey",
            F.col("x").alias("total_dollars"),
            F.col("y").alias("n_items"),
            (
                F.round(
                    F.col("num") * (F.col("n") - 1) / F.col("den") * 1000000
                )
                / 1000000
            ).alias("md2"),
        )
        .orderBy("segment", "rnk")
    )


# Poisson(1) CDF thresholds on the 2^40 md5-hash grid: a draw h in
# [0, 2^40) maps to the bootstrap weight k = #{t in _POIS_T : h >= t}
# (inverse-CDF by integer comparison — no float ever touches the
# draw). Tail mass beyond w=8 (~1e-8) collapses into w=8.
_POIS_T = [
    404487723187,
    808975446375,
    1011219307969,
    1078633928500,
    1095487583633,
    1098858314660,
    1099420103164,
    1099500358665,
]


@register(
    "poisson_bootstrap_ci_priority",
    oracle="""
WITH draws AS (
  SELECT o.o_orderpriority AS priority, b.b,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS x,
         ('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR) || ':'
                             || CAST(b.b AS VARCHAR)), 1, 10))::BIGINT
             AS h
  FROM orders o CROSS JOIN (SELECT unnest(range(64)) AS b) b
),
weighted AS (
  SELECT priority, b,
         ("""
    + " + ".join(
        f"CASE WHEN h >= {t} THEN 1 ELSE 0 END" for t in _POIS_T
    )
    + """) AS w,
         x
  FROM draws
),
reps AS (
  SELECT priority, b,
         CAST(SUM(w * x) AS BIGINT) AS sw, CAST(SUM(w) AS BIGINT) AS nw
  FROM weighted GROUP BY 1, 2
),
ranked AS (
  SELECT priority, CAST(sw AS DOUBLE) / nw AS mean_b,
         row_number() OVER (PARTITION BY priority
                            ORDER BY CAST(sw AS DOUBLE) / nw, b) AS rn
  FROM reps
),
base AS (
  SELECT o_orderpriority AS priority,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS s
  FROM orders GROUP BY 1
)
SELECT base.priority, base.n_orders,
       round(CAST(base.s AS DOUBLE) / base.n_orders * 1000000) / 1000000
           AS mean_cents,
       round(max(CASE WHEN rn = 4 THEN mean_b END) * 1000000) / 1000000
           AS ci_lo_cents,
       round(max(CASE WHEN rn = 61 THEN mean_b END) * 1000000) / 1000000
           AS ci_hi_cents
FROM base JOIN ranked ON ranked.priority = base.priority
GROUP BY base.priority, base.n_orders, base.s
ORDER BY base.priority
""",
    category="relational",
    tags=("defer-window",),
)
def poisson_bootstrap_ci_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """POISSON BOOTSTRAP confidence interval (Chamandy et al., the
    distributed bootstrap: resample weights ~ Poisson(1) per row,
    independent across rows, so NO replicate ever needs a global
    multinomial draw) for the mean order value per priority — 64
    replicates, 5th/95th percentile band from the 4th/61st ranked
    replicate means. The per-(row, replicate) weight is the
    md5-affine hash family (the repo's ONLY sanctioned randomness)
    inverse-CDF'd through EXACT INTEGER thresholds on the 2^40 grid
    — both engines compare the same int64 against the same literals,
    so every weight, every replicate sum (exact int64 cents) and
    each final mean (one double division) replays bit-identically.
    Scale: the 64x fan-out is map-side; each replicate reduces by
    (priority, b) with map-side partial aggregation — the classic
    'bootstrap without replication storage' at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    draws = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b"),
    ).select(
        "priority",
        "b",
        "x",
        F.conv(
            F.substring(
                F.md5(
                    F.encode(
                        F.concat_ws(
                            ":",
                            F.col("o_orderkey").cast("string"),
                            F.col("b").cast("string"),
                        ),
                        "UTF-8",
                    )
                ),
                1,
                10,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    w = sum(
        (F.col("h") >= F.lit(t)).cast("long") for t in _POIS_T
    )
    reps = (
        draws.withColumn("w", w)
        .groupBy("priority", "b")
        .agg(
            F.sum(F.col("w") * F.col("x")).alias("sw"),
            F.sum("w").alias("nw"),
        )
        .withColumn("mean_b", F.col("sw").cast("double") / F.col("nw"))
    )
    wn = Window.partitionBy("priority").orderBy("mean_b", "b")
    ranked = reps.withColumn("rn", F.row_number().over(wn))
    ci = ranked.groupBy(F.col("priority").alias("cp")).agg(
        F.max(F.when(F.col("rn") == 4, F.col("mean_b"))).alias("lo"),
        F.max(F.when(F.col("rn") == 61, F.col("mean_b"))).alias("hi"),
    )
    base = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("s"),
    )
    return (
        base.join(F.broadcast(ci), F.col("cp") == F.col("priority"))
        .select(
            "priority",
            "n_orders",
            (
                F.round(F.col("s").cast("double") / F.col("n_orders") * 1000000)
                / 1000000
            ).alias("mean_cents"),
            (F.round(F.col("lo") * 1000000) / 1000000).alias("ci_lo_cents"),
            (F.round(F.col("hi") * 1000000) / 1000000).alias("ci_hi_cents"),
        )
        .orderBy("priority")
    )


@register(
    "decile_lift_table_returns",
    oracle="""
WITH lab AS (
  SELECT o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS score,
         CAST(max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT pos,
         CAST(row_number() OVER (ORDER BY score DESC, o_orderkey)
              AS BIGINT) AS rk,
         CAST(count(*) OVER () AS BIGINT) AS nt
  FROM lab
),
dec AS (
  SELECT (rk * 10 - 1) // nt + 1 AS decile, pos FROM ranked
),
g AS (
  SELECT decile,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS np
  FROM dec GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(np) AS BIGINT) AS pt
  FROM g
)
SELECT g.decile, g.n AS n_orders, g.np AS n_returned,
       g.np * 1000000 // g.n AS response_ppm,
       CAST(SUM(g.np) OVER (ORDER BY g.decile) * 1000000 // tot.pt
            AS BIGINT) AS cum_gain_ppm,
       CAST(CAST(g.np AS HUGEINT) * tot.nt * 1000000
            // (CAST(g.n AS HUGEINT) * tot.pt) AS BIGINT) AS lift_ppm
FROM g CROSS JOIN tot ORDER BY g.decile
""",
    category="relational",
    tags=("defer-window",),
)
def decile_lift_table_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECILE LIFT / CUMULATIVE-GAINS TABLE for 'order value predicts
    a return' — the campaign-targeting readout that accompanies
    roc_auc_price_predicts_return: orders ranked by score into 10
    exact-population deciles (grank's binned global rank — the
    ceiling-division decile rule (rk·10−1) div n_tot + 1, never an
    approximate ntile), then per-decile response rate, cumulative
    gain and lift, ALL exact ppm ratios (lift = np·N·10⁶ div (n·P),
    cross-multiplied — no float; the quadratic np·N cross-product is
    carried in decimal(38,0) ⟷ HUGEINT so it never wraps int64 at
    large SF, and only the ppm quotient lands in int64). The ranking pass is the
    2-pass binned global rank over per-order rows; everything after
    lives on the 10-row decile domain."""
    from spark_lever_spark.operators.grank import with_global_rank

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag"
    )
    lab = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("score"),
        )
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("pos")
        )
    )
    ranked = with_global_rank(lab, -F.col("score"), ["o_orderkey"])
    dec = ranked.select(
        F.expr("(_rk * 10 - 1) div _n_tot + 1").alias("decile"), "pos"
    )
    g = dec.groupBy("decile").agg(
        F.count("*").alias("n"), F.sum("pos").alias("np")
    )
    tot = g.agg(F.sum("n").alias("nt"), F.sum("np").alias("pt"))
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        g.join(F.broadcast(tot))
        .withColumn("cum_np", F.sum("np").over(wcum))
        .select(
            "decile",
            F.col("n").alias("n_orders"),
            F.col("np").alias("n_returned"),
            F.expr("np * 1000000 div n").alias("response_ppm"),
            F.expr("cum_np * 1000000 div pt").alias("cum_gain_ppm"),
            F.expr(
                "CAST(CAST(np AS DECIMAL(38,0)) * nt * 1000000"
                " div (CAST(n AS DECIMAL(38,0)) * pt) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy("decile")
    )


@register(
    "contingency_residuals_segment_priority",
    oracle="""
WITH j AS (
  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
cell AS (
  SELECT segment, priority, CAST(count(*) AS BIGINT) AS o
  FROM j GROUP BY 1, 2
),
marg AS (
  SELECT segment, priority, o,
         CAST(SUM(o) OVER (PARTITION BY segment) AS BIGINT) AS r,
         CAST(SUM(o) OVER (PARTITION BY priority) AS BIGINT) AS c,
         CAST(SUM(o) OVER () AS BIGINT) AS n
  FROM cell
)
SELECT segment, priority, o AS observed,
       round(CAST(r * c AS DOUBLE) / n * 1000000) / 1000000
           AS expected,
       round((CAST(o AS DOUBLE) - CAST(r * c AS DOUBLE) / n)
             / sqrt(CAST(r * c AS DOUBLE) / n
                    * (1 - CAST(r AS DOUBLE) / n)
                    * (1 - CAST(c AS DOUBLE) / n))
             * 1000000) / 1000000 AS adj_residual
FROM marg ORDER BY segment, priority
""",
    category="relational",
    tags=("defer-window",),
)
def contingency_residuals_segment_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ADJUSTED (Haberman) STANDARDIZED RESIDUALS of the segment x
    priority contingency table — WHICH cells drive an association,
    the per-cell readout a chi-square total cannot give (and the
    per-cell route around the cross-engine N-ary float-sum ban that
    makes a single chi-square statistic unpinnable): residual =
    (O − E) / sqrt(E(1 − r/N)(1 − c/N)), each cell ONE fixed IEEE
    tree over exact int64 marginals (|residual| > 2 ≈ a cell
    significantly off independence). The margins come from three
    windows over the 25-row CELL domain — the fact table is touched
    exactly once, by the cell count."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    cell = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").alias("o"))
    )
    marg = cell.select(
        "segment",
        "priority",
        "o",
        F.sum("o").over(Window.partitionBy("segment")).alias("r"),
        F.sum("o").over(Window.partitionBy("priority")).alias("c"),
        F.sum("o").over(
            Window.partitionBy()
        ).alias("n"),
    )
    e = (F.col("r") * F.col("c")).cast("double") / F.col("n")
    resid = (F.col("o").cast("double") - e) / F.sqrt(
        e
        * (1 - F.col("r").cast("double") / F.col("n"))
        * (1 - F.col("c").cast("double") / F.col("n"))
    )
    return marg.select(
        "segment",
        "priority",
        F.col("o").alias("observed"),
        (F.round(e * 1000000) / 1000000).alias("expected"),
        (F.round(resid * 1000000) / 1000000).alias("adj_residual"),
    ).orderBy("segment", "priority")


@register(
    "welch_t_test_segments",
    oracle="""
WITH j AS (
  SELECT c.c_mktsegment AS seg,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
),
m AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s,
         SUM(CAST(x AS HUGEINT) * x) AS sxx
  FROM j GROUP BY seg
),
sides AS (
  SELECT
    max(CASE WHEN seg = 'BUILDING' THEN n END) AS n1,
    max(CASE WHEN seg = 'BUILDING' THEN s END) AS s1,
    max(CASE WHEN seg = 'BUILDING' THEN sxx END) AS x1,
    max(CASE WHEN seg = 'MACHINERY' THEN n END) AS n2,
    max(CASE WHEN seg = 'MACHINERY' THEN s END) AS s2,
    max(CASE WHEN seg = 'MACHINERY' THEN sxx END) AS x2
  FROM m
),
t AS (
  SELECT n1, n2,
         CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS md,
         CAST(n1 * x1 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * (n1 - 1)) / n1 AS a,
         CAST(n2 * x2 - CAST(s2 AS HUGEINT) * s2 AS DOUBLE)
             / (CAST(n2 AS DOUBLE) * (n2 - 1)) / n2 AS b
  FROM sides
)
SELECT n1 AS n_building, n2 AS n_machinery,
       round(md * 1000000) / 1000000 AS mean_diff_cents,
       round(md / sqrt(a + b) * 1000000) / 1000000 AS t_stat,
       round((a + b) * (a + b)
             / (a * a / (n1 - 1) + b * b / (n2 - 1))
             * 1000000) / 1000000 AS welch_df,
       abs(md / sqrt(a + b)) > 1.959964 AS significant_5pct
FROM t
""",
    category="relational",
    tags=("defer-window",),
)
def welch_t_test_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH'S UNEQUAL-VARIANCE t-TEST for mean order value, BUILDING
    vs MACHINERY — the parametric partner of mann_whitney_u_sources
    (and the test a/b dashboards actually run): t = (m1−m2) /
    sqrt(v1/n1 + v2/n2) with the Welch–Satterthwaite df. The second
    moments are summed in DECIMAL(38,0) ⟷ HUGEINT (Σx² in cents
    exceeds int64 already at sf0.01 — probed bit-exact across
    engines this round: both 128-bit sums round to the IDENTICAL
    double), so the variance complements n·Σx² − S² stay EXACT at
    any SF before their single cast to double; v1/n1 + v2/n2 and the
    df denominator are 2-term known-order double sums (allowed),
    every division a fixed tree. Scale: one shuffled orders↔customer
    equi-join, one 2-group reduce, a 1-row pivot."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    x = F.round(F.col("o_totalprice") * 100).cast("long")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(F.col("c_mktsegment").alias("seg"), x.alias("x"))
    )
    m = j.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
    )
    sides = m.agg(
        *[
            F.max(F.when(F.col("seg") == seg, F.col(col))).alias(
                f"{col}{i}"
            )
            for i, seg in ((1, "BUILDING"), (2, "MACHINERY"))
            for col in ("n", "s", "sxx")
        ]
    ).withColumnsRenamed({"sxx1": "x1", "sxx2": "x2"})
    a = (
        (
            F.col("n1").cast("decimal(38,0)") * F.col("x1")
            - F.col("s1").cast("decimal(38,0)") * F.col("s1")
        ).cast("double")
        / (F.col("n1").cast("double") * (F.col("n1") - 1))
        / F.col("n1")
    )
    b = (
        (
            F.col("n2").cast("decimal(38,0)") * F.col("x2")
            - F.col("s2").cast("decimal(38,0)") * F.col("s2")
        ).cast("double")
        / (F.col("n2").cast("double") * (F.col("n2") - 1))
        / F.col("n2")
    )
    md = F.col("s1").cast("double") / F.col("n1") - F.col("s2").cast(
        "double"
    ) / F.col("n2")
    t = sides.select(
        "n1", "n2", md.alias("md"), a.alias("a"), b.alias("b")
    )
    tstat = F.col("md") / F.sqrt(F.col("a") + F.col("b"))
    dfw = (
        (F.col("a") + F.col("b"))
        * (F.col("a") + F.col("b"))
        / (
            F.col("a") * F.col("a") / (F.col("n1") - 1)
            + F.col("b") * F.col("b") / (F.col("n2") - 1)
        )
    )
    return t.select(
        F.col("n1").alias("n_building"),
        F.col("n2").alias("n_machinery"),
        (F.round(F.col("md") * 1000000) / 1000000).alias(
            "mean_diff_cents"
        ),
        (F.round(tstat * 1000000) / 1000000).alias("t_stat"),
        (F.round(dfw * 1000000) / 1000000).alias("welch_df"),
        (F.abs(tstat) > 1.959964).alias("significant_5pct"),
    )


@register(
    "trimmed_mean_order_values",
    oracle="""
WITH v AS (
  SELECT c.c_mktsegment AS segment, o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
ranked AS (
  SELECT segment, x,
         CAST(row_number() OVER (PARTITION BY segment
                                 ORDER BY x, o_orderkey) AS BIGINT)
             AS rk,
         CAST(count(*) OVER (PARTITION BY segment) AS BIGINT) AS n
  FROM v
),
kept AS (
  SELECT segment, x, n FROM ranked
  WHERE rk > n // 10 AND rk <= n - n // 10
)
SELECT segment, max(n) AS n_total,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(SUM(x) AS BIGINT) AS kept_sum_cents,
       round(CAST(SUM(x) AS DOUBLE) / count(*) * 1000000) / 1000000
           AS trimmed_mean_cents
FROM kept GROUP BY segment ORDER BY segment
""",
    category="relational",
    tags=("defer-window",),
)
def trimmed_mean_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% TRIMMED MEAN of order value per market segment — the
    robust location estimate between the mean (outlier-dragged) and
    the median (throws away 98% of the data): drop the bottom and
    top n div 10 observations by exact rank, average the rest.
    Ranks come from grank's with_grouped_cumsum over a running
    count — the 2-pass binned form, so a 5-value segment key NEVER
    routes a whole segment through one window task (the
    low-cardinality funnel the single-partition hazard sweep
    hunts); the trim boundaries are exact integer floor-divisions
    and the kept-sum is exact int64 cents with ONE final division.
    Deterministic under ties via the orderkey tiebreak."""
    from spark_lever_spark.operators.grank import with_grouped_cumsum

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    v = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
        )
        .withColumn("one", F.lit(1).cast("long"))
    )
    ranked = with_grouped_cumsum(
        v, ["segment"], F.col("x"), ["x", "o_orderkey"], "one"
    ).withColumnRenamed("_cum", "rk")
    n = v.groupBy(F.col("segment").alias("nseg")).agg(
        F.count("*").alias("n")
    )
    kept = ranked.join(
        F.broadcast(n), F.col("nseg") == F.col("segment")
    ).filter(
        (F.col("rk") > F.expr("n div 10"))
        & (F.col("rk") <= F.col("n") - F.expr("n div 10"))
    )
    return (
        kept.groupBy("segment")
        .agg(
            F.max("n").alias("n_total"),
            F.count("*").alias("n_kept"),
            F.sum("x").alias("kept_sum_cents"),
        )
        .select(
            "segment",
            "n_total",
            "n_kept",
            "kept_sum_cents",
            (
                F.round(
                    F.col("kept_sum_cents").cast("double")
                    / F.col("n_kept")
                    * 1000000
                )
                / 1000000
            ).alias("trimmed_mean_cents"),
        )
        .orderBy("segment")
    )


@register(
    "zscore_nation_monthly_peers",
    oracle="""
WITH per AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) * 100
              + EXTRACT(month FROM o.o_orderdate) AS BIGINT) AS yyyymm,
         n.n_name,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS x
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
m AS (
  SELECT yyyymm, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s,
         SUM(CAST(x AS HUGEINT) * x) AS sxx
  FROM per GROUP BY 1
)
SELECT per.yyyymm, per.n_name, per.x AS revenue_cents,
       CASE WHEN m.n >= 2 THEN
         round(CAST(m.n * per.x - m.s AS DOUBLE) / m.n
               / sqrt(CAST(m.n * m.sxx - CAST(m.s AS HUGEINT) * m.s
                           AS DOUBLE)
                      / (CAST(m.n AS DOUBLE) * (m.n - 1)))
               * 1000000) / 1000000
       END AS z_score
FROM per JOIN m ON m.yyyymm = per.yyyymm
ORDER BY per.yyyymm, per.n_name
""",
    category="relational",
    tags=("defer-window",),
)
def zscore_nation_monthly_peers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PEER-GROUP Z-SCORE of each nation's monthly revenue against
    that month's 25-nation cross-section — the 'which market broke
    from the pack THIS month' benchmark that xmr_control_chart_daily
    answers longitudinally (own history) but never cross-sectionally:
    z = (x − μ_month)/σ_month, computed as (n·x − S)/n over the
    sample σ from 128-bit-exact moments (Σx² of monthly cent totals
    breaches int64 near sf1 — DECIMAL(38,0) ⟷ HUGEINT keeps the
    variance complement exact at any SF, both engines rounding to
    the identical double), one fixed IEEE tree per row. The fact
    table is touched once by the (month, nation) aggregation; the
    z pass joins 25-row month moments back to a 25-row domain."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            (
                F.year(F.to_date("o_orderdate")) * 100
                + F.month(F.to_date("o_orderdate"))
            )
            .cast("long")
            .alias("yyyymm"),
            "n_name",
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("x")
        )
    )
    dec = "decimal(38,0)"
    m = per.groupBy(F.col("yyyymm").alias("mym")).agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
    )
    a = (
        F.col("n").cast(dec) * F.col("sxx")
        - F.col("s").cast(dec) * F.col("s")
    ).cast("double")
    z = (
        (F.col("n") * F.col("x") - F.col("s")).cast("double")
        / F.col("n")
        / F.sqrt(a / (F.col("n").cast("double") * (F.col("n") - 1)))
    )
    return (
        per.join(F.broadcast(m), F.col("mym") == F.col("yyyymm"))
        .select(
            "yyyymm",
            "n_name",
            F.col("x").alias("revenue_cents"),
            # A 1-nation cross-section has no sample sigma: NULL, not a
            # divide-by-zero (ANSI) / NaN (non-ANSI) — mirrored by the
            # oracle's CASE WHEN n >= 2.
            F.when(
                F.col("n") >= 2, F.round(z * 1000000) / 1000000
            ).alias("z_score"),
        )
        .orderBy("yyyymm", "n_name")
    )


@register(
    "kendall_w_nation_months",
    oracle="""
WITH per AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) * 100
              + EXTRACT(month FROM o.o_orderdate) AS BIGINT) AS yyyymm,
         n.n_name,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS rev
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
grid AS (
  SELECT mo.yyyymm, na.n_name, COALESCE(p.rev, 0) AS rev
  FROM (SELECT DISTINCT yyyymm FROM per) mo
  CROSS JOIN (SELECT n_name FROM nation) na
  LEFT JOIN per p ON p.yyyymm = mo.yyyymm AND p.n_name = na.n_name
),
rk AS (
  SELECT n_name,
         CAST(row_number() OVER (PARTITION BY yyyymm
                                 ORDER BY rev DESC, n_name) AS BIGINT)
             AS rk
  FROM grid
),
sums AS (
  SELECT n_name, CAST(SUM(rk) AS BIGINT) AS r_sum,
         CAST(count(*) AS BIGINT) AS m
  FROM rk GROUP BY 1
),
nm AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nations,
         CAST(max(m) AS BIGINT) AS m_months
  FROM sums
),
d AS (
  SELECT CAST(SUM((2 * s.r_sum - nm.m_months * (nm.n_nations + 1))
               * (2 * s.r_sum - nm.m_months * (nm.n_nations + 1)))
              AS BIGINT) AS sum_d2_x4
  FROM sums s CROSS JOIN nm
)
SELECT nm.n_nations, nm.m_months, d.sum_d2_x4,
       d.sum_d2_x4 * 3000000
         // (4 * nm.m_months * nm.m_months
             * (nm.n_nations * nm.n_nations * nm.n_nations
                - nm.n_nations)) AS w_ppm
FROM nm CROSS JOIN d
""",
    category="relational",
    tags=("defer-window",),
)
def kendall_w_nation_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL'S W (coefficient of concordance) over the monthly
    nation-revenue league table: each month "judges" the 25 nations by
    ranking them on revenue; W in [0,1] says how stable that ranking is
    across the whole observation window (W=1: every month agrees; W~0:
    the table reshuffles at random). The panel is made COMPLETE first —
    a dense month x nation grid with zero revenue for absent cells, so
    a nation with no orders one month ranks last instead of silently
    shrinking that month's panel — and ranks are made deterministic by
    the (rev DESC, n_name) tie-break both engines share. The doubled
    deviation 2R_j − m(n+1) keeps the half-integer mean rank exact, so
    W = 3·Σ(2R−m(n+1))² / (4·m²·(n³−n)) is one int64 ppm
    floor-division. Scale: rank windows partition by month with exactly
    |nation| = 25 rows each, and every aggregate after the first
    fact-table pass lives on the bounded (month x nation) domain —
    int64 headroom at any SF (ranks are ≤ 25·months, never fact-sized).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            (
                F.year(F.to_date("o_orderdate")) * 100
                + F.month(F.to_date("o_orderdate"))
            )
            .cast("long")
            .alias("yyyymm"),
            "n_name",
        )
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("rev"))
    )
    months = per.select("yyyymm").distinct()
    grid = (
        months.crossJoin(F.broadcast(n.select("n_name")))
        .join(per, ["yyyymm", "n_name"], "left")
        .na.fill({"rev": 0})
    )
    w = Window.partitionBy("yyyymm").orderBy(F.col("rev").desc(), "n_name")
    ranked = grid.withColumn("rk", F.row_number().over(w).cast("long"))
    sums = ranked.groupBy("n_name").agg(
        F.sum("rk").alias("r_sum"), F.count("*").alias("m")
    )
    nm = sums.agg(
        F.count("*").alias("n_nations"), F.max("m").alias("m_months")
    )
    dev = 2 * F.col("r_sum") - F.col("m_months") * (F.col("n_nations") + 1)
    d = (
        sums.crossJoin(F.broadcast(nm))
        .select((dev * dev).alias("d2"), "n_nations", "m_months")
        .groupBy("n_nations", "m_months")
        .agg(F.sum("d2").alias("sum_d2_x4"))
    )
    return d.select(
        "n_nations",
        "m_months",
        "sum_d2_x4",
        F.expr(
            "sum_d2_x4 * 3000000 div (4 * m_months * m_months"
            " * (n_nations * n_nations * n_nations - n_nations))"
        ).alias("w_ppm"),
    )


@register(
    "monetary_unit_sampling_orders",
    oracle="""
WITH v AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
),
cum AS (
  SELECT o_orderkey, v,
         CAST(SUM(v) OVER (ORDER BY o_orderkey
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(v) OVER () AS BIGINT) AS tot
  FROM v
),
par AS (
  SELECT tot // 100 AS j, (tot // 100) // 2 AS off FROM cum
  WHERE tot // 100 > 0 LIMIT 1
)
SELECT c.o_orderkey, c.v AS order_cents, c.cum AS cum_cents,
       (c.cum - p.off + p.j) // p.j
         - (c.cum - c.v - p.off + p.j) // p.j AS n_hits
FROM cum c CROSS JOIN par p
WHERE (c.cum - p.off + p.j) // p.j
        > (c.cum - c.v - p.off + p.j) // p.j
ORDER BY c.o_orderkey
""",
    category="relational",
    tags=("defer-window",),
)
def monetary_unit_sampling_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MONETARY-UNIT SAMPLING (dollar-unit / PPS audit sampling, the
    AICPA-standard technique): lay the orders end to end on a line of
    cumulative cents, drop 100 equally spaced sampling points (interval
    J = total//100, first point at J//2), and select every order whose
    cent-range covers a point — selection probability proportional to
    monetary size, and any order larger than J is selected with
    CERTAINTY (n_hits counts multiple strikes: the auditor's
    'high-value items' fall out of the same formula). This is the PPS
    complement to systematic_sample_orders' equal-probability
    every-k-rows design. The hit test is pure integer arithmetic:
    shifting both range ends by +J keeps them non-negative (off < J, v
    >= 0), where Spark's truncating `div` and DuckDB's flooring `//`
    agree. Scale: the cumulative line is grank's binned 2-pass prefix
    sum over orderkey — no single-task global window; the 1-row
    (interval, offset) pair broadcasts."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents(F.col("o_totalprice")).alias("v")
    )
    cum = with_global_rank(o, F.col("o_orderkey"), [], value="v").select(
        "o_orderkey",
        "v",
        F.col("_cum").alias("cum"),
        F.col("_s_tot").alias("tot"),
    )
    par = (
        o.agg(F.sum("v").alias("tot"))
        .select(
            F.expr("tot div 100").alias("j"),
            F.expr("(tot div 100) div 2").alias("off"),
        )
        # degenerate-fixture guard (total < 100 cents): an empty
        # broadcast side yields 0 sampled rows in both engines
        # instead of an ANSI divide-by-zero.
        .filter(F.col("j") > 0)
    )
    hits = F.expr(
        "(cum - off + j) div j - (cum - v - off + j) div j"
    )
    return (
        cum.join(F.broadcast(par))
        .select(
            "o_orderkey",
            F.col("v").alias("order_cents"),
            F.col("cum").alias("cum_cents"),
            hits.alias("n_hits"),
        )
        .filter(F.col("n_hits") > 0)
        .orderBy("o_orderkey")
    )


@register(
    "robust_quartile_shape_by_priority",
    oracle="""
WITH v AS (
  SELECT o_orderpriority AS priority, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS x
  FROM orders
),
r AS (
  SELECT priority, x,
         CAST(row_number() OVER (PARTITION BY priority
                                 ORDER BY x, o_orderkey) AS BIGINT) AS rk,
         CAST(count(*) OVER (PARTITION BY priority) AS BIGINT) AS n
  FROM v
),
q AS (
  SELECT priority, max(n) AS n,
         max(CASE WHEN rk = (n + 3) // 4 THEN x END) AS q1_cents,
         max(CASE WHEN rk = (n + 1) // 2 THEN x END) AS q2_cents,
         max(CASE WHEN rk = (3 * n + 1) // 4 THEN x END) AS q3_cents
  FROM r GROUP BY priority
),
f AS (
  SELECT priority, n, q1_cents, q2_cents, q3_cents,
         q1_cents - (3 * (q3_cents - q1_cents)) // 2 AS lo_fence,
         q3_cents + (3 * (q3_cents - q1_cents)) // 2 AS hi_fence
  FROM q
)
SELECT f.priority, f.n, f.q1_cents, f.q2_cents, f.q3_cents,
       CASE WHEN f.q3_cents > f.q1_cents THEN
         ((f.q3_cents + f.q1_cents - 2 * f.q2_cents) * 1000
          + 1000 * (f.q3_cents - f.q1_cents))
           // (f.q3_cents - f.q1_cents) - 1000 END AS bowley_milli,
       (f.q3_cents - f.q1_cents) * 1000
         // (f.q3_cents + f.q1_cents) AS qcd_milli,
       CAST(SUM(CASE WHEN v.x < f.lo_fence THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low_outliers,
       CAST(SUM(CASE WHEN v.x > f.hi_fence THEN 1 ELSE 0 END)
            AS BIGINT) AS n_high_outliers
FROM f JOIN v ON v.priority = f.priority
GROUP BY f.priority, f.n, f.q1_cents, f.q2_cents, f.q3_cents,
         f.lo_fence, f.hi_fence
ORDER BY f.priority
""",
    category="relational",
    tags=("defer-window",),
)
def robust_quartile_shape_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ROBUST SHAPE PROFILE per order priority from the exact quartile
    triple: Bowley's quartile skewness (Q3+Q1−2·Q2)/(Q3−Q1), the
    quartile coefficient of dispersion (Q3−Q1)/(Q3+Q1), and Tukey
    1.5·IQR fence outlier counts per tail — the quartile-only siblings
    of mad_outlier_order_values' median-based fences, giving the three
    numbers (asymmetry, spread, tail mass) a box plot encodes, all
    outlier-immune where moment skewness/CV are not. Quartiles are the
    exact order statistics at ranks ceil(n/4), ceil(n/2), ceil(3n/4)
    (ties broken by orderkey; mirrored row_number), computed with the
    binned grouped cumsum so no priority group funnels through one
    task. Ratios are int64 milli floor-divisions (all operands
    non-negative once Q3>Q1 is guarded; Q-cents are positive). Second
    pass re-joins the 5-row fence table (broadcast) to count tail
    exceedances — fact table touched exactly twice."""
    v = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
        cents(F.col("o_totalprice")).alias("x"),
    ).withColumn("one", F.lit(1).cast("long"))
    ranked = with_grouped_cumsum(
        v, ["priority"], F.col("x"), ["x", "o_orderkey"], "one"
    ).withColumnRenamed("_cum", "rk")
    n = v.groupBy(F.col("priority").alias("np")).agg(
        F.count("*").alias("n")
    )
    q = (
        ranked.join(F.broadcast(n), F.col("np") == F.col("priority"))
        .groupBy("priority")
        .agg(
            F.max("n").alias("n"),
            F.max(
                F.when(F.col("rk") == F.expr("(n + 3) div 4"), F.col("x"))
            ).alias("q1_cents"),
            F.max(
                F.when(F.col("rk") == F.expr("(n + 1) div 2"), F.col("x"))
            ).alias("q2_cents"),
            F.max(
                F.when(
                    F.col("rk") == F.expr("(3 * n + 1) div 4"), F.col("x")
                )
            ).alias("q3_cents"),
        )
    )
    f = q.select(
        F.col("priority").alias("fp"),
        "n",
        "q1_cents",
        "q2_cents",
        "q3_cents",
        F.expr(
            "q1_cents - (3 * (q3_cents - q1_cents)) div 2"
        ).alias("lo_fence"),
        F.expr(
            "q3_cents + (3 * (q3_cents - q1_cents)) div 2"
        ).alias("hi_fence"),
    )
    return (
        v.join(F.broadcast(f), F.col("fp") == F.col("priority"))
        .groupBy(
            "priority",
            "n",
            "q1_cents",
            "q2_cents",
            "q3_cents",
            "lo_fence",
            "hi_fence",
        )
        .agg(
            F.sum(
                F.when(F.col("x") < F.col("lo_fence"), 1).otherwise(0)
            ).alias("n_low_outliers"),
            F.sum(
                F.when(F.col("x") > F.col("hi_fence"), 1).otherwise(0)
            ).alias("n_high_outliers"),
        )
        .select(
            "priority",
            "n",
            "q1_cents",
            "q2_cents",
            "q3_cents",
            # Bowley can be negative; shift by +1000·IQR so the single
            # floor-division runs on a non-negative numerator (Spark
            # div truncates, DuckDB // floors — they only agree >= 0).
            F.when(
                F.col("q3_cents") > F.col("q1_cents"),
                F.expr(
                    "((q3_cents + q1_cents - 2 * q2_cents) * 1000"
                    " + 1000 * (q3_cents - q1_cents))"
                    " div (q3_cents - q1_cents) - 1000"
                ),
            ).alias("bowley_milli"),
            F.expr(
                "(q3_cents - q1_cents) * 1000"
                " div (q3_cents + q1_cents)"
            ).alias("qcd_milli"),
            "n_low_outliers",
            "n_high_outliers",
        )
        .orderBy("priority")
    )


@register(
    "kruskal_wallis_priorities",
    oracle="""
WITH v AS (
  SELECT o_orderpriority AS priority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS x
  FROM orders
),
pts AS (
  SELECT x, priority, CAST(count(*) AS BIGINT) AS c
  FROM v GROUP BY 1, 2
),
tv AS (
  SELECT x, CAST(SUM(c) AS BIGINT) AS t FROM pts GROUP BY 1
),
cum AS (
  SELECT x, t,
         CAST(SUM(t) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) - t
              AS BIGINT) AS before_all
  FROM tv
),
grp AS (
  SELECT p.priority, CAST(SUM(p.c) AS BIGINT) AS n_g,
         SUM(CAST(p.c AS HUGEINT) * (2 * cum.before_all + cum.t + 1))
             AS r2
  FROM pts p JOIN cum ON cum.x = p.x
  GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n_tot,
         SUM(CAST(t AS HUGEINT) * t * t - t) AS tie3
  FROM tv
),
contrib AS (
  SELECT g.priority, g.n_g, g.r2,
         CAST(g.r2 * g.r2 * 3000
              // (CAST(g.n_g AS HUGEINT) * tot.n_tot * (tot.n_tot + 1))
              AS BIGINT) AS contrib_milli
  FROM grp g CROSS JOIN tot
),
h AS (
  SELECT CAST(SUM(contrib_milli) AS BIGINT)
           - 3000 * (SELECT n_tot + 1 FROM tot) AS h_milli
  FROM contrib
)
SELECT c.priority, c.n_g, CAST(c.r2 AS BIGINT) AS rank2_sum,
       tot.n_tot, h.h_milli,
       CAST(1000000 - tot.tie3 * 1000000
              // (CAST(tot.n_tot AS HUGEINT) * tot.n_tot * tot.n_tot
                  - tot.n_tot) AS BIGINT) AS tie_c_ppm
FROM contrib c CROSS JOIN tot CROSS JOIN h
ORDER BY c.priority
""",
    category="relational",
    tags=("defer-window",),
)
def kruskal_wallis_priorities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KRUSKAL-WALLIS H — the k-sample generalization of
    mann_whitney_u_sources (one-way ANOVA on ranks): do the five order
    priorities draw order values from the same distribution? Works on
    the value-grain count table with tie-corrected doubled midranks
    (2r = 2·before + t + 1, integer ALWAYS), so each group's doubled
    rank sum 2R_g is exact; H = 12/(N(N+1))·ΣR_g²/n_g − 3(N+1) is
    published as h_milli with each group's term floored independently
    (3000·(2R_g)² div (n_g·N·(N+1)), the engines' shared non-negative
    floor-division — deterministic cross-engine, per-group floor error
    < 5/1000 total), plus the tie-correction factor
    C = 1 − Σ(t³−t)/(N³−N) as ppm. All quadratic/cubic cross-products
    live in decimal(38,0) ⟷ HUGEINT (headroom to N≈10⁹ orders, ~sf600;
    rank2_sum itself is < 2N² and presented as int64). Scale: the
    cumulative runs over DISTINCT values via the binned 2-pass cumsum;
    the 5-row group table and 1-row totals broadcast."""
    v = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        cents(F.col("o_totalprice")).alias("x"),
    )
    pts = v.groupBy("x", "priority").agg(F.count("*").alias("c"))
    tv = pts.groupBy(F.col("x").alias("xv")).agg(F.sum("c").alias("t"))
    cum = with_grouped_cumsum(
        tv, [], F.col("xv"), ["xv"], "t"
    ).select(
        "xv", "t", (F.col("_cum") - F.col("t")).alias("before_all")
    )
    dec = "decimal(38,0)"
    grp = (
        pts.join(cum, pts.x == cum.xv)
        .groupBy("priority")
        .agg(
            F.sum("c").alias("n_g"),
            F.sum(
                F.col("c").cast(dec)
                * (2 * F.col("before_all") + F.col("t") + 1)
            ).alias("r2"),
        )
    )
    tot = cum.agg(
        F.sum("t").alias("n_tot"),
        F.sum(
            F.col("t").cast(dec) * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie3"),
    )
    contrib = grp.crossJoin(F.broadcast(tot)).select(
        "priority",
        "n_g",
        "r2",
        "n_tot",
        "tie3",
        F.expr(
            "CAST(r2 * r2 * 3000"
            " div (CAST(n_g AS DECIMAL(38,0)) * n_tot * (n_tot + 1))"
            " AS BIGINT)"
        ).alias("contrib_milli"),
    )
    h = contrib.groupBy("n_tot").agg(
        (F.sum("contrib_milli") - 3000 * (F.col("n_tot") + 1)).alias(
            "h_milli"
        )
    ).select("h_milli")
    return (
        contrib.crossJoin(F.broadcast(h))
        .select(
            "priority",
            "n_g",
            F.col("r2").cast("long").alias("rank2_sum"),
            "n_tot",
            "h_milli",
            F.expr(
                "CAST(1000000 - tie3 * 1000000"
                " div (CAST(n_tot AS DECIMAL(38,0)) * n_tot * n_tot"
                " - n_tot) AS BIGINT)"
            ).alias("tie_c_ppm"),
        )
        .orderBy("priority")
    )


@register(
    "cramer_von_mises_sources",
    oracle="""
WITH pts AS (
  SELECT n_chars AS v,
         CAST(count(*) FILTER (WHERE source = 'src0') AS BIGINT) AS c1,
         CAST(count(*) FILTER (WHERE source = 'src1') AS BIGINT) AS c2
  FROM documents WHERE source IN ('src0', 'src1')
  GROUP BY n_chars
),
cum AS (
  SELECT v, c1 + c2 AS t,
         CAST(SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS f1,
         CAST(SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS f2
  FROM pts
),
n AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
  FROM pts
),
u AS (
  SELECT SUM(CAST(cum.t AS HUGEINT)
             * (CAST(cum.f1 AS HUGEINT) * n.n2
                - CAST(cum.f2 AS HUGEINT) * n.n1)
             * (CAST(cum.f1 AS HUGEINT) * n.n2
                - CAST(cum.f2 AS HUGEINT) * n.n1)) AS u
  FROM cum CROSS JOIN n
)
SELECT n.n1, n.n2,
       CAST(u.u * 1000000
            // (CAST(n.n1 AS HUGEINT) * n.n2 * (n.n1 + n.n2)
                * (n.n1 + n.n2)) AS BIGINT) AS t_cvm_micro
FROM n CROSS JOIN u
""",
    category="relational",
    tags=("defer-window",),
)
def cramer_von_mises_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-sample CRAMER-VON MISES statistic between src0's and src1's
    document-length distributions — the INTEGRATED-squared-gap member
    of the drift-test trio (ks_statistic_sources takes the supremum of
    |F1−F2|, mann_whitney_u_sources its signed location shift; CvM
    weighs the WHOLE curve, catching two distributions that cross so
    their max gap is small but their accumulated gap is not):
    T = (n1·n2/N²)·Σ_pooled (F1(x)−F2(x))², Anderson's computational
    form evaluated at every pooled observation (each of the t(v) tied
    copies contributes — ties handled by the value-grain count table,
    no midranks needed since only CDF values enter). The gap numerator
    f1·n2 − f2·n1 is the same exact cross-multiplied integer as the KS
    query; its square times t accumulates in decimal(38,0) ⟷ HUGEINT
    and T is published as ONE micro floor-division by n1·n2·N²
    (headroom: corpus N up to ~10⁷ docs per source pair; document
    counts grow far slower than fact tables). Scale shape identical to
    ks_statistic_sources: distinct-length domain, binned 2-pass
    cumulative, 1-row totals broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.filter(F.col("source").isin("src0", "src1")).select(
        F.col("n_chars").alias("v"),
        F.when(F.col("source") == "src0", 1).otherwise(2).alias("src"),
    )
    pts = s.groupBy("v").agg(
        F.sum(F.when(F.col("src") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("src") == 2, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    cum = with_grouped_cumsum(
        pts, [], F.col("v"), ["v"], ["c1", "c2"]
    ).select(
        (F.col("c1") + F.col("c2")).alias("t"),
        F.col("_cum_c1").alias("f1"),
        F.col("_cum_c2").alias("f2"),
    )
    n = pts.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    dec = "decimal(38,0)"
    gap = (
        F.col("f1").cast(dec) * F.col("n2")
        - F.col("f2").cast(dec) * F.col("n1")
    )
    u = (
        cum.crossJoin(F.broadcast(n))
        .select((F.col("t").cast(dec) * gap * gap).alias("term"))
        .agg(F.sum("term").alias("u"))
    )
    return n.crossJoin(F.broadcast(u)).select(
        "n1",
        "n2",
        F.expr(
            "CAST(u * 1000000"
            " div (CAST(n1 AS DECIMAL(38,0)) * n2 * (n1 + n2)"
            " * (n1 + n2)) AS BIGINT)"
        ).alias("t_cvm_micro"),
    )


@register(
    "shift_share_nation_brandmix",
    oracle="""
WITH y0 AS (
  SELECT CAST(min(EXTRACT(year FROM o_orderdate)) AS BIGINT) AS yr0
  FROM orders
),
base AS (
  SELECT n.n_name, p.p_brand,
         CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) - y0.yr0
             AS t,
         CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS rev
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN part p ON p.p_partkey = l.l_partkey
  CROSS JOIN y0
  WHERE CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) - y0.yr0
        IN (0, 1)
  GROUP BY 1, 2, 3
),
brand AS (
  SELECT p_brand, t, CAST(SUM(rev) AS BIGINT) AS b FROM base
  GROUP BY 1, 2
),
natl AS (
  SELECT t, CAST(SUM(rev) AS BIGINT) AS r FROM base GROUP BY 1
),
cells AS (
  SELECT c0.n_name, c0.p_brand,
         c0.rev AS r0, c1.rev AS r1,
         b0.b AS b0, b1.b AS b1,
         (SELECT r FROM natl WHERE t = 0) AS rn0,
         (SELECT r FROM natl WHERE t = 1) AS rn1
  FROM base c0
  JOIN base c1 ON c1.n_name = c0.n_name AND c1.p_brand = c0.p_brand
              AND c1.t = 1
  JOIN brand b0 ON b0.p_brand = c0.p_brand AND b0.t = 0
  JOIN brand b1 ON b1.p_brand = c0.p_brand AND b1.t = 1
  WHERE c0.t = 0
),
eff AS (
  SELECT n_name, p_brand, r0, r1,
         CAST(CAST(r0 AS HUGEINT) * rn1 // rn0 AS BIGINT) - r0 AS ns,
         CAST(CAST(r0 AS HUGEINT) * b1 // b0 AS BIGINT) - r0
             AS brand_growth
  FROM cells
)
SELECT n_name, p_brand, r0 AS rev_base_cents, r1 AS rev_next_cents,
       ns AS national_effect_cents,
       brand_growth - ns AS mix_effect_cents,
       (r1 - r0) - brand_growth AS competitive_effect_cents
FROM eff
ORDER BY n_name, p_brand
""",
    category="relational",
    tags=("defer-window",),
)
def shift_share_nation_brandmix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SHIFT-SHARE ANALYSIS (Dunn 1960, the regional-economics
    workhorse) of each (nation x brand) cell's base→next-year revenue
    change, decomposed into the three effects an FP&A or economic
    analyst separates: NATIONAL effect (what growing at the
    everything-total rate would have added), industry-MIX effect (the
    extra from the cell's brand growing faster/slower than the total),
    and the residual COMPETITIVE effect (the nation's own out/under-
    performance within that brand). The base period is DERIVED — the
    earliest order year in the data, compared against the year after
    it (the repo's derive-the-base doctrine; hardcoded years go
    vacuous when the fixture's date span moves) — normalized to a
    relative index t∈{0,1} so both engines share the frame. Exactness
    follows price_volume_mix_bridge's reconciliation doctrine: each
    growth application is floor(r0·R1/R0) − r0 — the subtraction
    pulled OUTSIDE the floor so the single division runs on a
    non-negative numerator (decimal(38,0) ⟷ HUGEINT cross-products)
    even when a year shrinks — and the competitive effect is the
    exact residual, so the three effects sum to r1−r0 TO THE CENT by
    construction. Scale: one pass over the year-filtered fact join
    (nation/part broadcast, customer shuffled); brand and national
    totals are aggregates OF the cell aggregate, all on the bounded
    25x25xyear domain; the base-year scalar is a broadcast aggregate,
    not a collect."""
    o_all = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.year(F.to_date("o_orderdate")).cast("long").alias("yr"),
    )
    yr0 = o_all.agg(F.min("yr").alias("yr0"))
    o = (
        o_all.crossJoin(F.broadcast(yr0))
        .withColumn("t", F.col("yr") - F.col("yr0"))
        .filter(F.col("t").isin(0, 1))
        .select("o_orderkey", "o_custkey", "t")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", cents(F.col("l_extendedprice")).alias("v")
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("n_name", "p_brand", "t")
        .agg(F.sum("v").alias("rev"))
    )
    brand = base.groupBy(F.col("p_brand").alias("bb"), "t").agg(
        F.sum("rev").alias("b")
    )
    natl = base.groupBy("t").agg(F.sum("rev").alias("r"))
    c0 = base.filter(F.col("t") == 0).select(
        "n_name", "p_brand", F.col("rev").alias("r0")
    )
    c1 = base.filter(F.col("t") == 1).select(
        F.col("n_name").alias("n1n"),
        F.col("p_brand").alias("p1b"),
        F.col("rev").alias("r1"),
    )
    b0 = brand.filter(F.col("t") == 0).select("bb", F.col("b").alias("b0"))
    b1 = brand.filter(F.col("t") == 1).select(
        F.col("bb").alias("bb1"), F.col("b").alias("b1")
    )
    rn = (
        natl.groupBy()
        .agg(
            F.max(F.when(F.col("t") == 0, F.col("r"))).alias("rn0"),
            F.max(F.when(F.col("t") == 1, F.col("r"))).alias("rn1"),
        )
    )
    cells = (
        c0.join(
            c1,
            (F.col("n_name") == F.col("n1n"))
            & (F.col("p_brand") == F.col("p1b")),
        )
        .join(F.broadcast(b0), F.col("p_brand") == F.col("bb"))
        .join(F.broadcast(b1), F.col("p_brand") == F.col("bb1"))
        .crossJoin(F.broadcast(rn))
    )
    ns = F.expr(
        "CAST(CAST(r0 AS DECIMAL(38,0)) * rn1 div rn0 AS BIGINT) - r0"
    )
    bg = F.expr(
        "CAST(CAST(r0 AS DECIMAL(38,0)) * b1 div b0 AS BIGINT) - r0"
    )
    return (
        cells.select(
            "n_name",
            "p_brand",
            F.col("r0").alias("rev_base_cents"),
            F.col("r1").alias("rev_next_cents"),
            ns.alias("national_effect_cents"),
            (bg - ns).alias("mix_effect_cents"),
            (F.col("r1") - F.col("r0") - bg).alias(
                "competitive_effect_cents"
            ),
        )
        .orderBy("n_name", "p_brand")
    )


@register(
    "cochran_armitage_trend_returns",
    oracle="""
WITH lab AS (
  SELECT CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS w,
         CAST(max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, 1
),
g AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n_w,
         CAST(SUM(pos) AS BIGINT) AS r_w
  FROM lab GROUP BY 1
),
s AS (
  SELECT CAST(SUM(n_w) AS BIGINT) AS n,
         CAST(SUM(r_w) AS BIGINT) AS r,
         CAST(SUM(w * n_w) AS BIGINT) AS swn,
         CAST(SUM(w * r_w) AS BIGINT) AS swr,
         CAST(SUM(w * w * n_w) AS BIGINT) AS sw2n
  FROM g
)
SELECT n AS n_total, r AS n_returned, swn AS sum_w_n, swr AS sum_w_r,
       sw2n AS sum_w2_n,
       round(
         CAST(CAST(n AS HUGEINT) * swr - CAST(r AS HUGEINT) * swn
              AS DOUBLE)
         * CAST(CAST(n AS HUGEINT) * swr - CAST(r AS HUGEINT) * swn
                AS DOUBLE)
         / CAST(CAST(r AS HUGEINT) * (n - r) AS DOUBLE)
         * n
         / CAST(CAST(n AS HUGEINT) * sw2n
                - CAST(swn AS HUGEINT) * swn AS DOUBLE)
         * 1000000) / 1000000 AS z_squared
FROM s
""",
    category="relational",
    tags=("defer-window",),
)
def cochran_armitage_trend_returns(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COCHRAN-ARMITAGE TREND TEST: does return probability move
    MONOTONICALLY with order priority (an ORDERED 1..5 dose)? The
    ordered-alternative refinement of ab_chi_square /
    contingency_residuals_segment_priority — chi-square spends its
    power on any deviation; CA concentrates it on the linear trend a
    dose-response analyst actually posits. All five moment sums (n, R,
    Σwn, Σwr, Σw²n) are exact int64 from ONE pass over the per-order
    aggregate; Z² = (N·Σwr − R·Σwn)²·N / (R(N−R)·(N·Σw²n − (Σwn)²))
    is then a FIXED IEEE tree over those exact moments (the
    Wilson/CUPED doctrine: decimal/HUGEINT cross-products cast once to
    double, identical operation order in both engines, one closing
    ppm round). Scale: the orderkey fact-fact join is the only
    shuffle; the dose table is 5 rows."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag"
    )
    lab = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            F.substring("o_orderpriority", 1, 1).cast("long").alias("w"),
        )
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("pos")
        )
    )
    g = lab.groupBy("w").agg(
        F.count("*").alias("n_w"), F.sum("pos").alias("r_w")
    )
    s = g.agg(
        F.sum("n_w").alias("n"),
        F.sum("r_w").alias("r"),
        F.sum(F.col("w") * F.col("n_w")).alias("swn"),
        F.sum(F.col("w") * F.col("r_w")).alias("swr"),
        F.sum(F.col("w") * F.col("w") * F.col("n_w")).alias("sw2n"),
    )
    dec = "decimal(38,0)"
    t = (
        F.col("n").cast(dec) * F.col("swr")
        - F.col("r").cast(dec) * F.col("swn")
    ).cast("double")
    a = (F.col("r").cast(dec) * (F.col("n") - F.col("r"))).cast("double")
    b = (
        F.col("n").cast(dec) * F.col("sw2n")
        - F.col("swn").cast(dec) * F.col("swn")
    ).cast("double")
    z2 = t * t / a * F.col("n") / b
    return s.select(
        F.col("n").alias("n_total"),
        F.col("r").alias("n_returned"),
        F.col("swn").alias("sum_w_n"),
        F.col("swr").alias("sum_w_r"),
        F.col("sw2n").alias("sum_w2_n"),
        (F.round(z2 * 1000000) / 1000000).alias("z_squared"),
    )


@register(
    "cliffs_delta_sources",
    oracle="""
WITH pts AS (
  SELECT n_chars AS v,
         CAST(count(*) FILTER (WHERE source = 'src0') AS BIGINT) AS c1,
         CAST(count(*) FILTER (WHERE source = 'src1') AS BIGINT) AS c2
  FROM documents WHERE source IN ('src0', 'src1')
  GROUP BY n_chars
),
cum AS (
  SELECT v, c1, c2,
         CAST(SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c2
              AS BIGINT) AS f2_before,
         CAST(SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS f2_incl
  FROM pts
),
n AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
  FROM pts
),
s AS (
  SELECT SUM(CAST(cum.c1 AS HUGEINT) * cum.f2_before) AS gt,
         SUM(CAST(cum.c1 AS HUGEINT) * (n.n2 - cum.f2_incl)) AS lt
  FROM cum CROSS JOIN n
)
SELECT n.n1, n.n2,
       CAST(s.gt AS BIGINT) AS n_pairs_greater,
       CAST(s.lt AS BIGINT) AS n_pairs_less,
       CAST(((s.gt - s.lt) + CAST(n.n1 AS HUGEINT) * n.n2) * 1000000
            // (CAST(n.n1 AS HUGEINT) * n.n2) - 1000000
            AS BIGINT) AS cliffs_delta_ppm
FROM n CROSS JOIN s
""",
    category="relational",
    tags=("defer-window",),
)
def cliffs_delta_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIFF'S DELTA between src0's and src1's document lengths — the
    ORDINAL effect size (P(x>y) − P(x<y), in [−1,1]) that reviewers
    ask for next to mann_whitney_u_sources' p-value machinery: MW says
    WHETHER the distributions differ, delta says HOW MUCH, robustly
    (|δ|<.147 negligible / .33 / .474 are the standard fences). The
    pair counts come from the same value-grain cumulative table as
    KS/MW — Σ c1(v)·F2(<v) pairs where src0 wins, Σ c1(v)·(n2−F2(≤v))
    where it loses, ties excluded by construction — accumulated in
    decimal(38,0) ⟷ HUGEINT (pair counts are quadratic in corpus
    size). Delta can be negative, so the ppm floor-division is
    shift-guarded by +n1·n2 (constant pulled back out after the
    floor), keeping both engines on the shared non-negative floor
    path. Scale shape identical to ks_statistic_sources."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.filter(F.col("source").isin("src0", "src1")).select(
        F.col("n_chars").alias("v"),
        F.when(F.col("source") == "src0", 1).otherwise(2).alias("src"),
    )
    pts = s.groupBy("v").agg(
        F.sum(F.when(F.col("src") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("src") == 2, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    cum = with_grouped_cumsum(
        pts, [], F.col("v"), ["v"], ["c1", "c2"]
    ).select(
        "c1",
        (F.col("_cum_c2") - F.col("c2")).alias("f2_before"),
        F.col("_cum_c2").alias("f2_incl"),
    )
    n = pts.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    dec = "decimal(38,0)"
    sums = cum.crossJoin(F.broadcast(n)).agg(
        F.sum(F.col("c1").cast(dec) * F.col("f2_before")).alias("gt"),
        F.sum(
            F.col("c1").cast(dec) * (F.col("n2") - F.col("f2_incl"))
        ).alias("lt"),
    )
    return n.crossJoin(F.broadcast(sums)).select(
        "n1",
        "n2",
        F.col("gt").cast("long").alias("n_pairs_greater"),
        F.col("lt").cast("long").alias("n_pairs_less"),
        F.expr(
            "CAST(((gt - lt) + CAST(n1 AS DECIMAL(38,0)) * n2)"
            " * 1000000 div (CAST(n1 AS DECIMAL(38,0)) * n2)"
            " - 1000000 AS BIGINT)"
        ).alias("cliffs_delta_ppm"),
    )


@register(
    "page_trend_test_priorities",
    oracle="""
WITH cell AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS yyyymm,
         CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS j,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
              // count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1, 2
),
full_blocks AS (
  SELECT yyyymm FROM cell GROUP BY 1 HAVING count(*) = 5
),
rk AS (
  SELECT c.yyyymm, c.j,
         CAST(row_number() OVER (PARTITION BY c.yyyymm
                                 ORDER BY c.x, c.j) AS BIGINT) AS r
  FROM cell c JOIN full_blocks f ON f.yyyymm = c.yyyymm
),
s AS (
  SELECT CAST(count(DISTINCT yyyymm) AS BIGINT) AS m,
         CAST(SUM(j * r) AS BIGINT) AS l
  FROM rk
)
SELECT m AS n_blocks, l AS page_l,
       m * 5 * 36 // 4 AS e_l,
       round((CAST(l AS DOUBLE) - CAST(m * 5 * 36 AS DOUBLE) / 4)
             * (CAST(l AS DOUBLE) - CAST(m * 5 * 36 AS DOUBLE) / 4)
             / (CAST(m AS DOUBLE) * 25 * 6 * 24 / 144)
             * 1000000) / 1000000 AS z_squared
FROM s
""",
    category="relational",
    tags=("defer-window",),
)
def page_trend_test_priorities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PAGE'S TREND TEST (L statistic) — the ordered-alternative
    refinement of the Friedman/Kendall-W family, asking whether mean
    order value moves MONOTONICALLY with priority 1→5 consistently
    across month blocks (cochran_armitage_trend_returns is the binary-
    outcome dose test; Page's L is its continuous-outcome block
    sibling). Each complete month block ranks the 5 priorities by
    their mean order value (floored-mean cents — exact, deterministic
    tie-break by priority); L = Σ_blocks Σ_j j·rank_j, an exact int64.
    Incomplete blocks (< 5 priorities observed) are EXCLUDED by a
    count guard rather than silently ranked short. Under H0,
    E[L] = m·k(k+1)²/4 = 45m and Var = m·k²(k+1)(k²−1)/144 = 25m;
    z² = (L−E)²/Var is a fixed IEEE tree over the exact integers
    (k = 5 constants folded as literals in both engines). Scale: the
    fact table aggregates once onto the (month x 5) cell domain;
    ranks run in 5-row month partitions."""
    o = load_table(spark, sf_dir, "orders")
    cell = o.groupBy(
        (
            F.year(F.to_date("o_orderdate")) * 100
            + F.month(F.to_date("o_orderdate"))
        )
        .cast("long")
        .alias("yyyymm"),
        F.substring("o_orderpriority", 1, 1).cast("long").alias("j"),
    ).agg(
        F.expr(
            "sum(CAST(round(o_totalprice * 100) AS BIGINT))"
            " div count(*)"
        ).alias("x")
    )
    full_blocks = (
        cell.groupBy(F.col("yyyymm").alias("fb"))
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") == 5)
        .select("fb")
    )
    rk = (
        cell.join(F.broadcast(full_blocks), cell.yyyymm == F.col("fb"))
        .withColumn(
            "r",
            F.row_number()
            .over(Window.partitionBy("yyyymm").orderBy("x", "j"))
            .cast("long"),
        )
    )
    s = rk.agg(
        F.countDistinct("yyyymm").alias("m"),
        F.sum(F.col("j") * F.col("r")).alias("l"),
    )
    e_d = F.col("m").cast("double") * 5 * 36 / 4
    z2 = (
        (F.col("l").cast("double") - e_d)
        * (F.col("l").cast("double") - e_d)
        / (F.col("m").cast("double") * 25 * 6 * 24 / 144)
    )
    return s.select(
        F.col("m").alias("n_blocks"),
        F.col("l").alias("page_l"),
        F.expr("m * 5 * 36 div 4").alias("e_l"),
        (F.round(z2 * 1000000) / 1000000).alias("z_squared"),
    )


@register(
    "effect_size_cohens_d_segments",
    oracle="""
WITH v AS (
  SELECT c.c_mktsegment AS seg,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
),
m AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s,
         SUM(CAST(x AS HUGEINT) * x) AS sxx
  FROM v GROUP BY 1
),
w AS (
  SELECT b.n AS n1, b.s AS s1, b.sxx AS sxx1,
         a.n AS n2, a.s AS s2, a.sxx AS sxx2
  FROM m b, m a WHERE b.seg = 'BUILDING' AND a.seg = 'MACHINERY'
)
SELECT n1, n2,
       round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             / sqrt((CAST(CAST(n1 AS HUGEINT) * sxx1
                          - CAST(s1 AS HUGEINT) * s1 AS DOUBLE) / n1
                     + CAST(CAST(n2 AS HUGEINT) * sxx2
                            - CAST(s2 AS HUGEINT) * s2 AS DOUBLE) / n2)
                    / (CAST(n1 AS DOUBLE) + n2 - 2))
             * 1000000) / 1000000 AS cohens_d,
       round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             / sqrt((CAST(CAST(n1 AS HUGEINT) * sxx1
                          - CAST(s1 AS HUGEINT) * s1 AS DOUBLE) / n1
                     + CAST(CAST(n2 AS HUGEINT) * sxx2
                            - CAST(s2 AS HUGEINT) * s2 AS DOUBLE) / n2)
                    / (CAST(n1 AS DOUBLE) + n2 - 2))
             * (1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE) + n2 - 2) - 1.0))
             * 1000000) / 1000000 AS hedges_g
FROM w
""",
    category="relational",
    tags=("defer-window",),
)
def effect_size_cohens_d_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COHEN'S d and HEDGES' g between BUILDING's and MACHINERY's
    order values — the standardized-mean-difference effect sizes that
    welch_t_test_segments' t statistic gets divided into for
    meta-analysis (t answers 'significant?'; d answers 'how big, in
    pooled-sd units', and g applies the small-sample bias correction
    J = 1 − 3/(4·df−1)). The pooled variance comes from the exact
    128-bit moment complements n·Σx² − (Σx)² (decimal(38,0) ⟷
    HUGEINT — Σx² of cent values breaches int64 near sf1), divided by
    df = n1+n2−2 in ONE fixed IEEE tree — the Wilson/CUPED doctrine:
    identical literals, identical operation order, one closing ppm
    round, so both engines produce the same double bit-for-bit.
    Scale: one shuffled customer join (fact-sized dim, never
    broadcast), then two 1-row moment frames."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    v = (
        o.join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            F.col("c_mktsegment").alias("seg"),
            cents(F.col("o_totalprice")).alias("x"),
        )
    )
    dec = "decimal(38,0)"
    m = v.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum((F.col("x").cast(dec) * F.col("x"))).alias("sxx"),
    )
    b = m.filter(F.col("seg") == "BUILDING").select(
        F.col("n").alias("n1"),
        F.col("s").alias("s1"),
        F.col("sxx").alias("sxx1"),
    )
    a = m.filter(F.col("seg") == "MACHINERY").select(
        F.col("n").alias("n2"),
        F.col("s").alias("s2"),
        F.col("sxx").alias("sxx2"),
    )
    w = b.crossJoin(F.broadcast(a))
    mean_gap = (
        F.col("s1").cast("double") / F.col("n1")
        - F.col("s2").cast("double") / F.col("n2")
    )
    css1 = (
        F.col("n1").cast(dec) * F.col("sxx1")
        - F.col("s1").cast(dec) * F.col("s1")
    ).cast("double") / F.col("n1")
    css2 = (
        F.col("n2").cast(dec) * F.col("sxx2")
        - F.col("s2").cast(dec) * F.col("s2")
    ).cast("double") / F.col("n2")
    df_ = F.col("n1").cast("double") + F.col("n2") - 2
    d = mean_gap / F.sqrt((css1 + css2) / df_)
    g = d * (F.lit(1.0) - F.lit(3.0) / (F.lit(4.0) * df_ - F.lit(1.0)))
    return w.select(
        "n1",
        "n2",
        (F.round(d * 1000000) / 1000000).alias("cohens_d"),
        (F.round(g * 1000000) / 1000000).alias("hedges_g"),
    )


@register(
    "neyman_allocation_segments",
    oracle="""
WITH v AS (
  SELECT c.c_mktsegment AS segment,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
m AS (
  SELECT segment, CAST(count(*) AS BIGINT) AS n_h,
         CAST(SUM(x) AS BIGINT) AS s,
         SUM(CAST(x AS HUGEINT) * x) AS sxx
  FROM v GROUP BY 1
),
wts AS (
  SELECT segment, n_h,
         CASE WHEN n_h >= 2 THEN
           CAST(floor(sqrt(CAST(CAST(n_h AS HUGEINT) * sxx
                                - CAST(s AS HUGEINT) * s AS DOUBLE)
                           / (CAST(n_h AS DOUBLE) * (n_h - 1)))
                      * 1000) AS BIGINT)
         ELSE 0 END AS sd_milli_cents
  FROM m
),
tot AS (
  SELECT SUM(CAST(n_h AS HUGEINT) * sd_milli_cents) AS w_tot FROM wts
),
shares AS (
  SELECT w.segment, w.n_h, w.sd_milli_cents,
         CAST(1000 * CAST(w.n_h AS HUGEINT) * w.sd_milli_cents
              // t.w_tot AS BIGINT) AS floor_share,
         1000 * CAST(w.n_h AS HUGEINT) * w.sd_milli_cents
           % t.w_tot AS rem
  FROM wts w CROSS JOIN tot t
),
ranked AS (
  SELECT *,
         CAST(row_number() OVER (ORDER BY rem DESC, segment)
              AS BIGINT) AS rk,
         CAST(SUM(floor_share) OVER () AS BIGINT) AS floor_sum
  FROM shares
)
SELECT segment, n_h, sd_milli_cents,
       floor_share + CASE WHEN rk <= 1000 - floor_sum
                     THEN 1 ELSE 0 END AS alloc_n
FROM ranked ORDER BY segment
""",
    category="relational",
    tags=("defer-window",),
)
def neyman_allocation_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """NEYMAN OPTIMAL ALLOCATION of a 1000-sample audit budget across
    market-segment strata — the survey-sampling design rule n_h ∝
    N_h·S_h (sample variance-minimizing under fixed budget) that
    stratified samplers should use where sample_by_key_stratified's
    proportional allocation over-samples homogeneous strata. Each
    stratum's sd comes from the exact 128-bit moment complement,
    then is FLOORED to integer milli-cents (floor(sqrt·1000) — sqrt
    and floor are both deterministic cross-engine), so the weights
    N_h·sd_milli are exact integers and the budget split reuses the
    prorate_fee_largest_remainder discipline: floor shares
    1000·w_h div W, leftover units to the largest integer remainders
    (ties to segment name) — allocations sum to EXACTLY 1000 by
    construction, the invariant naive rounding violates. Scale: one
    shuffled customer join (fact-sized dim), then all allocation
    arithmetic on the 5-row strata frame."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    dec = "decimal(38,0)"
    m = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            cents(F.col("o_totalprice")).alias("x"),
        )
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_h"),
            F.sum("x").alias("s"),
            F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        )
    )
    css = (
        F.col("n_h").cast(dec) * F.col("sxx")
        - F.col("s").cast(dec) * F.col("s")
    ).cast("double")
    wts = m.select(
        "segment",
        "n_h",
        F.when(
            F.col("n_h") >= 2,
            F.floor(
                F.sqrt(
                    css / (F.col("n_h").cast("double") * (F.col("n_h") - 1))
                )
                * 1000
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("sd_milli_cents"),
    )
    tot = wts.agg(
        F.sum(F.col("n_h").cast(dec) * F.col("sd_milli_cents")).alias(
            "w_tot"
        )
    )
    shares = wts.crossJoin(F.broadcast(tot)).select(
        "segment",
        "n_h",
        "sd_milli_cents",
        F.expr(
            "CAST(1000 * CAST(n_h AS DECIMAL(38,0)) * sd_milli_cents"
            " div w_tot AS BIGINT)"
        ).alias("floor_share"),
        F.expr(
            "1000 * CAST(n_h AS DECIMAL(38,0)) * sd_milli_cents"
            " % w_tot"
        ).alias("rem"),
    )
    wr = Window.orderBy(F.col("rem").desc(), "segment")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = shares.select(
        "segment",
        "n_h",
        "sd_milli_cents",
        "floor_share",
        F.row_number().over(wr).cast("long").alias("rk"),
        F.sum("floor_share").over(wall).alias("floor_sum"),
    )
    return ranked.select(
        "segment",
        "n_h",
        "sd_milli_cents",
        (
            F.col("floor_share")
            + F.when(
                F.col("rk") <= 1000 - F.col("floor_sum"), 1
            ).otherwise(0)
        ).alias("alloc_n"),
    ).orderBy("segment")


@register(
    "ansari_bradley_sources",
    oracle="""
WITH pts AS (
  SELECT n_chars AS v,
         CAST(count(*) FILTER (WHERE source = 'src0') AS BIGINT) AS c1,
         CAST(count(*) FILTER (WHERE source = 'src1') AS BIGINT) AS c2
  FROM documents WHERE source IN ('src0', 'src1')
  GROUP BY n_chars
),
cum AS (
  SELECT v, c1, c2,
         CAST(SUM(c1 + c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              - (c1 + c2) AS BIGINT) AS before_all
  FROM pts
),
n AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
         CAST(SUM(c1 + c2) AS BIGINT) AS nt
  FROM pts
),
blocks AS (
  SELECT cum.c1, cum.c2,
         cum.before_all + 1 AS a,
         cum.before_all + cum.c1 AS b1,
         cum.before_all + cum.c1 + cum.c2 AS b,
         n.nt + 1 AS mm,
         (n.nt + 1) // 2 AS h
  FROM cum CROSS JOIN n
),
scored AS (
  SELECT
    CASE WHEN c1 > 0 AND least(b1, h) >= a THEN
      CAST((a + least(b1, h)) AS HUGEINT)
        * (least(b1, h) - a + 1) // 2 ELSE 0 END
    + CASE WHEN c1 > 0 AND b1 >= greatest(a, h + 1) THEN
      CAST((mm - greatest(a, h + 1) + mm - b1) AS HUGEINT)
        * (b1 - greatest(a, h + 1) + 1) // 2 ELSE 0 END AS t1,
    CASE WHEN least(b, h) >= a THEN
      CAST((a + least(b, h)) AS HUGEINT)
        * (least(b, h) - a + 1) // 2 ELSE 0 END
    + CASE WHEN b >= greatest(a, h + 1) THEN
      CAST((mm - greatest(a, h + 1) + mm - b) AS HUGEINT)
        * (b - greatest(a, h + 1) + 1) // 2 ELSE 0 END AS t_all
  FROM blocks
)
SELECT n.n1, n.n2,
       CAST(SUM(s.t1) AS BIGINT) AS ab1_score_sum,
       CAST(SUM(s.t_all) AS BIGINT) AS total_score_sum,
       CAST(SUM(s.t1) * 1000000 // SUM(s.t_all) AS BIGINT)
           AS ab1_share_ppm,
       CAST(CAST(n.n1 AS HUGEINT) * 1000000 // n.nt AS BIGINT)
           AS expected_share_ppm
FROM scored s CROSS JOIN n
GROUP BY n.n1, n.n2, n.nt
""",
    category="relational",
    tags=("defer-window",),
)
def ansari_bradley_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ANSARI-BRADLEY SCALE TEST between src0's and src1's document
    lengths — the rank test for DISPERSION that completes the
    two-sample trio (ks: shape, mann-whitney: location, AB: spread):
    rank the pooled values, score each rank r as min(r, N+1−r) —
    small at BOTH extremes — and sum sample-1's scores; a sample
    concentrated in the middle scores high (tighter spread). Ties use
    the repo's DETERMINISTIC policy (documented here, mirrored
    exactly: within a tied value block, sample-1 occupies the lower
    ranks), so each block's sample-1 score is a CLOSED-FORM integer —
    the V-shaped score sum over a rank range splits at h = (N+1) div 2
    into two arithmetic series, each an exact (p+q)(q−p+1)/2 with the
    product always even. Published as the sample-1 share of total
    score (ppm) against its H0 expectation n1/N — both single int64
    floor-divisions; series sums accumulate in decimal(38,0) ⟷
    HUGEINT (quadratic in corpus size). Scale shape identical to
    ks_statistic_sources: value-grain counts, binned 2-pass
    cumulative, bounded final frame."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.filter(F.col("source").isin("src0", "src1")).select(
        F.col("n_chars").alias("v"),
        F.when(F.col("source") == "src0", 1).otherwise(2).alias("src"),
    )
    pts = s.groupBy("v").agg(
        F.sum(F.when(F.col("src") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("src") == 2, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    cum = with_grouped_cumsum(
        pts, [], F.col("v"), ["v"], ["c1", "c2"]
    ).select(
        "c1",
        "c2",
        (
            F.col("_cum_c1") + F.col("_cum_c2") - F.col("c1") - F.col("c2")
        ).alias("before_all"),
    )
    n = pts.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        (F.sum("c1") + F.sum("c2")).alias("nt"),
    )
    blocks = cum.crossJoin(F.broadcast(n)).select(
        "c1",
        "c2",
        "n1",
        "n2",
        "nt",
        (F.col("before_all") + 1).alias("a"),
        (F.col("before_all") + F.col("c1")).alias("b1"),
        (F.col("before_all") + F.col("c1") + F.col("c2")).alias("b"),
        (F.col("nt") + 1).alias("mm"),
        F.expr("(nt + 1) div 2").alias("h"),
    )

    def vsum(lo: str, hi: str) -> F.Column:
        # sum of min(r, mm - r) for r in [lo, hi], split at h
        asc = F.expr(
            f"CASE WHEN least({hi}, h) >= {lo} THEN"
            f" CAST(({lo} + least({hi}, h)) AS DECIMAL(38,0))"
            f" * (least({hi}, h) - {lo} + 1) div 2 ELSE 0 END"
        )
        desc = F.expr(
            f"CASE WHEN {hi} >= greatest({lo}, h + 1) THEN"
            f" CAST((mm - greatest({lo}, h + 1) + mm - {hi})"
            f" AS DECIMAL(38,0))"
            f" * ({hi} - greatest({lo}, h + 1) + 1) div 2 ELSE 0 END"
        )
        return asc.cast("decimal(38,0)") + desc.cast("decimal(38,0)")

    scored = blocks.select(
        "n1",
        "n2",
        "nt",
        F.when(F.col("c1") > 0, vsum("a", "b1"))
        .otherwise(F.lit(0).cast("decimal(38,0)"))
        .alias("t1"),
        vsum("a", "b").alias("t_all"),
    )
    return (
        scored.groupBy("n1", "n2", "nt")
        .agg(F.sum("t1").alias("ab1"), F.sum("t_all").alias("tall"))
        .select(
            "n1",
            "n2",
            F.col("ab1").cast("long").alias("ab1_score_sum"),
            F.col("tall").cast("long").alias("total_score_sum"),
            F.expr(
                "CAST(ab1 * 1000000 div tall AS BIGINT)"
            ).alias("ab1_share_ppm"),
            F.expr(
                "CAST(CAST(n1 AS DECIMAL(38,0)) * 1000000 div nt"
                " AS BIGINT)"
            ).alias("expected_share_ppm"),
        )
    )


@register(
    "abc_xyz_matrix_parts",
    oracle="""
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS rev
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT l_partkey, rev,
         CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey)
              AS BIGINT) AS cum,
         CAST(SUM(rev) OVER () AS BIGINT) AS tot
  FROM rev
),
abc AS (
  SELECT l_partkey, rev,
         CASE WHEN cum * 5 <= tot * 4 THEN 'A'
              WHEN cum * 20 <= tot * 19 THEN 'B'
              ELSE 'C' END AS abc_class,
         tot
  FROM ranked
),
mq AS (
  SELECT l_partkey,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(q) AS BIGINT) AS s,
         SUM(CAST(q AS HUGEINT) * q) AS sqq
  FROM (
    SELECT l_partkey,
           CAST(EXTRACT(year FROM l_shipdate) * 100
                + EXTRACT(month FROM l_shipdate) AS BIGINT) AS ym,
           CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
    FROM lineitem GROUP BY 1, 2
  ) GROUP BY 1
),
xyz AS (
  SELECT l_partkey,
         CASE WHEN n < 2 THEN 'Z'
              WHEN 4 * CAST(n AS HUGEINT)
                   * (CAST(n AS HUGEINT) * sqq
                      - CAST(s AS HUGEINT) * s)
                   <= CAST(n - 1 AS HUGEINT) * s * s THEN 'X'
              WHEN CAST(n AS HUGEINT)
                   * (CAST(n AS HUGEINT) * sqq
                      - CAST(s AS HUGEINT) * s)
                   <= CAST(n - 1 AS HUGEINT) * s * s THEN 'Y'
              ELSE 'Z' END AS xyz_class
  FROM mq
)
SELECT a.abc_class, x.xyz_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(SUM(a.rev) AS BIGINT) AS rev_cents,
       CAST(SUM(a.rev) * 1000000 // max(a.tot) AS BIGINT)
           AS rev_share_ppm
FROM abc a JOIN xyz x ON x.l_partkey = a.l_partkey
GROUP BY 1, 2 ORDER BY 1, 2
""",
    category="relational",
    tags=("defer-window",),
)
def abc_xyz_matrix_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ INVENTORY MATRIX — the 9-cell planning grid supply
    chains actually run on, crossing abc_classification_parts'
    revenue-concentration axis (A: top 80% of cumulative revenue, B:
    to 95%, C: tail) with demand-VARIABILITY classes from each part's
    monthly quantity series (X: cv ≤ 0.5 steady, Y: cv ≤ 1.0, Z:
    erratic or < 2 observed months): AX parts get automated
    replenishment, CZ gets make-to-order. The cv thresholds are EXACT
    integer predicates — cv² = n·(n·Σq² − S²)/((n−1)·S²), so cv ≤ ½ ⟺
    4n·(nΣq² − S²) ≤ (n−1)·S², all cross-products in decimal(38,0) ⟷
    HUGEINT, no float, no sqrt. ABC reuses the descending binned
    global cumsum; XYZ is two stacked aggregations (month then part).
    Scale: two passes over lineitem, everything after on the part
    domain; the final matrix is ≤ 9 rows."""
    from spark_lever_spark.operators.grank import with_global_rank

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(cents(F.col("l_extendedprice"))).alias("rev")
    )
    ranked = with_global_rank(
        rev, -F.col("rev"), ["l_partkey"], value="rev"
    )
    abc = ranked.select(
        "l_partkey",
        "rev",
        F.col("_s_tot").alias("tot"),
        F.when(F.col("_cum") * 5 <= F.col("_s_tot") * 4, "A")
        .when(F.col("_cum") * 20 <= F.col("_s_tot") * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    dec = "decimal(38,0)"
    mq = (
        li.groupBy(
            F.col("l_partkey").alias("xp"),
            (
                F.year(F.to_date("l_shipdate")) * 100
                + F.month(F.to_date("l_shipdate"))
            )
            .cast("long")
            .alias("ym"),
        )
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("q"))
        .groupBy("xp")
        .agg(
            F.count("*").alias("n"),
            F.sum("q").alias("s"),
            F.sum(F.col("q").cast(dec) * F.col("q")).alias("sqq"),
        )
    )
    css = F.col("n").cast(dec) * F.col("sqq") - F.col("s").cast(
        dec
    ) * F.col("s")
    rhs = (F.col("n") - 1).cast(dec) * F.col("s") * F.col("s")
    xyz = mq.select(
        "xp",
        F.when(F.col("n") < 2, "Z")
        .when(4 * F.col("n").cast(dec) * css <= rhs, "X")
        .when(F.col("n").cast(dec) * css <= rhs, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    return (
        abc.join(xyz, abc.l_partkey == xyz.xp)
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("rev").alias("rev_cents"),
            F.expr(
                "CAST(SUM(rev) * 1000000 div max(tot) AS BIGINT)"
            ).alias("rev_share_ppm"),
        )
        .orderBy("abc_class", "xyz_class")
    )


@register(
    "raking_calibration_segment_priority",
    oracle="""
WITH pop AS (
  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
         CAST(count(*) AS BIGINT) AS n_pop,
         CAST(SUM(CASE WHEN o.o_orderkey % 10 = 7 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_sample
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
cells AS (SELECT * FROM pop WHERE n_sample > 0),
rowm AS (
  SELECT segment,
         CAST(SUM(n_pop) AS BIGINT) AS p_seg,
         CAST(SUM(n_sample) AS BIGINT) AS s_seg
  FROM cells GROUP BY 1
),
w1 AS (
  SELECT c.segment, c.priority, c.n_pop, c.n_sample,
         CAST(1000000 AS HUGEINT) * r.p_seg * 1000000
           // (CAST(r.s_seg AS HUGEINT) * 1000000) AS w1_ppm
  FROM cells c JOIN rowm r ON r.segment = c.segment
),
colm AS (
  SELECT priority,
         CAST(SUM(n_pop) AS BIGINT) AS p_pri,
         SUM(CAST(n_sample AS HUGEINT) * w1_ppm) AS ws_pri
  FROM w1 GROUP BY 1
),
w2 AS (
  SELECT w1.segment, w1.priority, w1.n_pop, w1.n_sample,
         w1.w1_ppm * (CAST(cm.p_pri AS HUGEINT) * 1000000)
           // cm.ws_pri AS w2_ppm
  FROM w1 JOIN colm cm ON cm.priority = w1.priority
)
SELECT segment, priority, n_pop, n_sample,
       CAST(w2_ppm AS BIGINT) AS weight_ppm,
       CAST(CAST(n_sample AS HUGEINT) * w2_ppm // 1000000 AS BIGINT)
           AS weighted_n
FROM w2 ORDER BY segment, priority
""",
    category="relational",
    tags=("defer-window",),
)
def raking_calibration_segment_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RAKING / ITERATIVE PROPORTIONAL FITTING (one full row+column
    cycle) — the survey-weighting calibration that post-stratifies a
    sample to match POPULATION margins on two dimensions at once: a
    10% deterministic sample (orderkey % 10 = 7) of orders is
    re-weighted so segment margins match exactly (row step), then
    priority margins (column step — partially disturbing the row
    match, which is WHY raking iterates; one cycle shown, the
    fixed-point machinery identical for more). Where
    sample_by_key_stratified draws a stratified sample, raking
    repairs one drawn otherwise. Weights live in exact ppm integers:
    each scaling factor is one non-negative floor-division of
    decimal(38,0) ⟷ HUGEINT cross-products (population margin ×
    current weighted margin), so both engines walk the identical
    integer trajectory — no float drift across iterations, the
    property that makes the calibration REPLAYABLE. Scale: one
    shuffled customer join computes population and sample cells in
    the same pass (conditional count); everything after lives on the
    25-cell frame."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    pop = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.count("*").alias("n_pop"),
            F.sum(
                F.when(F.col("o_orderkey") % 10 == 7, 1).otherwise(0)
            ).alias("n_sample"),
        )
        .filter(F.col("n_sample") > 0)
    )
    dec = "decimal(38,0)"
    rowm = pop.groupBy(F.col("segment").alias("rs")).agg(
        F.sum("n_pop").alias("p_seg"), F.sum("n_sample").alias("s_seg")
    )
    w1 = pop.join(F.broadcast(rowm), F.col("segment") == F.col("rs")).select(
        "segment",
        "priority",
        "n_pop",
        "n_sample",
        F.expr(
            "CAST(1000000 AS DECIMAL(38,0)) * p_seg * 1000000"
            " div (CAST(s_seg AS DECIMAL(38,0)) * 1000000)"
        ).alias("w1_ppm"),
    )
    colm = w1.groupBy(F.col("priority").alias("cp")).agg(
        F.sum("n_pop").alias("p_pri"),
        F.sum(F.col("n_sample").cast(dec) * F.col("w1_ppm")).alias(
            "ws_pri"
        ),
    )
    w2 = w1.join(F.broadcast(colm), F.col("priority") == F.col("cp")).select(
        "segment",
        "priority",
        "n_pop",
        "n_sample",
        F.expr(
            "w1_ppm * (CAST(p_pri AS DECIMAL(38,0)) * 1000000)"
            " div ws_pri"
        ).alias("w2_ppm"),
    )
    return w2.select(
        "segment",
        "priority",
        "n_pop",
        "n_sample",
        F.col("w2_ppm").cast("long").alias("weight_ppm"),
        F.expr(
            "CAST(CAST(n_sample AS DECIMAL(38,0)) * w2_ppm div 1000000"
            " AS BIGINT)"
        ).alias("weighted_n"),
    ).orderBy("segment", "priority")


@register(
    "moods_median_test_segments",
    oracle="""
WITH j AS (
  SELECT c.c_mktsegment AS segment, o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
med AS (
  SELECT x AS m FROM (
    SELECT x, o_orderkey,
           row_number() OVER (ORDER BY x, o_orderkey) AS rk,
           count(*) OVER () AS n
    FROM j
  ) WHERE rk = (n + 1) // 2
),
cell AS (
  SELECT segment,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(SUM(CASE WHEN j.x > med.m THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above
  FROM j, med GROUP BY segment
),
marg AS (
  SELECT segment, n_orders, n_above,
         CAST(SUM(n_orders) OVER () AS BIGINT) AS n,
         CAST(SUM(n_above) OVER () AS BIGINT) AS a
  FROM cell
)
SELECT segment, n_orders, n_above,
       round(CAST(n_orders AS DOUBLE) * a / n * 1000000) / 1000000
           AS expected_above,
       round((CAST(n_above AS DOUBLE)
              - CAST(n_orders AS DOUBLE) * a / n)
             / sqrt(CAST(n_orders AS DOUBLE) * a / n
                    * (1 - CAST(n_orders AS DOUBLE) / n)
                    * (1 - CAST(a AS DOUBLE) / n))
             * 1000000) / 1000000 AS adj_residual
FROM marg ORDER BY segment
""",
    category="relational",
    tags=("defer-window",),
)
def moods_median_test_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MOOD'S MEDIAN TEST across market segments — 'do the segments
    share one median order value?', the k-sample rank-free coarsening
    of kruskal_wallis_priorities (which compares mean RANKS; Mood's
    only asks which side of the pooled median each order falls on, so
    it is robust to any monotone distortion). The pooled median is the
    DISCRETE value at rank (N+1) div 2 of exact cents (ties by
    o_orderkey), extracted with the 2-pass grank machinery — no global
    sort; the above/below split is then a pure integer comparison, so
    every count is bit-identical cross-engine. Per-segment readout is
    the Haberman adjusted residual of the 'above' cell (the
    contingency_residuals_segment_priority per-cell doctrine — one
    fixed IEEE tree per segment over exact int64 marginals, no N-ary
    float sum). customer is FACT-sized by repo doctrine: shuffled
    equi-join on custkey, never broadcast. Scale: two fact-table
    passes (rank + recount against the 1-row broadcast median) and one
    5-row margin window."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        "o_orderkey",
        cents(F.col("o_totalprice")).alias("x"),
    )
    r1 = with_global_rank(j, F.col("x"), ["o_orderkey"])
    med = r1.filter(F.expr("_rk = (_n_tot + 1) div 2")).agg(
        F.max("x").alias("m")
    )
    cell = (
        j.crossJoin(F.broadcast(med))
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.when(F.col("x") > F.col("m"), 1).otherwise(0)
            ).alias("n_above"),
        )
    )
    marg = cell.select(
        "segment",
        "n_orders",
        "n_above",
        F.sum("n_orders").over(Window.partitionBy()).alias("n"),
        F.sum("n_above").over(Window.partitionBy()).alias("a"),
    )
    e = (
        F.col("n_orders").cast("double")
        * F.col("a")
        / F.col("n")
    )
    resid = (F.col("n_above").cast("double") - e) / F.sqrt(
        e
        * (1 - F.col("n_orders").cast("double") / F.col("n"))
        * (1 - F.col("a").cast("double") / F.col("n"))
    )
    return marg.select(
        "segment",
        "n_orders",
        "n_above",
        (F.round(e * 1000000) / 1000000).alias("expected_above"),
        (F.round(resid * 1000000) / 1000000).alias("adj_residual"),
    ).orderBy("segment")


@register(
    "lorenz_curve_customer_deciles",
    oracle="""
WITH rev AS (
  SELECT o_custkey AS ck,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS r
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT ck, r,
         row_number() OVER (ORDER BY r, ck) AS rk,
         count(*) OVER () AS n,
         CAST(SUM(r) OVER () AS HUGEINT) AS s_tot,
         CAST(SUM(r) OVER (ORDER BY r, ck ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) AS HUGEINT) AS cum
  FROM rev
)
SELECT CAST(((rk - 1) * 10) // n + 1 AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(SUM(r) AS BIGINT) AS rev_cents,
       CAST(max(cum) AS BIGINT) AS cum_rev_cents,
       CAST(max(cum) * 1000000 // max(s_tot) AS BIGINT)
           AS cum_share_ppm,
       CAST(max(rk) * 1000000 // max(n) AS BIGINT) AS cum_pop_ppm
FROM ranked
GROUP BY 1 ORDER BY decile
""",
    category="relational",
    tags=("defer-window",),
)
def lorenz_curve_customer_deciles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LORENZ CURVE of customer revenue concentration, published as
    the 10-point decile table ('the bottom 10% of customers hold X ppm
    of revenue') — the CURVE behind gini_customer_revenue's scalar:
    the Gini is twice the area between this curve and the diagonal,
    but the decile readout is what a curation/BI consumer actually
    plots, and each point is EXACT (cumulative cents at the decile
    boundary over total cents, one non-negative ppm floor-division on
    decimal(38,0) ⟷ HUGEINT). Population axis = customers WITH orders,
    ranked ascending by (revenue, custkey); decile = ((rk−1)·10) div n
    — the equal_frequency_buckets closed form, deterministic under
    ties. Rank AND running revenue sum come from ONE with_global_rank
    pass (value='r'): bit-identical to a single-task cumsum, but 2-pass
    parallel — no unpartitioned window ever touches the customer-grain
    frame. Scale: one map-side-combinable fact aggregation to customer
    grain, one grank pass, then a 10-row rollup."""
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("r"))
    )
    ranked = with_global_rank(rev, F.col("r"), ["ck"], value="r")
    return (
        ranked.withColumn(
            "decile", F.expr("((_rk - 1) * 10) div _n_tot + 1")
        )
        .groupBy(F.col("decile").cast("long").alias("decile"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("r").alias("rev_cents"),
            F.max("_cum").alias("cum_rev_cents"),
            F.expr(
                "CAST(max(CAST(_cum AS DECIMAL(38,0))) * 1000000"
                " div max(_s_tot) AS BIGINT)"
            ).alias("cum_share_ppm"),
            F.expr(
                "CAST(max(_rk) * 1000000 div max(_n_tot) AS BIGINT)"
            ).alias("cum_pop_ppm"),
        )
        .orderBy("decile")
    )


@register(
    "on_time_in_full_monthly",
    oracle="""
WITH j AS (
  SELECT o.o_orderkey,
         CAST(EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) * 100
              + EXTRACT(month FROM CAST(o.o_orderdate AS DATE))
              AS BIGINT) AS yyyymm,
         CASE WHEN CAST(l.l_shipdate AS DATE)
                   <= CAST(o.o_orderdate AS DATE) + 30
              THEN 1 ELSE 0 END AS ontime
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
per_order AS (
  SELECT o_orderkey, min(yyyymm) AS yyyymm,
         CAST(min(ontime) AS BIGINT) AS all_on_time,
         CAST(count(*) AS BIGINT) AS n_lines
  FROM j GROUP BY o_orderkey
)
SELECT yyyymm,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(all_on_time) AS BIGINT) AS n_otif,
       CAST(SUM(n_lines) AS BIGINT) AS n_lines,
       CAST(SUM(all_on_time) * 1000000 // count(*) AS BIGINT)
           AS otif_ppm
FROM per_order GROUP BY yyyymm ORDER BY yyyymm
""",
    category="relational",
    tags=("defer-window",),
)
def on_time_in_full_monthly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ON-TIME-IN-FULL rate by order month — the classic supply-chain
    SLA: an order counts only if EVERY line shipped on time (one late
    line fails the whole order — the all-lines conjunction is what
    distinguishes OTIF from q12_late_shipment_priority's line-level
    lens). The shipped data contract has no l_commitdate, so "on
    time" is defined against the order's own clock: shipped within 30
    days of o_orderdate. That forces the join-first shape — orders
    meets lineitem in a FACT-to-FACT shuffled equi-join on orderkey
    (both sides hash-partition on the key — co-located, no broadcast
    of a fact per repo doctrine), then the conjunction is min() over
    a 0/1 indicator grouped by orderkey — map-side combinable, no
    DISTINCT. Rate is one non-negative ppm floor-division of exact
    counts (int64 to any SF — counts, not cents). Scale: one keyed
    shuffle join + two map-side-combinable aggregations, the
    canonical TPC-H orders⋈lineitem shape AQE handles at 1000
    executors."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey)
    per_order = j.groupBy("o_orderkey").agg(
        F.min(
            (
                F.year(F.to_date("o_orderdate")) * 100
                + F.month(F.to_date("o_orderdate"))
            ).cast("long")
        ).alias("yyyymm"),
        F.min(
            F.when(
                F.to_date("l_shipdate")
                <= F.date_add(F.to_date("o_orderdate"), 30),
                1,
            ).otherwise(0)
        ).alias("all_on_time"),
        F.count("*").alias("n_lines"),
    )
    return (
        per_order.groupBy("yyyymm")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("all_on_time").alias("n_otif"),
            F.sum("n_lines").alias("n_lines"),
            F.expr(
                "CAST(sum(all_on_time) * 1000000 div count(*)"
                " AS BIGINT)"
            ).alias("otif_ppm"),
        )
        .orderBy("yyyymm")
    )


@register(
    "backlog_aging_snapshot",
    oracle="""
WITH snap AS (
  SELECT max(CAST(o_orderdate AS DATE)) AS s FROM orders
),
open_orders AS (
  SELECT date_diff('day', CAST(o.o_orderdate AS DATE), snap.s)
             AS age_days,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS c
  FROM orders o CROSS JOIN snap
  WHERE o.o_orderstatus = 'O'
),
bucketed AS (
  SELECT CASE WHEN age_days < 30 THEN 0
              WHEN age_days < 60 THEN 30
              WHEN age_days < 90 THEN 60
              WHEN age_days < 180 THEN 90
              ELSE 180 END AS bucket_lo,
         c
  FROM open_orders
)
SELECT bucket_lo,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(c) AS BIGINT) AS value_cents
FROM bucketed GROUP BY bucket_lo ORDER BY bucket_lo
""",
    category="relational",
    tags=("defer-window",),
)
def backlog_aging_snapshot(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BACKLOG AGING of open orders at the dataset's snapshot date —
    the AR-aging idiom applied to fulfillment: every order still in
    status 'O' is bucketed by how many days it has sat open as of
    max(o_orderdate) (the snapshot is DERIVED, never hardcoded — the
    sf0.001-sparsity doctrine), into the standard 0/30/60/90/180+
    ledger buckets with order counts and exact cents value. The
    snapshot scalar attaches via .agg() (aggregate-derived 1-row
    broadcast, sanctioned by the nested-loop sweep); bucketing is a
    pure CASE over an integer day difference, so the whole readout is
    exact integers end-to-end. Scale: one fact scan + a 5-row rollup;
    the status filter pushes down to the parquet scan."""
    o = load_table(spark, sf_dir, "orders")
    snap = o.agg(F.max(F.to_date("o_orderdate")).alias("s"))
    open_orders = (
        o.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(snap))
        .select(
            F.datediff(F.col("s"), F.to_date("o_orderdate")).alias(
                "age_days"
            ),
            cents(F.col("o_totalprice")).alias("c"),
        )
    )
    bucketed = open_orders.select(
        F.when(F.col("age_days") < 30, 0)
        .when(F.col("age_days") < 60, 30)
        .when(F.col("age_days") < 90, 60)
        .when(F.col("age_days") < 180, 90)
        .otherwise(180)
        .alias("bucket_lo"),
        "c",
    )
    return (
        bucketed.groupBy("bucket_lo")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("c").alias("value_cents"),
        )
        .orderBy("bucket_lo")
    )


@register(
    "slow_moving_parts_by_brand",
    oracle="""
WITH snap AS (
  SELECT max(CAST(l_shipdate AS DATE)) AS s FROM lineitem
),
per_part AS (
  SELECT l_partkey,
         max(CAST(l_shipdate AS DATE)) AS last_ship,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY l_partkey
),
flagged AS (
  SELECT p.p_brand, pp.qty,
         CASE WHEN date_diff('day', pp.last_ship, snap.s) >= 180
              THEN 1 ELSE 0 END AS slow
  FROM per_part pp
  JOIN part p ON p.p_partkey = pp.l_partkey
  CROSS JOIN snap
)
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(SUM(slow) AS BIGINT) AS n_slow,
       CAST(SUM(slow) * 1000000 // count(*) AS BIGINT) AS slow_ppm,
       CAST(SUM(CASE WHEN slow = 1 THEN qty ELSE 0 END) AS BIGINT)
           AS slow_qty
FROM flagged GROUP BY p_brand ORDER BY p_brand
""",
    category="relational",
    tags=("defer-window",),
)
def slow_moving_parts_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SLOW-MOVER / DEAD-STOCK screen rolled up by brand: a part is
    'slow' when its LAST shipment is ≥180 days before the dataset's
    latest shipment (snapshot derived, not hardcoded), reported per
    brand as count, share (exact ppm of counts), and the quantity
    parked in slow movers — the inventory-health complement to
    abc_classification_parts' velocity ranking (ABC ranks by revenue
    RATE; this flags absence of RECENT movement, which ABC's lifetime
    totals can't see). One map-side-combinable per-part aggregation of
    lineitem (max shipdate + quantity), then a broadcast join to the
    part dim (dim-sized by doctrine) and a bounded brand rollup.
    All-integer outputs; the day-difference threshold is a pure date
    comparison."""
    li = load_table(spark, sf_dir, "lineitem")
    snap = li.agg(F.max(F.to_date("l_shipdate")).alias("s"))
    per_part = li.groupBy("l_partkey").agg(
        F.max(F.to_date("l_shipdate")).alias("last_ship"),
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    flagged = (
        per_part.join(
            F.broadcast(p), per_part.l_partkey == p.p_partkey
        )
        .crossJoin(F.broadcast(snap))
        .select(
            "p_brand",
            "qty",
            F.when(
                F.datediff(F.col("s"), F.col("last_ship")) >= 180, 1
            )
            .otherwise(0)
            .alias("slow"),
        )
    )
    return (
        flagged.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("slow").alias("n_slow"),
            F.expr(
                "CAST(sum(slow) * 1000000 div count(*) AS BIGINT)"
            ).alias("slow_ppm"),
            F.sum(
                F.when(F.col("slow") == 1, F.col("qty")).otherwise(0)
            ).alias("slow_qty"),
        )
        .orderBy("p_brand")
    )


@register(
    "anderson_darling_sources",
    oracle="""
WITH pts AS (
  SELECT n_chars AS v,
         CAST(count(*) FILTER (WHERE source = 'src0') AS BIGINT) AS c1,
         CAST(count(*) FILTER (WHERE source = 'src1') AS BIGINT) AS c2
  FROM documents WHERE source IN ('src0', 'src1')
  GROUP BY n_chars
),
cum AS (
  SELECT v, c1 + c2 AS t,
         CAST(SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS f1,
         CAST(SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS f2
  FROM pts
),
n AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
  FROM pts
),
terms AS (
  SELECT SUM(CAST(cum.t AS HUGEINT)
             * (CAST(cum.f1 AS HUGEINT) * n.n2
                - CAST(cum.f2 AS HUGEINT) * n.n1)
             * (CAST(cum.f1 AS HUGEINT) * n.n2
                - CAST(cum.f2 AS HUGEINT) * n.n1)
             * 1000000
             // (CAST(cum.f1 + cum.f2 AS HUGEINT)
                 * (n.n1 + n.n2 - cum.f1 - cum.f2))) AS u
  FROM cum CROSS JOIN n
  WHERE cum.f1 + cum.f2 < n.n1 + n.n2
)
SELECT n.n1, n.n2,
       CAST(terms.u // (CAST(n.n1 AS HUGEINT) * n.n2) AS BIGINT)
           AS ad_micro
FROM n CROSS JOIN terms
""",
    category="relational",
    tags=("defer-window",),
)
def anderson_darling_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-sample ANDERSON-DARLING statistic between src0's and src1's
    document-length distributions — the TAIL-WEIGHTED member of the
    drift-test quartet (ks = supremum gap, mann-whitney = location,
    cramer-von-mises = unweighted integrated gap; AD divides each
    squared CDF gap by B(N−B), which blows up toward the tails, so it
    catches two corpora that differ mainly in their extremes —
    exactly where contamination and truncation artifacts live):
    A² = (1/(n1·n2)) Σ_pooled t·(F1−F2)²·n1n2-cross / (B·(N−B)),
    Pettitt's computational form with the same exact cross-multiplied
    gap f1·n2 − f2·n1 as the KS/CvM queries. Each term takes ONE
    micro floor-division by its own weight (the documented
    per-term-floored discrete variant — identical in both engines;
    the last pooled point, B = N, is excluded as in every AD
    implementation since its weight is 0), terms accumulate in
    decimal(38,0) ⟷ HUGEINT, and the statistic is one final
    floor-division by n1·n2. Headroom: t·gap²·10⁶ stays under 10³⁸
    to ~10⁷ docs per source. Scale shape identical to
    ks_statistic_sources: distinct-length domain, binned 2-pass
    cumulative, 1-row totals broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.filter(F.col("source").isin("src0", "src1")).select(
        F.col("n_chars").alias("v"),
        F.when(F.col("source") == "src0", 1).otherwise(2).alias("src"),
    )
    pts = s.groupBy("v").agg(
        F.sum(F.when(F.col("src") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("src") == 2, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    cum = with_grouped_cumsum(
        pts, [], F.col("v"), ["v"], ["c1", "c2"]
    ).select(
        (F.col("c1") + F.col("c2")).alias("t"),
        F.col("_cum_c1").alias("f1"),
        F.col("_cum_c2").alias("f2"),
    )
    n = pts.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    dec = "decimal(38,0)"
    gap = (
        F.col("f1").cast(dec) * F.col("n2")
        - F.col("f2").cast(dec) * F.col("n1")
    )
    b = F.col("f1") + F.col("f2")
    nn = F.col("n1") + F.col("n2")
    terms = (
        cum.crossJoin(F.broadcast(n))
        .filter(b < nn)
        .select(
            (
                (F.col("t").cast(dec) * gap * gap * 1000000)
                .cast(dec)
            ).alias("num"),
            (b.cast(dec) * (nn - b)).alias("den"),
        )
        .select(F.expr("CAST(num div den AS DECIMAL(38,0))").alias("term"))
        .agg(F.sum("term").alias("u"))
    )
    return n.crossJoin(F.broadcast(terms)).select(
        "n1",
        "n2",
        F.expr(
            "CAST(u div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)"
        ).alias("ad_micro"),
    )


@register(
    "l_diversity_audit_customers",
    oracle="""
WITH bands AS (
  SELECT c_nationkey, c_mktsegment,
         (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) // 100000
             AS band
  FROM customer
),
g AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(count(*) AS BIGINT) AS k_size,
         CAST(count(DISTINCT band) AS BIGINT) AS l_distinct
  FROM bands GROUP BY 1, 2
)
SELECT CAST(c_nationkey AS INT) AS c_nationkey, c_mktsegment, k_size,
       l_distinct,
       CAST(CASE WHEN l_distinct >= 3 THEN 1 ELSE 0 END AS BIGINT)
           AS meets_l3
FROM g ORDER BY c_nationkey, c_mktsegment
""",
    category="relational",
    tags=("defer-window",),
)
def l_diversity_audit_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """L-DIVERSITY audit (Machanavajjhala et al. 2007 — the
    refinement k_anonymity_audit_customers stops short of: a class
    can be k-anonymous yet leak its sensitive value when all k rows
    SHARE it) over the customer table: quasi-identifiers are
    (nation, market segment), the sensitive attribute is the account
    balance discretized into $1000 bands, and each equivalence class
    reports its size k and its count-of-distinct sensitive values l —
    distinct-l-diversity, the auditable variant that needs no
    entropy/log (doctrine: no transcendentals in checked outputs).
    The band arithmetic shifts cents by +10⁶ BEFORE the
    floor-division so the operand is non-negative for every TPC-H
    balance (min −999.99) — the range where Spark's truncating div
    and DuckDB's flooring // agree exactly. Scale: one
    map-side-combinable count-distinct aggregation over a
    bounded-domain (25 nations × 5 segments) key space."""
    c = load_table(spark, sf_dir, "customer")
    bands = c.select(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "(CAST(round(c_acctbal * 100) AS BIGINT) + 1000000)"
            " div 100000"
        ).alias("band"),
    )
    return (
        bands.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").alias("k_size"),
            F.countDistinct("band").alias("l_distinct"),
        )
        .select(
            F.col("c_nationkey").cast("int").alias("c_nationkey"),
            "c_mktsegment",
            "k_size",
            "l_distinct",
            F.when(F.col("l_distinct") >= 3, 1)
            .otherwise(0)
            .cast("long")
            .alias("meets_l3"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


@register(
    "eoq_brands",
    oracle="""
WITH demand AS (
  SELECT p.p_brand,
         CAST(SUM(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS d
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1
),
holding AS (
  SELECT p_brand,
         CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT))
              // count(*) // 5 AS BIGINT) AS h
  FROM part GROUP BY 1
)
SELECT d.p_brand, d.d AS total_demand_units, h.h AS holding_cents,
       CASE WHEN h.h > 0 THEN
            CAST(floor(sqrt(CAST((2 * d.d * 5000) // h.h AS DOUBLE)))
                 AS BIGINT) END AS eoq_units,
       CASE WHEN h.h > 0 AND (2 * d.d * 5000) // h.h >= 1 THEN
            CAST(d.d // CAST(floor(sqrt(CAST((2 * d.d * 5000) // h.h
                 AS DOUBLE))) AS BIGINT) AS BIGINT) END AS n_orders
FROM demand d JOIN holding h ON h.p_brand = d.p_brand
WHERE h.h > 0
ORDER BY d.p_brand
""",
    category="relational",
    tags=("defer-window",),
)
def eoq_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECONOMIC ORDER QUANTITY (Harris-Wilson 1913, the square-root
    law every inventory planner starts from) per brand: EOQ =
    sqrt(2·D·S/H) balances a fixed S = $50.00 cost per replenishment
    order against a holding cost H = 20 % of the brand's average unit
    retail price over the demand D observed in the data — the sizing
    complement to reorder_point_brands (WHEN to order) and
    slow_moving_parts_by_brand (WHETHER to keep stocking). Exactness:
    D, S, H are exact int64 (H via two floor-divisions — mean price
    then the 20 % haircut, the documented discrete variant); the
    quotient 2DS/H is floored BEFORE the sqrt so the only float op is
    one IEEE-correctly-rounded sqrt of an exactly-representable
    integer (< 2⁵³ up to ~10¹⁵ demand-cents — any SF), floored back
    to units; n_orders = D div EOQ is pure integers. Degenerate
    guard: when 10000·D < H the floored EOQ is 0 — n_orders is
    CASE-guarded to NULL in BOTH engines (DuckDB `// 0` raises,
    non-ANSI Spark yields NULL — the guard makes them agree), and
    the H divisor itself is CASE-guarded because ANSI Spark
    evaluates projections before the h > 0 row filter
    (project+filter collapse). Scale: one map-side-combinable fact
    aggregation (part broadcast) plus a 25-brand dimension
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    demand = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("d"))
    )
    holding = p.groupBy(F.col("p_brand").alias("hb")).agg(
        F.expr(
            "CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT))"
            " div count(*) div 5 AS BIGINT)"
        ).alias("h")
    )
    eoq = F.expr(
        "CASE WHEN h > 0 THEN CAST(floor(sqrt("
        "CAST((2 * d * 5000) div h AS DOUBLE))) AS BIGINT) END"
    )
    return (
        demand.join(
            F.broadcast(holding), F.col("p_brand") == F.col("hb")
        )
        .filter(F.col("h") > 0)
        .select(
            "p_brand",
            F.col("d").alias("total_demand_units"),
            F.col("h").alias("holding_cents"),
            eoq.alias("eoq_units"),
            F.expr(
                "CASE WHEN h > 0 AND (2 * d * 5000) div h >= 1 THEN"
                " CAST(d div CAST(floor(sqrt(CAST((2 * d * 5000) div h"
                " AS DOUBLE))) AS BIGINT) AS BIGINT) END"
            ).alias("n_orders"),
        )
        .orderBy("p_brand")
    )


@register(
    "process_capability_cpk_latency",
    oracle="""
WITH lat AS (
  SELECT o.o_orderpriority,
         CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS BIGINT) AS x
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
m AS (
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s,
         CAST(SUM(x * x) AS BIGINT) AS s2
  FROM lat GROUP BY o_orderpriority
)
SELECT o_orderpriority, n,
       CAST(s * 1000 // n AS BIGINT) AS mean_milli_days,
       CASE WHEN CAST(n AS HUGEINT) * s2 - CAST(s AS HUGEINT) * s > 0
            THEN CAST(floor(
              CAST(LEAST(180 * n - s, s - 0 * n) AS DOUBLE) * 1000
              / (3 * sqrt(CAST(CAST(n AS HUGEINT) * s2
                               - CAST(s AS HUGEINT) * s AS DOUBLE)))
            ) AS BIGINT) END AS cpk_milli
FROM m ORDER BY o_orderpriority
""",
    category="relational",
    tags=("defer-window",),
)
def process_capability_cpk_latency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PROCESS CAPABILITY INDEX Cpk of order→ship latency per priority
    class — the Six-Sigma SPC summary (xmr_control_chart_daily watches
    the process IN TIME; Cpk scores it AGAINST SPEC): with spec limits
    LSL = 0 and USL = 180 days, Cpk = min(USL−μ, μ−LSL)/(3σ) — above
    ~1.33 the process comfortably fits the spec window, below 1 it
    ships defects (here: SLA breaches) even when perfectly centered.
    Exactness is the reorder_point algebraic-variance doctrine:
    multiply through by n so the numerator min(USL·n−S, S−LSL·n) and
    the variance complement n·Σx² − S² are EXACT integers (HUGEINT ⟷
    decimal(38,0)); both convert to double once (< 2⁵³ to ~10¹²
    line-days per class — any SF), one IEEE sqrt, one division, one
    floor onto the milli grid, identical op order in both engines;
    degenerate zero-variance classes yield NULL via the CASE guard
    (ANSI-safe). Scale: one map-side-combinable moment aggregation
    over the orders⋈lineitem keyed join — 5 output rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("x"),
    )
    m = lat.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    dec = "decimal(38,0)"
    comp = F.expr(f"CAST(n AS {dec}) * s2 - CAST(s AS {dec}) * s")
    return m.select(
        "o_orderpriority",
        "n",
        F.expr("CAST(s * 1000 div n AS BIGINT)").alias(
            "mean_milli_days"
        ),
        F.when(
            comp > 0,
            F.floor(
                F.least(
                    180 * F.col("n") - F.col("s"),
                    F.col("s") - 0 * F.col("n"),
                ).cast("double")
                * 1000
                / (3 * F.sqrt(comp.cast("double")))
            ).cast("long"),
        ).alias("cpk_milli"),
    ).orderBy("o_orderpriority")


@register(
    "sketch_kmv_distinct_orders",
    oracle="""
WITH h AS (
  SELECT DISTINCT
         ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 10))::BIGINT
             AS hv
  FROM lineitem
),
k AS (SELECT hv FROM h ORDER BY hv LIMIT 256),
kth AS (
  SELECT CAST(max(hv) AS BIGINT) AS hk, CAST(count(*) AS BIGINT) AS k
  FROM k
),
tru AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM lineitem
)
SELECT kth.k, kth.hk AS kth_hash,
       CAST((kth.k - 1) * CAST(1099511627776 AS HUGEINT) // kth.hk
            AS BIGINT) AS est_distinct,
       tru.n AS true_distinct,
       CAST(abs(CAST((kth.k - 1) * CAST(1099511627776 AS HUGEINT)
                     // kth.hk AS BIGINT) - tru.n) * 1000000 // tru.n
            AS BIGINT) AS err_ppm
FROM kth CROSS JOIN tru
""",
    category="relational",
    tags=("defer-window2",),
)
def sketch_kmv_distinct_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) DISTINCT-COUNT SKETCH
    (Bar-Yossef et al. 2002) over lineitem's order keys — the third
    mergeable cardinality sketch beside HLL (approx_count_distinct /
    sketch_hll_mergeable) and theta (sketch_theta_fixed_distinct),
    and the one whose estimator is pure integer arithmetic: hash
    every key onto the 2⁴⁰ md5 grid (the repo's replayable hash), keep
    the k = 256 smallest distinct values, estimate D̂ = (k−1)·2⁴⁰ //
    h₍ₖ₎ — the k-th smallest of D uniform draws sits near k/D of the
    range, no harmonic means or doubles anywhere. Mergeability is the
    scale story: per-partition bottom-k sets union and re-truncate to
    bottom-k (exactly what TakeOrdered's tree aggregation does here —
    map-side bottom-k, one tiny final merge, never a global sort),
    the same shape theta sketches use for set algebra. The estimate,
    the true distinct count, and the realized error (ppm) publish
    side by side so the sketch's accuracy contract (≈1/√k ≈ 6 %) is
    itself oracle-checked."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    h = li.select(
        F.conv(
            F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 10),
            16,
            10,
        )
        .cast("long")
        .alias("hv")
    ).distinct()
    k = h.orderBy("hv").limit(256)
    kth = k.agg(F.max("hv").alias("hk"), F.count("*").alias("k"))
    tru = li.agg(F.countDistinct("l_orderkey").alias("n"))
    est = F.expr(
        "CAST((k - 1) * CAST(1099511627776 AS DECIMAL(38,0)) div hk"
        " AS BIGINT)"
    )
    return kth.crossJoin(F.broadcast(tru)).select(
        "k",
        F.col("hk").alias("kth_hash"),
        est.alias("est_distinct"),
        F.col("n").alias("true_distinct"),
        F.expr(
            "CAST(abs(CAST((k - 1) * CAST(1099511627776 AS"
            " DECIMAL(38,0)) div hk AS BIGINT) - n) * 1000000 div n"
            " AS BIGINT)"
        ).alias("err_ppm"),
    )


@register(
    "newsvendor_quantile_brands",
    oracle="""
WITH dem AS (
  SELECT p.p_brand,
         date_diff('day', DATE '1970-01-01', CAST(l.l_shipdate AS DATE))
             AS d,
         CAST(SUM(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
rk AS (
  SELECT p_brand, d, q,
         CAST(row_number() OVER (PARTITION BY p_brand
                                 ORDER BY q, d) AS BIGINT) AS r,
         CAST(count(*) OVER (PARTITION BY p_brand) AS BIGINT) AS n
  FROM dem
),
qstar AS (
  SELECT p_brand, max(n) AS n_days,
         CAST(max(CASE WHEN r = (3 * n + 3) // 4 THEN q END) AS BIGINT)
             AS q_star
  FROM rk GROUP BY p_brand
)
SELECT s.p_brand, s.n_days, s.q_star,
       CAST(SUM(CASE WHEN s.q_star > dem.q THEN s.q_star - dem.q
                ELSE 0 END) AS BIGINT) AS total_leftover_units,
       CAST(SUM(CASE WHEN dem.q > s.q_star THEN dem.q - s.q_star
                ELSE 0 END) AS BIGINT) AS total_shortage_units
FROM qstar s JOIN dem ON dem.p_brand = s.p_brand
GROUP BY s.p_brand, s.n_days, s.q_star
ORDER BY s.p_brand
""",
    category="relational",
    tags=("defer-window2",),
)
def newsvendor_quantile_brands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """NEWSVENDOR stocking quantity per brand — the single-period
    inventory model whose optimum is a pure QUANTILE: with underage
    cost 3× overage (cu=3, co=1) the critical fractile is
    cu/(cu+co) = 0.75, so q* is the 0.75 discrete quantile of the
    brand's daily demand distribution — no distributional assumption,
    just the empirical inverse CDF (this is the stocking-LEVEL
    counterpart to eoq_brands' batch size and reorder_point_brands'
    trigger). q* is selected exactly: per-brand row_number over
    (demand, day) with the ceil(3n/4) = (3n+3) div 4 index —
    tie-stable in both engines — and the decision is then SCORED
    against the same history it came from: exact leftover
    (Σ max(q*−d, 0)) and shortage (Σ max(d−q*, 0)) unit totals, whose
    3:1 cost ratio the quantile provably minimizes. Scale: one
    map-side-combinable fact aggregation to (brand, day) grain (part
    broadcast), bounded per-brand windows, one re-join at brand
    grain."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    dem = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand",
            F.datediff(
                F.to_date("l_shipdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("d"),
        )
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("q"))
    )
    w = Window.partitionBy("p_brand").orderBy("q", "d")
    wn = Window.partitionBy("p_brand")
    rk = dem.withColumn("r", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wn)
    )
    qstar = rk.groupBy(F.col("p_brand").alias("qb")).agg(
        F.max("n").alias("n_days"),
        F.max(
            F.when(F.col("r") == F.expr("(3 * n + 3) div 4"), F.col("q"))
        ).alias("q_star"),
    )
    return (
        dem.join(F.broadcast(qstar), dem.p_brand == F.col("qb"))
        .groupBy("p_brand", "n_days", "q_star")
        .agg(
            F.sum(
                F.when(
                    F.col("q_star") > F.col("q"),
                    F.col("q_star") - F.col("q"),
                ).otherwise(0)
            ).alias("total_leftover_units"),
            F.sum(
                F.when(
                    F.col("q") > F.col("q_star"),
                    F.col("q") - F.col("q_star"),
                ).otherwise(0)
            ).alias("total_shortage_units"),
        )
        .orderBy("p_brand")
    )


@register(
    "anova_f_priorities",
    oracle="""
WITH v AS (
  SELECT o_orderpriority AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) AS x
  FROM orders
),
grp AS (
  SELECT g, CAST(count(*) AS BIGINT) AS ng,
         CAST(SUM(x) AS BIGINT) AS sg,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS qg
  FROM v GROUP BY g
),
tot AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
         CAST(SUM(sg) AS BIGINT) AS s,
         CAST(SUM(qg) AS HUGEINT) AS q
  FROM grp
),
parts AS (
  SELECT CAST(SUM(CAST(sg AS HUGEINT) * sg * 1000 // ng) AS HUGEINT)
             AS sum_sq_over_n
  FROM grp
),
ss AS (
  SELECT tot.n, tot.k,
         parts.sum_sq_over_n
           - CAST(tot.s AS HUGEINT) * tot.s * 1000 // tot.n AS ssb_milli,
         tot.q * 1000 - parts.sum_sq_over_n AS ssw_milli
  FROM tot CROSS JOIN parts
)
SELECT n, k,
       CASE WHEN ssw_milli > 0 AND k > 1
                 AND CAST(ssb_milli AS DOUBLE)
                     * CAST(n - k AS DOUBLE) < 1e31
                 AND CAST(ssw_milli AS DOUBLE)
                     * CAST(k - 1 AS DOUBLE) < 1e37
            THEN CAST(ssb_milli * (n - k) * 1000000
                      // (ssw_milli * (k - 1)) AS BIGINT)
       END AS f_micro,
       CASE WHEN ssb_milli + ssw_milli > 0
                 AND CAST(ssb_milli AS DOUBLE) < 1e31
            THEN CAST(ssb_milli * 1000000 // (ssb_milli + ssw_milli)
                      AS BIGINT)
       END AS eta_sq_ppm
FROM ss
""",
    category="relational",
    tags=("defer-window2",),
)
def anova_f_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-WAY ANOVA F statistic of order value across priority
    classes — the parametric k-sample test the registry's
    nonparametric members shadow (kruskal_wallis = rank version,
    welch_t = the k=2 unequal-variance case): F =
    (SSB/(k−1))/(SSW/(n−k)) with SSB = Σ S_g²/n_g − S²/n and
    SSW = ΣΣx² − Σ S_g²/n_g — computational identities, no per-row
    mean subtraction, all exact int64/HUGEINT ⟷ decimal(38,0)
    moments. The per-group S_g²·1000/n_g fractions are per-term
    milli-floored (discrete variant); on the Spark side the quotient
    itself exceeds int64 (Spark's `div` ALWAYS yields BIGINT and
    silently wraps — measured 4× garbage at sf0.001), so the floor is
    decomposed via S_g = n_g·m + r into
    (n_g·m² + 2·m·r)·1000 + ⌊1000·r²/n_g⌋ — only the last, int64-safe
    quotient uses div, the rest is pure decimal arithmetic; DuckDB's
    native HUGEINT // needs no decomposition. Published outputs are
    deliberately SCALE-BOUNDED: F (micro) and the eta² effect size
    (ppm) — the raw SS values are n-scaled and would outgrow any
    fixed int column at 100 TB. Zero-variance degeneracy yields NULL
    via CASE guards. Headroom: the F numerator ssb·(n−k)·10⁶ rides
    decimal(38,0) ⟷ HUGEINT, whose overflow modes DIVERGE (Spark
    non-ANSI silently NULLs, DuckDB errors) — so an explicit
    magnitude guard (ssb·(n−k) < 10³¹ and ssw·(k−1) < 10³⁷,
    evaluated in IEEE doubles, bit-identical cross-engine) degrades
    the statistic to NULL IDENTICALLY in both engines past the safe
    region (~10¹² rows at 10⁶-cent values, 10× under the 10³⁸
    decimal cap). Scale: one map-side-combinable moment
    aggregation, 5-group rollup, 1-row output."""
    o = load_table(spark, sf_dir, "orders")
    v = o.select(
        F.col("o_orderpriority").alias("g"),
        cents(F.col("o_totalprice")).alias("x"),
    )
    dec = "decimal(38,0)"
    grp = v.groupBy("g").agg(
        F.count("*").alias("ng"),
        F.sum("x").alias("sg"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("qg"),
    )

    def sq_milli_over(s_col: str, n_col: str) -> str:
        # floor(s² · 1000 / n) with every `div` quotient int64-safe:
        # s = n·m + r  ⇒  s²·1000/n = (n·m² + 2·m·r)·1000 + 1000·r²/n
        m = f"({s_col} div {n_col})"
        r = f"({s_col} % {n_col})"
        return (
            f"(CAST({n_col} AS {dec}) * {m} * {m}"
            f" + 2 * CAST({m} AS {dec}) * {r}) * 1000"
            f" + (CAST({r} AS {dec}) * {r} * 1000 div {n_col})"
        )

    parts = grp.agg(
        F.sum(F.expr(sq_milli_over("sg", "ng")).cast(dec)).alias(
            "sum_sq_over_n"
        )
    )
    tot = grp.agg(
        F.sum("ng").alias("n"),
        F.count("*").alias("k"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
    )
    ss = tot.crossJoin(F.broadcast(parts)).select(
        "n",
        "k",
        F.expr(
            f"sum_sq_over_n - CAST({sq_milli_over('s', 'n')} AS {dec})"
        ).alias("ssb_milli"),
        F.expr("q * 1000 - sum_sq_over_n").alias("ssw_milli"),
    )
    return ss.select(
        "n",
        "k",
        F.expr(
            "CASE WHEN ssw_milli > 0 AND k > 1"
            " AND CAST(ssb_milli AS DOUBLE)"
            " * CAST(n - k AS DOUBLE) < 1e31"
            " AND CAST(ssw_milli AS DOUBLE)"
            " * CAST(k - 1 AS DOUBLE) < 1e37 THEN"
            " CAST(ssb_milli * (n - k) * 1000000"
            " div (ssw_milli * (k - 1)) AS BIGINT) END"
        ).alias("f_micro"),
        F.expr(
            "CASE WHEN ssb_milli + ssw_milli > 0"
            " AND CAST(ssb_milli AS DOUBLE) < 1e31 THEN"
            " CAST(ssb_milli * 1000000 div (ssb_milli + ssw_milli)"
            " AS BIGINT) END"
        ).alias("eta_sq_ppm"),
    )


@register(
    "brown_forsythe_priorities",
    oracle="""
WITH v AS (
  SELECT o_orderpriority AS g, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS x
  FROM orders
),
rk AS (
  SELECT g, x,
         CAST(row_number() OVER (PARTITION BY g ORDER BY x, o_orderkey)
              AS BIGINT) AS r,
         CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS ng
  FROM v
),
med AS (
  SELECT g, CAST(max(CASE WHEN r = (ng + 1) // 2 THEN x END) AS BIGINT)
             AS med
  FROM rk GROUP BY g
),
z AS (
  SELECT v.g, abs(v.x - med.med) AS x
  FROM v JOIN med ON med.g = v.g
),
grp AS (
  SELECT g, CAST(count(*) AS BIGINT) AS ng,
         CAST(SUM(x) AS BIGINT) AS sg,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS qg
  FROM z GROUP BY g
),
tot AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
         CAST(SUM(sg) AS BIGINT) AS s,
         CAST(SUM(qg) AS HUGEINT) AS q
  FROM grp
),
parts AS (
  SELECT CAST(SUM(CAST(sg AS HUGEINT) * sg * 1000 // ng) AS HUGEINT)
             AS sum_sq_over_n
  FROM grp
),
ss AS (
  SELECT tot.n, tot.k,
         parts.sum_sq_over_n
           - CAST(tot.s AS HUGEINT) * tot.s * 1000 // tot.n AS ssb_milli,
         tot.q * 1000 - parts.sum_sq_over_n AS ssw_milli
  FROM tot CROSS JOIN parts
)
SELECT n, k,
       CASE WHEN ssw_milli > 0 AND k > 1
                 AND CAST(ssb_milli AS DOUBLE)
                     * CAST(n - k AS DOUBLE) < 1e31
                 AND CAST(ssw_milli AS DOUBLE)
                     * CAST(k - 1 AS DOUBLE) < 1e37
            THEN CAST(ssb_milli * (n - k) * 1000000
                      // (ssw_milli * (k - 1)) AS BIGINT)
       END AS bf_w_micro
FROM ss
""",
    category="relational",
    tags=("defer-window2",),
)
def brown_forsythe_priorities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BROWN-FORSYTHE test for EQUALITY OF VARIANCES across priority
    classes — the robust Levene variant (deviations from the group
    MEDIAN, not the mean, so heavy tails don't masquerade as variance
    differences) that guards anova_f_priorities' homogeneity
    assumption: W is literally the one-way ANOVA F computed on
    z = |x − median_g|, so this query composes the registry's two
    exact primitives — per-group lower-median selection (rank
    (n+1) div 2 over a (value, key) tie-stable order, the
    robust_quartile doctrine) and the moment-identity F with
    per-term milli-floored S²/n fractions (anova_f_priorities'
    decomposition S = n·m + r keeps every Spark `div` quotient
    int64-safe). Degenerate all-equal groups yield NULL via the CASE
    guard, and the anova_f double-precision magnitude guard
    (ssb·(n−k) < 10³¹, ssw·(k−1) < 10³⁷) degrades the statistic to
    NULL identically in both engines past the decimal(38,0)/HUGEINT
    headroom instead of diverging (silent Spark NULL vs DuckDB
    error). Scale: one per-group window for the median
    (priority-keyed — parallel across groups), one broadcast median
    join, one moment aggregation."""
    o = load_table(spark, sf_dir, "orders")
    v = o.select(
        F.col("o_orderpriority").alias("g"),
        "o_orderkey",
        cents(F.col("o_totalprice")).alias("x"),
    )
    wg = Window.partitionBy("g").orderBy("x", "o_orderkey")
    wn = Window.partitionBy("g")
    rk = v.withColumn("r", F.row_number().over(wg).cast("long")).withColumn(
        "ng", F.count("*").over(wn)
    )
    med = rk.groupBy(F.col("g").alias("mg")).agg(
        F.max(
            F.when(F.col("r") == F.expr("(ng + 1) div 2"), F.col("x"))
        ).alias("med")
    )
    z = v.join(F.broadcast(med), v.g == F.col("mg")).select(
        "g", F.abs(F.col("x") - F.col("med")).alias("x")
    )
    dec = "decimal(38,0)"
    grp = z.groupBy("g").agg(
        F.count("*").alias("ng"),
        F.sum("x").alias("sg"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("qg"),
    )

    def sq_milli_over(s_col: str, n_col: str) -> str:
        m = f"({s_col} div {n_col})"
        r = f"({s_col} % {n_col})"
        return (
            f"(CAST({n_col} AS {dec}) * {m} * {m}"
            f" + 2 * CAST({m} AS {dec}) * {r}) * 1000"
            f" + (CAST({r} AS {dec}) * {r} * 1000 div {n_col})"
        )

    parts = grp.agg(
        F.sum(F.expr(sq_milli_over("sg", "ng")).cast(dec)).alias(
            "sum_sq_over_n"
        )
    )
    tot = grp.agg(
        F.sum("ng").alias("n"),
        F.count("*").alias("k"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
    )
    ss = tot.crossJoin(F.broadcast(parts)).select(
        "n",
        "k",
        F.expr(
            f"sum_sq_over_n - CAST({sq_milli_over('s', 'n')} AS {dec})"
        ).alias("ssb_milli"),
        F.expr("q * 1000 - sum_sq_over_n").alias("ssw_milli"),
    )
    return ss.select(
        "n",
        "k",
        F.expr(
            "CASE WHEN ssw_milli > 0 AND k > 1"
            " AND CAST(ssb_milli AS DOUBLE)"
            " * CAST(n - k AS DOUBLE) < 1e31"
            " AND CAST(ssw_milli AS DOUBLE)"
            " * CAST(k - 1 AS DOUBLE) < 1e37 THEN"
            " CAST(ssb_milli * (n - k) * 1000000"
            " div (ssw_milli * (k - 1)) AS BIGINT) END"
        ).alias("bf_w_micro"),
    )


@register(
    "decision_stump_returns",
    bench=True,
    oracle="""
WITH lab AS (
  SELECT o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS x,
         CAST(max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, 2
),
pts AS (
  SELECT x, CAST(count(*) AS BIGINT) AS cnt,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM lab GROUP BY x
),
cum AS (
  SELECT x,
         CAST(SUM(cnt) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS nl,
         CAST(SUM(pos) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS pl
  FROM pts
),
tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS p
  FROM pts
),
sc AS (
  SELECT cum.x, cum.nl, cum.pl, tot.n - cum.nl AS nr,
         tot.p - cum.pl AS pr,
         (CAST(cum.nl AS HUGEINT) * cum.nl
          - 2 * CAST(cum.pl AS HUGEINT) * (cum.nl - cum.pl)) * 1000
             // cum.nl
         + (CAST(tot.n - cum.nl AS HUGEINT) * (tot.n - cum.nl)
            - 2 * CAST(tot.p - cum.pl AS HUGEINT)
              * ((tot.n - cum.nl) - (tot.p - cum.pl))) * 1000
             // (tot.n - cum.nl)
         AS neg_obj_milli
  FROM cum CROSS JOIN tot WHERE cum.nl < tot.n
),
m AS (SELECT max(neg_obj_milli) AS mm FROM sc),
best AS (
  SELECT min(x) AS split_x FROM sc, m WHERE neg_obj_milli = m.mm
),
row0 AS (
  SELECT sc.x AS split_value_cents, sc.nl AS n_left, sc.pl AS pos_left,
         sc.nr AS n_right, sc.pr AS pos_right,
         CAST(2 * CAST(sc.pl AS HUGEINT) * (sc.nl - sc.pl) * 1000000
              // (CAST(sc.nl AS HUGEINT) * sc.nl) AS BIGINT)
             AS gini_left_ppm,
         CAST(2 * CAST(sc.pr AS HUGEINT) * (sc.nr - sc.pr) * 1000000
              // (CAST(sc.nr AS HUGEINT) * sc.nr) AS BIGINT)
             AS gini_right_ppm,
         CAST(2 * CAST(tot.p AS HUGEINT) * (tot.n - tot.p) * 1000000
              // (CAST(tot.n AS HUGEINT) * tot.n) AS BIGINT)
             AS gini_root_ppm
  FROM sc JOIN best ON best.split_x = sc.x
  CROSS JOIN tot
)
SELECT * FROM row0
""",
    category="relational",
    tags=("defer-window2",),
)
def decision_stump_returns(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CART DECISION STUMP: the single best Gini split of order value
    for predicting 'order contains a returned line' — the primitive a
    gradient-boosted/random-forest trainer evaluates millions of
    times, run once, exactly, at data scale (roc_auc_price_predicts_
    return scores the feature's RANKING power; the stump finds the
    actual THRESHOLD). Candidates are every boundary between distinct
    values (value-grain count table + binned cumulative — the CvM
    frame); the objective min Σ_side n_side·Gini_side collapses to
    maximizing Σ_side −(n_side² − 2·pos·neg)/n_side, which is
    per-term milli-floored (discrete variant) so the argmax is an
    exact-integer max-then-min-split aggregate (no LIMIT scalars).
    Per-side quotients stay int64 (≤ 2·n·1000); the split row
    publishes exact counts and the ppm Gini of root and both leaves.
    Scale: one fact-fact keyed join + per-order conjunction, one
    value-grain rollup, binned cumulative, two scans."""
    from spark_lever_spark.catalog import spread_scan

    # Spread the one-row-group lineitem scan (r19, guide §2.5 — the
    # copurchase_edges pattern): the label build (scan + broadcast
    # join + partial agg) otherwise runs on ONE task. ABBA at sf0.1:
    # 3.58 -> 3.18 s min-of-3, rows identical; no-op at cluster scale.
    li = spread_scan(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag"
        ),
        key="l_orderkey",
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents(F.col("o_totalprice")).alias("x")
    )
    lab = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "x")
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            )
            .cast("long")
            .alias("y")
        )
    )
    # pts (the value-grain count table) feeds the cumsum helper's
    # quantile-bounds pass, its main pass AND the totals aggregate —
    # three replays of the fact-fact join + two rollups without a
    # persist (optimization r18, guide §2.4/§5). Value-grain, so it
    # spills rather than OOMs at scale; released after the 1-row
    # result is pinned below.
    from pyspark import StorageLevel

    pts = lab.groupBy("x").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cum = with_grouped_cumsum(
        pts, [], F.col("x"), ["x"], ["cnt", "pos"]
    ).select(
        "x",
        F.col("_cum_cnt").alias("nl"),
        F.col("_cum_pos").alias("pl"),
    )
    tot = pts.agg(F.sum("cnt").alias("n"), F.sum("pos").alias("p"))
    dec = "decimal(38,0)"
    sc = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("nl") < F.col("n"))
        .select(
            "x",
            "nl",
            "pl",
            (F.col("n") - F.col("nl")).alias("nr"),
            (F.col("p") - F.col("pl")).alias("pr"),
            F.expr(
                # CASE-guarded: ANSI evaluates collapsed
                # project+filter expressions together, so the nl < n
                # row filter alone does not protect the divisor
                f"CASE WHEN nl > 0 AND n > nl THEN"
                f" (CAST(nl AS {dec}) * nl"
                f" - 2 * CAST(pl AS {dec}) * (nl - pl)) * 1000 div nl"
                f" + (CAST(n - nl AS {dec}) * (n - nl)"
                f" - 2 * CAST(p - pl AS {dec}) * ((n - nl) - (p - pl)))"
                f" * 1000 div (n - nl) END"
            ).alias("neg_obj_milli"),
        )
    )
    # sc is consumed three times (argmax aggregate, min-split pick,
    # final row) — persist so the split scoring runs once, and pin the
    # 1-row result eagerly so both caches release before return
    # (optimization r18; the dbscan/ppr eager-pin pattern).
    sc = sc.persist(StorageLevel.MEMORY_AND_DISK)
    m = sc.agg(F.max("neg_obj_milli").alias("mm"))
    best = (
        sc.crossJoin(F.broadcast(m))
        .filter(F.col("neg_obj_milli") == F.col("mm"))
        .agg(F.min("x").alias("split_x"))
    )
    out = (
        sc.join(F.broadcast(best), sc.x == F.col("split_x"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("x").alias("split_value_cents"),
            F.col("nl").alias("n_left"),
            F.col("pl").alias("pos_left"),
            F.col("nr").alias("n_right"),
            F.col("pr").alias("pos_right"),
            F.expr(
                f"CAST(2 * CAST(pl AS {dec}) * (nl - pl) * 1000000"
                f" div (CAST(nl AS {dec}) * nl) AS BIGINT)"
            ).alias("gini_left_ppm"),
            F.expr(
                f"CAST(2 * CAST(pr AS {dec}) * (nr - pr) * 1000000"
                f" div (CAST(nr AS {dec}) * nr) AS BIGINT)"
            ).alias("gini_right_ppm"),
            F.expr(
                f"CAST(2 * CAST(p AS {dec}) * (n - p) * 1000000"
                f" div (CAST(n AS {dec}) * n) AS BIGINT)"
            ).alias("gini_root_ppm"),
        )
    )
    out = out.localCheckpoint(eager=True)
    pts.unpersist()
    sc.unpersist()
    return out


@register(
    "isotonic_return_rate_by_price",
    bench=True,
    oracle="""
WITH lab AS (
  SELECT o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS x,
         CAST(max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, 2
),
rk AS (
  SELECT x, y,
         CAST(row_number() OVER (ORDER BY x, o_orderkey) AS BIGINT)
             AS r,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM lab
),
bkt AS (
  SELECT ((r - 1) * 20) // n + 1 AS b,
         CAST(count(*) AS BIGINT) AS nb,
         CAST(SUM(y) AS BIGINT) AS pb
  FROM rk GROUP BY 1
),
cum AS (
  SELECT b, nb, pb,
         CAST(SUM(nb) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cn,
         CAST(SUM(pb) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cp
  FROM bkt
),
pairs AS (
  SELECT j.b AS j, k.b AS k,
         CAST((k.cp - j.cp + j.pb) * 1000
              // (k.cn - j.cn + j.nb) AS BIGINT) AS avg_milli
  FROM cum j JOIN cum k ON k.b >= j.b
),
suffmin AS (
  SELECT p.j, i.b AS i, min(p.avg_milli) AS m
  FROM pairs p JOIN cum i ON p.k >= i.b AND p.j <= i.b
  GROUP BY p.j, i.b
),
iso AS (
  SELECT i, max(m) AS iso_milli FROM suffmin GROUP BY i
)
SELECT cum.b AS bucket, cum.nb AS n_orders, cum.pb AS n_returned,
       CAST(cum.pb * 1000 // cum.nb AS BIGINT) AS raw_rate_milli,
       iso.iso_milli AS iso_rate_milli
FROM cum JOIN iso ON iso.i = cum.b
ORDER BY bucket
""",
    category="relational",
    tags=("defer-window2",),
)
def isotonic_return_rate_by_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ISOTONIC REGRESSION of the returned-order rate on price rank —
    the monotone calibration fit (PAVA's solution) that turns a noisy
    bucket curve into the best nondecreasing one, the standard
    score-calibration step (sklearn's IsotonicRegression) and the
    monotone-binning core of credit-risk WoE pipelines
    (roc_auc_price_predicts_return scores the feature; this CALIBRATES
    it). Instead of the sequential pool-adjacent-violators loop, the
    fit uses the exact MINIMAX identity ŷ_i = max_{j≤i} min_{k≥i}
    avg(y[j..k]) — every (j,k) segment average materializes from the
    20-bucket cumulative as ONE bounded pair frame (20² rows at ANY
    data size: the bucket grid is the scale knob), averages live on
    the milli floor grid (deterministic in both engines; floor
    preserves ≤ so the fit stays monotone), and the max-of-suffix-min
    collapses to two keyed aggregations. Scale: one global rank
    (binned 2-pass), one 20-bucket rollup — the data-sized work is
    rank assignment; the regression itself is grid-sized."""
    from spark_lever_spark.catalog import spread_scan

    # Spread the one-row-group lineitem scan (r19, guide §2.5): the
    # label build otherwise runs its scan + broadcast join + partial
    # agg on ONE task. ABBA at sf0.1: 2.99 -> 2.57 s min-of-3, rows
    # identical; no-op at cluster scale.
    li = spread_scan(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag"
        ),
        key="l_orderkey",
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents(F.col("o_totalprice")).alias("x")
    )
    lab = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "x")
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            )
            .cast("long")
            .alias("y")
        )
    )
    # lab feeds the rank helper's quantile-bounds pass AND its main
    # pass — without a persist the fact-fact join + per-order rollup
    # runs twice (optimization r18, guide §2.4/§5: the recompute-
    # elimination class). Released below once the 20-row grid is
    # pinned.
    from pyspark import StorageLevel

    lab = lab.persist(StorageLevel.MEMORY_AND_DISK)
    ranked = with_global_rank(
        lab.select(F.col("x").alias("v"), "o_orderkey", "y"),
        F.col("v"),
        ["v", "o_orderkey"],
        value="y",
    )
    bkt = (
        ranked.groupBy(
            F.expr("((_rk - 1) * 20) div _n_tot + 1").alias("b")
        )
        .agg(F.count("*").alias("nb"), F.sum("y").alias("pb"))
    )
    # The bucket grid is <= 20 rows at ANY data size (the grid IS the
    # scale knob), so the prefix sum may ride a plain ordered window
    # over the aggregated domain — the 2-pass cumsum helper here would
    # re-run the whole rank pipeline for its quantile-bounds pass
    # (optimization r18; the plan sweep sanctions windows over
    # pre-aggregated domains). Eagerly pinning the grid keeps its FOUR
    # downstream consumers (j, k, i_frame, final join) from replaying
    # the data-sized rank stages once each — the r16 pair-table persist
    # class, measured 7.2 -> 2.7 s at sf0.1 (rows hash-identical).
    wcum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = bkt.select(
        "b",
        "nb",
        "pb",
        F.sum("nb").over(wcum).alias("cn"),
        F.sum("pb").over(wcum).alias("cp"),
    )
    cum = cum.localCheckpoint(eager=True)
    lab.unpersist()
    j = cum.select(
        F.col("b").alias("j"),
        F.col("nb").alias("jnb"),
        F.col("pb").alias("jpb"),
        F.col("cn").alias("jcn"),
        F.col("cp").alias("jcp"),
    )
    k = cum.select(
        F.col("b").alias("k"),
        F.col("cn").alias("kcn"),
        F.col("cp").alias("kcp"),
    )
    pairs = j.join(F.broadcast(k), F.col("k") >= F.col("j")).select(
        "j",
        "k",
        F.expr(
            "CAST((kcp - jcp + jpb) * 1000 div (kcn - jcn + jnb)"
            " AS BIGINT)"
        ).alias("avg_milli"),
    )
    i_frame = cum.select(F.col("b").alias("i"))
    suffmin = (
        pairs.join(
            F.broadcast(i_frame),
            (F.col("k") >= F.col("i")) & (F.col("j") <= F.col("i")),
        )
        .groupBy("j", "i")
        .agg(F.min("avg_milli").alias("m"))
    )
    iso = suffmin.groupBy("i").agg(F.max("m").alias("iso_milli"))
    return (
        cum.join(iso, cum.b == iso.i)
        .select(
            F.col("b").alias("bucket"),
            F.col("nb").alias("n_orders"),
            F.col("pb").alias("n_returned"),
            F.expr("CAST(pb * 1000 div nb AS BIGINT)").alias(
                "raw_rate_milli"
            ),
            F.col("iso_milli").alias("iso_rate_milli"),
        )
        .orderBy("bucket")
    )


@register(
    "median_polish_nation_month",
    oracle="""
WITH cell AS (
  SELECT n.n_name AS rn,
         CAST(EXTRACT(year FROM o.o_orderdate) * 100
              + EXTRACT(month FROM o.o_orderdate) AS BIGINT) AS cm,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS v
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
rm1 AS (
  SELECT rn, CAST(max(CASE WHEN rk = (cnt + 1) // 2 THEN v END)
              AS BIGINT) AS m
  FROM (SELECT rn, v,
               row_number() OVER (PARTITION BY rn ORDER BY v, cm)
                   AS rk,
               count(*) OVER (PARTITION BY rn) AS cnt
        FROM cell) GROUP BY rn
),
r1 AS (
  SELECT cell.rn, cell.cm, cell.v, cell.v - rm1.m AS r, rm1.m AS re
  FROM cell JOIN rm1 ON rm1.rn = cell.rn
),
cm1 AS (
  SELECT cm, CAST(max(CASE WHEN rk = (cnt + 1) // 2 THEN r END)
              AS BIGINT) AS m
  FROM (SELECT cm, r,
               row_number() OVER (PARTITION BY cm ORDER BY r, rn)
                   AS rk,
               count(*) OVER (PARTITION BY cm) AS cnt
        FROM r1) GROUP BY cm
),
r2 AS (
  SELECT r1.rn, r1.cm, r1.v, r1.r - cm1.m AS r, r1.re, cm1.m AS ce
  FROM r1 JOIN cm1 ON cm1.cm = r1.cm
),
rm2 AS (
  SELECT rn, CAST(max(CASE WHEN rk = (cnt + 1) // 2 THEN r END)
              AS BIGINT) AS m
  FROM (SELECT rn, r,
               row_number() OVER (PARTITION BY rn ORDER BY r, cm)
                   AS rk,
               count(*) OVER (PARTITION BY rn) AS cnt
        FROM r2) GROUP BY rn
),
r3 AS (
  SELECT r2.rn, r2.cm, r2.v, r2.r - rm2.m AS r,
         r2.re + rm2.m AS re, r2.ce
  FROM r2 JOIN rm2 ON rm2.rn = r2.rn
),
cm2 AS (
  SELECT cm, CAST(max(CASE WHEN rk = (cnt + 1) // 2 THEN r END)
              AS BIGINT) AS m
  FROM (SELECT cm, r,
               row_number() OVER (PARTITION BY cm ORDER BY r, rn)
                   AS rk,
               count(*) OVER (PARTITION BY cm) AS cnt
        FROM r3) GROUP BY cm
)
SELECT r3.rn AS n_name, r3.cm AS yyyymm, r3.v AS rev_cents,
       r3.re AS row_effect_cents,
       r3.ce + cm2.m AS col_effect_cents,
       r3.r - cm2.m AS residual_cents
FROM r3 JOIN cm2 ON cm2.cm = r3.cm
ORDER BY n_name, yyyymm
""",
    category="relational",
    tags=("defer-window2",),
)
def median_polish_nation_month(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MEDIAN POLISH (Tukey's robust two-way decomposition — the EDA
    workhorse behind every 'row effect + column effect + residual'
    table) of monthly revenue by nation: two full sweeps of
    alternately subtracting row (nation) and column (month) LOWER
    medians, leaving residuals that expose cell-level surprises the
    mean-based two-way ANOVA smears (one outlier month drags every
    mean; medians shrug it off). The lower-median variant ((n+1)
    div 2 rank over a (value, key) tie-stable order — the
    robust_quartile selection) keeps EVERY intermediate integer
    cents, so the sweep is exact with no interpolation games; effects
    accumulate across sweeps and the published identity
    v = row + col + residual holds to the cent by construction
    (checked in the reference test). Scale: the sweep runs on the
    bounded 25-nation × calendar-month cell table after ONE fact
    aggregation; each median is a group-keyed window — parallel
    across rows/columns, two fixed sweeps."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cell = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("rn"),
            (
                F.year(F.to_date("o_orderdate")) * 100
                + F.month(F.to_date("o_orderdate"))
            )
            .cast("long")
            .alias("cm"),
        )
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("v"))
    )

    def group_median(df, key, val, tie):
        wk = Window.partitionBy(key).orderBy(val, tie)
        wc = Window.partitionBy(key)
        return (
            df.withColumn("_rk", F.row_number().over(wk))
            .withColumn("_cnt", F.count("*").over(wc))
            .groupBy(F.col(key).alias("_k"))
            .agg(
                F.max(
                    F.when(
                        F.col("_rk") == F.expr("(_cnt + 1) div 2"),
                        F.col(val),
                    )
                ).alias("_m")
            )
        )

    r = cell.withColumn("r", F.col("v")).withColumn(
        "re", F.lit(0).cast("long")
    ).withColumn("ce", F.lit(0).cast("long"))
    for sweep_key, eff in (("rn", "re"), ("cm", "ce"), ("rn", "re"),
                           ("cm", "ce")):
        tie = "cm" if sweep_key == "rn" else "rn"
        med = group_median(r, sweep_key, "r", tie)
        r = (
            r.join(F.broadcast(med), F.col(sweep_key) == F.col("_k"))
            .withColumn("r", F.col("r") - F.col("_m"))
            .withColumn(eff, F.col(eff) + F.col("_m"))
            .drop("_k", "_m")
        )
    return r.select(
        F.col("rn").alias("n_name"),
        F.col("cm").alias("yyyymm"),
        F.col("v").alias("rev_cents"),
        F.col("re").alias("row_effect_cents"),
        F.col("ce").alias("col_effect_cents"),
        F.col("r").alias("residual_cents"),
    ).orderBy("n_name", "yyyymm")


@register(
    "wasserstein_distance_sources",
    oracle="""
WITH pts AS (
  SELECT n_chars AS v,
         CAST(count(*) FILTER (WHERE source = 'src0') AS BIGINT) AS c1,
         CAST(count(*) FILTER (WHERE source = 'src1') AS BIGINT) AS c2
  FROM documents WHERE source IN ('src0', 'src1')
  GROUP BY n_chars
),
cum AS (
  SELECT v,
         CAST(SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS f1,
         CAST(SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS f2,
         LEAD(v) OVER (ORDER BY v) AS nxt
  FROM pts
),
n AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
  FROM pts
),
area AS (
  SELECT SUM(abs(CAST(cum.f1 AS HUGEINT) * n.n2
                 - CAST(cum.f2 AS HUGEINT) * n.n1)
             * (cum.nxt - cum.v)) AS a
  FROM cum CROSS JOIN n WHERE cum.nxt IS NOT NULL
)
SELECT n.n1, n.n2,
       CAST(area.a * 1000000 // (CAST(n.n1 AS HUGEINT) * n.n2)
            AS BIGINT) AS w1_micro
FROM n CROSS JOIN area
""",
    category="relational",
    tags=("defer-window2",),
)
def wasserstein_distance_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """1-D WASSERSTEIN (earth mover's) DISTANCE between src0's and
    src1's document-length distributions — completing the drift-test
    QUINTET with the metric that carries UNITS: KS takes the supremum
    CDF gap, CvM/AD integrate its square, Mann-Whitney its sign; W1 =
    ∫|F1−F2|dx is literally 'average characters of work to morph one
    distribution into the other', which is why distribution-shift
    monitors report it (it is finite, metric, and insensitive to
    binning). On the pooled distinct-value grid W1 is EXACT: the CDF
    gap is the cross-multiplied integer f1·n2 − f2·n1 (the KS/CvM
    family numerator), each segment contributes |gap|·Δv (pure
    int64/HUGEINT ⟷ decimal(38,0)), and the total takes ONE micro
    floor-division by n1·n2. Scale shape identical to
    ks_statistic_sources: value-grain counts, binned 2-pass
    cumulative, a LEAD for segment widths, 1-row totals broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.filter(F.col("source").isin("src0", "src1")).select(
        F.col("n_chars").alias("v"),
        F.when(F.col("source") == "src0", 1).otherwise(2).alias("src"),
    )
    pts = s.groupBy("v").agg(
        F.sum(F.when(F.col("src") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("src") == 2, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    cum = with_grouped_cumsum(
        pts, [], F.col("v"), ["v"], ["c1", "c2"]
    ).select(
        "v",
        F.col("_cum_c1").alias("f1"),
        F.col("_cum_c2").alias("f2"),
    )
    w = Window.orderBy("v")
    cum = cum.withColumn("nxt", F.lead("v").over(w))
    n = pts.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    dec = "decimal(38,0)"
    area = (
        cum.crossJoin(F.broadcast(n))
        .filter(F.col("nxt").isNotNull())
        .select(
            (
                F.abs(
                    F.col("f1").cast(dec) * F.col("n2")
                    - F.col("f2").cast(dec) * F.col("n1")
                )
                * (F.col("nxt") - F.col("v"))
            ).alias("seg")
        )
        .agg(F.sum("seg").alias("a"))
    )
    return n.crossJoin(F.broadcast(area)).select(
        "n1",
        "n2",
        F.expr(
            f"CAST(a * 1000000 div (CAST(n1 AS {dec}) * n2) AS BIGINT)"
        ).alias("w1_micro"),
    )


@register(
    "ge2_inequality_decomposition_nations",
    oracle="""
WITH v AS (
  SELECT n.n_name AS g,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS x
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
),
grp AS (
  SELECT g, CAST(count(*) AS BIGINT) AS ng,
         CAST(SUM(x) AS BIGINT) AS sg,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS qg
  FROM v GROUP BY g
),
tot AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n,
         CAST(SUM(sg) AS BIGINT) AS s,
         CAST(SUM(qg) AS HUGEINT) AS q,
         CAST(SUM(CAST(sg AS HUGEINT) * sg * 1000 // ng) AS HUGEINT)
             AS ssov_milli
  FROM grp
)
SELECT n, s AS total_cents,
       CASE WHEN s > 0 AND CAST(s AS DOUBLE) < 2e17
                 AND CAST(n AS DOUBLE) * CAST(q AS DOUBLE) < 1e28
       THEN
       CAST((CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
            * 1000000 // (2 * CAST(s AS HUGEINT) * s) AS BIGINT)
       END AS ge2_total_micro,
       CASE WHEN s > 0 AND CAST(s AS DOUBLE) < 2e17
                 AND CAST(n AS DOUBLE) * CAST(q AS DOUBLE) < 1e28
       THEN
       CAST((CAST(n AS HUGEINT) * ssov_milli
             - CAST(s AS HUGEINT) * s * 1000) * 1000000
            // (2 * CAST(s AS HUGEINT) * s * 1000) AS BIGINT)
       END AS ge2_between_micro,
       CASE WHEN s > 0 AND CAST(s AS DOUBLE) < 2e17
                 AND CAST(n AS DOUBLE) * CAST(q AS DOUBLE) < 1e28
       THEN
       CAST((CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
            * 1000000 // (2 * CAST(s AS HUGEINT) * s) AS BIGINT)
       - CAST((CAST(n AS HUGEINT) * ssov_milli
               - CAST(s AS HUGEINT) * s * 1000) * 1000000
              // (2 * CAST(s AS HUGEINT) * s * 1000) AS BIGINT)
       END AS ge2_within_micro
FROM tot
""",
    category="relational",
    tags=("defer-window2",),
)
def ge2_inequality_decomposition_nations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GENERALIZED-ENTROPY GE(2) INEQUALITY DECOMPOSITION of order
    value across nations — the inequality index that decomposes
    ADDITIVELY into between-group and within-group parts (Gini, which
    gini_customer_revenue publishes, famously does NOT decompose;
    Theil needs logarithms; GE(2) = half the squared coefficient of
    variation is the member that is PURE MOMENTS): GE2 =
    (n·Σx² − S²)/(2S²), between-GE2 replaces each value with its
    nation mean — n·Σ S_g²/n_g − S² over the same denominator (the
    anova_f per-group milli-floored fraction machinery; in fact
    between/within here are SSB/SSW in disguise, rescaled by the
    grand mean — this query and anova_f_priorities are the
    inequality and inference faces of one identity). Published as
    micro floor-divisions with within = total − between taken as the
    exact RESIDUAL (the shift_share reconciliation doctrine), so the
    three numbers add up by construction. Headroom guard (anova_f
    doctrine): s > 0 plus double-precision magnitude checks
    (s < 2·10¹⁷ keeps 2·s²·1000 under the 10³⁸ decimal cap;
    n·q < 10²⁸ keeps both micro numerators under it) degrade all
    three indices to NULL identically in both engines past the safe
    region instead of diverging. Scale: one
    map-side-combinable moment aggregation over the fact join
    (nation broadcast, customer shuffled per doctrine), 1-row
    output."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n_ = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    v = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_), c.c_nationkey == n_.n_nationkey)
        .select(
            F.col("n_name").alias("g"),
            cents(F.col("o_totalprice")).alias("x"),
        )
    )
    dec = "decimal(38,0)"
    grp = v.groupBy("g").agg(
        F.count("*").alias("ng"),
        F.sum("x").alias("sg"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("qg"),
    )

    def sq_milli_over(s_col: str, n_col: str) -> str:
        m = f"({s_col} div {n_col})"
        r = f"({s_col} % {n_col})"
        return (
            f"(CAST({n_col} AS {dec}) * {m} * {m}"
            f" + 2 * CAST({m} AS {dec}) * {r}) * 1000"
            f" + (CAST({r} AS {dec}) * {r} * 1000 div {n_col})"
        )

    tot = grp.agg(
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
        F.sum(F.expr(sq_milli_over("sg", "ng")).cast(dec)).alias(
            "ssov_milli"
        ),
    )
    guard = (
        "s > 0 AND CAST(s AS DOUBLE) < 2e17"
        " AND CAST(n AS DOUBLE) * CAST(q AS DOUBLE) < 1e28"
    )
    total = F.expr(
        f"CASE WHEN {guard} THEN"
        f" CAST((CAST(n AS {dec}) * q - CAST(s AS {dec}) * s)"
        f" * 1000000 div (2 * CAST(s AS {dec}) * s) AS BIGINT) END"
    )
    between = F.expr(
        f"CASE WHEN {guard} THEN"
        f" CAST((CAST(n AS {dec}) * ssov_milli"
        f" - CAST(s AS {dec}) * s * 1000) * 1000000"
        f" div (2 * CAST(s AS {dec}) * s * 1000) AS BIGINT) END"
    )
    return tot.select(
        "n",
        F.col("s").alias("total_cents"),
        total.alias("ge2_total_micro"),
        between.alias("ge2_between_micro"),
        (total - between).alias("ge2_within_micro"),
    )
