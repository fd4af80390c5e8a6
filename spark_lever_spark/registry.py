"""Central query registry.

Every operator the engine claims (SURVEY.md §2 inventory) registers a
named query here: a PySpark callable ``(spark, sf_dir) -> DataFrame``
plus, when SQL-expressible, a DuckDB-compatible ANSI-SQL oracle string
computing the identical result (same column names — the driver's
compare hashes values after sorting columns by name).

The registry is what ``__spark_entry__.queries()`` / ``oracle_sql()``
expose to the correctness driver, and what ``bench.py`` samples.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check
    category: str = "misc"
    bench: bool = False  # include in bench.py headline set
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    category: str = "misc",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle.strip() if oracle else None,
            category=category,
            bench=bench,
            doc=(fn.__doc__ or "").strip(),
            tags=tags,
        )
        return fn

    return deco


# The correctness driver consumes queries() in dict order and has a
# per-round budget (50/round; every CORRECTNESS_r0N file is exactly the
# first 50 names of that round's ordering). Order the exposed dict so
# the budget lands where it buys the most new information:
#   0. just-fixed regressions (must be re-verified THIS round — their
#      latest green rows predate the break),
#   1. never-driver-checked queries (SQL-oracle first — the stronger
#      check — then rows-only),
#   2. already-green queries, least-recently-driver-checked FIRST, so
#      the window rotates through the whole registry across rounds
#      instead of pinning to one prefix (r03 and r04 re-checked an
#      identical 50-query set while two queries regressed outside it —
#      that must not repeat). Streaming queries drain last within a
#      vintage (slowest per verified row).
_R01_CHECKED: frozenset[str] = frozenset({
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q10_returned_items", "q14_promo_effect",
    "q18_large_volume_customer", "q9_profit_by_nation_year",
    "q4_order_priority", "q7_volume_shipping", "q8_market_share",
    "q13_customer_distribution", "q15_top_supplier",
    "q17_small_quantity_revenue", "q19_discounted_revenue",
    "q22_dormant_customers", "q12_late_shipment_priority",
    "q21_waiting_supplier", "q2_min_cost_supplier", "q11_important_stock",
    "q16_supplier_part_counts", "q20_potential_promotion",
    "scan_project_filter", "distinct_pairs", "dropduplicates_orders",
    "topk_orders", "agg_stats_full", "first_last_per_group",
    "approx_count_distinct", "sample_deterministic",
    "histogram_fixed_buckets", "percentiles_exact", "count_by_value",
    "values_collected_sorted", "sample_by_key_stratified",
    "map_in_pandas_partition_stats", "skew_salted_agg",
    "stat_corr_covar_by_flag", "approx_percentile_prices",
    "random_split_sizes", "skew_salted_join", "stat_freq_items",
    "join_inner", "join_left_outer", "join_right_outer", "join_full_outer",
    "join_left_semi", "join_left_anti", "join_broadcast_dim",
    "join_theta_nonequi",
})
_R02_CHECKED: frozenset[str] = frozenset({
    "q12_late_shipment_priority", "approx_count_distinct",
    "values_collected_sorted", "sample_by_key_stratified",
    "map_in_pandas_partition_stats", "approx_percentile_prices",
    "random_split_sizes", "stat_freq_items", "pipe_partitions_tr",
    "join_cartesian", "join_mixed_equi_nonequi", "cogroup_pandas",
    "set_union_all", "set_union_distinct", "set_intersect", "set_except",
    "zip_with_index", "cube_flag_status", "rollup_region_nation",
    "grouping_sets_explicit", "pivot_event_type_daily",
    "window_topk_per_group", "window_rank_dense", "window_lag_lead",
    "window_running_sum", "window_moving_avg", "window_ntile_quartiles",
    "expr_string_funcs", "expr_like_rlike", "expr_case_null",
    "expr_cast_matrix", "expr_math", "expr_datetime",
    "expr_complex_types", "expr_explode_words", "expr_posexplode",
    "expr_json_extract", "expr_bitwise_in_greatest",
    "na_fill_drop_replace", "sessionize_events",
    "funnel_view_click_purchase", "layout_zorder_events",
    "lever_weighted_repartition", "lever_plan_proportion",
    "asof_purchase_last_view", "range_join_views_before_purchase",
    "resample_hourly_ffill", "text_decontaminate", "text_bigram_novelty",
    "sample_hash_bucket",
})
# r03 and r04 ran the identical set (CORRECTNESS_r03 == _r04 key-wise):
# the 38 queries that were group-0/1 in round 3's ordering plus the
# first 12 re-checks.
_R04_CHECKED: frozenset[str] = frozenset({
    "text_fingerprint_winnow", "mix_source_weights",
    "pipeline_curate_sample_stats", "dedup_substring_spans",
    "dedup_exact_md5", "dedup_exact_normalized", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "knn_cosine_topk",
    "similarity_join_blocked", "embedding_norm_stats",
    "ann_lsh_hyperplane", "dedup_embedding_cosine", "ann_ivf",
    "embedding_quantize_int8", "dedup_cc_chain_clusters",
    "dedup_minhash_clusters", "multimodal_decode_meta",
    "multimodal_meta_stats", "multimodal_frame_sample",
    "multimodal_resize_plan", "text_chunk_sliding", "pack_documents_2048",
    "text_token_counts", "text_quality_scores", "text_lang_id",
    "text_fingerprint_shingles", "text_repetition_signals",
    "pipeline_quality_dedup_stats", "pandas_udf_text_norm",
    "grouped_pandas_median", "sql_registered_udf",
    "stream_agg_orders_status", "stream_windowed_events_hourly",
    "stream_update_state_customer_counts", "stream_dedup_events",
    "stream_static_orders_by_nation", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q10_returned_items", "q14_promo_effect",
    "q18_large_volume_customer", "q9_profit_by_nation_year",
    "q4_order_priority", "q7_volume_shipping", "q8_market_share",
    "q13_customer_distribution",
})

# Most-recent round each query was driver-checked in (later rounds win).
_CHECK_ROUNDS: tuple[tuple[int, frozenset[str]], ...] = (
    (1, _R01_CHECKED),
    (2, _R02_CHECKED),
    (4, _R04_CHECKED),
)

# Queries broken by the events.ts TIMESTAMP_NTZ shift and fixed in
# round 5 — their latest green rows (r02) predate the break, so they
# must head the round-5 window for an immediate re-verify.
_REFRONT: tuple[str, ...] = (
    "sessionize_events",
    "range_join_views_before_purchase",
)


def _last_checked(name: str) -> int:
    return max((rnd for rnd, names in _CHECK_ROUNDS if name in names), default=0)


def _driver_group(q: Query) -> tuple[int, int]:
    if q.name in _REFRONT:
        return (0, 0)
    last = _last_checked(q.name)
    if last == 0:  # never driver-checked: oracle first (stronger check)
        return (1, 0 if q.oracle else 1)
    return (2, last)  # oldest vintage first → window rotates


def all_queries() -> dict[str, Query]:
    _ensure_loaded()
    order = list(_REGISTRY)
    keyed = sorted(
        _REGISTRY.values(),
        key=lambda q: (
            *_driver_group(q),
            q.category == "streaming",
            order.index(q.name),
        ),
    )
    return {q.name: q for q in keyed}


def query_fns() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle}


def bench_queries() -> dict[str, Query]:
    return {name: q for name, q in all_queries().items() if q.bench}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports happen here (not module top) to avoid import cycles:
    # operator modules import `register` from this module.
    from spark_lever_spark.operators import (  # noqa: F401
        tpch,
        tpch2,
        tpch3,
        relational,
        joins,
        setops,
        rollups,
        windows,
        expressions,
        events,
        layout,
        lever_demo,
        temporal,
    )
    from spark_lever_spark.llm import (  # noqa: F401
        curation,
        dedup,
        embeddings,
        graph,
        multimodal,
        packing,
        pipeline,
        similarity,
        textstats,
    )
    from spark_lever_spark.functions import udfs  # noqa: F401
    from spark_lever_spark.streaming import queries as streaming_queries  # noqa: F401

    _LOADED = True
