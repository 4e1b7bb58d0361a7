"""Registry mapping operator-query names to (Spark callable, DuckDB oracle).

Conventions (driver contract, see repo README / __spark_entry__.py):

- Spark callable signature: ``fn(spark: SparkSession, sf_dir: str) -> DataFrame``.
- Every computed/aggregate column is aliased identically in the Spark plan
  and the oracle SQL (the driver sorts columns by name before hashing).
- Doubles are ``round()``-ed (2 dp money, 4 dp ratios) on BOTH sides so
  accumulation order can't flip a hash bit (SURVEY.md §7.4 #4/#7).
- Time columns cross the boundary as 'yyyy-MM-dd HH:mm:ss' strings
  (functions/timeutil.py) so physical timestamp precision never matters.
- Queries with no SQL-expressible oracle (streaming-stateful, LSH internals)
  register ``oracle=None`` → the driver records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# The external driver records correctness rows for only ~50 entries of
# queries() per round, in emission order. Emission order therefore rotates
# per round so every query accumulates a driver-recorded row. Round-5
# policy (VERDICT.md r4 item 1): surface growth is frozen; the head is the
# never-driver-recorded backlog, alphabetical, so the ledger gap closes at
# the driver's own budget rate.
DRIVER_PRIORITY: list[str] = [
    # ---- round-5 head: the 87 queries with NO driver CORRECTNESS row in
    # any round (r01-r04), alphabetical. The driver records ~50 rows per
    # round in emission order, so the first 50 below gain their first
    # driver record this round (never-recorded count 87 -> 37); the
    # remaining 37 lead round 6. Every name here is green in this
    # session's local replication (tests/test_correctness.py + the full
    # driver-contract sim at sf0.01) regardless of driver-row age.
    "ann_ivf_recall_eval",
    "ann_knn_graph",
    "ann_mmr_diversify",
    "ann_pq_rerank_topk",
    "ann_pq_topk",
    "curate_cross_source_leakage",
    "dedup_jaccard_prefix",
    "dedup_minhash_cdc",
    "dedup_minhash_eval",
    "dedup_ngram_containment",
    "dedup_semantic_lsh",
    "embed_dimension_stats",
    "embed_pca_top_component",
    "ext_asof_forward_tol",
    "ext_bm25_topk",
    "ext_fuzzy_name_join",
    "ext_value_band_join",
    "graph_bfs_layers",
    "graph_clustering_coeff",
    "graph_degree_distribution",
    "graph_doc_centrality",
    "graph_modularity",
    "graph_pagerank",
    "graph_triangle_count",
    "mix_dup_aware_weights",
    "mix_epoch_schedule",
    "mm_image_phash",
    "mm_phash_near_dup_pairs",
    "olap_abtest_srm_check",
    "olap_abtest_ztest",
    "olap_anomaly_outliers",
    "olap_basket_lift",
    "olap_benford_check",
    "olap_bitmap_audience_overlap",
    "olap_bitmap_uv_state",
    "olap_budget_allocation",
    "olap_calendar_heatmap",
    "olap_cohort_ltv",
    "olap_corr_matrix",
    "olap_cusum_drift",
    "olap_dau_wau_stickiness",
    "olap_equidepth_histogram",
    "olap_event_transitions",
    "olap_ewma_monthly_gmv",
    "olap_ewma_user_value",
    "olap_forecast_linear",
    "olap_gmv_waterfall",
    "olap_grouping_sets",
    "olap_growth_accounting",
    "olap_histogram",
    # ---- never-recorded remainder (rolls to round 6's head)
    "olap_incremental_gmv",
    "olap_join_skew_report",
    "olap_mad_outliers",
    "olap_markov_transition_probs",
    "olap_model_lift_table",
    "olap_monthly_growth",
    "olap_ohlc_bars",
    "olap_order_interarrival",
    "olap_pareto_segments",
    "olap_rfm_segmentation",
    "olap_sequence_match",
    "olap_session_attribution",
    "olap_sessionize",
    "olap_skyline_parts",
    "olap_timeseries_fill",
    "olap_unpivot_metrics",
    "olap_window_functions_v2",
    "olap_window_funnel",
    "olap_yoy_growth",
    "pipeline_corpus_curation_v3",
    "sk_cms_heavy_hitters",
    "sk_kmv_intersect",
    "sql_top_customers_by_year",
    "text_bpe_encode",
    "text_bpe_merge_pairs",
    "text_bpe_train",
    "text_cdc_chunks",
    "text_char_entropy",
    "text_dsir_weights",
    "text_dup_ngram_coverage",
    "text_ngram_novelty",
    "text_perplexity_buckets",
    "text_quality_calibration",
    "text_shared_substring_runs",
    "text_substring_dedup",
    "text_tokenizer_fertility",
    "text_vocab_growth",
    # ---- new in r5 (the round's one registered addition, VERDICT.md r4
    # item 5); queued behind the never-recorded backlog so it doesn't
    # displace a first-record slot — pinned by a pytest recall floor
    # (tests/test_plans.py::test_semdedup_eval_recall_floors) meanwhile
    "dedup_semantic_eval",
    # ---- stale cohort: latest driver record is r01/r02 (71 queries);
    # refresh after the never-recorded set is exhausted
    "a1_tumble_count_by_key",
    "a2_tumble_multi_metric",
    "a3_global_tumble_window",
    "ads_gmv_daily",
    "ads_province_order_amount",
    "dedup_minhash_estimate",
    "embed_near_dup_lsh",
    "embed_near_dup_pairs",
    "j8_interval_join",
    "mix_pack_sequences",
    "mix_stratified_sample",
    "mix_upsample_repeat",
    "mm_decode_metadata",
    "mm_feature_extract",
    "mm_frame_sample",
    "mm_resize_images",
    "p3_etl_filter",
    "p4_json_map_projection",
    "p8_field_add_remove",
    "p9_bean_mapping",
    "pipeline_corpus_curation",
    "r1_demux_side_outputs",
    "r3_union_same_type",
    "st1_new_visitor_repair",
    "st2_daily_unique_visitor",
    "st3_page_uv_two_states",
    "st4_login_uu_and_back",
    "st5_cart_add_uu",
    "st7_keep_latest_dedup",
    "st8_bounce_detection",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "a4_window_count_agg",
    "a5_sku_order_count_distinct",
    "a6_money_sums_coalesced",
    "curate_decontaminate",
    "ext_hop_window",
    "ext_session_window",
    "hh_top_parts_per_brand",
    "j11_anti_join_never_ordered",
    "j1_order_detail_inner_join",
    "j2_left_outer_join_collapsed",
    "j3_lookup_join_dic",
    "j4_double_lookup_same_dim",
    "j5_five_table_mixed_join",
    "j6_composite_key_join",
    "j7_dim_snowflake_enrich",
    "j9_full_outer_join",
    "mix_pack_sequences_sharded",
    "mm_audio_decode",
    "p5_conditional_delta",
    "p7_config_driven_pruning",
    "r2_array_unnest",
    "text_paragraph_dedup",
    "text_pii_redact",
    "text_quality_classifier",
    "tpch_q10_top_returners",
    "tpch_q12_priority_class",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_quantity",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_dormant_customers",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
]

_LOADED = False


def _rotated(d: dict) -> dict:
    head = {n: d[n] for n in DRIVER_PRIORITY if n in d}
    head.update({n: v for n, v in d.items() if n not in head})
    return head


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query plan and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load() -> None:
    """Import all plan modules (idempotent) so their decorators register."""
    global _LOADED
    if _LOADED:
        return
    from realtime_datawarehouse_spark.plans import (  # noqa: F401
        analytic,
        cdc_pipelines,
        graph_ops,
        llm_ops,
        sketch_agg,
        tpch_like,
        traffic,
        trade,
        warehouse_ext,
    )

    _LOADED = True


def get_queries() -> dict[str, QueryFn]:
    load()
    # A typo in the hand-maintained rotation list would silently skip a
    # query's driver re-record (_rotated drops unknown names) — fail loudly.
    unknown = [n for n in DRIVER_PRIORITY if n not in QUERIES]
    if unknown:
        raise ValueError(f"DRIVER_PRIORITY names not in registry: {unknown}")
    return _rotated(QUERIES)


def get_oracles() -> dict[str, str]:
    load()
    return _rotated(ORACLES)
