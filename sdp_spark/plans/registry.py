"""Operator registry — binds every SURVEY.md §2 key to its implementation.

Each registered key carries:
- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-native implementation;
- ``oracle`` — the equivalent DuckDB/ANSI SQL (None for ops DuckDB cannot
  express: streaming, LSH, grouped-map UDFs → driver does rows-only checks).

``__spark_entry__.py`` exposes this registry verbatim as ``queries()`` /
``oracle_sql()``; tests iterate it to diff Spark vs DuckDB locally.

Conventions (keep Spark and oracle hash-identical, SURVEY.md §7 hard parts):
- alias every computed column identically on both sides;
- round double aggregates with ``ROUND(x, 2)`` on both sides;
- output temporal values as strings (date_format / strftime), never raw
  timestamps (fixture precision is ms/ns mixed, FIXTURES.md);
- LIMIT queries carry a fully deterministic ORDER BY (unique tiebreaker).
"""

from __future__ import annotations

import functools
import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    key: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    section: str


REGISTRY: dict[str, QuerySpec] = {}

# Modules that register operator keys on import (order = SURVEY.md §2 order).
_OPERATOR_MODULES = (
    "sdp_spark.operators.scans",
    "sdp_spark.operators.relational",
    "sdp_spark.operators.joins",
    "sdp_spark.operators.aggregates",
    "sdp_spark.operators.windows",
    "sdp_spark.operators.sortlimit",
    "sdp_spark.operators.setops",
    "sdp_spark.functions.families",
    "sdp_spark.operators.subqueries",
    "sdp_spark.streaming.ops",
    "sdp_spark.operators.udfs",
    "sdp_spark.operators.llm",
    "sdp_spark.operators.corpus",
    "sdp_spark.operators.multimodal",
    "sdp_spark.operators.fulltext",
    "sdp_spark.operators.catalog",
    "sdp_spark.operators.analytics",
    "sdp_spark.operators.insights",
    "sdp_spark.operators.stats",
    "sdp_spark.operators.graphs",
    "sdp_spark.dialect",
)


def register(key: str, oracle: str | None = None, section: str = ""):
    """Decorator: add ``fn`` to the registry under ``key``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if key in REGISTRY:
            raise ValueError(f"duplicate operator key: {key}")

        @functools.wraps(fn)
        def pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver invokes operators under its own vanilla session;
            # pin the runtime confs the oracle contract depends on (UTC
            # session timezone) on EVERY dispatch, not just fixture loads —
            # disk-cached derived inputs can bypass fixtures.table().
            from sdp_spark.sources.fixtures import _pin_session_confs

            _pin_session_confs(spark)
            return fn(spark, sf_dir)

        REGISTRY[key] = QuerySpec(key=key, fn=pinned, oracle=oracle, section=section)
        return fn

    return deco


# Driver-sweep priority (round 6): the budget-capped sweep (~50 keys/round)
# certified ~50 keys per round r1-r5; CORRECTNESS_r05 landed verdicts for
# the first 50 list entries, leaving a 62-key never-verified backlog (the
# round-5 keys past the cap). VERDICT r5 next-round #1: that backlog leads
# round 6 — the sweep's 50-key cap takes exactly its first 50; the ~12
# stragglers queue for r7. Behind them: round-6 NEW keys, then all
# driver-green keys newest-round-first. An unlisted key sorts before
# everything (rank -1) and would displace the backlog past the cap — to
# deprioritize, list it; test_entry enforces registry == list exactly.
_SWEEP_PRIORITY = (
    # --- new round-10 keys (never driver-swept) ---
    "query_outbreak_farrington", "stream_farrington_alerts", "fn_epiweek",
    "ts_nowcast_delay", "query_spatial_scan_kulldorff", "fn_geo_wkt_shapes",
    "join_polygon_intersects", "llm_sim_search_ivfpq",
    "stream_nowcast_delay", "agg_direct_standardization",
    "query_spacetime_scan", "stream_spacetime_alerts",
    # --- r10 precautionary re-proofs: llm_ann_recall_eval grows an
    #     ivfpq method row; fulltext_query_expansion re-planned onto
    #     shared tf postings (hash unchanged by construction) ---
    "llm_ann_recall_eval", "fulltext_query_expansion",
    # --- freshness rotation (VERDICT r9 next-round #6): the 48 keys
    #     whose latest driver verdict dates to ROUND 1 — the sweep
    #     budget's remaining ~40 slots re-certify the oldest of them;
    #     the overflow rotates in round 11. ---
    "agg_approx_distinct", "agg_bool_bit", "agg_count_distinct", "agg_cube",
    "agg_global", "agg_group_concat", "agg_groupby", "agg_having",
    "agg_percentile", "agg_pivot", "agg_rollup", "agg_stats",
    "dedup_distinct", "dml_update_delete", "filter_basic", "filter_between",
    "filter_collation_ci", "filter_compound", "filter_in", "filter_like",
    "filter_null", "filter_regexp", "join_anti", "join_asof",
    "join_broadcast", "join_cross", "join_full", "join_inner", "join_left",
    "join_multiway", "join_right", "join_salted", "join_self", "join_semi",
    "join_theta_range", "project_case", "project_cast", "project_select",
    "scan_csv", "scan_json", "scan_orc", "scan_parquet",
    "scan_partition_pruned", "sink_append", "sink_overwrite",
    "sink_partitioned", "sink_upsert", "sort_nulls",
    # --- driver-green keys, newest-round-first (r9 ... r2) ---
    "agg_capture_recapture", "agg_proportion_ztest", "dq_l_diversity",
    "query_outbreak_ewma", "stream_ewma_alerts", "fn_geo_haversine",
    "stream_rt_alerts", "llm_rouge_overlap", "llm_quality_score",
    "llm_hard_negatives", "llm_fingerprint", "llm_dedup_simhash",
    "llm_cdc_chunk", "llm_sim_search_lsh", "llm_dedup_embed_lsh",
    "stream_sliding_wm", "stream_session_wm", "stream_stream_join_outer",
    "stream_stateful_timeout", "graph_pagerank", "llm_boilerplate_ngrams",
    "fn_geo_polygon", "dml_changelog_trigger", "catalog_information_schema",
    "query_outbreak_serfling", "stream_serfling_alerts",
    "sample_balanced_class", "graph_k_core", "join_polygon_contains",
    "llm_sim_search_pq", "win_event_sequence", "llm_span_corruption",
    "fn_geo_wkt", "agg_diagnostic_accuracy", "agg_cmh_stratified",
    "agg_moran_grid", "ts_theil_sen", "ts_holt_linear",
    "graph_label_propagation", "mm_patch_grid", "llm_keyword_rake",
    "filter_fulltext_phrase", "query_spatial_hotspot", "ts_mann_kendall",
    "join_geo_nearest", "fn_geo_geohash", "dq_benford",
    "llm_curriculum_order", "dq_drift_psi", "ts_changepoint_meanshift",
    "agg_market_basket", "llm_sample_importance", "llm_winnow_fingerprint",
    "stream_drift_psi", "llm_dedup_containment", "agg_retention_cohort",
    "agg_period_growth", "agg_pareto_abc", "dq_k_anonymity",
    "llm_embed_feature_hash", "llm_quality_classifier_linear",
    "mm_payload_cdc", "llm_corpus_diff", "query_outbreak_histlimits",
    "ts_autocorr", "ts_decompose_seasonal", "ts_max_drawdown",
    "agg_rfm_segmentation", "agg_chi2_independence", "dq_expectations_suite",
    "graph_common_neighbors", "sample_hash_group", "stream_histlimits_alerts",
    "agg_markov_transitions", "agg_time_to_event",
    "graph_degree_assortativity", "llm_zipf_slope", "agg_survival_km",
    "agg_relative_risk", "llm_token_budget_alloc", "llm_pmi_collocations",
    "llm_bigram_perplexity", "agg_welch_ttest", "agg_mann_whitney",
    "ts_cross_correlation", "llm_readability", "llm_knn_graph",
    "llm_novelty_rate", "sample_weighted_reservoir", "agg_hhi_concentration",
    "agg_bootstrap_ci", "agg_indirect_standardization", "ts_rt_ratio",
    "sample_neyman_allocation", "agg_gini", "graph_bipartite_projection",
    "dialect_pipe_syntax", "agg_observe_metrics", "stream_dedup_wm",
    "scan_recursive_glob", "udf_grouped_arrow", "filter_collation_native",
    "dialect_identifier_param", "win_fill_forward", "scan_file_metadata",
    "fn_url_parse", "sink_compressed", "agg_bitmap_distinct",
    "dialect_dml_roundtrip", "llm_quality_c4", "dq_anomaly_iqr",
    "join_interval_overlap", "graph_connected_components",
    "graph_triangle_count", "ts_interpolate_linear", "dq_profile_table",
    "llm_repetition_ngram", "agg_histogram_equiwidth", "dq_winsorize",
    "graph_shortest_path_bfs", "win_rolling_corr", "llm_dup_cluster_stats",
    "catalog_matview_incremental", "agg_entropy", "dq_mad_outlier",
    "agg_weighted_percentile", "ts_seasonal_error", "stream_matview_upkeep",
    "query_outbreak_cusum", "agg_skew_kurtosis", "stream_cusum_alerts",
    "llm_dataset_card", "subq_any_all", "udf_pandas_iter", "mm_payload_dedup",
    "dq_freshness_check", "dq_duplicate_pk_check", "win_cumulative_distinct",
    "llm_dedup_near", "stream_watermark", "stream_tumbling_wm",
    "win_sliding_median", "win_ewma", "llm_blocklist_filter",
    "subq_correlated_scalar", "filter_row_constructor", "agg_regression",
    "query_forecast_revenue", "join_existence", "fn_try_arith",
    "fn_week_modes", "fn_mysql_string2", "fn_inet", "fn_aes_roundtrip",
    "join_null_safe", "win_ratio_to_report", "stream_approx_distinct",
    "mm_modality_stats", "llm_pipeline_multimodal", "query_outbreak_ears",
    "join_fuzzy_blocked", "stream_ears_alerts", "llm_corpus_lineage",
    "catalog_cross_db", "sink_dynamic_overwrite", "sink_stream_partitioned",
    "fn_regex_advanced", "scan_numbers_table", "scan_incremental_files",
    "dialect_prepared_stmt", "udtf_python_native", "udf_map_in_arrow",
    "fn_variant_json", "catalog_sql_udf", "query_small_qty_orders",
    "query_market_share", "query_product_profit", "query_shipmode_priority",
    "query_parts_supplier_cnt", "query_waiting_suppliers",
    "query_min_cost_supplier", "query_important_stock",
    "query_dominant_suppliers", "scan_xml", "scan_python_datasource",
    "catalog_sql_script", "cte_recursive", "graph_degree",
    "dq_referential_check", "scan_csv_malformed", "llm_perplexity_proxy",
    "llm_sample_stratified", "llm_chunk_windows", "scan_multiformat_union",
    "agg_percentile_disc", "fn_trig", "dml_truncate_partition",
    "llm_url_normalize", "llm_shard_export", "llm_semdedup",
    "llm_cluster_kmeans", "fulltext_bm25", "llm_inverted_index",
    "limit_found_rows", "agg_ohlc_resample", "ts_gap_fill",
    "llm_dedup_substring", "llm_embed_normalize", "llm_embed_pca",
    "sink_zorder", "llm_embed_quantize", "llm_bpe_pair_counts",
    "llm_mix_epochs", "join_scd2_pointintime", "subq_not_in_null",
    "fn_convert_tz", "query_cust_order_counts", "stream_ohlc",
    "dialect_mysql_query", "llm_dedup_url_docs", "llm_vocab_oov",
    "agg_approx_topk", "query_large_volume_cust",
    "query_local_supplier_volume", "query_volume_shipping",
    "query_promo_effect", "query_top_supplier", "query_disjunctive_parts",
    "query_dormant_customers", "dialect_user_var_rownum", "sink_odku",
    "llm_hybrid_search_rrf", "llm_dedup_incremental", "join_runtime_bloom",
    "stream_topk_windowed", "llm_bpe_apply", "sink_sized_files", "join_dpp",
    "sink_insert_ignore", "sink_replace", "llm_pii_scrub",
    "llm_decontaminate", "llm_sample_temperature", "llm_pack_sequences",
    "llm_quality_gopher", "fn_encode", "join_spatial_grid",
    "agg_sketch_rollup", "sink_stream_upsert", "scan_binary_files",
    "fn_spatial", "agg_funnel", "llm_ngram_counts", "sink_outfile_csv",
    "sink_compact", "llm_doc_len_histogram", "agg_approx_percentile",
    "mm_decode_pipeline", "scan_jdbc", "join_bucketed", "sink_autoincrement",
    "scan_text", "agg_filtered", "win_sessionize", "join_range_bucketed",
    "catalog_ctas", "llm_dedup_softnorm", "llm_dedup_prefix",
    "llm_domain_mix", "llm_corpus_stats", "query_shipping_priority",
    "query_returned_items", "query_late_orders", "agg_mode", "sink_jsonl",
    "fn_json_struct", "win_zscore", "join_asof_tolerance",
    "llm_cross_split_dedup", "stream_late_metrics", "win_gap_islands",
    "dml_merge_scd2", "source_stream_files", "sink_stream_foreachBatch",
    "sink_jdbc", "sink_stream_jdbc",
    "stream_ingest", "stream_tumbling", "stream_sliding", "stream_session",
    "stream_dedup", "stream_stateful", "stream_join_dim", "filter_fulltext",
    "filter_fulltext_bool", "catalog_ddl", "catalog_views", "llm_langid",
    "llm_dedup_embed", "llm_dedup_ngram_jaccard", "llm_sim_search_ivf",
    "llm_token_count_bpe", "llm_pipeline_e2e", "llm_pipeline_train_corpus",
    "agg_grouping_sets", "agg_corr", "filter_collation_accent",
    "sample_systematic", "agg_unpivot", "project_cast_lenient",
    "catalog_analyze_stats", "fn_fuzzy", "scan_schema_evolution",
    "catalog_show_describe", "join_hinted", "mm_frame_sample",
    "stream_stream_join", "llm_dedup_near_resolve",
    "llm_pipeline_train_corpus_nd", "project_enum_check", "fn_time_year",
    "project_set_check", "win_row_number", "win_rank", "win_lag_lead",
    "win_running", "win_sliding_rows", "win_range_frame", "win_topk_group",
    "win_first_last", "win_cume_dist", "win_nth_value", "win_ntile",
    "sort_multikey", "limit_offset", "topk", "set_union_all", "set_union",
    "set_intersect", "set_except", "set_intersect_all", "set_except_all",
    "fn_string", "fn_string_regex", "fn_date", "fn_math", "fn_conditional",
    "fn_json", "fn_array_map", "fn_hash", "fn_map", "fn_substring_index",
    "fn_datetime_arith", "fn_bitwise", "fn_mysql_misc", "subq_scalar",
    "subq_in_exists", "subq_derived", "cte_with", "subq_lateral",
    "udf_python", "udf_pandas_scalar", "udf_pandas_grouped_agg",
    "udf_grouped_map", "udtf_explode", "llm_dedup_exact", "llm_sim_search",
    "llm_text_stats", "llm_tfidf_topterms", "llm_lang_filter",
    "llm_multimodal_cols",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (idempotent) and return the registry,
    ordered so the driver's budget-bounded sweep hits never-verified keys
    first (see _SWEEP_PRIORITY)."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    rank = {k: i for i, k in enumerate(_SWEEP_PRIORITY)}
    # unknown (newly added) keys sort before everything: they have no verdict
    ordered = sorted(REGISTRY, key=lambda k: rank.get(k, -1))
    return {k: REGISTRY[k] for k in ordered}
