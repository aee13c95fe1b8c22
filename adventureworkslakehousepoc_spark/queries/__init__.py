"""Query registry: maps SURVEY.md §2 inventory rows (and extension operators)
to (Spark callable, DuckDB oracle SQL) pairs consumed by ``__spark_entry__``.

Registration ORDER matters: the driver's per-round correctness pass covers a
prefix of the registry (50 queries in rounds 1-3), so each round fronts the
queries most in need of a fresh driver row:

1. queries whose round-3 row errored (the TIMESTAMP_NTZ regression, now
   fixed) plus ``multimodal_decode_features`` (first round with a real
   oracle),
2. queries never yet included in any driver window,
3. queries new this round (no local-green history either),
4. everything already driver-verified green in r1-r3, oldest verification
   first is unnecessary — any order is fine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Rows that errored in CORRECTNESS_r03.json — re-green them in the driver
# record first (all were the one NTZ regression; multimodal_decode_features
# was `no_oracle` until round 4 gave the stub decode a closed-form oracle).
_R03_FAILED = (
    "sessionization_batch",
    "st_windowed_agg",
    "st_interval_join_inner",
    "st_streaming_dedup",
    "st_session_window",
    "multimodal_decode_features",
)

# Registered queries that have never appeared in any driver correctness
# window (r1-r3 each checked a 50-query prefix; these were always behind it).
_NEVER_WINDOWED = (
    "q2_min_within_group",
    "agg_percentiles_approx",
    "agg_grouping_sets",
    "approx_distinct_sketch",
    "q7_volume_between_nations",
    "q10_returned_items",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_delay_priority_counts",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q21_sole_late_supplier",
    "q22_dormant_customers",
    "q20_dominant_suppliers",
    "sft_transcript_assembly",
    "contrastive_negative_pairs",
    "embedding_norm_histogram",
    "tokenize_encode_ids",
    "curriculum_length_buckets",
    "dedup_incremental_batch",
    "mixture_resample_sources",
    "dedup_span_exact",
    "tfidf_top_terms",
    "global_shuffle_buckets",
    "grouped_map_label_centroids",
    "st_interval_join_left_outer",
    "w4_rolling_range_frame",
    "unpivot_source_metrics",
    "j6_skew_salted_join",
    "runtime_filter_join",
)

# dq_expectations_orders / schema_evolution_read / agg_cube /
# cdf_time_travel_asof_v2 intentionally NOT fronted: they sort with the
# new-this-round group (after it, by module order) so the round-4 additions
# all fit inside a 50-query driver prefix. Every registered query is
# oracle-compared locally by tests/test_oracle_parity.py regardless; the
# demoted four also have dedicated tests (test_advanced.py, test_streaming.py;
# agg_cube's ROLLUP / GROUPING SETS siblings are already driver-green).

# Green rows recorded by the driver in CORRECTNESS_r01/r02/r03.json — these
# sort to the back of the registry; everything not listed here and not
# explicitly fronted is new this round and sorts just after the fronted set.
_DRIVER_VERIFIED = frozenset(
    {
        "a1_grouped_avg", "a2_pivot_explicit_values", "agg_distinct",
        "agg_percentiles", "agg_rollup", "agg_stats_exact",
        "ann_bruteforce_topk", "ann_ivf_topk", "ann_lsh_bucketed_topk",
        "ann_pandas_udf_scores", "ann_pq_adc_topk", "asof_join_latest_click",
        "cdf_scd2_history", "decontaminate_ngram_overlap", "dedup_clusters",
        "dedup_embedding_cosine", "dedup_exact", "dedup_minhash_lsh",
        "dedup_ngram_jaccard", "dedup_simhash_fingerprints",
        "dedup_simhash_pairs", "dedup_window_rank", "dim_customer",
        "dim_geo", "dim_product", "dim_store", "f_array_functions",
        "f_conditional_functions", "f_date_functions", "f_json_extract",
        "f_string_functions", "fact_sales", "fact_weather",
        "flagship_revenue_by_month_segment", "fuzzy_part_names",
        "j1_dim_lookup_left_join", "j3_interval_join_symmetric",
        "j4_chained_interval_join", "j5_batch_inner_join", "knn_join_exact",
        "multimodal_payload_metadata", "p1_projection_rename",
        "p2_computed_columns", "p3_null_filter", "p4_conjunctive_filter",
        "p5_membership_filter", "pack_training_sequences",
        "profile_orders_table", "q14_promo_revenue_ratio",
        "q18_large_orders", "q19_disjunctive_predicates",
        "q1_pricing_summary", "q3_shipping_priority",
        "q4_order_priority_semi", "q5_supplier_volume_by_nation",
        "q6_forecast_revenue", "range_join_price_tiers",
        "raw_metrics_timeseries", "s5_s7_stations_text_file",
        "s6_csv_explicit_schema", "s6_csv_malformed_quarantine",
        "s7_fixed_width_parse", "s7_inventory_file", "s8_sink_roundtrip",
        "s9_bronze_passthrough", "sample_hash_deterministic",
        "sample_stratified_corpus", "sessionization_batch",
        "set_operations", "source_quota_cap", "sql_api_orders_by_region",
        "st_cdf_snapshot", "st_dim_geo_incremental",
        "st_interval_join_inner", "st_j2_unwatermarked_inner_join",
        "st_session_window", "st_stateful_running_counts",
        "st_stream_static_join", "st_streaming_dedup",
        "st_upsert_sink_snapshot", "st_windowed_agg",
        "string_edit_distance", "text_boilerplate_flags",
        "text_fingerprints", "text_language_id", "text_pii_redaction",
        "text_quality_scores", "text_repetition_scores",
        "text_token_counts", "text_unigram_lm_score", "time_bucket_rollup",
        "timeseries_gapfill_locf", "training_corpus_pipeline",
        "training_corpus_pipeline_v2", "us_stations", "vocab_top_tokens",
        "w1_topk_per_group", "w2_running_sum", "w3_lag_lead",
    }
)


# new-in-r4 streaming query, fronted explicitly because its module
# (streaming_queries) sorts after extensions in the merged dict
_R04_FRONT = ("st_corpus_ingest_gate",)


def _round4_order(merged: dict) -> dict:
    front = [k for k in _R03_FAILED + _NEVER_WINDOWED + _R04_FRONT if k in merged]
    out = {k: merged[k] for k in front}
    # new-this-round queries: registered but never driver-verified nor fronted
    out.update({k: v for k, v in merged.items() if k not in out and k not in _DRIVER_VERIFIED})
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import advanced, analytics, extensions, parity, streaming_queries, tpch_suite

    out: dict[str, Callable] = {}
    out.update(parity.QUERIES)
    out.update(extensions.QUERIES)
    out.update(streaming_queries.QUERIES)
    out.update(analytics.QUERIES)
    out.update(advanced.QUERIES)
    out.update(tpch_suite.QUERIES)
    return _round4_order(out)


def all_oracles() -> dict[str, str]:
    from . import advanced, analytics, extensions, parity, streaming_queries, tpch_suite

    out: dict[str, str] = {}
    out.update(parity.ORACLE)
    out.update(extensions.ORACLE)
    out.update(streaming_queries.ORACLE)
    out.update(analytics.ORACLE)
    out.update(advanced.ORACLE)
    out.update(tpch_suite.ORACLE)
    return _round4_order(out)
