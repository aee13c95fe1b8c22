"""Query registry: maps SURVEY.md §2 inventory rows (and extension operators)
to (Spark callable, DuckDB oracle SQL) pairs consumed by ``__spark_entry__``.

Registration ORDER matters: the driver's per-round correctness pass covers a
50-query prefix of the registry, so each round fronts the queries most in
need of a fresh driver row. The ROUND-5 window (checked by
tests/test_registry.py::test_round5_driver_window_composition so additions
can't silently overflow it, the round-4 mistake) is, in order:

1. the 12 queries that have NEVER had a driver row (they overflowed the
   round-4 window: 8 operators added after the r4 order was planned, plus
   the 4 demoted to make room),
2. the two sketch rows, re-shaped this round to be driver-verifiable
   (``agg_percentiles_approx`` emitted an array column the driver's
   canonicalizer couldn't sort; ``approx_distinct_sketch`` had no oracle),
3. queries NEW this round (6 planned late in round 4 + 25 added in round 5:
   span-rewrite dedup, k-anonymity, time-decay, DSIR, bigram LM, weighted
   systematic sample, entity resolution, PageRank, BPE encode, pipeline v4,
   dim_date, contribution share, PSI drift, prefix-filter Jaccard,
   distributed exact quantiles, SCD2 point-in-time join, market basket,
   daily z-score anomaly, ntile/percent_rank, Pareto frontier, triangle
   counts, spatial grid join, CDF version diff, vocab coverage curve,
   incremental MinHash index, forward as-of join, referential-integrity
   audit, embedding decontamination, containment-ratio dedup),
4. queries whose OUTPUT changed in round 4 after their last driver row
   (md5-lane MinHash signatures, hashed-shingle boilerplate flags,
   coalesced weak-label votes), so the old green rows no longer attest
   current behavior,
5. refresh of the oldest driver rows — round-5 additions consumed every
   refresh slot. ROUND-6 PLAN: front the whole r1-verified set (p1–p5,
   j1/j3/j4/j5, a1/a2, f_*,
   s6/s7 sources, dim_*, fact_*, raw_metrics, q1/q5/q6/q14/q19,
   us_stations, ann_*, dedup_simhash_*, text_*), then the r3-verified
   block — restoring the ≤2-round row-age target that round 5 deliberately
   traded for first-time verification of 31 new operators.

Every registered query is ALSO oracle-compared locally by
tests/test_oracle_parity.py each session regardless of window position.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Window groups 1-4 above, in driver-row priority order. Queries added later
# in round 5 must be appended HERE (the composition test forces the matching
# trim of _R05_REFRESH_R1).
_R05_FRONT = (
    # -- group 1: never had a driver row (r4 window overflow)
    "source_drift_kl",
    "weak_label_votes",
    "embedding_int8_quantize",
    "collocation_pmi_topk",
    "cdf_time_travel_asof_v2",
    "agg_cube",
    "gold_sales_wide",
    "incremental_agg_merge",
    "funnel_conversion_stages",
    "cohort_retention_matrix",
    "dq_expectations_orders",
    "schema_evolution_read",
    # -- group 2: sketch rows made driver-verifiable this round
    "agg_percentiles_approx",
    "approx_distinct_sketch",
    # -- group 3: new in round 5
    "semantic_prune_pairs_scaled",
    "reward_group_normalize",
    "dpo_pair_mining",
    "char_entropy_quality",
    "mad_outlier_flags",
    "bpe_merge_induction",
    "dedup_span_rewrite",
    "k_anonymity_audit",
    "time_decay_user_scores",
    "dsir_importance_weights",
    "bigram_lm_scores",
    "weighted_systematic_sample",
    "entity_resolution_parts",
    "pagerank_dup_graph",
    "bpe_apply_encode",
    "training_corpus_pipeline_v4",
    "dim_date_generated",
    "contribution_share_by_region",
    "psi_value_drift",
    "dedup_prefix_filter_jaccard",
    "exact_quantiles_distributed",
    "scd2_point_in_time_join",
    "market_basket_lift",
    "anomaly_daily_zscore",
    "w5_ntile_percent_rank",
    "pareto_frontier_parts",
    "graph_triangle_counts",
    "spatial_grid_neighbors",
    "cdf_snapshot_diff",
    "vocab_coverage_curve",
    "incremental_minhash_index",
    "asof_join_forward_next_purchase",
    "referential_integrity_audit",
    "decontaminate_embedding_cosine",
    "dedup_containment_pairs",
    # -- group 4: outputs changed in r4 after their last driver row
    # (text_boilerplate_flags also changed, but the 50-slot window is full —
    # it stays locally oracle-green and fronts the round-6 window)
    "dedup_minhash_lsh",
)

# Group 5: refresh slots — rows last driver-verified in ROUND 1. EMPTY this
# round: all 50 - len(_R05_FRONT) slots were re-spent on first-time driver
# rows for operators added during round 5; the whole r1-verified §2 core
# block (p1–p5, j*, a*, f_*, sources, dims, facts, q-suite, ann_*,
# dedup_simhash_*, text_*) fronts the round-6 window instead.
_R05_REFRESH_R1 = ()

# Every query with a green driver row in SOME round (r1-r4) — used to route
# queries that are neither fronted nor refreshed: unknown names land right
# after the front block (never silently at 50+), known-verified ones sort to
# the back.
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
        # green in CORRECTNESS_r04.json:
        "agg_grouping_sets", "contrastive_negative_pairs",
        "curriculum_length_buckets", "dedup_incremental_batch",
        "dedup_span_exact", "doc_chunking_overlap",
        "embedding_norm_histogram", "global_shuffle_buckets",
        "grouped_map_label_centroids", "j6_skew_salted_join",
        "mixture_resample_sources", "mixture_token_budget_plan",
        "multimodal_decode_features", "multimodal_frame_sample",
        "ngram_continuation_topk", "q10_returned_items",
        "q11_important_parts", "q12_delay_priority_counts",
        "q13_customer_distribution", "q15_top_supplier",
        "q16_supplier_part_counts", "q17_small_quantity_revenue",
        "q20_dominant_suppliers", "q21_sole_late_supplier",
        "q22_dormant_customers", "q2_min_within_group",
        "q7_volume_between_nations", "q8_market_share", "q9_product_profit",
        "runtime_filter_join", "semantic_cluster_assign",
        "semantic_dedup_reps", "semantic_prune_pairs", "sft_transcript_assembly",
        "st_corpus_ingest_gate", "st_interval_join_left_outer",
        "tfidf_top_terms", "tokenize_encode_ids", "train_eval_split_counts",
        "training_corpus_pipeline_v3", "unpivot_source_metrics",
        "w4_rolling_range_frame", "zorder_key_orders",
    }
)


def _round5_order(merged: dict) -> dict:
    out = {k: merged[k] for k in _R05_FRONT if k in merged}
    # safety net: anything never driver-verified and not fronted goes HERE,
    # before the refresh block — a forgotten new query steals a refresh slot
    # instead of silently landing past position 50 (the round-4 failure mode)
    out.update({k: v for k, v in merged.items() if k not in out and k not in _DRIVER_VERIFIED})
    out.update({k: merged[k] for k in _R05_REFRESH_R1 if k in merged and k not in out})
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
    return _round5_order(out)


def all_oracles() -> dict[str, str]:
    from . import advanced, analytics, extensions, parity, streaming_queries, tpch_suite

    out: dict[str, str] = {}
    out.update(parity.ORACLE)
    out.update(extensions.ORACLE)
    out.update(streaming_queries.ORACLE)
    out.update(analytics.ORACLE)
    out.update(advanced.ORACLE)
    out.update(tpch_suite.ORACLE)
    return _round5_order(out)
