"""Hand-maintained CHANGED_PLAN ledger: queries whose PHYSICAL PLAN was
restructured by an optimization round while their declared OUTPUT stayed
identical (verified locally by tests/test_oracle_parity.py, but not yet
re-attested by a driver CORRECTNESS row run against the new plan).

The row-age rotation (``_row_age.py``) only fronts never-verified and
changed-OUTPUT rows — an output-identical plan rewrite leaves the old
driver row green forever, so nothing would ever re-attest the new code
path through the driver's own oracle gate (round-15 verdict, "driver
attestation gap for changed plans"). Entries here front right behind the
changed-output group in the driver window ordering.

Format: ``{query_name: round_the_plan_change_shipped}``. An entry is
LIVE (fronted) while the query's last green driver row predates the
shipping round, and clears itself the moment the driver verifies the
query at or after that round — no manual pruning step. Add an entry in
the same commit as any plan-restructuring edit to a registered query.
"""

CHANGED_PLAN: dict[str, int] = {
    # --- round 15 (plans changed again r16: integer hi/lo split inside
    # exact_unscaled_sum replaced the double floor-division — ADVICE r15):
    # exact_unscaled_sum decimal-aggregate hot path ---
    "flagship_revenue_by_month_segment": 16,
    "q1_pricing_summary": 16,
    "q3_shipping_priority": 16,
    "q5_supplier_volume_by_nation": 16,
    "q8_market_share": 16,
    "q14_promo_revenue_ratio": 16,
    "q19_disjunctive_predicates": 16,
    # --- round 16: exact_unscaled_sum internals (integer split) also flow
    # into every other exact_avg / _rev_sum consumer ---
    "q9_product_profit": 16,
    "q11_important_parts": 16,
    "j1_dim_lookup_left_join": 16,
    "j5_batch_inner_join": 16,
    "a1_grouped_avg": 16,
    "a2_pivot_explicit_values": 16,
    # --- round 16: decimal-sum → long-partials rollout (guide §5) ---
    "q17_small_quantity_revenue": 16,
    "q20_dominant_suppliers": 16,
    "q22_dormant_customers": 16,
    "w2_running_sum": 16,
    "range_join_price_tiers": 16,
    "agg_cube": 16,
    "agg_grouping_sets": 16,
    "agg_stats_exact": 16,
    "j6_skew_salted_join": 16,
    "contribution_share_by_region": 16,
    "st_windowed_agg": 16,
    # --- round 15 dedup collapse; plans changed AGAIN r16 (shared
    # per-doc array corpus pass, window→aggregate prefix, array verify
    # off the cached arrays) ---
    "dedup_minhash_lsh": 16,
    "dedup_clusters": 16,
    "pagerank_dup_graph": 16,
    "graph_triangle_counts": 16,
    "incremental_minhash_index": 16,
    "dedup_prefix_filter_jaccard": 16,
    "dedup_containment_exact": 16,
    "dedup_containment_pairs": 16,
    "minhash_estimate_error": 16,
    # --- round 16: per-doc top-k via aggregate (two-window grouped_topk
    # removed from the apply side) ---
    "langid_ngram_profile": 16,
    # --- round 16: input materialized once ahead of the 3-pass bucketed
    # rank machinery; kmv one-shuffle hash grouping; crossmodal
    # passthrough decode (3 joins + double encode → 1 join) ---
    "ccnet_perplexity_buckets": 16,
    "training_corpus_pipeline_v5": 16,
    "quantile_normalize_doclen": 16,
    "kmv_source_overlap": 16,
    "crossmodal_pair_audit": 16,
    # --- round 15: single-scan MATCH SIMPLE referential enforcement ---
    "expectations_referential": 15,
    "expectations_quarantine_replay": 15,
    "expectations_aggregate_counters": 15,
    "expectations_quarantine_split": 15,
}
