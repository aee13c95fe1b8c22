"""Query registry: maps SURVEY.md §2 inventory rows (and extension operators)
to (Spark callable, DuckDB oracle SQL) pairs consumed by ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Queries the round-1 driver already recorded green CORRECTNESS rows for
# (CORRECTNESS_r01.json covered exactly the first 50 registrations). Round 2
# registers the still-unchecked queries FIRST so a prefix-limited driver pass
# reaches them; combined r01+r02 coverage is maximized either way.
_R01_DRIVER_CHECKED = frozenset(
    {
        "flagship_revenue_by_month_segment", "q1_pricing_summary",
        "q3_shipping_priority", "q5_supplier_volume_by_nation",
        "p1_projection_rename", "p2_computed_columns", "p3_null_filter",
        "p4_conjunctive_filter", "p5_membership_filter",
        "j1_dim_lookup_left_join", "j3_interval_join_symmetric",
        "j4_chained_interval_join", "j5_batch_inner_join", "a1_grouped_avg",
        "a2_pivot_explicit_values", "f_string_functions",
        "f_conditional_functions", "f_date_functions", "s7_fixed_width_parse",
        "s6_csv_explicit_schema", "dim_geo", "dim_product", "dim_customer",
        "dim_store", "fact_sales", "raw_metrics_timeseries", "us_stations",
        "fact_weather", "s9_bronze_passthrough", "s5_s7_stations_text_file",
        "q6_forecast_revenue", "q14_promo_revenue_ratio",
        "q19_disjunctive_predicates", "s7_inventory_file",
        "s6_csv_malformed_quarantine", "dedup_exact", "dedup_minhash_lsh",
        "dedup_simhash_fingerprints", "dedup_simhash_pairs",
        "dedup_ngram_jaccard", "dedup_embedding_cosine",
        "ann_bruteforce_topk", "ann_lsh_bucketed_topk", "ann_ivf_topk",
        "ann_pandas_udf_scores", "text_language_id", "text_quality_scores",
        "text_token_counts", "text_fingerprints", "text_repetition_scores",
    }
)


def _unchecked_first(merged: dict) -> dict:
    out = {k: v for k, v in merged.items() if k not in _R01_DRIVER_CHECKED}
    out.update({k: v for k, v in merged.items() if k in _R01_DRIVER_CHECKED})
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
    return _unchecked_first(out)


def all_oracles() -> dict[str, str]:
    from . import advanced, analytics, extensions, parity, streaming_queries, tpch_suite

    out: dict[str, str] = {}
    out.update(parity.ORACLE)
    out.update(extensions.ORACLE)
    out.update(streaming_queries.ORACLE)
    out.update(analytics.ORACLE)
    out.update(advanced.ORACLE)
    out.update(tpch_suite.ORACLE)
    return _unchecked_first(out)
