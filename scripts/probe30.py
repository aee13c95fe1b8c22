#!/usr/bin/env python
"""One-off 30x probe with per-query progress prints (diagnosing which
round-5 query grinds at 30x; assumes scale_smoke already built /tmp dataset
or rebuilds it)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adventureworkslakehousepoc_spark.session import get_spark  # noqa: E402
from scripts import scale_smoke  # noqa: E402

NAMES = [
    "flagship_revenue_by_month_segment",
    "q1_pricing_summary",
    "dedup_span_rewrite",
    "dsir_importance_weights",
    "bigram_lm_scores",
    "weighted_systematic_sample",
    "entity_resolution_parts",
    "bpe_apply_encode",
    "k_anonymity_audit",
    "time_decay_user_scores",
    "training_corpus_pipeline_v4",
    "exact_quantiles_distributed",
    "psi_value_drift",
    "dedup_prefix_filter_jaccard",
    # round-5 late additions
    "market_basket_lift",
    "graph_triangle_counts",
    "spatial_grid_neighbors",
    "incremental_minhash_index",
    "dedup_containment_pairs",
    "dedup_containment_exact",
    "decontaminate_embedding_cosine",
    "winsorize_price_stats",
    "quantile_normalize_doclen",
    "reconcile_sink_buckets",
    "markov_event_transitions",
    "zipf_fit_tokens",
    # round-7/8 heavy rows
    "minhash_estimate_error",
    "ccnet_perplexity_buckets",
    "bt_preference_strengths",
    "dedup_soft_weights",
    "tokenizer_fertility_by_lang",
    "training_corpus_pipeline_v5",
    "training_corpus_pipeline_v6",
    # round-9 rows
    "ann_recall_calibration",
    "probe_calibration_ece",
    "embedding_pca_power",
    "dawid_skene_labelers",
    "doremi_domain_weights",
    "probe_conformal_gate",
    "hll_distinct_tokens",
    "rho_loss_selection",
    "kmv_source_overlap",
    "multimodal_ppm_decode",
    "histogram_quantile_sketch",
]


def main() -> None:
    spark = get_spark(
        app_name="probe30", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    copies = int(os.environ.get("PROBE_COPIES", "30"))
    if not os.path.exists(f"{scale_smoke.DST}/lineitem.parquet") or os.environ.get(
        "PROBE_REBUILD"
    ):
        t0 = time.perf_counter()
        scale_smoke.build(spark, copies)
        print(f"build {round(time.perf_counter() - t0, 1)}s", flush=True)

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    timings = {}
    for name in NAMES:
        t0 = time.perf_counter()
        qs[name](spark, scale_smoke.DST).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 2)
        print(f"{name}: {timings[name]}s", flush=True)
    print(json.dumps({"copies": copies, "timings": timings}))


if __name__ == "__main__":
    main()
