#!/usr/bin/env python
"""10× scale smoke: derive an sf1-equivalent dataset from sf0.1 (deterministic
key-shifted copies — engineering probe only, NOT driver test inputs) and run
the headline operators to observe scaling behavior: which stages go
superlinear, whether plans change (broadcast→SMJ), where memory pressure
appears. Results land in SCALE.md.

Usage: python scripts/scale_smoke.py [copies] [query,query,...]
(default 10 copies, full list — pass a comma list to probe a subset)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from adventureworkslakehousepoc_spark.catalog import TESTDATA_TABLES, load_tables
from adventureworkslakehousepoc_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/awlh_scale/sf1"

# per-table (key columns to shift, shift granularity) — keys stay unique,
# foreign keys stay consistent because all tables shift by the same stride
KEYS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": [],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
STRIDE = 10_000_000


def build(spark, copies: int) -> None:
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)
    tables = load_tables(spark, SRC)
    for name in TESTDATA_TABLES:
        df = tables[name]
        if not KEYS[name]:
            df.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
            continue
        parts = []
        for i in range(copies):
            shifted = df
            for k in KEYS[name]:
                shifted = shifted.withColumn(k, F.col(k) + F.lit(i * STRIDE))
            parts.append(shifted)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="scale-smoke", extra_conf={"spark.ui.showConsoleProgress": "false"})
    t0 = time.perf_counter()
    build(spark, copies)
    build_s = round(time.perf_counter() - t0, 1)

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = [
        "flagship_revenue_by_month_segment",
        "q1_pricing_summary",
        "q5_supplier_volume_by_nation",
        "fact_sales",
        "fact_weather",
        "dedup_minhash_lsh",
        "dedup_simhash_pairs",
        "ann_bruteforce_topk",
        "ann_lsh_bucketed_topk",
        "text_fingerprints",
        "sessionization_batch",
        "asof_join_latest_click",
        "dedup_clusters",
        "ann_ivf_topk",
        "q8_market_share",
        "q13_customer_distribution",
        "q21_sole_late_supplier",
        "training_corpus_pipeline",
        "sample_stratified_corpus",
        "agg_percentiles",
        "agg_percentiles_approx",
        # round-4 operators + the re-optimized shingle path
        "text_boilerplate_flags",
        "training_corpus_pipeline_v2",
        "semantic_cluster_assign",
        "semantic_dedup_reps",
        "doc_chunking_overlap",
        "ngram_continuation_topk",
        "train_eval_split_counts",
        "mixture_token_budget_plan",
        "zorder_key_orders",
        "semantic_prune_pairs",
        "training_corpus_pipeline_v3",
        "source_drift_kl",
        "gold_sales_wide",
        "incremental_agg_merge",
        "weak_label_votes",
        "embedding_int8_quantize",
        "funnel_conversion_stages",
        "cohort_retention_matrix",
        # round-5 operators
        "approx_distinct_sketch",
        "dedup_span_rewrite",
        "dsir_importance_weights",
        "bigram_lm_scores",
        "weighted_systematic_sample",
        "entity_resolution_parts",
        "pagerank_dup_graph",
        "bpe_apply_encode",
        "k_anonymity_audit",
        "time_decay_user_scores",
        "training_corpus_pipeline_v4",
    ]
    if len(sys.argv) > 2:
        wanted = set(sys.argv[2].split(","))
        names = [n for n in names if n in wanted] + [n for n in wanted if n not in names]
    timings = {}
    for name in names:
        qs[name](spark, DST).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        qs[name](spark, DST).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 2)
    print(json.dumps({"copies": copies, "build_s": build_s, "timings": timings}))


if __name__ == "__main__":
    main()
