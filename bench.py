#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with the no-op sink (full distributed
execution, zero driver collect). Wall-clock per query; `value` is the total.
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
    "ann_pandas_udf_scores",
    "text_quality_scores",
    "text_fingerprints",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(app_name="awlh-bench")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    names = [n for n in BENCH_QUERIES if n in queries]
    extra = os.environ.get("AWLH_BENCH_EXTRA")
    if extra:
        names += [n for n in extra.split(",") if n in queries and n not in names]

    # warm the JVM/codegen path once on a trivial plan
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

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
