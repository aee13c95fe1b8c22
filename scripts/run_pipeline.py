#!/usr/bin/env python
"""Operational entry point — the reference's scheduled pipeline refresh
(entry point B, SURVEY.md §3.2: daily `pipeline_task` trigger). One invocation
= one refresh: materializes the batch medallion DAG into a warehouse dir and
runs the streaming silver datasets to completion with AvailableNow.

Usage:
  python scripts/run_pipeline.py [--sf-dir DIR] [--warehouse DIR] [--streaming]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adventureworkslakehousepoc_spark.pipelines.medallion import (
    medallion_context,
    medallion_streaming_context,
)
from adventureworkslakehousepoc_spark.session import get_spark
from adventureworkslakehousepoc_spark.streaming.runner import run_available_now

BATCH_DATASETS = [
    "dim_geo",
    "dim_product",
    "dim_customer",
    "dim_store",
    "raw_metrics_timeseries",
    "us_stations",
    "fact_sales",
    "fact_weather",
]
STREAMING_DATASETS = ["dim_geo", "dim_product"]  # stream-static silver paths


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--warehouse", default="/tmp/awlh_warehouse")
    ap.add_argument("--streaming", action="store_true", help="also refresh streaming silver")
    args = ap.parse_args()

    spark = get_spark(app_name="awlh-pipeline", extra_conf={"spark.ui.showConsoleProgress": "false"})
    t0 = time.perf_counter()
    ctx = medallion_context(spark, args.sf_dir)
    out = ctx.run(
        args.warehouse,
        names=BATCH_DATASETS,
        partition_by={"fact_sales": ["order_date"], "fact_weather": ["date"]},
    )
    report = {"batch": {k: spark.read.parquet(v).count() for k, v in out.items()}}

    if args.streaming:
        s_ctx = medallion_streaming_context(spark, args.sf_dir)
        stream_counts = {}
        for name in STREAMING_DATASETS:
            result = run_available_now(s_ctx.dataframe(name), f"pipeline-{name}")
            path = os.path.join(args.warehouse, f"{name}_streaming")
            result.write.mode("overwrite").parquet(path)
            stream_counts[name] = result.count()
        report["streaming"] = stream_counts

    report["seconds"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
