"""SparkSession factory.

Local mode mirrors the driver harness (``local[$SPARK_GRAFT_CPUS]``); on a real
cluster the same settings apply minus the master override. AQE is always on so
skewed shuffles re-plan at runtime; shuffle partitions default to the local
core count (32) instead of Spark's 200 — at 100 TB scale this knob is expected
to be set per-job (e.g. ``max(2 * total_cores, input_bytes / 128MB)``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def get_spark(
    app_name: str = "awlh-spark",
    cpus: str | int | None = None,
    shuffle_partitions: str | int | None = None,
    driver_memory: str | None = None,
    ui: bool = False,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with scale-sane defaults."""
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "*"))
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    mem = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "true" if ui else "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # plan-text audits (plans/audit.py, tests/test_physical.py) parse
        # expression trees out of plan strings; the default 25-field
        # truncation can elide the lambda bodies the loop-invariant HOF
        # gate inspects
        .config("spark.sql.debug.maxToStringFields", "2000")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
