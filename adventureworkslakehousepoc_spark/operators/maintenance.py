"""Lakehouse table maintenance: small-file compaction and stats-friendly
layout rewrites.

Streaming sinks and frequent micro-batches leave many small files; at 100 TB
read amplification from file-open costs dominates unless tables are
periodically compacted. ``compact_parquet`` rewrites a parquet directory to
size-targeted files, optionally sorting within partitions so parquet
row-group min/max statistics enable file/row-group skipping on the sort key
(the vanilla-Spark stand-in for clustering/Z-ordering).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["compact_parquet"]


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Rewrite the parquet table at ``path`` into ``ceil(bytes/target)`` files
    (atomic via temp-dir swap). Returns the new file count."""
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files if f.endswith(".parquet"))
    n_files = max(1, -(-total // target_file_bytes))
    df: DataFrame = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*[F.asc(c) for c in sort_within_by])
    tmp = path.rstrip("/") + ".compact.tmp"
    out.write.mode("overwrite").parquet(tmp)
    back = spark.read.parquet(tmp)
    assert back.count() == df.count()
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files
