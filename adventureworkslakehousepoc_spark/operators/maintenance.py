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

__all__ = ["compact_parquet", "with_z_value", "cluster_zorder"]


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
    _swap_dirs(tmp, path)
    return n_files


def _swap_dirs(tmp: str, path: str) -> None:
    """Crash-safe table swap: move the live dir aside, rename the rewrite
    into place, then delete the old copy. At every instant a complete
    directory exists at ``path`` or ``path.old`` — a crash mid-swap is
    recoverable by renaming ``.old`` back, unlike rmtree-then-rename which
    strands the table in ``.tmp`` with nothing at ``path``."""
    old = path.rstrip("/") + ".old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def with_z_value(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Append a ``_z`` Morton (Z-order) key interleaving the bit patterns of
    ``cols`` after min-max normalizing each to ``bits`` bits. Rows close in
    _z are close in EVERY clustered dimension, so range-partitioning on _z
    gives files whose parquet min/max stats are narrow on all of them —
    multi-dimensional file skipping with vanilla parquet, no table format
    needed. Stats come from one aggregate broadcast as a single row (no
    collect — the same job works at 100 TB)."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_mx_{c}") for c in cols],
    )
    scaled = []
    for c in cols:
        rng = F.col(f"_mx_{c}") - F.col(f"_mn_{c}")
        frac = F.when(
            rng > 0, (F.col(c).cast("double") - F.col(f"_mn_{c}")) / rng
        ).otherwise(F.lit(0.0))
        scaled.append(F.floor(frac * F.lit((1 << bits) - 1)).cast("bigint"))
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, s in enumerate(scaled):
            z = z + F.shiftright(s, b).bitwiseAND(F.lit(1)) * F.lit(
                1 << (b * len(cols) + i)
            ).cast("bigint")
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("_z", z)
        .drop(*[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols])
    )


def cluster_zorder(
    spark: SparkSession, path: str, cols: list[str], n_files: int, bits: int = 16
) -> None:
    """Rewrite the parquet table at ``path`` Z-clustered on ``cols``:
    range-partition by the Morton key (disjoint _z ranges per file) and sort
    within files, then drop the key. Point/box predicates on any clustered
    column now skip most files on footer stats alone — the compaction-time
    layout optimization Delta/Iceberg call OPTIMIZE ZORDER, expressed as two
    stock DataFrame ops."""
    df = spark.read.parquet(path)
    clustered = (
        with_z_value(df, cols, bits)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    tmp = path.rstrip("/") + ".zorder.tmp"
    clustered.write.mode("overwrite").parquet(tmp)
    back = spark.read.parquet(tmp)
    assert back.count() == df.count()
    _swap_dirs(tmp, path)
