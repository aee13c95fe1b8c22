"""Bucketed managed tables: co-located, shuffle-free fact-fact joins.

At 100 TB the lineitem ⋈ orders join is the dominant shuffle; bucketing both
tables by the join key at write time (``bucketBy`` + ``saveAsTable``) lets
sort-merge join read co-located buckets with **zero Exchange** in the plan.
This module wraps the write/read pair; the test suite asserts the bucketed
join plan contains no shuffle while producing identical results.

Bucket count guidance: ``total_input_bytes / 128 MB`` rounded to a power of
two, fixed at write time — all readers get the co-location for free
thereafter (the lakehouse pre-partitioning the reference gestures at with its
dim/fact layout, expressed physically).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_table"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize as a bucketed (and optionally sort-bucketed) managed table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
