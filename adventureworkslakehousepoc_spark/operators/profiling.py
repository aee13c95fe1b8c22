"""Table profiling: per-column quality stats in one pass.

The data-quality preamble of every ingestion pipeline — null rates, distinct
cardinalities, value ranges — computed as ONE aggregate job over the table
(every metric for every column in the same pass; Spark partial-aggregates
them together, so at 100 TB it costs one scan, not one scan per column) and
unpivoted to a long (column, metric...) result with ``stack``.

Exact COUNT(DISTINCT) is used so results are oracle-checkable; swap in
``approx_count_distinct`` at scale (same plan shape, sketch merge instead of
distinct expansion) — that's a one-argument change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]


def profile_table(df: DataFrame, columns: list[str], exact_distinct: bool = True) -> DataFrame:
    """One row per profiled column: total rows, null count, distinct count
    (of non-null values), min/max rendered as strings (uniform schema across
    column types)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            (
                F.countDistinct(F.col(c))
                if exact_distinct
                else F.approx_count_distinct(F.col(c))
            ).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _n - _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in columns
    )
    return wide.selectExpr(
        "_n AS n_rows",
        f"stack({len(columns)}, {stack_args}) AS (column_name, n_nulls, n_distinct, min_value, max_value)",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
