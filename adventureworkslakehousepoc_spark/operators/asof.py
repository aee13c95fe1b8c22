"""As-of (point-in-time) join — an operator Spark lacks natively, composed
from existing DataFrame ops (no UDF, no per-row subquery).

Semantics: for each left row, attach the latest right row whose event time is
≤ the left row's time, per key ("backward" direction; the shape used for
point-in-time feature lookups and slowly-changing enrichment).

Implementation is the scalable union-sort trick: tag both sides, union, sort
per key by (time, side) with right rows first on ties, and carry right-side
values forward with ``last_value(..., ignoreNulls)``. Cost: one shuffle on
the key + one per-partition sort — the same complexity as a sort-merge join,
no matter how many right rows precede each left row (a naive range join would
explode |left| × |matching-right| before aggregation).

Oracle form: DuckDB's native ``ASOF LEFT JOIN`` reproduces the semantics
exactly, which keeps this operator hash-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
) -> DataFrame:
    """Backward as-of join.

    ``on`` is the equi-key column name on both sides; ``left_cols`` /
    ``right_cols`` are the payload columns to carry through (exclusive of key
    and time columns). Right rows sort before left rows at equal timestamps,
    so a right event at exactly the left time matches (``r.t <= l.t``).
    """
    lt = F.col(left_time)
    rt = F.col(right_time)
    l_tagged = left.select(
        F.col(on).alias("_k"),
        lt.alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        lt.alias(left_time),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in right_cols],
        F.lit(None).cast(dict(right.dtypes)[right_time]).alias(right_time),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        rt.alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        F.lit(None).cast(dict(left.dtypes)[left_time]).alias(left_time),
        *[F.col(c) for c in right_cols],
        rt.alias(right_time),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_t"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_k",
        "_side",
        *[F.col(c) for c in left_cols],
        F.col(left_time),
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in right_cols],
        F.last(F.col(right_time), ignorenulls=True).over(w).alias(right_time),
    )
    return carried.filter(F.col("_side") == 1).select(
        F.col("_k").alias(on), *left_cols, left_time, *right_cols, right_time
    )
