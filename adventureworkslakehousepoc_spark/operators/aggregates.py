"""Aggregation builders (SURVEY.md §2.4 A1/A2).

The reference's only aggregations: expression-keyed grouped average
(``Geo_silver_layer_common.py:18-24``) and explicit-value-list pivot over a
pre-aggregated input (``:27-32``). Pre-aggregating before the pivot keeps the
pivot's shuffle input small — the two-stage shape is preserved here because it
is exactly what survives a 100×  scale-up (partial aggregation map-side, pivot
over |groups| rows instead of |rows|).

Pivot always takes an explicit value list: implicit pivot runs a distinct scan
to discover columns (extra job + nondeterministic column order).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["grouped_avg", "pivot_agg"]


def grouped_avg(
    df: DataFrame,
    keys: Sequence[Column | str],
    value: Column | str,
    alias: str = "avg_value",
    scale: int = 2,
) -> DataFrame:
    """Grouped order-independent average (exact decimal sum ÷ count → double)."""
    v = F.col(value) if isinstance(value, str) else value
    return df.groupBy(*keys).agg(
        (F.sum(v.cast(f"decimal(18,{scale})")).cast("double") / F.count(v)).alias(alias)
    )


def pivot_agg(
    df: DataFrame,
    keys: Sequence[Column | str],
    pivot_col: str,
    values: Sequence[str],
    agg: Column,
) -> DataFrame:
    """Explicit-value-list pivot (reference ``Geo_silver_layer_common.py:27-32``).
    SQL-oracle equivalent: one conditional aggregate per listed value
    (``AVG(CASE WHEN variable = 'TAVG' THEN v END)``)."""
    return df.groupBy(*keys).pivot(pivot_col, list(values)).agg(agg)
