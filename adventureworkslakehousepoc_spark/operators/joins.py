"""Join builders (SURVEY.md §2.3 J1–J5).

All joins are declarative DataFrame joins — Catalyst picks broadcast-hash for
small dimensions (we additionally hint with ``F.broadcast`` where the caller
knows the side is a dim), sort-merge otherwise, and AQE re-plans skew at
runtime. The event-time interval join builder serves both the batch analog and
the streaming (watermarked) form — the same ``F.expr`` range condition caps
stream-stream join state exactly as the reference does
(``sales_aw_silver_layer_dim_store.py:24-34``, ``sales_aw_silver_layer_fact_sales.py:32-50``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["star_left_join", "interval_join"]


def star_left_join(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, object]],
    broadcast_dims: bool = True,
) -> DataFrame:
    """Chained left joins of a (possibly streaming) fact to static dimension
    lookups — the reference's stream-static pattern that avoids stream-stream
    join state (``silver_layer_person.py:22-33``, ``silver_layer_production.py:20-31``).

    ``dims`` is ``[(dim_df, join_condition), ...]``; each dim is broadcast by
    default (dimension tables are small relative to a 100 TB fact).
    """
    out = fact
    for dim, cond in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, cond, "left")
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[tuple[str, str]],
    left_time: str,
    right_time: str,
    lower: str,
    upper: str,
    how: str = "left",
) -> DataFrame:
    """Event-time interval (range) join: equi keys + ``right_time BETWEEN
    left_time - lower AND left_time + upper`` (reference J3/J4 shapes,
    ``sales_aw_silver_layer_dim_store.py:28-32``: symmetric ±2 min;
    ``sales_aw_silver_layer_fact_sales.py:35-39``: asymmetric −2/+5 min).

    ``lower``/``upper`` are interval literals like ``"2 minutes"``. The relation
    aliases ``l``/``r`` qualify the key and time columns, so callers should pass
    bare column names unique across both sides or select/alias beforehand.
    Works for batch DataFrames and for watermarked streaming DataFrames alike
    (Structured Streaming uses the range condition to evict per-key state).
    """
    lhs = left.alias("l")
    rhs = right.alias("r")
    conds = [F.col(f"l.{lk}") == F.col(f"r.{rk}") for lk, rk in on]
    conds.append(
        F.expr(
            f"r.{right_time} >= l.{left_time} - interval {lower} "
            f"AND r.{right_time} <= l.{left_time} + interval {upper}"
        )
    )
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    return lhs.join(rhs, cond, how)
