"""Temporal weighting operators: recency-decayed aggregates.

Feature stores and curriculum samplers weight interactions by recency —
an event from yesterday counts more than one from last quarter. The decay
here is the half-life form ``value · 2^(−age/half_life)``, restricted to
*whole half-life steps* so the decay factor is an exact binary power:
``2^(−k)`` for integer ``k`` is representable exactly in an IEEE double, the
per-row product rounds identically in every engine, and the micro-unit
quantized per-row contribution integer-sums without order sensitivity —
the same exactness discipline the rest of the repo uses for cross-engine
hash verification.

Scale posture: the reference instant is a 1-row broadcast (max event time);
the decayed sum is one partial-aggregated groupBy on the entity key. No
windows, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["time_decay_scores"]


def time_decay_scores(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_days: int = 7,
) -> DataFrame:
    """Per-key recency-decayed engagement: ``Σ value · 2^(−steps)`` where
    ``steps = age_in_days ÷ half_life_days`` (integer division) and age is
    measured back from the newest event in the input (so the operator is a
    pure function of the data — reproducible across runs and engines).

    Returns ``(key, n_events, decayed_value_micros, newest_age_days)`` with
    the decayed sum quantized per-row to integer micro-units before summing.
    """
    ref = events.agg(F.max(F.to_date(ts_col)).alias("ref_day"))
    aged = events.crossJoin(F.broadcast(ref)).select(
        F.col(key_col).alias("key"),
        F.datediff(F.col("ref_day"), F.to_date(ts_col)).alias("age_days"),
        F.col(value_col).alias("v"),
    )
    # integer floor-division (ages are non-negative) — NOT a double cast,
    # which truncates in Spark but rounds half-even in DuckDB
    steps = F.expr(f"age_days div {int(half_life_days)}")
    # v * 1e6 is one IEEE-rounded multiply (identical everywhere); the
    # division by 2^steps is exact scaling; floor(+0.5) quantizes per-row
    contrib = F.floor(
        F.col("v") * F.lit(1000000.0) / F.pow(F.lit(2.0), steps) + F.lit(0.5)
    ).cast("bigint")
    return (
        aged.withColumn("c_u", contrib)
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("c_u").cast("bigint").alias("decayed_value_micros"),
            F.min("age_days").cast("int").alias("newest_age_days"),
        )
        .withColumnRenamed("key", key_col)
    )
