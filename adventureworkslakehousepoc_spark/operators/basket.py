"""Market-basket analysis: co-occurrence counts and association-rule
metrics (support / confidence / lift) over (basket, item) pairs.

The classic retail-analytics operator the reference's sales-mart consumers
ask of a lakehouse (which products sell together), and — in the
training-data world — the same shape as tag/label co-occurrence mining.

Scale design (100 TB):
- The quadratic step is bounded PER BASKET: the self-join runs on the
  distinct (basket, item) relation co-partitioned by basket key, so a
  basket with b items emits b·(b−1)/2 pairs and nothing joins across
  baskets. Real baskets are small (the sf0.01 max here is 11 items); a
  runaway basket would be capped upstream, not here.
- Item frequencies live on the ITEM domain (vocabulary-scale, e.g. 25
  brands) and broadcast onto the pair counts; the basket-count scalar is a
  1-row broadcast. No global shuffle touches raw basket rows twice.
- All rule metrics are exact integer micro-units (``a*1_000_000 div b``):
  bit-identical across engines and partitionings. At corpus scales where
  ``n_ab · n_baskets · 1e6`` could exceed int64 (~10^12 baskets), widen to
  DECIMAL(38,0) — the expression shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["association_rules"]

MICRO = 1_000_000


def association_rules(
    basket_items: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    min_pair_count: int = 1,
) -> DataFrame:
    """Unordered item-pair association rules from a (basket, item) relation.

    Returns one row per unordered item pair (item_a < item_b) occurring in
    at least ``min_pair_count`` baskets, with exact counts and micro-unit
    support (P(a,b)), confidence (P(b|a)), and lift
    (P(a,b) / (P(a)·P(b))).
    """
    bi = basket_items.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    n_baskets = bi.agg(F.count_distinct("b").cast("bigint").alias("n_baskets"))
    item_counts = bi.groupBy("i").agg(F.count(F.lit(1)).cast("bigint").alias("n_i"))
    pairs = (
        bi.alias("x")
        .join(bi.alias("y"), "b")
        .where(F.col("x.i") < F.col("y.i"))
        .groupBy(F.col("x.i").alias("item_a"), F.col("y.i").alias("item_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_count)
    )
    return (
        pairs.join(
            F.broadcast(item_counts.select(F.col("i").alias("item_a"), F.col("n_i").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(item_counts.select(F.col("i").alias("item_b"), F.col("n_i").alias("n_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            "n_baskets",
            F.expr(f"(n_ab * {MICRO}) div n_baskets").alias("support_micros"),
            F.expr(f"(n_ab * {MICRO}) div n_a").alias("confidence_a_to_b_micros"),
            F.expr(f"(n_ab * n_baskets * {MICRO}) div (n_a * n_b)").alias("lift_micros"),
        )
    )
