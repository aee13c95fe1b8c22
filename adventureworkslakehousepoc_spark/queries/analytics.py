"""Analytics built-ins beyond reference parity (SURVEY.md §2.5 notes the
reference uses none of these, but the engine ships them as first-class tested
capabilities): window functions, set operations, rollup, distinct aggregates,
window-rank dedup.

Determinism rules: every window ORDER BY carries a unique tie-breaker key;
running sums aggregate exact decimals; counts are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, *names: str):
    return load_tables(spark, sf_dir, names)


@query(
    "w1_topk_per_group",
    """
    SELECT o_custkey AS customer_id, o_orderkey AS order_key, o_totalprice AS total_price,
           CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def w1(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("customer_id"),
            F.col("o_orderkey").alias("order_key"),
            F.col("o_totalprice").alias("total_price"),
            "rn",
        )
    )


@query(
    "w2_running_sum",
    """
    SELECT o_custkey AS customer_id, o_orderkey AS order_key,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                  OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def w2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_key"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double").alias(
            "running_spend"
        ),
    )


@query(
    "w3_lag_lead",
    """
    SELECT o_custkey AS customer_id, o_orderkey AS order_key, o_orderdate AS order_date,
           lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS prev_order_date,
           lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS next_order_date
    FROM orders
    """,
)
def w3(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return o.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderdate").alias("order_date"),
        F.lag("o_orderdate").over(w).alias("prev_order_date"),
        F.lead("o_orderdate").over(w).alias("next_order_date"),
    )


@query(
    "set_operations",
    """
    SELECT c_custkey AS customer_id, 'both' AS membership FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    INTERSECT
    SELECT user_id, 'both' FROM events
    UNION ALL
    SELECT c_custkey, 'orders_only' FROM (
      SELECT DISTINCT c_custkey FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders)
      EXCEPT
      SELECT DISTINCT user_id FROM events
    )
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders", "events")
    with_orders = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey")
    )
    with_events = t["events"].select(F.col("user_id").alias("c_custkey"))
    both = with_orders.withColumn("membership", F.lit("both")).intersect(
        with_events.withColumn("membership", F.lit("both"))
    )
    orders_only = with_orders.distinct().exceptAll(with_events.distinct()).withColumn(
        "membership", F.lit("orders_only")
    )
    return both.unionAll(orders_only).select(
        F.col("c_custkey").alias("customer_id"), "membership"
    )


@query(
    "agg_rollup",
    """
    SELECT COALESCE(r.r_name, '<all>') AS region_name,
           COALESCE(n.n_name, '<all>') AS nation_name,
           COUNT(c.c_custkey) AS n_customers,
           CAST(GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS INTEGER) AS grp
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "nation", "region")
    joined = (
        t["customer"]
        .alias("c")
        .join(F.broadcast(t["nation"].alias("n")), F.col("c.c_nationkey") == F.col("n.n_nationkey"))
        .join(F.broadcast(t["region"].alias("r")), F.col("n.n_regionkey") == F.col("r.r_regionkey"))
    )
    return (
        joined.rollup(F.col("r.r_name"), F.col("n.n_name"))
        .agg(F.count("c.c_custkey").alias("n_customers"), F.grouping_id().cast("int").alias("grp"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("<all>")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("<all>")).alias("nation_name"),
            "n_customers",
            "grp",
        )
    )


@query(
    "agg_distinct",
    """
    SELECT l_returnflag AS return_flag,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY 1
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy(F.col("l_returnflag").alias("return_flag")).agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "dedup_window_rank",
    """
    SELECT user_id, event_type, event_id, ts FROM (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup via deterministic window rank (the scalable
    ``dropDuplicates`` replacement — dropDuplicates keeps an *arbitrary* row,
    this keeps a *defined* one)."""
    e = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id", "event_type").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )
