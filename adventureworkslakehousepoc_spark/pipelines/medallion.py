"""The reference's medallion silver layer re-expressed over the driver's
testdata star schema (SURVEY.md §1, FIXTURES.md table-analog mapping).

Every reference dataset is rebuilt with the same operator shapes on analog
tables: ``customer``→stg_address/stg_customer, ``nation``→stg_stateprovince /
stg_productsubcategory, ``region``→stg_countryregion/stg_productcategory,
``part``→stg_product, ``supplier``→stg_store, ``orders``+``lineitem``→
stg_salesorderheader/detail, ``events``→NOAA timeseries.

All aggregates go through exact decimal arithmetic (see functions.expressions)
so results hash-match the DuckDB oracle; all dimension joins broadcast the dim
side (at 100 TB the facts shuffle-partition, dims never should).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.expressions import (
    clean_name,
    decode,
    exact_avg,
    quantized_avg,
    surrogate_key,
    typed_null,
)
from ..operators.aggregates import grouped_avg, pivot_agg
from ..operators.joins import interval_join, star_left_join
from ..plans.registry import DatasetRegistry, PipelineContext
from .bronze import bronze_fanout

__all__ = [
    "build_medallion",
    "medallion_context",
    "medallion_streaming_context",
    "SEGMENT_DECODE",
    "EVENT_DECODE",
]

# 6-way PersonType decode analog (reference sales_aw_silver_layer_dim_customer.py:37-43)
SEGMENT_DECODE = {
    "AUTOMOBILE": "Individual",
    "BUILDING": "Store Contact",
    "FURNITURE": "Sales Person",
    "MACHINERY": "Employee",
    "HOUSEHOLD": "Vendor Contact",
}

# 10-way variable-name decode analog (reference noaa_bronze_layer.py:142-152)
EVENT_DECODE = {
    "click": "Click Through",
    "view": "Page View",
    "purchase": "Purchase",
    "signup": "Sign Up",
    "error": "Error",
}

# unit-mapping analog (reference noaa_bronze_layer.py:166-176)
EVENT_UNITS = {
    "click": "count/10",
    "view": "count/10",
    "purchase": "usd",
    "signup": "count",
    "error": "count",
}


def build_medallion(registry: DatasetRegistry | None = None) -> DatasetRegistry:
    dp = registry or DatasetRegistry()
    bronze_fanout(dp)

    # ---- dim_geo (reference silver_layer_person.py) -------------------------
    @dp.table(name="dim_geo", comment="geography dim: address ⟕ stateprovince ⟕ countryregion")
    def dim_geo(ctx: PipelineContext) -> DataFrame:
        address = ctx.read("stg_sales__customer").alias("a")
        state = ctx.read_static("stg_person__nation").alias("sp")
        country = ctx.read_static("stg_person__region").alias("cr")
        joined = star_left_join(
            address,
            [
                (state, F.col("a.c_nationkey") == F.col("sp.n_nationkey")),
                (country, F.col("sp.n_regionkey") == F.col("cr.r_regionkey")),
            ],
        )
        return joined.select(
            surrogate_key("a.c_custkey", "a.c_mktsegment").alias("geography_id"),
            F.col("a.c_name").alias("city"),
            F.upper(F.substring(F.col("sp.n_name"), 1, 2)).alias("state_province_code"),
            F.col("sp.n_name").alias("state_province_name"),
            F.col("cr.r_regionkey").cast("string").alias("country_region_code"),
            F.col("cr.r_name").alias("country_name"),
        )

    # ---- dim_product (reference silver_layer_production.py) -----------------
    @dp.table(name="dim_product", comment="product dim: product ⟕ subcategory ⟕ category, coalesced defaults")
    def dim_product(ctx: PipelineContext) -> DataFrame:
        product = ctx.read("stg_production__part").alias("p")
        subcat = ctx.read_static("stg_person__nation").alias("sc")
        cat = ctx.read_static("stg_person__region").alias("c")
        joined = star_left_join(
            product,
            [
                (subcat, (F.col("p.p_size") % 25) == F.col("sc.n_nationkey")),
                (cat, F.col("sc.n_regionkey") == F.col("c.r_regionkey")),
            ],
        )
        color_raw = F.when((F.col("p.p_size") % 7) == 0, typed_null("string")).otherwise(
            F.col("p.p_brand")
        )
        return joined.select(
            F.col("p.p_partkey").alias("product_id"),
            F.col("p.p_brand").alias("product_number"),
            F.col("p.p_name").alias("product_name"),
            F.coalesce(F.col("sc.n_name"), F.lit("Missing")).alias("subcategory_name"),
            F.coalesce(F.col("c.r_name"), F.lit("Missing")).alias("category_name"),
            F.coalesce(color_raw, F.lit("Missing")).alias("color"),
            F.coalesce(F.col("p.p_retailprice").cast("decimal(18,2)").cast("string"), F.lit("-")).alias(
                "weight"
            ),
            (F.col("p.p_retailprice").cast("decimal(12,2)") * F.lit("0.6").cast("decimal(2,1)"))
            .cast("double")
            .alias("standard_cost"),
            F.col("p.p_retailprice").alias("list_price"),
            (F.col("p.p_size") + F.lit(10)).alias("safety_stock_level"),
            (F.col("p.p_size") % 4).alias("days_to_manufacture"),
            ((F.col("p.p_size") % 2) == 0).alias("make_flag"),
            ((F.col("p.p_size") % 3) != 0).alias("finished_goods_flag"),
            decode("p.p_type", {"PROMO": "P", "STANDARD": "S", "ECONOMY": "E"}).alias("product_line"),
        )

    # ---- dim_customer (reference sales_aw_silver_layer_dim_customer.py) -----
    @dp.table(name="dim_customer", comment="customer dim: null-filtered customer ⋈ person, decoded type, greatest(ts)")
    def dim_customer(ctx: PipelineContext) -> DataFrame:
        cust = (
            ctx.read("stg_sales__customer")
            .withColumn(
                "person_id",
                F.when((F.col("c_custkey") % 10) == 0, typed_null("bigint")).otherwise(
                    F.col("c_custkey")
                ),
            )
            .filter(F.col("person_id").isNotNull())  # P3 pre-join null filter
            .alias("c")
        )
        person = ctx.read("stg_sales__customer").alias("p")
        last_order = (
            ctx.read("stg_sales__orders")
            .groupBy("o_custkey")
            .agg(F.max("o_orderdate").alias("last_order_ts"))
            .alias("o")
        )
        joined = (
            cust.join(person, F.col("c.person_id") == F.col("p.c_custkey"), "inner")
            .join(last_order, F.col("c.c_custkey") == F.col("o.o_custkey"), "left")
        )
        return joined.select(
            F.col("c.c_custkey").alias("customer_id"),
            F.concat(F.lit("AW"), F.lpad(F.col("c.c_custkey").cast("string"), 8, "0")).alias(
                "account_number"
            ),
            clean_name(F.regexp_replace(F.col("p.c_name"), "#", " "), F.col("p.c_mktsegment")).alias(
                "full_name"
            ),
            decode("p.c_mktsegment", SEGMENT_DECODE, default="Unknown").alias("person_type"),
            F.greatest(
                F.coalesce(F.col("o.last_order_ts"), F.lit("1970-01-01 00:00:00").cast("timestamp")),
                F.lit("1998-01-01 00:00:00").cast("timestamp"),
            ).alias("last_modified"),
        )

    # ---- dim_store (reference sales_aw_silver_layer_dim_store.py) -----------
    @dp.table(name="dim_store", comment="store dim: null-filtered customer ⟕ store, greatest(ts)")
    def dim_store(ctx: PipelineContext) -> DataFrame:
        cust = (
            ctx.read("stg_sales__customer")
            .withColumn(
                "store_id",
                F.when((F.col("c_custkey") % 3) == 0, typed_null("bigint")).otherwise(
                    (F.col("c_custkey") % 10)
                ),
            )
            .filter(F.col("store_id").isNotNull())
            .alias("c")
        )
        store = ctx.read("stg_production__supplier").alias("s")
        joined = cust.join(store, F.col("c.store_id") == F.col("s.s_suppkey"), "left")
        return joined.select(
            F.col("c.c_custkey").alias("customer_id"),
            F.col("s.s_suppkey").alias("store_business_id"),
            F.col("s.s_name").alias("store_name"),
            F.greatest(
                F.coalesce(F.col("s.s_acctbal"), F.lit(0.0)),
                F.coalesce(F.col("c.c_acctbal"), F.lit(0.0)),
            ).alias("best_acctbal"),
        )

    # ---- fact_sales (reference sales_aw_silver_layer_fact_sales.py) ---------
    @dp.table(name="fact_sales", comment="sales fact: detail ⟕ header (interval) ⟕ address")
    def fact_sales(ctx: PipelineContext) -> DataFrame:
        detail = ctx.read("stg_sales__lineitem").select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        )
        header = ctx.read("stg_sales__orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
        )
        # J4 analog: equi key + event-time interval bound (minutes → days at
        # this data's granularity), LEFT to preserve unmatched detail rows
        dh = interval_join(
            detail, header,
            on=[("l_orderkey", "o_orderkey")],
            left_time="l_shipdate", right_time="o_orderdate",
            lower="365 days", upper="365 days",
            how="left",
        )
        address = ctx.read_static("stg_sales__customer").alias("a")
        joined = dh.join(
            F.broadcast(address), F.col("r.o_custkey") == F.col("a.c_custkey"), "left"
        )
        return joined.select(
            F.col("l.l_orderkey").alias("sales_order_id"),
            F.col("l.l_linenumber").alias("sales_order_detail_id"),
            F.col("l.l_partkey").alias("product_id"),
            F.to_date(F.col("r.o_orderdate")).alias("order_date"),
            F.col("r.o_orderstatus").alias("status"),
            F.col("r.o_custkey").alias("customer_id"),
            surrogate_key("a.c_custkey", "a.c_mktsegment").alias("geography_id"),
            F.col("l.l_quantity").cast("int").alias("order_qty"),
            (
                F.col("l.l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1).cast("decimal(3,2)") - F.col("l.l_discount").cast("decimal(3,2)"))
            )
            .cast("double")
            .alias("line_total"),
            F.col("r.o_totalprice").alias("total_due"),
            F.greatest(F.col("l.l_shipdate"), F.coalesce(F.col("r.o_orderdate"), F.col("l.l_shipdate"))).alias(
                "last_modified"
            ),
        )

    # ---- NOAA analogs -------------------------------------------------------
    @dp.table(name="raw_metrics_timeseries", comment="NOAA by-year analog: decode/rescale/typed-null over events")
    def raw_metrics_timeseries(ctx: PipelineContext) -> DataFrame:
        ev = ctx.read("stg_telemetry__events")
        date_str = F.date_format(F.col("ts"), "yyyyMMdd")
        return ev.select(
            F.col("user_id").cast("string").alias("station_id"),
            date_str.alias("date_str"),
            F.to_date(date_str, "yyyyMMdd").alias("date"),
            F.to_timestamp(date_str, "yyyyMMdd").alias("date_ts"),
            F.upper(F.col("event_type")).alias("variable"),
            decode("event_type", EVENT_DECODE, default="Unknown").alias("variable_name"),
            F.when(F.col("event_type").isin(["click", "view"]), F.col("value") / 10.0)
            .otherwise(F.col("value"))
            .alias("value"),
            decode("event_type", EVENT_UNITS, default="unknown").alias("unit"),
            typed_null("string").alias("qflag"),
        )

    @dp.table(name="us_stations", comment="reduced lookup (US-only stations analog): conjunctive filter")
    def us_stations(ctx: PipelineContext) -> DataFrame:
        c = ctx.read("stg_sales__customer")
        return c.filter((F.col("c_nationkey") < 5) & F.col("c_mktsegment").isNotNull()).select(
            F.col("c_custkey").alias("station_id"),
            F.col("c_name").alias("station_name"),
            F.col("c_nationkey").alias("state_id"),
            F.col("c_mktsegment").alias("network"),
        )

    # ---- fact_weather (reference Geo_silver_layer_common.py) ----------------
    @dp.table(name="fact_weather", comment="A1 grouped avg + A2 explicit-list pivot over metrics ⋈ us_stations")
    def fact_weather(ctx: PipelineContext) -> DataFrame:
        ts = ctx.read("raw_metrics_timeseries").alias("ts")
        st = ctx.read("us_stations").alias("st")
        filtered = ts.filter(
            F.col("ts.variable").isin(["CLICK", "VIEW", "PURCHASE", "SIGNUP"])  # P5
        ).join(
            F.broadcast(st), F.col("ts.station_id") == F.col("st.station_id").cast("string"), "inner"
        )
        # A1: expression-keyed grouped average. The value column is *computed*
        # (value/10 rescale) so use the IEEE-deterministic quantized average
        # rather than a decimal cast (see functions.expressions.quantized_avg).
        pre = filtered.groupBy(
            F.concat(F.lit("N"), F.col("st.state_id").cast("string")).alias("state_geo_id"),
            F.col("ts.date").alias("date"),
            F.col("ts.variable").alias("variable"),
        ).agg(quantized_avg(F.col("ts.value"), 6).alias("avg_value"))
        # A2: explicit value list; quantized avg-of-avg (order-independent)
        second = quantized_avg(F.col("avg_value"), 6)
        piv = pivot_agg(pre, ["state_geo_id", "date"], "variable",
                        ["CLICK", "VIEW", "PURCHASE", "SIGNUP"], second)
        return piv.select(
            F.col("state_geo_id"),
            F.col("date"),
            F.col("CLICK").alias("average_clicks"),
            F.col("VIEW").alias("average_views"),
            F.col("PURCHASE").alias("average_purchase_value"),
            F.col("SIGNUP").alias("average_signups"),
        )

    return dp


def medallion_context(spark: SparkSession, sf_dir: str) -> PipelineContext:
    """Batch context over the driver's testdata parquet."""
    from ..catalog import load_tables

    def reader(name: str) -> DataFrame:
        return load_tables(spark, sf_dir, (name,))[name]

    return PipelineContext(build_medallion(), spark, catalog_reader=reader)


def _source_of(name: str) -> str:
    """``stg_<schema>__<table>`` → ``<table>`` (bronze staging is passthrough)."""
    return name.split("__", 1)[1] if name.startswith("stg_") and "__" in name else name


def medallion_streaming_context(spark: SparkSession, sf_dir: str) -> PipelineContext:
    """Streaming medallion: bronze staging tables (and thus the silver driving
    paths) are unbounded file streams; every ``read_static`` dimension lookup
    resolves to a batch read of the underlying source — the reference's
    stream-static silver architecture (``silver_layer_person.py:12-19``),
    end-to-end through the same dataset registry as the batch run."""
    from ..catalog import load_tables
    from ..streaming.runner import stream_table

    def stream_reader(name: str) -> DataFrame:
        return stream_table(spark, sf_dir, _source_of(name))

    def static_reader(name: str) -> DataFrame:
        src = _source_of(name)
        return load_tables(spark, sf_dir, (src,))[src]

    return PipelineContext(
        build_medallion(),
        spark,
        catalog_reader=stream_reader,
        static_reader=static_reader,
        static_first=True,
    )
