"""Catalog helpers: three-part naming + testdata star-schema loaders.

The reference addresses every dataset as ``catalog.schema.table`` (Unity
Catalog three-level namespace, e.g. ``dev_bronze.stg_sales.stg_customer`` —
reference ``sales_aw_silver_layer_dim_customer.py:10-11``). Locally we run a
single Spark catalog, so three-part names map onto ``catalog__schema__table``
database-less identifiers (one reversible helper, nothing else cares).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "qualified",
    "split_qualified",
    "TESTDATA_TABLES",
    "load_tables",
    "register_views",
    "ensure_database",
    "register_external_table",
    "read_three_part",
]

_SEP = "__"

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def qualified(catalog: str, schema: str, table: str) -> str:
    """``dev_bronze, stg_sales, stg_customer`` → ``dev_bronze__stg_sales__stg_customer``."""
    return _SEP.join(p.replace(".", "_") for p in (catalog, schema, table))


def split_qualified(name: str) -> tuple[str, ...]:
    return tuple(name.split(_SEP))


# columns stored as parquet TIMESTAMP(NANOS) — Spark has no nanos timestamp, so
# they are read as long (legacy conf) and truncated to microseconds, matching
# DuckDB's ns→µs comparison precision (python-datetime-generated data is
# µs-aligned, so truncation is lossless here)
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load driver-generated parquet tables. Pins session timezone to UTC so
    date extraction from naive parquet timestamps matches the DuckDB oracle."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = {}
    for n in names:
        path = os.path.join(sf_dir, f"{n}.parquet")
        df = spark.read.parquet(path)
        for col in _NANOS_TS_COLS.get(n, ()):
            if dict(df.dtypes).get(col) == "bigint":
                df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        # parquet timestamp[us] with isAdjustedToUTC=false loads as TIMESTAMP_NTZ;
        # normalize to session-tz TIMESTAMP (session tz pinned UTC above, so the
        # cast is value-preserving vs DuckDB's naive timestamps) so downstream
        # watermarks / unix-time extraction / window range frames all work.
        for col, dtype in df.dtypes:
            if dtype == "timestamp_ntz":
                df = df.withColumn(col, F.col(col).cast("timestamp"))
        out[n] = df
    return out


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES) -> None:
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# Three-level namespace on real catalog objects. The reference addresses every
# dataset as catalog.schema.table (Unity Catalog; e.g. `dev_bronze.stg_sales
# .stg_customer` — sales_aw_silver_layer_dim_customer.py:10-11). Spark's
# session catalog is two-level (database.table), so catalog+schema fold into
# one database (`<catalog>_<schema>`) and tables register as EXTERNAL parquet
# tables over their existing files — real catalog entries with three-part
# `spark_catalog.<db>.<table>` SQL addressing, zero data copies, rather than
# the string-mangled temp-view fallback above.
#
# NOTE: `spark.table` on an external table reads the raw parquet — the
# `load_tables` timestamp normalization does NOT apply. Register normalized
# data (or normalize after read) for tables with event-time columns.
# ---------------------------------------------------------------------------


def ensure_database(spark: SparkSession, catalog: str, schema: str) -> str:
    """Create (idempotently) the database backing ``catalog.schema``."""
    db = f"{catalog}_{schema}".replace(".", "_").replace("`", "")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{db}`")
    return db


def register_external_table(
    spark: SparkSession, path: str, catalog: str, schema: str, table: str
) -> str:
    """Register existing parquet files as an external table under the
    ``catalog.schema`` database; returns the two-part name Spark resolves."""
    db = ensure_database(spark, catalog, schema)
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS `{db}`.`{table}` USING parquet LOCATION '{path}'"
    )
    return f"{db}.{table}"


def read_three_part(
    spark: SparkSession, catalog: str, schema: str, table: str
) -> DataFrame:
    """Resolve a reference-style three-part name through the real catalog."""
    db = f"{catalog}_{schema}".replace(".", "_").replace("`", "")
    return spark.table(f"`{db}`.`{table}`")
