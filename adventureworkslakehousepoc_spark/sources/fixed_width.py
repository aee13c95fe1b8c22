"""Fixed-width text source (SURVEY.md §2.1 S7).

Spark has no native fixed-width reader; the reference decodes NOAA station /
inventory files positionally with ``substring``+``trim``+``cast`` over
``spark.read.text`` lines (reference ``noaa_bronze_layer.py:31-44`` stations,
``:92-102`` inventory). This module packages that as a declarative field spec
so the whole parse stays inside whole-stage codegen — one projection, no
Python per-row work, scales linearly with input splits.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["FixedWidthField", "fixed_width_columns", "parse_fixed_width", "read_fixed_width"]


@dataclass(frozen=True)
class FixedWidthField:
    """One field of a fixed-width record. ``start`` is 1-based (SQL substring
    convention, matching the reference's column-spec docstrings)."""

    name: str
    start: int
    length: int
    dtype: str = "string"
    trim: bool = True


# NOAA ghcnd-stations.txt layout (reference noaa_bronze_layer.py:18-27)
GHCND_STATIONS = (
    FixedWidthField("station_id", 1, 11),
    FixedWidthField("latitude", 13, 8, "double"),
    FixedWidthField("longitude", 22, 9, "double"),
    FixedWidthField("elevation", 32, 6, "double"),
    FixedWidthField("state", 39, 2),
    FixedWidthField("name", 42, 30),
    FixedWidthField("gsn_flag", 73, 3),
    FixedWidthField("hcn_crn_flag", 77, 3),
    FixedWidthField("wmo_id", 81, 5),
)

# NOAA ghcnd-inventory.txt layout (reference noaa_bronze_layer.py:82-88)
GHCND_INVENTORY = (
    FixedWidthField("station_id", 1, 11),
    FixedWidthField("latitude", 13, 8, "double"),
    FixedWidthField("longitude", 22, 9, "double"),
    FixedWidthField("element", 32, 4),
    FixedWidthField("first_year", 37, 4, "int"),
    FixedWidthField("last_year", 42, 4, "int"),
)


def fixed_width_columns(value_col: str, fields: tuple[FixedWidthField, ...]) -> list[Column]:
    cols = []
    for f in fields:
        c: Column = F.substring(F.col(value_col), f.start, f.length)
        if f.trim:
            c = F.trim(c)
        if f.dtype != "string":
            c = c.cast(f.dtype)
        cols.append(c.alias(f.name))
    return cols


def parse_fixed_width(
    df: DataFrame, fields: tuple[FixedWidthField, ...], value_col: str = "value"
) -> DataFrame:
    """Decode a single-string-column DataFrame positionally into typed columns."""
    return df.select(*fixed_width_columns(value_col, fields))


def read_fixed_width(spark: SparkSession, path: str, fields: tuple[FixedWidthField, ...]) -> DataFrame:
    """``spark.read.text`` (S5) + positional decode (S7)."""
    return parse_fixed_width(spark.read.text(path), fields)
