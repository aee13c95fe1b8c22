"""File sources: explicit-schema CSV (S6) and line-text scan (S5).

The reference reads the NOAA by-year CSV with a hand-declared ``StructType``
to skip schema inference over a 30 GB+ dataset (``noaa_bronze_layer.py:117-135``)
— at 100 TB inference is a full extra pass, so explicit schemas are mandatory
here, not optional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_csv_with_schema", "read_text_lines", "NOAA_BY_YEAR_SCHEMA"]

# reference noaa_bronze_layer.py:125-134
NOAA_BY_YEAR_SCHEMA = T.StructType(
    [
        T.StructField("station_id", T.StringType(), False),
        T.StructField("date", T.StringType(), False),
        T.StructField("element", T.StringType(), False),
        T.StructField("value", T.IntegerType(), True),
        T.StructField("mflag", T.StringType(), True),
        T.StructField("qflag", T.StringType(), True),
        T.StructField("sflag", T.StringType(), True),
        T.StructField("obs_time", T.StringType(), True),
    ]
)


def read_csv_with_schema(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = False, **options
) -> DataFrame:
    return spark.read.options(**options).csv(path, header=header, schema=schema)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Single ``value: string`` column per line (reference ``noaa_bronze_layer.py:31,92``)."""
    return spark.read.text(path)
