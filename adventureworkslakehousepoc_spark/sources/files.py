"""File sources: explicit-schema CSV (S6) and line-text scan (S5).

The reference reads the NOAA by-year CSV with a hand-declared ``StructType``
to skip schema inference over a 30 GB+ dataset (``noaa_bronze_layer.py:117-135``)
— at 100 TB inference is a full extra pass, so explicit schemas are mandatory
here, not optional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "read_csv_with_schema",
    "read_csv_resilient",
    "split_valid_corrupt",
    "read_text_lines",
    "read_jsonl_with_schema",
    "NOAA_BY_YEAR_SCHEMA",
]

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


def read_csv_resilient(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = False, **options
) -> DataFrame:
    """PERMISSIVE CSV read that quarantines malformed lines instead of
    failing the job or silently dropping rows — at 100 TB some fraction of a
    raw feed is always malformed, and dropping it invisibly corrupts counts.
    The returned frame carries ``_corrupt_record`` (the raw line, NULL for
    clean rows); split with :func:`split_valid_corrupt`."""
    full = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    return spark.read.options(
        mode="PERMISSIVE", columnNameOfCorruptRecord="_corrupt_record", **options
    ).csv(path, header=header, schema=full)


def split_valid_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the marker column, quarantined raw lines).

    Spark refuses to evaluate a plan that references ONLY the corrupt-record
    column of a raw CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the
    documented idiom is to cache the parsed frame first, which also means the
    file is parsed once for both branches."""
    from pyspark.sql import functions as F

    df = df.cache()
    valid = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    corrupt = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return valid, corrupt


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Single ``value: string`` column per line (reference ``noaa_bronze_layer.py:31,92``)."""
    return spark.read.text(path)


def read_jsonl_with_schema(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S10: JSON-lines scan with an EXPLICIT schema — like the CSV reader,
    never schema inference (inference runs an extra full pass over the data
    and silently widens types between runs; an explicit StructType makes
    the scan single-pass and the contract stable). Nested structs/arrays in
    the schema are projected with ordinary dotted/HOF column access
    downstream — no JSON re-parsing per field."""
    return spark.read.schema(schema).json(path)
