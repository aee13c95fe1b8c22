"""Scalar expression builders — the reference's entire scalar-function surface
(SURVEY.md §2.6 F1–F19) is built-in ``pyspark.sql.functions``; these helpers
package the recurring *combinations* the reference uses so queries stay
declarative and Catalyst-optimizable (no UDFs anywhere).

Cross-engine determinism note: aggregates over double columns are order
sensitive (a float sum re-associates across partitions), so any aggregate that
must hash-match a DuckDB oracle goes through exact decimal arithmetic
(``exact_sum`` / ``exact_avg``) and only converts to double at the very end —
one correctly-rounded conversion that both engines perform identically.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "surrogate_key",
    "decode",
    "clean_name",
    "greatest_ts",
    "typed_null",
    "money",
    "exact_sum",
    "exact_avg",
]


def surrogate_key(*cols: Column | str, sep: str = "_") -> Column:
    """Concatenated natural-key surrogate, e.g. ``AddressID || '_' || PostalCode``
    (reference ``silver_layer_person.py:35``, ``sales_aw_silver_layer_fact_sales.py:58``)."""
    parts: list[Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(sep))
        parts.append(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"))
    return F.concat(*parts)


def decode(col: Column | str, mapping: Mapping[str, str], default: str | None = None) -> Column:
    """``when/otherwise`` chain for code→label decodes (reference 6-way PersonType
    decode ``sales_aw_silver_layer_dim_customer.py:37-43``, 10-way variable decode
    ``noaa_bronze_layer.py:142-152``)."""
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for code, label in mapping.items():
        expr = F.when(c == code, label) if expr is None else expr.when(c == code, label)
    if expr is None:
        return F.lit(default)
    return expr.otherwise(F.lit(default)) if default is not None else expr.otherwise(typed_null("string"))


def clean_name(*cols: Column | str, sep: str = " ") -> Column:
    """``trim(regexp_replace(concat_ws(' ', ...), '\\s+', ' '))`` — the reference's
    full-name construction (``sales_aw_silver_layer_dim_customer.py:22-27``)."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.trim(F.regexp_replace(F.concat_ws(sep, *parts), r"\s+", " "))


def greatest_ts(*cols: Column | str) -> Column:
    """Null-skipping max of timestamps (reference ``greatest`` last-modified,
    ``sales_aw_silver_layer_dim_customer.py:46``). Spark's ``greatest`` skips
    nulls; DuckDB oracles should COALESCE-wrap to pin identical semantics."""
    return F.greatest(*[F.col(c) if isinstance(c, str) else c for c in cols])


def typed_null(dtype: str) -> Column:
    """``lit(None).cast(dtype)`` (reference ``noaa_bronze_layer.py:55-56``)."""
    return F.lit(None).cast(dtype)


def money(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Cast a 2-decimal double (synthetic money) to exact decimal so downstream
    sums are order-independent and bit-identical across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def exact_sum(col: Column, out: str = "double") -> Column:
    """Exact decimal sum, converted once to double at the end."""
    return F.sum(col).cast(out)


def exact_avg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent average: exact decimal sum ÷ count, one double division.
    Matches ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x)`` in ANSI SQL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)


def quantized_avg(col: Column | str, digits: int = 6) -> Column:
    """Order-independent average of a *computed* double column.

    Casting a computed double to decimal is engine-dependent at the last digit
    (shortest-repr vs scaled rounding), so instead quantize with pure IEEE ops
    that every engine evaluates bit-identically: ``floor(x·10^d + 0.5)`` →
    exact integer sum → two double divisions. ANSI equivalent:
    ``CAST(SUM(CAST(FLOOR(x * 10^d + 0.5) AS BIGINT)) AS DOUBLE) / COUNT(x) / 10^d``.
    """
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**digits)
    q = F.floor(c * F.lit(scale) + F.lit(0.5)).cast("bigint")
    return F.sum(q).cast("double") / F.count(c) / F.lit(scale)
