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
    "exact_unscaled_sum",
    "exact_unscaled_sum_over",
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


_SPLIT = 1_000_000


def _split_hi_lo(unscaled: Column) -> tuple[Column, Column]:
    """Pure-integer hi/lo split: ``u = hi·10^6 + lo`` with hi the
    truncate-toward-zero quotient (IntegralDivide — codegen'd long op) and
    lo the signed remainder in (−10^6, 10^6). Exact for every bigint u."""
    u = unscaled.cast("bigint")
    hi = F.call_function("div", u, F.lit(_SPLIT))
    lo = (u - hi * F.lit(_SPLIT)).cast("bigint")
    return hi, lo


def _recombine(sum_hi: Column, sum_lo: Column, scale: int) -> Column:
    """Exact decimal recombination of the two long partial sums, then the
    single correctly-rounded cast to double (once per group/row, never per
    input row)."""
    total = (
        sum_hi.cast("decimal(38,0)") * F.lit(_SPLIT).cast("decimal(38,0)")
        + sum_lo.cast("decimal(38,0)")
    )
    return (total / F.lit(10 ** scale).cast(f"decimal({scale + 1},0)")).cast("double")


def exact_unscaled_sum(unscaled: Column, scale: int) -> Column:
    """Exact ``CAST(SUM(value) AS DOUBLE)`` for fixed-point values passed as
    their integer unscaled form (value = unscaled · 10^-scale) — the fast
    twin of ``F.sum(decimal_col).cast("double")``.

    Why: Spark's SUM over ``decimal(p,s)`` buffers in ``decimal(p+10,s)``;
    for p > 8 that exceeds the 18-digit compact-long representation, so
    every row pays a serialized-BigDecimal add in the aggregation hash map
    (measured 2.2× the whole stage on q1's charge sum at sf0.1). Here the
    per-row unscaled long splits into ``(floor(u/10^6), pmod(u, 10^6))``;
    both parts accumulate as plain LONG sums (codegen'd integer adds), and
    the two totals recombine into the exact decimal ONCE per group:
    ``(sum_hi · 10^6 + sum_lo) · 10^-scale``.

    Exactness (r16 — pure integer split, no double anywhere):
    - ``hi = u div 10^6`` (IntegralDivide: truncate-toward-zero long
      division, codegen'd) and ``lo = u − hi·10^6`` (signed remainder in
      (−10^6, 10^6)) satisfy ``u = hi·10^6 + lo`` exactly for EVERY
      bigint u — |hi| ≤ 2^63/10^6 so hi·10^6 cannot overflow, and |lo| <
      10^6. The previous double floor-division was only exact for
      |u| ≤ 2^53 (ADVICE r15: the docstring claimed an assert that did
      not exist); the integer form has no precondition on u at all;
    - the long partials cannot overflow for any realistic group: with
      per-row |u| ≤ 1.2·10^11 (q1's charge term at TPC-H prices), the hi
      sum holds ~10^13 rows per group and the lo sum ~9·10^12 — three
      orders of magnitude beyond a 100 TB lineitem;
    - the recombination and the final ×10^-scale run in decimal(38,·)
      (exact: the result has ≤ scale ≤ 6 decimal digits, and the division
      result scale is max(6, scale+2) ≥ scale), and the one cast to
      double is the same correctly-rounded conversion the reference
      ``SUM(decimal)`` path performs.
    Requires scale ≤ 6 (asserted)."""
    if scale > 6:
        raise ValueError(f"exact_unscaled_sum: scale {scale} > 6 breaks the "
                         "lossless decimal-division argument")
    hi, lo = _split_hi_lo(unscaled)
    return _recombine(F.sum(hi), F.sum(lo), scale)


def exact_unscaled_sum_over(unscaled: Column, scale: int, w) -> Column:
    """Window twin of ``exact_unscaled_sum``: exact
    ``CAST(SUM(decimal) OVER w AS DOUBLE)`` via two plain LONG window sums
    (r16 rollout — a decimal(p+10,s) window buffer past 18 digits pays the
    same per-row serialized-BigDecimal add inside WindowExec as it does in
    a hash aggregate; the long partials are codegen'd adds and the exact
    decimal recombination runs once per output row)."""
    if scale > 6:
        raise ValueError(f"exact_unscaled_sum_over: scale {scale} > 6 breaks "
                         "the lossless decimal-division argument")
    hi, lo = _split_hi_lo(unscaled)
    return _recombine(F.sum(hi).over(w), F.sum(lo).over(w), scale)


def exact_avg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent average: exact decimal sum ÷ count, one double division.
    Matches ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x)`` in ANSI
    SQL. The sum runs through ``exact_unscaled_sum`` (plain long partials — the
    decimal(28,s) buffer of a direct decimal sum pays a per-row BigDecimal add);
    the decimal(18,s) cast's HALF_UP rounding is applied per row first, so the
    summed values are identical to the reference form."""
    c = F.col(col) if isinstance(col, str) else col
    unscaled = (
        c.cast(f"decimal(18,{scale})")
        * F.lit(10 ** scale).cast(f"decimal({scale + 1},0)")
    ).cast("bigint")
    return exact_unscaled_sum(unscaled, scale) / F.count(c)


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
