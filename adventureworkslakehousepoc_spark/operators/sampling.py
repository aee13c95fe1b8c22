"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-dependent per partitioning — re-partition the input
and the sample changes, which breaks reproducible corpus builds and makes an
engine-independent oracle impossible. These operators sample by *content
hash* instead: a row is in the sample iff the leading hex digit(s) of
``md5(key)`` fall in an allowed set. The decision is a pure function of the
key — stable across runs, partitionings, engines, and cluster sizes, and the
sample is reproducible from the key alone (the property corpus pipelines
actually need: "was this doc in the 10% eval split?" must have one answer
forever).

Scale posture: the predicate is a scan-side filter (no shuffle, no state);
rates compose multiplicatively by adding hex digits (1/16, 1/256, ...).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_sample_predicate", "hash_sample", "stratified_hash_sample"]

_HEX = "0123456789abcdef"


def hash_sample_predicate(key: Column, sixteenths: int) -> Column:
    """True for ~``sixteenths``/16 of rows, decided by md5(key)'s first hex
    digit (< comparison over the hex alphabet — portable string ordering)."""
    if not 0 < sixteenths <= 16:
        raise ValueError("sixteenths must be in 1..16")
    return F.substring(F.md5(key.cast("string")), 1, 1) < _HEX[sixteenths] if sixteenths < 16 else F.lit(True)


def hash_sample(df: DataFrame, key_col: str, sixteenths: int) -> DataFrame:
    """Deterministic ~sixteenths/16 sample keyed on ``key_col``."""
    return df.filter(hash_sample_predicate(F.col(key_col), sixteenths))


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, rates: dict[str, int], default: int = 0
) -> DataFrame:
    """Per-stratum deterministic sampling — the class-rebalancing pass of a
    corpus build (e.g. keep 2/16 of dominant-language docs, 8/16 of rare
    ones). ``rates`` maps stratum value → sixteenths; unlisted strata get
    ``default`` (0 = dropped)."""
    digit = F.substring(F.md5(F.col(key_col).cast("string")), 1, 1)
    pred: Column = F.lit(False)
    expr = F.when(F.lit(False), F.lit(True))
    for value, sixteenths in rates.items():
        if not 0 <= sixteenths <= 16:
            raise ValueError(f"rate for {value!r} out of 0..16")
        expr = expr.when(F.col(strata_col) == value, digit < _HEX[sixteenths] if sixteenths < 16 else F.lit(True))
    if default > 0:
        pred = expr.otherwise(digit < _HEX[default] if default < 16 else F.lit(True))
    else:
        pred = expr.otherwise(F.lit(False))
    return df.filter(pred)
