"""Declarative data-quality expectations — the DLT/Lakeflow
``@dp.expect`` / ``expect_or_drop`` surface of the reference's host platform,
re-expressed as plain DataFrame ops.

The reference's transformations run on a platform whose pipeline decorator
carries row-level expectations (keep / drop / quarantine + metrics); the
reference code itself declares none, so this module supplies the capability
rather than porting a specific rule set.

Scale shape: ``expectation_metrics`` folds every constraint into ONE keyless
aggregate pass (a conditional sum per constraint — map-side partials, one
merged row) and unpivots with ``stack``, so metric collection costs one scan
regardless of how many constraints are declared. ``enforce_expectations`` is
a pure conjunctive filter — codegen'd, pushdown-eligible, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectation_metrics(df: DataFrame, expectations: dict[str, Column]) -> DataFrame:
    """One row per expectation: (expectation, n_failed, n_passed).

    A row fails an expectation when the predicate is false OR null (DLT
    semantics: null means the constraint cannot be proven, so it fails).
    """
    aggs = [F.count(F.lit(1)).alias("__total")]
    for name, pred in expectations.items():
        aggs.append(
            F.sum(F.when(pred, 0).otherwise(1)).alias(f"__f_{name}")
        )
    one = df.agg(*aggs)
    pairs = ", ".join(
        f"'{name}', __f_{name}" for name in expectations
    )
    n = len(expectations)
    return one.select(
        F.expr(f"stack({n}, {pairs}) AS (expectation, n_failed)"),
        F.col("__total"),
    ).select(
        "expectation",
        F.col("n_failed").cast("bigint").alias("n_failed"),
        (F.col("__total") - F.col("n_failed")).cast("bigint").alias("n_passed"),
    )


def enforce_expectations(df: DataFrame, expectations: dict[str, Column]) -> DataFrame:
    """expect_or_drop: keep only rows passing every expectation (null fails)."""
    out = df
    for pred in expectations.values():
        out = out.filter(pred)
    return out


def weak_label_votes(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Weak-supervision labeling: four cheap heuristic labelers vote on
    document quality (length band, stopword floor, repetition ceiling,
    alphabetic floor); majority (≥3) keeps. The programmatic-labeling prep
    step of a classifier-filtered corpus (Snorkel-style): labelers are pure
    scan-side projections, votes are exact ints — one narrow pass, zero
    shuffles, trivially auditable.

    Returns (doc_id, l_length, l_stopword, l_repetition, l_alpha, votes,
    keep)."""
    from .text_analysis import LANG_MARKERS

    stop = ", ".join(f"'{m}'" for m in LANG_MARKERS["en"])
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words)
    stop_hits = F.expr(f"size(filter(split({text_col}, ' '), w -> w IN ({stop})))")
    # repetition: distinct-token fraction over whitespace tokens
    distinct_frac = F.size(F.array_distinct(words)).cast("double") / n_words
    alpha_ratio = F.regexp_count(F.col(text_col), F.lit("[a-z]")).cast("double") / F.length(
        F.col(text_col)
    )
    l1 = n_words.between(20, 1000)
    l2 = (stop_hits.cast("double") / n_words) >= 0.05
    l3 = distinct_frac >= 0.3
    l4 = alpha_ratio >= 0.5
    votes = sum(F.when(c, 1).otherwise(0) for c in (l1, l2, l3, l4))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        l1.alias("l_length"),
        l2.alias("l_stopword"),
        l3.alias("l_repetition"),
        l4.alias("l_alpha"),
        votes.cast("int").alias("votes"),
        (votes >= 3).alias("keep"),
    )
