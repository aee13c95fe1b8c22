"""Privacy / re-identification screens over training and analytics tables.

Training corpora and gold tables routinely carry quasi-identifiers (QIs) —
columns that are individually harmless but jointly identifying (nation ×
market segment × balance band). The k-anonymity audit is the standard
pre-release gate: every QI combination must describe at least ``k``
individuals, else those rows are re-identifiable and must be suppressed or
generalized. Complements the text-side PII redaction pass
(``text_analysis``): that one scrubs payloads, this one audits structure.

Scale posture: one partial-aggregated groupBy on the QI tuple — the QI
domain is orders of magnitude smaller than the row count, so the shuffle
carries |QI-combinations| rows. No windows, no joins, no driver work.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity_audit"]


def k_anonymity_audit(
    df: DataFrame,
    quasi_identifiers: Sequence[Column | str],
    k: int = 5,
    sensitive: Column | str | None = None,
) -> DataFrame:
    """Per-QI-combination audit row: group size, ``at_risk`` (size < k), and
    — when a ``sensitive`` column is given — the distinct sensitive-value
    count for an l-diversity reading (a k-anonymous group leaking a single
    sensitive value is still a disclosure).

    Returns the QI columns plus ``(group_size, at_risk, n_sensitive)``.
    """
    keys = [F.col(c) if isinstance(c, str) else c for c in quasi_identifiers]
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("group_size"),
    ]
    if sensitive is not None:
        s = F.col(sensitive) if isinstance(sensitive, str) else sensitive
        aggs.append(F.count_distinct(s).cast("bigint").alias("n_sensitive"))
    out = df.groupBy(*keys).agg(*aggs)
    out = out.withColumn("at_risk", F.col("group_size") < k)
    return out
