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

__all__ = ["k_anonymity_audit", "dp_noisy_group_counts", "dp_clipped_noisy_sums"]


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


def dp_noisy_group_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    seed: str = "dp42",
) -> DataFrame:
    """ε-differentially-private group counts via the Laplace mechanism,
    with DETERMINISTIC noise so the operator is replayable and
    oracle-testable: the Laplace draw is inverse-CDF over an md5-derived
    uniform of the GROUP KEY (53-bit mantissa), not an RNG. A count query
    has L1 sensitivity 1, so the noise scale is 1/ε.

    noise = -(1/ε)·sign(u)·ln(1 − 2|u|),  u = H(seed, key) − ½ ∈ [−½, ½)

    The ln term is micro-quantized (⌊x·10⁶ + ½⌋) before re-scaling so the
    result is bit-identical across engines regardless of libm ulp drift.
    Returns ``(group cols…, n_true, n_noisy, epsilon)``; a production
    release drops ``n_true`` — it is kept here because this operator's
    job in the suite is to make the mechanism auditable.

    Scale posture: one partial-aggregated groupBy; the noise is a scalar
    expression over the |groups|-row result. Nothing else moves.
    """
    keys = [F.col(c) for c in group_cols]
    counted = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )
    # injective group-key encoding: each component is hashed SEPARATELY
    # before joining, so a delimiter character inside a value cannot
    # collide two distinct groups into one (correlated) noise draw, and a
    # NULL component maps to a fixed non-hex sentinel (md5 of NULL is
    # NULL) instead of silently vanishing as concat_ws would — which also
    # diverged from the oracle, where NULL propagates through '||'.
    key_str = F.concat_ws(
        "",
        *[
            F.coalesce(F.md5(F.col(c).cast("string")), F.lit("~null~"))
            for c in group_cols
        ],
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + ":"), key_str)), 1, 13), 16, 10
    ).cast("bigint") / F.lit(float(1 << 52))
    u = h - F.lit(0.5)
    raw = (
        F.lit(-1.0 / epsilon)
        * F.signum(u)
        * F.log(F.greatest(F.lit(1e-12), F.lit(1.0) - 2.0 * F.abs(u)))
    )
    noise_micro = F.floor(raw * 1e6 + F.lit(0.5)).cast("bigint")
    return counted.select(
        *group_cols,
        "n_true",
        (F.col("n_true") + noise_micro / F.lit(1e6)).alias("n_noisy"),
        F.lit(float(epsilon)).alias("epsilon"),
    )


def dp_clipped_noisy_sums(
    events: DataFrame,
    group_cols: Sequence[str],
    user_col: str,
    value_col: str,
    clip_micros: int = 5_000_000,
    epsilon: float = 1.0,
    seed: str = "dpsum42",
) -> DataFrame:
    """ε-DP group SUMS via contribution clipping + the Laplace mechanism —
    the release ``dp_noisy_group_counts`` cannot provide: a sum query has
    UNBOUNDED sensitivity until each user's total contribution is clipped,
    so the mechanism is (1) per-(group, user) exact micro-sums, (2) clamp
    each user's contribution to ±``clip_micros`` (the L1 sensitivity
    becomes exactly ``clip_micros``), (3) one Laplace draw per group at
    scale ``clip_micros``/ε. Noise is the family's DETERMINISTIC
    inverse-CDF draw (md5 uniform of the group key, each component hashed
    separately — the round-13 injective construction), micro-quantized, so
    the release is replayable and oracle-testable.

    Returns ``(group cols…, n_users, sum_clipped, sum_noisy, epsilon)``
    with sums in value units (micros / 10⁶). A production release drops
    ``sum_clipped``; it stays here to make the mechanism auditable, and
    the clip bound is part of the privacy contract (chosen a priori, NOT
    from the data).

    Scale posture: one (group, user)-keyed partial aggregate (the only
    real shuffle), one group-keyed aggregate over |users| rows, then
    scalar noise over the |groups|-row result.
    """
    keys = [F.col(c) for c in group_cols]
    v_micro = F.floor(F.col(value_col) * 1e6 + F.lit(0.5)).cast("bigint")
    per_user = (
        events.select(*keys, F.col(user_col).alias("_uid"), v_micro.alias("_v"))
        .groupBy(*group_cols, "_uid")
        .agg(F.sum("_v").cast("bigint").alias("_uv"))
        .select(
            *group_cols,
            "_uid",
            F.greatest(
                F.lit(-clip_micros), F.least(F.lit(clip_micros), F.col("_uv"))
            ).alias("_clipped"),
        )
    )
    grouped = per_user.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("_clipped").cast("bigint").alias("_sum_clipped"),
    )
    key_str = F.concat_ws(
        "",
        *[
            F.coalesce(F.md5(F.col(c).cast("string")), F.lit("~null~"))
            for c in group_cols
        ],
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + ":"), key_str)), 1, 13), 16, 10
    ).cast("bigint") / F.lit(float(1 << 52))
    u = h - F.lit(0.5)
    raw = (
        F.lit(-float(clip_micros) / epsilon)
        * F.signum(u)
        * F.log(F.greatest(F.lit(1e-12), F.lit(1.0) - 2.0 * F.abs(u)))
    )
    noise_micro = F.floor(raw + F.lit(0.5)).cast("bigint")
    MICRO = F.lit(1e6)
    return grouped.select(
        *group_cols,
        "n_users",
        (F.col("_sum_clipped") / MICRO).alias("sum_clipped"),
        ((F.col("_sum_clipped") + noise_micro) / MICRO).alias("sum_noisy"),
        F.lit(float(epsilon)).alias("epsilon"),
    )
