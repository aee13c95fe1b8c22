"""Preference-data / RLHF-prep operators: group-relative reward
normalization (the GRPO/RLOO advantage computation) and DPO-style
chosen/rejected pair mining.

Both follow the repo's exact-integer float discipline so every value is
bit-reproducible across engines and partitionings: rewards quantize once to
1e-3 milli-units (bigint — magnitudes stay far below 2^53 so integer sums
are exact even through a double), group moments are exact integer
arithmetic, and the one irrational step (sqrt of the variance) runs on
identical exact inputs in IEEE doubles before a final 1e-6 quantization.

Scale posture (100 TB): both operators are one window/aggregate over the
grouping key with map-side combine and no corpus-sized rejoin of payload
columns; DPO mining uses the per-partition pre-rank ``grouped_topk`` so a
hot source never funnels into a single-task window sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["reward_group_normalize", "dpo_pairs"]


def reward_group_normalize(
    samples: DataFrame,
    group_col: str = "user_id",
    id_col: str = "event_id",
    reward_col: str = "value",
) -> DataFrame:
    """Group-relative advantage (GRPO-style): for k sampled completions per
    prompt (here: events per user as the stand-in shape), the training signal
    is the reward's z-score WITHIN its group — ``adv = (r - mean_g) / std_g``
    — so a prompt whose rewards are uniformly high doesn't dominate the
    batch.

    Exactness: rewards quantize to milli-units ``ru`` (bigint); the group
    sum/count make the mean the exact rational ``sum_u/n``, so the centered
    numerator ``n·ru − sum_u`` is an exact integer; the population variance
    numerator ``n·Σru² − (Σru)²`` is likewise exact — all < 2^53 for GRPO-scale
    groups (holds up to n ≈ 10³ samples per prompt at |reward| ≤ 500; milli
    quantization is what buys the headroom). The only
    floats are one sqrt and one division on those exact integers, then a
    floor-quantize to micro-units. Degenerate groups (n == 1 or zero
    variance) emit advantage 0.

    One map-side-combined aggregate on the group key + one broadcast-joined
    stats table — group count is prompt-scale (small), so the join is
    broadcast at any corpus size.
    """
    ru = F.floor(F.col(reward_col).cast("double") * 1000 + F.lit(0.5)).cast("bigint")
    base = samples.select(
        F.col(group_col).alias("group_id"),
        F.col(id_col).alias("sample_id"),
        ru.alias("ru"),
    )
    stats = base.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ru").alias("sum_u"),
        F.sum(F.col("ru") * F.col("ru")).alias("sumsq_u"),
    )
    j = base.join(F.broadcast(stats), "group_id")
    # exact integer: variance numerator n·Σru² − (Σru)²  (= n²·σ²_pop in u²);
    # since std = sqrt(var_num)/n, the z-score collapses to
    # adv = (ru − sum_u/n) / std = (n·ru − sum_u) / sqrt(var_num)
    var_num = F.col("n") * F.col("sumsq_u") - F.col("sum_u") * F.col("sum_u")
    centered = F.col("n") * F.col("ru") - F.col("sum_u")
    adv = F.when(
        (F.col("n") > 1) & (var_num > 0),
        F.floor(
            centered.cast("double") / F.sqrt(var_num.cast("double")) * 1000000
            + F.lit(0.5)
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    return j.select(
        "group_id",
        "sample_id",
        F.col("ru").alias("reward_millis"),
        F.col("n").cast("bigint").alias("group_n"),
        adv.alias("adv_micros"),
    )


def dpo_pairs(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    pairs_per_group: int = 5,
) -> DataFrame:
    """DPO preference-pair mining: within each group, pair the top-m
    documents by a quality score (chosen) with the bottom-m (rejected),
    rank-to-rank, dropping pairs whose scores tie — the
    construct-preferences-from-a-scalar-judge pass of preference-data
    pipelines.

    The score is the distinct-token fraction in micro-units (an exact
    integer in any engine). Top and bottom lists use mirrored total orders
    — (score DESC, id ASC) vs (score ASC, id DESC) — so with
    ``m ≤ ⌈n/2⌉`` the i-th chosen and i-th rejected are distinct documents
    whenever their scores differ.

    Both rankings run through ``grouped_topk`` (per-partition pre-rank then
    one final per-group rank), so a group with 10⁹ docs costs two partial
    top-m passes, never a full window sort on one task.
    """
    from .similarity import grouped_topk

    words = F.split(F.col(text_col), " ")
    score_u = F.floor(
        F.size(F.array_distinct(words)).cast("double") / F.size(words) * 1000000
        + F.lit(0.5)
    ).cast("bigint")
    scored = docs.select(
        F.col(group_col).alias("group_id"),
        F.col(id_col).alias("doc_id"),
        score_u.alias("score_u"),
    )
    top = grouped_topk(
        scored,
        ["group_id"],
        pairs_per_group,
        [F.desc("score_u"), F.asc("doc_id")],
        rank_name="pair_rank",
    )
    bottom = grouped_topk(
        scored,
        ["group_id"],
        pairs_per_group,
        [F.asc("score_u"), F.desc("doc_id")],
        rank_name="pair_rank",
    )
    return (
        top.select(
            "group_id",
            "pair_rank",
            F.col("doc_id").alias("chosen_id"),
            F.col("score_u").alias("chosen_score_u"),
        )
        .join(
            bottom.select(
                "group_id",
                "pair_rank",
                F.col("doc_id").alias("rejected_id"),
                F.col("score_u").alias("rejected_score_u"),
            ),
            ["group_id", "pair_rank"],
        )
        .filter(F.col("chosen_score_u") > F.col("rejected_score_u"))
        .select(
            "group_id",
            F.col("pair_rank").cast("int").alias("pair_rank"),
            "chosen_id",
            "rejected_id",
            "chosen_score_u",
            "rejected_score_u",
            (F.col("chosen_score_u") - F.col("rejected_score_u")).alias("margin_u"),
        )
    )
