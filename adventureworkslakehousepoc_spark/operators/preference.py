"""Preference-data / RLHF-prep operators: group-relative reward
normalization (the GRPO/RLOO advantage computation), DPO-style
chosen/rejected pair mining, Bradley-Terry strength fitting over pairwise
outcomes, and length-bias removal from scalar rewards.

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

__all__ = [
    "reward_group_normalize",
    "dpo_pairs",
    "bradley_terry_strengths",
    "reward_length_debias",
    "dpo_pairs_debiased",
    "bt_winrate_calibration",
]


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


def _bt_win_matrix(
    events: DataFrame, item_col: str, group_col: str, value_col: str
) -> DataFrame:
    """Decided-pair win matrix ``(i, j, n, w_i)`` with ``i < j`` — the ONE
    corpus-scale pass (groupBy((judge, item)) then the per-judge pairwise
    join) shared by ``bradley_terry_strengths`` and
    ``bt_winrate_calibration``. Eagerly checkpointed so both consumers read
    the materialized |items|²-bounded matrix, never the events frame twice."""
    vu = F.floor(F.col(value_col).cast("double") * 1000 + F.lit(0.5)).cast("bigint")
    tot = (
        events.select(
            F.col(group_col).alias("g"), F.col(item_col).alias("item"), vu.alias("vu")
        )
        .groupBy("g", "item")
        .agg(F.sum("vu").alias("vu"))
    )
    a, b = tot.alias("a"), tot.alias("b")
    decided = a.join(
        b,
        (F.col("a.g") == F.col("b.g"))
        & (F.col("a.item") < F.col("b.item"))
        & (F.col("a.vu") != F.col("b.vu")),
    ).select(
        F.col("a.item").alias("i"),
        F.col("b.item").alias("j"),
        F.when(F.col("a.vu") > F.col("b.vu"), F.lit(1)).otherwise(F.lit(0)).alias("win_i"),
    )
    return (
        decided.groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("win_i").cast("bigint").alias("w_i"),
        )
        .localCheckpoint(eager=True)
    )


def bradley_terry_strengths(
    events: DataFrame,
    item_col: str = "event_type",
    group_col: str = "user_id",
    value_col: str = "value",
    iterations: int = 3,
    _mat: DataFrame | None = None,
) -> DataFrame:
    """Bradley-Terry strength fitting over pairwise preference outcomes —
    the rank-models-from-human-comparisons pass of RLHF data curation (the
    Chatbot-Arena / reward-model-calibration shape). Each judge
    (``group_col``) induces one decided comparison per item pair it scored:
    the item with the larger exact milli-unit reward total wins, exact ties
    are discarded. The MM update (Hunter 2004, "MM algorithms for
    generalized Bradley-Terry models") then iterates
    ``s_i ← w_i / Σ_j n_ij / (s_i + s_j)``, renormalized each round so
    strengths sum to ``|items| · 10⁶`` micros.

    Exactness: rewards quantize once to millis (bigint sums are exact);
    every MM quantity stays in integer micros — the per-opponent term is
    ``(n_ij · 10¹²) div (s_i + s_j)``, summed exactly, and the update and
    renormalization are integer divisions — so the fixed-iteration run is
    bit-reproducible in any engine and an unrolled SQL CTE replays it.
    Bigint headroom: the ``·10¹²`` lift bounds per-pair decided games at
    n_ij ≤ ~9·10⁶ (Chatbot-Arena-scale battle counts sit well inside;
    beyond that, pre-scale n_ij or drop the term lift to 10⁹ at 10⁻³
    relative precision). The renormalization product ``raw·|items|·10⁶``
    is widened to DECIMAL(38,0) (HUGEINT in the oracle) before the
    division, so there is no |items| bound — the quotient itself is
    ≤ |items|·10⁶ and lands safely back in bigint.
    ``greatest(·, 1)`` guards the two denominators; items whose every
    comparison tied are absent (no decided game → undefined strength).

    Scale (100 TB): the corpus-sized work is ONE partial-aggregated
    groupBy((group, item)); the per-judge self-join fans out ≤ |items|²/2
    rows per judge (vocabulary-bounded), collapsing immediately to the
    |items|²-bounded win matrix. The MM loop runs on that tiny matrix with
    an eager per-round checkpoint (the pagerank idiom — keeps Catalyst from
    re-planning a growing tree), and the normalization scalar is a 1-row
    broadcast. No collect anywhere.
    """
    mat = (
        _mat
        if _mat is not None
        else _bt_win_matrix(events, item_col, group_col, value_col)
    )
    sym = mat.select("i", "j", "n").unionByName(
        mat.select(F.col("j").alias("i"), F.col("i").alias("j"), "n")
    )
    wins = (
        mat.select(F.col("i").alias("item"), F.col("w_i").alias("w"))
        .unionByName(mat.select(F.col("j").alias("item"), (F.col("n") - F.col("w_i")).alias("w")))
        .groupBy("item")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    games = sym.groupBy("i").agg(F.sum("n").alias("n_games")).withColumnRenamed("i", "item")
    n_items = wins.agg(F.count(F.lit(1)).cast("bigint").alias("n_items"))
    s = wins.select("item", F.lit(1000000).cast("bigint").alias("s"))
    for _ in range(iterations):
        si = s.select(F.col("item").alias("i"), F.col("s").alias("s_i"))
        sj = s.select(F.col("item").alias("j"), F.col("s").alias("s_j"))
        d = (
            sym.join(si, "i")
            .join(sj, "j")
            .select(
                F.col("i").alias("item"),
                F.expr("(n * 1000000000000) div greatest(s_i + s_j, 1)").alias("t"),
            )
            .groupBy("item")
            .agg(F.sum("t").alias("d"))
        )
        raw = wins.join(d, "item").select(
            "item", F.expr("(w * 1000000000000) div greatest(d, 1)").alias("raw")
        )
        total = raw.agg(F.sum("raw").alias("total"))
        s = (
            raw.crossJoin(F.broadcast(total))
            .crossJoin(F.broadcast(n_items))
            .select(
                "item",
                # DECIMAL(38,0) widening: raw*n_items*10^6 wraps bigint once
                # |items| ≳ 3000 in non-ANSI Spark; the decimal product can't,
                # and `div` lands back in bigint (the quotient itself is
                # bounded by |items|·10^6). DuckDB oracle mirrors via HUGEINT.
                F.expr(
                    "(CAST(raw AS DECIMAL(38,0)) * n_items * 1000000)"
                    " div greatest(total, 1)"
                ).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
    out = (
        s.join(wins, "item")
        .join(games, "item")
        .select(
            "item",
            F.col("n_games").cast("bigint").alias("n_games"),
            F.col("w").cast("bigint").alias("n_wins"),
            F.col("s").alias("strength_micros"),
        )
    )
    # rank WITHOUT a global window (a keyless window funnels one task —
    # plan-gate-forbidden even on this tiny table): broadcast non-equi
    # self-join counts strictly-stronger predecessors, the zipf idiom
    r = out.select(F.col("item").alias("r_item"), F.col("strength_micros").alias("r_s"))
    return (
        out.join(
            F.broadcast(r),
            (F.col("r_s") > F.col("strength_micros"))
            | (
                (F.col("r_s") == F.col("strength_micros"))
                & (F.col("r_item") < F.col("item"))
            ),
            "left",
        )
        .groupBy("item", "n_games", "n_wins", "strength_micros")
        .agg((F.count("r_item") + 1).cast("int").alias("rank"))
    )


def reward_length_debias(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Length-bias removal from a scalar reward — the debiasing pass that
    keeps preference mining from learning "longer is better" (the classic
    reward-model length exploit). Per group, ordinary least squares of the
    reward (distinct-token-fraction score in micros, the repo's stand-in
    judge) on document length in words; each document's training signal
    becomes the RESIDUAL ``r = y − ŷ(len)``.

    Exactness: scores quantize once to integer micros and lengths are
    integer words, so the five group sums (n, Σx, Σy, Σx², Σxy) are exact
    bigints — the binding product ``n·Σxy`` stays under 2^63 for groups up
    to ~10⁷ docs of 10³ words; larger groups need per-group mean-centering
    first (two passes) or a milli-unit score.
    The slope is the one IEEE division ``num/den`` of those exact integers,
    and the prediction/residual chain (mean, centering, multiply, subtract)
    runs the SAME operation sequence in every engine before a final
    floor(·+0.5) micro-quantization — bit-reproducible, the
    reward_group_normalize discipline. Degenerate groups (n == 1 or zero
    length variance) fall back to slope 0 (residual = centered score).

    Scale: one map-side-combined aggregate on the group key; the stats
    table is group-scale and broadcast back — no corpus-sized rejoin, no
    window.
    """
    words = F.split(F.col(text_col), " ")
    score_u = F.floor(
        F.size(F.array_distinct(words)).cast("double") / F.size(words) * 1000000
        + F.lit(0.5)
    ).cast("bigint")
    base = docs.select(
        F.col(group_col).alias("group_id"),
        F.col(id_col).alias("doc_id"),
        F.size(words).cast("bigint").alias("x"),
        score_u.alias("y"),
    )
    stats = base.groupBy("group_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    j = base.join(F.broadcast(stats), "group_id")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))
    # operation order mirrored verbatim in the oracle SQL: mean_y, centered
    # x, multiply, add, subtract — identical IEEE sequence in both engines
    pred = (F.col("sy").cast("double") / F.col("n").cast("double")) + slope * (
        F.col("x").cast("double") - F.col("sx").cast("double") / F.col("n").cast("double")
    )
    resid = F.floor(F.col("y").cast("double") - pred + F.lit(0.5)).cast("bigint")
    return j.select(
        "group_id",
        "doc_id",
        F.col("x").alias("n_words"),
        F.col("y").alias("score_u"),
        F.floor(slope * 1000 + F.lit(0.5)).cast("bigint").alias("slope_milli_u_per_word"),
        resid.alias("resid_micros"),
    )


def dpo_pairs_debiased(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    pairs_per_group: int = 5,
) -> DataFrame:
    """DPO pair mining on the LENGTH-DEBIASED reward: chosen/rejected are
    the top-m / bottom-m by OLS residual (``reward_length_debias``) instead
    of the raw score, so pairs can no longer be won by verbosity alone —
    composing the two passes the way a production preference pipeline
    would. Each emitted pair also carries both documents' word counts and a
    ``raw_agrees`` flag (would raw-score mining have ordered this pair the
    same way?) so the bias the debiasing removed is auditable.

    Same mirrored-total-order + grouped_topk machinery as ``dpo_pairs``:
    (resid DESC, id ASC) vs (resid ASC, id DESC), ties on residual dropped.
    """
    from .similarity import grouped_topk

    scored = reward_length_debias(docs, group_col, id_col, text_col).select(
        "group_id", "doc_id", "n_words", "score_u", F.col("resid_micros").alias("r")
    )
    top = grouped_topk(
        scored, ["group_id"], pairs_per_group, [F.desc("r"), F.asc("doc_id")],
        rank_name="pair_rank",
    )
    bottom = grouped_topk(
        scored, ["group_id"], pairs_per_group, [F.asc("r"), F.desc("doc_id")],
        rank_name="pair_rank",
    )
    return (
        top.select(
            "group_id",
            "pair_rank",
            F.col("doc_id").alias("chosen_id"),
            F.col("r").alias("chosen_resid_u"),
            F.col("score_u").alias("chosen_score_u"),
            F.col("n_words").alias("chosen_words"),
        )
        .join(
            bottom.select(
                "group_id",
                "pair_rank",
                F.col("doc_id").alias("rejected_id"),
                F.col("r").alias("rejected_resid_u"),
                F.col("score_u").alias("rejected_score_u"),
                F.col("n_words").alias("rejected_words"),
            ),
            ["group_id", "pair_rank"],
        )
        .filter(F.col("chosen_resid_u") > F.col("rejected_resid_u"))
        .select(
            "group_id",
            F.col("pair_rank").cast("int").alias("pair_rank"),
            "chosen_id",
            "rejected_id",
            "chosen_resid_u",
            "rejected_resid_u",
            (F.col("chosen_resid_u") - F.col("rejected_resid_u")).alias("margin_u"),
            "chosen_words",
            "rejected_words",
            (F.col("chosen_score_u") > F.col("rejected_score_u")).alias("raw_agrees"),
        )
    )


def bt_winrate_calibration(
    events: DataFrame,
    item_col: str = "event_type",
    group_col: str = "user_id",
    value_col: str = "value",
    iterations: int = 3,
) -> DataFrame:
    """Calibration audit of the Bradley-Terry fit: for every item pair with
    decided games, the OBSERVED win rate ``w_ij/n_ij`` against the
    fit-PREDICTED probability ``s_i/(s_i + s_j)``, plus the absolute
    calibration gap — the reward-model-quality check run before trusting
    fitted strengths to mine preference pairs (a pair whose prediction is
    far from its empirical rate marks intransitive or under-sampled
    comparisons).

    Shares the single corpus pass with ``bradley_terry_strengths``: the
    decided-pair win matrix is built once (``_bt_win_matrix``, eagerly
    checkpointed) and handed to the fit via ``_mat``, so the events frame
    is never scanned a second time; everything
    downstream is |items|²-bounded integer-micro arithmetic: observed and
    predicted rates are integer divisions of exact counts/strengths, the
    gap is their absolute difference.

    Returns (item_i, item_j, n_games, wins_i, obs_micros, pred_micros,
    abs_gap_micros), item_i < item_j.
    """
    shared = _bt_win_matrix(events, item_col, group_col, value_col)
    mat = shared.select(
        F.col("i").alias("item_i"),
        F.col("j").alias("item_j"),
        F.col("n").alias("n_games"),
        F.col("w_i").alias("wins_i"),
    )
    s = bradley_terry_strengths(
        events, item_col, group_col, value_col, iterations, _mat=shared
    )
    si = s.select(F.col("item").alias("item_i"), F.col("strength_micros").alias("s_i"))
    sj = s.select(F.col("item").alias("item_j"), F.col("strength_micros").alias("s_j"))
    return (
        mat.join(F.broadcast(si), "item_i")
        .join(F.broadcast(sj), "item_j")
        .select(
            "item_i",
            "item_j",
            "n_games",
            "wins_i",
            F.expr("(wins_i * 1000000) div n_games").alias("obs_micros"),
            F.expr("(s_i * 1000000) div greatest(s_i + s_j, 1)").alias("pred_micros"),
        )
        .withColumn("abs_gap_micros", F.abs(F.col("obs_micros") - F.col("pred_micros")))
    )
