"""Distributed linear quality probe: batch-GD logistic regression.

The fastText-style quality classifier is a corpus-curation staple (GPT-3's
WebText-similarity filter, LLaMA's fasttext gate): train a cheap linear
model on labeled seed data, score the whole corpus, keep by threshold.
This module trains that probe END-TO-END inside the engine — each gradient
step is ONE corpus scan aggregated to a 5-number gradient — instead of
collecting features to the driver.

Cross-engine exactness (the oracle unrolls every iteration):
- Features are integer micros in [0, 10⁶] (capped/scaled surface stats).
- The sigmoid is the PIECEWISE-LINEAR "hard sigmoid" σ(z) = clamp(½ + z/4,
  0, 1): IEEE exp() is libm-dependent in its last ulp, a clamp of exact
  integer arithmetic is not.
- All divisions are bigint `div`, which truncates toward zero in BOTH
  Spark and DuckDB (verified: (-7) div 4 = -1 = (-7)//4), so signed
  gradients need no floor-shift trick.
- Per-row gradient contributions are quantized to micros BEFORE the sum
  (the repo-wide discipline): the summand stays ≤ 10⁶, so the bigint
  accumulator survives 10¹² rows where a raw err·x sum would overflow
  around 10⁶ rows-per-partition scales.

Scale posture: the feature frame is computed once and eager-checkpointed;
each of the T iterations is one scan of it with a map-side-combined sum to
a 1-row gradient frame that broadcasts back — weights never touch the
driver (n lives in a 1-row broadcast frame, not a collected scalar), state
per iteration is 5 bigints, and the loop eager-checkpoints per round (the
iterative-loop idiom shared with PageRank/k-means/BPE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["probe_features", "logistic_probe_fit", "probe_calibration", "probe_conformal_gate", "PROBE_STOPWORDS"]

# the Gopher stop set (operators/text_analysis.py::GOPHER_STOP_WORDS) — the
# probe DISTILLS the hand-written Gopher keep gate into a calibrated linear
# scorer: hard AND-of-thresholds in, soft rankable quality score out (the
# gate you can threshold-sweep for ablations without re-running rules)
PROBE_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_FEATS = ("bias", "len_words", "mean_word_len", "stopword_ratio", "stop_hits")


def probe_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc feature vector (integer micros, each capped to [0, 10⁶]) and
    binary label: x0 bias, x1 length (words/200), x2 mean word length (/10),
    x3 Gopher-stop-word ratio, x4 stop-hit count (/20 capped); y = 10⁶ iff
    the doc passes the composite Gopher keep gate (same word-count /
    mean-word-length / symbol / alpha / stop-hit thresholds as
    text_analysis.gopher_quality_flags — the label IS the rule, which is
    the point of distillation). One codegen'd projection, no shuffle."""
    stop_in = ", ".join(f"'{s}'" for s in PROBE_STOPWORDS)
    mwl = "length(replace(_t, ' ', '')) / size(_ws)"
    n_hash = "length(_t) - length(replace(_t, '#', ''))"
    n_ell = "floor(CAST(length(_t) - length(replace(_t, '...', '')) AS DOUBLE) / 3.0)"
    keep = (
        "size(_ws) >= 50 AND size(_ws) <= 100000"
        f" AND {mwl} >= 3.0 AND {mwl} <= 10.0"
        f" AND ({n_hash} + {n_ell}) / size(_ws) <= 0.1"
        " AND size(filter(_ws, w -> w rlike '[a-z]')) / size(_ws) >= 0.8"
        f" AND size(filter(_ws, w -> w IN ({stop_in}))) >= 2"
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_t"),
        F.expr(f"split(`{text_col}`, ' ')").alias("_ws"),
    ).select(
        "doc_id",
        "_ws",
        F.expr(
            f"CAST(CASE WHEN {keep} THEN 1000000 ELSE 0 END AS BIGINT)"
        ).alias("y"),
    ).select(
        "doc_id",
        "y",
        F.lit(1000000).cast("bigint").alias("x0"),
        F.expr("least(size(_ws), 200) * CAST(5000 AS BIGINT)").alias("x1"),
        F.expr(
            "least((aggregate(_ws, CAST(0 AS BIGINT), (a, w) -> a + length(w))"
            " * 1000000) div greatest(size(_ws), 1), CAST(10000000 AS BIGINT))"
            " div 10"
        ).alias("x2"),
        F.expr(
            f"(size(filter(_ws, w -> w IN ({stop_in}))) * CAST(1000000 AS BIGINT))"
            " div greatest(size(_ws), 1)"
        ).alias("x3"),
        F.expr(
            f"least(size(filter(_ws, w -> w IN ({stop_in}))), 20)"
            " * CAST(50000 AS BIGINT)"
        ).alias("x4"),
    )


_Z_EXPR = (
    "(w0*x0 + w1*x1 + w2*x2 + w3*x3 + w4*x4) div CAST(1000000 AS BIGINT)"
)
_SIG_EXPR = (
    "least(CAST(1000000 AS BIGINT), greatest(CAST(0 AS BIGINT),"
    f" 500000 + ({_Z_EXPR}) div 4))"
)


def _centered_features(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Centered, rescaled, eager-checkpointed feature frame shared by the
    fit and the calibration audit. Centering on the corpus mean (1-row
    broadcast) is what lets discriminative features earn opposite-signed
    weights — with all-positive features every gradient component shares
    the label mean's sign and the probe degenerates to the majority
    class. The ×4 rescale equalizes descent speed against the 10⁶ bias
    input (raw spans are ~±2.5·10⁵ micros)."""
    raw = probe_features(docs, text_col, id_col)
    means = raw.agg(
        *[
            F.expr(f"sum(x{f}) div count(1)").alias(f"m{f}")
            for f in range(1, 5)
        ]
    )
    return (
        raw.crossJoin(F.broadcast(means))
        .select(
            "doc_id",
            "y",
            "x0",
            *[F.expr(f"(x{f} - m{f}) * 4").alias(f"x{f}") for f in range(1, 5)],
        )
        .localCheckpoint(eager=True)
    )


def _zero_weights(feats: DataFrame) -> DataFrame:
    return feats.sparkSession.range(1).select(
        *[F.lit(0).cast("bigint").alias(f"w{f}") for f in range(5)]
    )


def _gd_step(feats: DataFrame, nf: DataFrame, w: DataFrame) -> DataFrame:
    """One full-batch GD step: one scan of ``feats`` map-side-combined to a
    5-number gradient, broadcast back into the 1-row weight frame (η = ½);
    eager checkpoint per round (the shared iterative-loop idiom)."""
    joined = feats.crossJoin(F.broadcast(w)).withColumn("sig", F.expr(_SIG_EXPR))
    grad = joined.agg(
        *[
            F.sum(
                F.expr(f"((sig - y) * x{f}) div CAST(1000000 AS BIGINT)")
            ).alias(f"g{f}")
            for f in range(5)
        ]
    )
    return (
        w.crossJoin(F.broadcast(grad))
        .crossJoin(F.broadcast(nf))
        .select(
            *[
                F.expr(f"w{f} - (g{f} div n) div 2").alias(f"w{f}")
                for f in range(5)
            ]
        )
        .localCheckpoint(eager=True)
    )


def logistic_probe_fit(
    docs: DataFrame,
    iterations: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fit the linear probe by ``iterations`` full-batch gradient steps
    (η = ½) and report the weight trajectory with post-update training
    accuracy:

      z_i   = (Σ_f w_f·x_if) div 10⁶                 (micros)
      σ_i   = clamp(500000 + z_i div 4, 0, 10⁶)      (hard sigmoid)
      c_if  = ((σ_i − y_i)·x_if) div 10⁶             (per-row, quantized)
      g_f   = (Σ_i c_if) div n                       (micros)
      w_f  −= g_f div 2

    Returns (iteration, feature, weight_micros, train_acc_micros) — one
    row per (iteration 1..T, feature), accuracy evaluated with that
    iteration's updated weights at the 500000 threshold.
    """
    feats = _centered_features(docs, text_col, id_col)
    nf = feats.agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    sig_expr = _SIG_EXPR

    w = _zero_weights(feats)
    out = []
    for it in range(1, iterations + 1):
        w = _gd_step(feats, nf, w)
        acc = (
            feats.crossJoin(F.broadcast(w))
            .withColumn("sig", F.expr(sig_expr))
            .agg(
                F.sum(
                    F.expr(
                        "CASE WHEN (sig >= 500000) = (y = 1000000)"
                        " THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END"
                    )
                ).alias("n_right")
            )
            .crossJoin(F.broadcast(nf))
            .select(
                F.expr("(n_right * CAST(1000000 AS BIGINT)) div n").alias(
                    "train_acc_micros"
                )
            )
        )
        row = w.crossJoin(F.broadcast(acc)).select(
            F.lit(it).cast("int").alias("iteration"),
            F.expr(
                "stack(5, "
                + ", ".join(f"'{name}', w{f}" for f, name in enumerate(_FEATS))
                + ") AS (feature, weight_micros)"
            ),
            "train_acc_micros",
        )
        out.append(row)
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res.select("iteration", "feature", "weight_micros", "train_acc_micros")


def probe_calibration(
    docs: DataFrame,
    iterations: int = 5,
    buckets: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reliability diagram + expected-calibration-error decomposition for
    the fitted probe — the audit a curation pipeline runs before using the
    probe's scores as keep-probabilities (a miscalibrated gate silently
    shifts the kept-data distribution even at the "right" threshold).

    Fits the same ``iterations``-step probe as ``logistic_probe_fit``,
    scores the corpus with the FINAL weights, buckets the hard-sigmoid
    scores into ``buckets`` equal-width probability bins, and reports per
    bin: doc count, mean predicted probability, observed keep rate, the
    absolute gap, and the bin's contribution to ECE
    (``n_b·|gap_b| div n``) — all exact integer micros, so the oracle
    replays the full fit + binning byte-identically.

    Scale: the fit is T one-scan gradient steps over the checkpointed
    feature frame; calibration adds ONE more scan reduced to ≤ ``buckets``
    rows (map-side combine) — nothing beyond the probe's own cost.
    """
    feats = _centered_features(docs, text_col, id_col)
    nf = feats.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = _zero_weights(feats)
    for _ in range(iterations):
        w = _gd_step(feats, nf, w)
    width = 1000000 // buckets
    scored = feats.crossJoin(F.broadcast(w)).withColumn("sig", F.expr(_SIG_EXPR))
    agg = (
        scored.select(
            F.expr(f"cast(least(sig div {width}, {buckets - 1}) as int)").alias(
                "bucket"
            ),
            "sig",
            "y",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr("sum(sig) div count(1)").alias("mean_pred_micros"),
            F.expr("sum(y) div count(1)").alias("obs_rate_micros"),
        )
    )
    return agg.crossJoin(F.broadcast(nf)).select(
        "bucket",
        "n_docs",
        "mean_pred_micros",
        "obs_rate_micros",
        F.expr("abs(mean_pred_micros - obs_rate_micros)").alias("abs_gap_micros"),
        F.expr(
            "(n_docs * abs(mean_pred_micros - obs_rate_micros)) div n"
        ).alias("ece_contrib_micros"),
    )


def probe_conformal_gate(
    docs: DataFrame,
    iterations: int = 5,
    alphas_micros: tuple = (100000, 50000),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split-conformal calibration of the quality probe as a keep gate
    with a finite-sample miss-rate guarantee (Vovk et al.; split-conformal
    as in Lei et al. 2018): fit the probe on the TRAIN split only, take
    the nonconformity score ``10⁶ − sig`` of every TRUE-keep doc in the
    held-out VAL split, and set the keep threshold to the
    ``⌈(n_cal+1)(1−α)⌉``-th smallest calibration score — by
    exchangeability, at most an α fraction of future true-keep docs fall
    below the resulting ``sig`` threshold. The TEST split then reports
    the realized coverage. This is how a curation pipeline turns "probe
    score ≥ 0.5" folklore into "misses at most 5% of good docs, with a
    proof" before gating 100 TB.

    Splits are the repo's hash-keyed 3-way assignment (``split42`` seed:
    test < 25/256, val < 50/256, train otherwise) — engine-invariant and
    leakage-free. Fit, centering means, and the gradient steps see TRAIN
    rows only; VAL and TEST are scored with TRAIN means + final weights.

    Exactness: the order statistic is exact — distinct calibration scores
    with counts, cumulative counts via a broadcast non-equi self-join
    over the (bounded, score-valued) distinct table — no keyless window,
    no sort; k_α = ((n_cal+1)·(10⁶−α) + 10⁶−1) div 10⁶; if k_α > n_cal
    the conformal threshold is +∞ (τ sentinel 1000001 → every doc kept),
    the textbook small-sample degeneracy.

    Returns one row per α: (alpha_micros, n_cal, k_order, tau_micros,
    threshold_sig_micros, n_test_pos, n_test_pos_kept, coverage_micros,
    n_test, n_test_kept, keep_rate_micros).

    Scale: the fit is T one-scan GD steps over TRAIN; scoring adds one
    scan; the calibration arithmetic lives on distinct-score-scale rows;
    TEST evaluation is one aggregate with per-α conditional sums.
    """
    from .sampling import split_column

    raw = probe_features(docs, text_col, id_col).withColumn(
        "split", split_column("doc_id")
    )
    means = raw.filter(F.col("split") == "train").agg(
        *[
            F.expr(f"sum(x{f}) div count(1)").alias(f"m{f}")
            for f in range(1, 5)
        ]
    )
    feats_all = (
        raw.crossJoin(F.broadcast(means))
        .select(
            "doc_id",
            "split",
            "y",
            "x0",
            *[F.expr(f"(x{f} - m{f}) * 4").alias(f"x{f}") for f in range(1, 5)],
        )
        .localCheckpoint(eager=True)
    )
    train = feats_all.filter(F.col("split") == "train")
    nf = train.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = _zero_weights(feats_all)
    for _ in range(iterations):
        w = _gd_step(train, nf, w)

    scored = feats_all.crossJoin(F.broadcast(w)).withColumn(
        "sig", F.expr(_SIG_EXPR)
    )
    cal = scored.filter(
        (F.col("split") == "val") & (F.col("y") == 1000000)
    ).select(F.expr("cast(1000000 as bigint) - sig").alias("v"))
    ncal = cal.agg(F.count(F.lit(1)).cast("bigint").alias("n_cal"))
    cnt = cal.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    # cumulative count over distinct score values: broadcast non-equi
    # self-join (distinct-score-scale), not a keyless window
    cum = (
        cnt.alias("a")
        .join(F.broadcast(cnt.alias("b")), F.expr("b.v <= a.v"))
        .groupBy(F.col("a.v").alias("v"))
        .agg(F.sum("b.c").cast("bigint").alias("cum"))
    )
    taus = None
    for alpha in alphas_micros:
        k = ncal.select(
            F.lit(alpha).cast("bigint").alias("alpha_micros"),
            "n_cal",
            F.expr(
                f"((n_cal + 1) * cast({1000000 - alpha} as bigint)"
                " + 999999) div 1000000"
            ).alias("k_order"),
        )
        t = (
            k.join(F.broadcast(cum), F.expr("cum >= k_order"), "left")
            .groupBy("alpha_micros", "n_cal", "k_order")
            .agg(F.min("v").alias("tau_raw"))
            .select(
                "alpha_micros",
                "n_cal",
                "k_order",
                # k > n_cal (tiny calibration set) -> no row reaches k ->
                # +inf threshold, everything kept
                F.expr(
                    "case when k_order > n_cal then cast(1000001 as bigint)"
                    " else tau_raw end"
                ).alias("tau_micros"),
            )
        )
        taus = t if taus is None else taus.unionByName(t)
    test = scored.filter(F.col("split") == "test").select("y", "sig")
    out = (
        test.crossJoin(F.broadcast(taus))
        .withColumn(
            "kept", F.expr("sig >= cast(1000000 as bigint) - tau_micros")
        )
        .groupBy("alpha_micros", "n_cal", "k_order", "tau_micros")
        .agg(
            F.sum(F.expr("if(y = 1000000, 1, 0)")).cast("bigint").alias("n_test_pos"),
            F.sum(F.expr("if(y = 1000000 and kept, 1, 0)"))
            .cast("bigint")
            .alias("n_test_pos_kept"),
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(F.expr("if(kept, 1, 0)")).cast("bigint").alias("n_test_kept"),
        )
    )
    return out.select(
        "alpha_micros",
        "n_cal",
        "k_order",
        "tau_micros",
        F.expr("cast(1000000 as bigint) - tau_micros").alias("threshold_sig_micros"),
        "n_test_pos",
        "n_test_pos_kept",
        F.expr(
            "(n_test_pos_kept * 1000000) div greatest(n_test_pos, 1)"
        ).alias("coverage_micros"),
        "n_test",
        "n_test_kept",
        F.expr("(n_test_kept * 1000000) div greatest(n_test, 1)").alias(
            "keep_rate_micros"
        ),
    )
