"""Temporal weighting operators: recency-decayed aggregates.

Feature stores and curriculum samplers weight interactions by recency —
an event from yesterday counts more than one from last quarter. The decay
here is the half-life form ``value · 2^(−age/half_life)``, restricted to
*whole half-life steps* so the decay factor is an exact binary power:
``2^(−k)`` for integer ``k`` is representable exactly in an IEEE double, the
per-row product rounds identically in every engine, and the micro-unit
quantized per-row contribution integer-sums without order sensitivity —
the same exactness discipline the rest of the repo uses for cross-engine
hash verification.

Scale posture: the reference instant is a 1-row broadcast (max event time);
the decayed sum is one partial-aggregated groupBy on the entity key. No
windows, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["time_decay_scores", "daily_anomaly_flags", "seasonal_naive_eval", "changepoint_cusum_daily", "kaplan_meier_lifetimes"]


def time_decay_scores(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_days: int = 7,
) -> DataFrame:
    """Per-key recency-decayed engagement: ``Σ value · 2^(−steps)`` where
    ``steps = age_in_days ÷ half_life_days`` (integer division) and age is
    measured back from the newest event in the input (so the operator is a
    pure function of the data — reproducible across runs and engines).

    Returns ``(key, n_events, decayed_value_micros, newest_age_days)`` with
    the decayed sum quantized per-row to integer micro-units before summing.
    """
    ref = events.agg(F.max(F.to_date(ts_col)).alias("ref_day"))
    aged = events.crossJoin(F.broadcast(ref)).select(
        F.col(key_col).alias("key"),
        F.datediff(F.col("ref_day"), F.to_date(ts_col)).alias("age_days"),
        F.col(value_col).alias("v"),
    )
    # integer floor-division (ages are non-negative) — NOT a double cast,
    # which truncates in Spark but rounds half-even in DuckDB
    steps = F.expr(f"age_days div {int(half_life_days)}")
    # v * 1e6 is one IEEE-rounded multiply (identical everywhere); the
    # division by 2^steps is exact scaling; floor(+0.5) quantizes per-row
    contrib = F.floor(
        F.col("v") * F.lit(1000000.0) / F.pow(F.lit(2.0), steps) + F.lit(0.5)
    ).cast("bigint")
    return (
        aged.withColumn("c_u", contrib)
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("c_u").cast("bigint").alias("decayed_value_micros"),
            F.min("age_days").cast("int").alias("newest_age_days"),
        )
        .withColumnRenamed("key", key_col)
    )


def daily_anomaly_flags(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    trailing_days: int = 7,
    z_threshold: int = 3,
    min_history: int = 4,
) -> DataFrame:
    """Metric-stream anomaly detection: flag days whose daily total deviates
    more than ``z_threshold`` trailing standard deviations from the trailing
    ``trailing_days``-day mean of its series — the ops monitor a pipeline
    runs over its own ingest/quality counters.

    Two-stage shape chosen FOR scale: stage 1 collapses the raw event
    stream to one row per (series, day) with a partial-aggregated groupBy
    (the only corpus-scale shuffle — map-side combine does most of the
    work); stage 2's trailing window runs on the aggregate-scale series
    table (|series| · |days| rows), so the low-cardinality window partition
    key is harmless — the quadratic-ish window never touches raw events.

    Exactness: daily totals are per-row micro-quantized before integer
    summing (order-insensitive); the z test compares
    ``(n·x − S)² > z²·(n·Q − S²)`` in pure bigint — the algebraic expansion
    of ``(x − μ)² > z²·σ²`` that needs no division, no sqrt, no floats.
    With day totals ≤ ~10^9 micro-units and n ≤ 7, every term stays far
    inside int64.
    """
    z2 = int(z_threshold) * int(z_threshold)
    daily = (
        events.select(
            F.col(series_col).alias("series"),
            F.to_date(ts_col).alias("day"),
            F.floor(F.col(value_col) * 1000 + F.lit(0.5)).cast("bigint").alias("v_milli"),
        )
        .groupBy("series", "day")
        .agg(
            F.sum("v_milli").cast("bigint").alias("day_total_millis"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
    from pyspark.sql import Window

    # integer day index as the RANGE key — a timestamp/epoch key would drag
    # session-timezone and microsecond-truncation semantics into frame
    # membership (the exact cross-engine drift the r5 sf0.1 sweep caught in
    # w4); datediff from a fixed epoch is the same integer in every engine
    daily = daily.withColumn("day_idx", F.datediff("day", F.lit("1970-01-01")))
    w = (
        Window.partitionBy("series")
        .orderBy("day_idx")
        .rangeBetween(-int(trailing_days), -1)
    )
    stats = daily.select(
        "series",
        "day",
        "day_total_millis",
        "n_events",
        F.count("day_total_millis").over(w).cast("bigint").alias("n_hist"),
        F.sum("day_total_millis").over(w).cast("bigint").alias("s_hist"),
        F.sum(F.expr("day_total_millis * day_total_millis")).over(w).cast("bigint").alias("q_hist"),
    )
    dev = F.expr("n_hist * day_total_millis - s_hist")
    var_n2 = F.expr("n_hist * q_hist - s_hist * s_hist")  # n²·variance
    return stats.select(
        "series",
        "day",
        "day_total_millis",
        "n_events",
        "n_hist",
        F.coalesce("s_hist", F.lit(0)).cast("bigint").alias("trailing_sum_millis"),
        (
            (F.col("n_hist") >= min_history) & (dev * dev > F.lit(z2) * var_n2)
        ).alias("is_anomaly"),
    )


def seasonal_naive_eval(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    season_days: int = 7,
) -> DataFrame:
    """Forecast-baseline evaluation: score the seasonal-naive predictor
    (tomorrow = same weekday last week) against realized daily totals — the
    sanity floor every forecasting pipeline reports before anything
    fancier. Per series: evaluated-day count, MAE in millis and WAPE in
    micros (Σ|err| / Σ|actual| — the weighted form, immune to zero-days
    that explode plain MAPE), all in exact integer arithmetic.

    The forecast lookup joins the daily-total table to itself on
    (series, day_idx − season_days) — gap-safe (a missing prior week drops
    the day from evaluation, unlike a lag() over rows) and co-keyed, so at
    scale both sides share one series-keyed partitioning of an
    aggregate-scale table; raw events are collapsed by the same
    partial-aggregated pass as daily_anomaly_flags."""
    daily = (
        events.select(
            F.col(series_col).alias("series"),
            F.to_date(ts_col).alias("day"),
            F.floor(F.col(value_col) * 1000 + F.lit(0.5)).cast("bigint").alias("v_milli"),
        )
        .groupBy("series", "day")
        .agg(F.sum("v_milli").cast("bigint").alias("total_millis"))
        .withColumn("day_idx", F.datediff("day", F.lit("1970-01-01")))
    )
    actual = daily.select("series", "day_idx", F.col("total_millis").alias("actual"))
    fc = daily.select(
        "series",
        (F.col("day_idx") + season_days).alias("day_idx"),
        F.col("total_millis").alias("forecast"),
    )
    scored = actual.join(fc, ["series", "day_idx"]).select(
        "series",
        F.expr("abs(actual - forecast)").cast("bigint").alias("abs_err"),
        F.expr("abs(actual)").cast("bigint").alias("abs_actual"),
    )
    return scored.groupBy("series").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days_evaluated"),
        F.expr("sum(abs_err) div count(1)").cast("bigint").alias("mae_millis"),
        F.expr("(sum(abs_err) * 1000000) div sum(abs_actual)")
        .cast("bigint")
        .alias("wape_micros"),
    )


def changepoint_cusum_daily(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Offline changepoint location by CUSUM: for each series, the day
    where the cumulative deviation from the series mean peaks — where the
    level shift most plausibly happened (the retrospective complement of
    the online z-score monitor). To stay in exact integers the statistic is
    scaled by n: ``C_t = n·prefix_t − t·S`` (≡ n²·(classic CUSUM)), which
    preserves the argmax; ties resolve to the earliest day.

    Shapes: one partial-aggregated pass to daily totals, one ordered
    prefix-sum window per series on the aggregate-scale table, one grouped
    argmax via min-struct."""
    daily = (
        events.select(
            F.col(series_col).alias("series"),
            F.to_date(ts_col).alias("day"),
            F.floor(F.col(value_col) * 1000 + F.lit(0.5)).cast("bigint").alias("v_milli"),
        )
        .groupBy("series", "day")
        .agg(F.sum("v_milli").cast("bigint").alias("total_millis"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("series").orderBy("day")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored = daily.select(
        "series",
        "day",
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
        F.sum("total_millis").over(wall).cast("bigint").alias("s"),
        F.sum("total_millis").over(wcum).cast("bigint").alias("prefix"),
        F.row_number().over(w).cast("bigint").alias("t"),
    ).select(
        "series",
        "day",
        "n",
        F.expr("n * prefix - t * s").cast("bigint").alias("c_scaled"),
    )
    best = scored.groupBy("series").agg(
        F.max(
            F.struct(
                F.abs("c_scaled").alias("mag"),
                F.expr("-datediff(day, date'1970-01-01')").alias("neg_day"),
                F.col("day").alias("day"),
                F.col("c_scaled").alias("c"),
                F.col("n").alias("n"),
            )
        ).alias("m")
    )
    return best.select(
        "series",
        F.col("m.day").alias("changepoint_day"),
        F.col("m.mag").cast("bigint").alias("max_abs_cusum_scaled"),
        F.col("m.c").cast("bigint").alias("cusum_scaled_at_peak"),
        F.col("m.n").cast("bigint").alias("n_days"),
    )


def kaplan_meier_lifetimes(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_horizon_days: int = 7,
) -> DataFrame:
    """Kaplan-Meier survival estimate over per-user activity lifetimes —
    the standard churn/retention curve, computed fully distributed.

    Per user: lifetime = days between first and last event. A user whose
    last event falls within ``censor_horizon_days`` of the corpus's last
    observed day is CENSORED (still alive — their true lifetime is only
    known to be >= the observed one); everyone else is an observed churn.

    The estimator at each distinct lifetime t:
        n(t) = users with lifetime >= t   (censored-at-t still at risk)
        d(t) = churns observed at t
        S(t) = prod over t' <= t of (1 - d(t')/n(t'))

    The product is carried in LOG space as an exact integer: per-step
    floor(ln(1 - d/n) * 1e9) summed exactly — bit-identical in any engine,
    while a float product would drift with accumulation order. A step
    where everyone at risk churns (d = n) floors the term at ln(1e-12) so
    S collapses to 0 without NULL/-inf plumbing. ``survival_ppm``
    re-exponentiates for readability.

    Both prefix sums (at-risk depletion, cumulative log survival) run as
    broadcast non-equi self-joins over the |distinct-lifetimes| aggregate
    (bounded by the corpus day span) — a global ordered window would plan
    an Exchange SinglePartition, the exact shape the repo's plan audit
    rejects. Returns ``(lifetime_days, n_at_risk, n_churned, n_censored,
    log_survival_ppb, survival_ppm)``. Scale posture: the only big shuffle
    is the per-user groupBy; everything after runs on the tiny lifetime
    table.
    """
    per_user = events.groupBy(F.col(user_col).alias("uid")).agg(
        F.datediff(F.max(ts_col), F.min(ts_col)).alias("lifetime_days"),
        F.max(F.col(ts_col).cast("date")).alias("last_day"),
    )
    horizon = per_user.agg(
        F.date_sub(F.max("last_day"), censor_horizon_days).alias("cutoff_day")
    )
    marked = per_user.crossJoin(F.broadcast(horizon)).select(
        "lifetime_days",
        (F.col("last_day") <= F.col("cutoff_day")).cast("int").alias("churned"),
    )
    lifetimes = marked.groupBy("lifetime_days").agg(
        F.sum("churned").cast("bigint").alias("n_churned"),
        F.sum(F.lit(1) - F.col("churned")).cast("bigint").alias("n_censored"),
    )
    total = lifetimes.agg(
        F.sum(F.col("n_churned") + F.col("n_censored")).alias("n_total")
    )
    # prefix sum 1: users leaving at earlier lifetimes -> n_at_risk
    lt = lifetimes.select(
        F.col("lifetime_days").alias("t"), "n_churned", "n_censored"
    )
    risk = (
        lt.alias("cur")
        .join(
            F.broadcast(lt.alias("prev")),
            F.col("prev.t") < F.col("cur.t"),
            "left",
        )
        .groupBy(
            F.col("cur.t").alias("t"),
            F.col("cur.n_churned").alias("n_churned"),
            F.col("cur.n_censored").alias("n_censored"),
        )
        .agg(
            F.coalesce(
                F.sum(F.col("prev.n_churned") + F.col("prev.n_censored")),
                F.lit(0),
            ).alias("earlier_gone")
        )
        .crossJoin(F.broadcast(total))
        .withColumn(
            "n_at_risk",
            (F.col("n_total") - F.col("earlier_gone")).cast("bigint"),
        )
        .withColumn(
            "term_ppb",
            F.floor(
                F.log(
                    F.greatest(
                        F.lit(1e-12),
                        F.lit(1.0) - F.col("n_churned") / F.col("n_at_risk"),
                    )
                )
                * F.lit(1e9)
            ).cast("bigint"),
        )
    )
    # prefix sum 2: cumulative log survival through t (self-inclusive)
    r = risk.select("t", "n_churned", "n_censored", "n_at_risk", "term_ppb")
    surv = (
        r.alias("cur")
        .join(
            F.broadcast(r.select("t", "term_ppb").alias("prev")),
            F.col("prev.t") <= F.col("cur.t"),
        )
        .groupBy(
            F.col("cur.t").alias("lifetime_days"),
            F.col("cur.n_at_risk").alias("n_at_risk"),
            F.col("cur.n_churned").alias("n_churned"),
            F.col("cur.n_censored").alias("n_censored"),
        )
        .agg(F.sum(F.col("prev.term_ppb")).cast("bigint").alias("log_survival_ppb"))
    )
    return surv.select(
        F.col("lifetime_days").cast("int").alias("lifetime_days"),
        "n_at_risk",
        "n_churned",
        "n_censored",
        "log_survival_ppb",
        (
            F.floor(
                F.exp(F.col("log_survival_ppb") / F.lit(1e9)) * 1e6 + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("survival_ppm"),
    )
