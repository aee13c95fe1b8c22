"""Round-13 operator tests: mSPRT sequential A/B readout and the
retention/VACUUM planner."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _arm(uid: int, seed: str = "exp42") -> str:
    return "t" if int(hashlib.md5(f"{seed}:{uid}".encode()).hexdigest()[0], 16) < 8 else "c"


# ---------------------------------------------------------------------------
# msprt_sequential_ab
# ---------------------------------------------------------------------------


def _stage_events(spark, values_by_arm, n_users=4000, n_days=6):
    rows = []
    for i in range(n_users):
        arm = _arm(i)
        day = 1 + (i % n_days)
        rows.append((i, f"2024-03-{day:02d} 12:00:00", values_by_arm[arm]))
    return spark.createDataFrame(
        rows, "user_id bigint, ts string, value double"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")


def test_msprt_crosses_under_a_real_effect(spark):
    """Closed-form expected crossing: treatment value 10, control 5 →
    δ̂ = 5 exactly at every look; with τ=0.5 and the pooled variance
    (cross-arm split of two constants, ≈6.25) the LLR second term is
    n_eff·δ²-driven and blows past ln(1/α)=2.9957 within the first look at
    hundreds of users. The LAST look (most data) must be crossed and δ̂
    must read 5.0 exactly in micros."""
    from adventureworkslakehousepoc_spark.operators.experiments import (
        msprt_sequential_ab,
    )

    ev = _stage_events(spark, {"t": 10.0, "c": 5.0})
    out = sorted(msprt_sequential_ab(ev).collect(), key=lambda r: r.day)
    assert len(out) == 6
    last = out[-1]
    assert last.delta_micros == 5_000_000, last
    assert last.crossed is True
    assert any(r.crossed for r in out[:2]), "effect this big must cross early"
    # cumulative looks: arm counts nondecreasing over days
    tns = [r.n_treatment for r in out]
    assert tns == sorted(tns)


def test_msprt_never_crosses_under_the_null(spark):
    """Zero effect (identical constant outcome in both arms): δ̂ = 0 at
    every look, the LLR is the pure mixture-shrinkage term (≤ 0), and no
    look may cross — the anytime-valid guarantee's sanity anchor."""
    from adventureworkslakehousepoc_spark.operators.experiments import (
        msprt_sequential_ab,
    )

    ev = _stage_events(spark, {"t": 7.0, "c": 7.0})
    out = msprt_sequential_ab(ev).collect()
    assert len(out) == 6
    for r in out:
        assert r.delta_micros == 0, r
        assert r.log_lambda_micros <= 0, r
        assert r.crossed is False, r


def test_msprt_single_arm_look_reports_null_stats(spark):
    """A look where only one arm has data yet cannot estimate a difference:
    statistics are NULL and crossed is False (and the oracle mirrors the
    same guard)."""
    from adventureworkslakehousepoc_spark.operators.experiments import (
        msprt_sequential_ab,
    )

    # find a treatment-armed and a control-armed uid deterministically
    t_uid = next(i for i in range(100) if _arm(i) == "t")
    c_uid = next(i for i in range(100) if _arm(i) == "c")
    rows = [
        (t_uid, "2024-03-01 00:00:00", 1.0),  # day 1: treatment only
        (t_uid, "2024-03-02 00:00:00", 1.0),  # day 2: both
        (c_uid, "2024-03-02 00:00:00", 2.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, ts string, value double"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    out = {str(r.day): r for r in msprt_sequential_ab(ev).collect()}
    d1 = out["2024-03-01"]
    assert d1.delta_micros is None and d1.log_lambda_micros is None
    assert d1.crossed is False
    d2 = out["2024-03-02"]
    assert d2.delta_micros is not None


# ---------------------------------------------------------------------------
# vacuum_plan
# ---------------------------------------------------------------------------


def _stage_log(spark, rows):
    """rows: (key, payload, change_type, version)"""
    return spark.createDataFrame(
        rows, "k bigint, payload string, _change_type string, _commit_version bigint"
    )


def test_vacuum_plan_row_classification(spark):
    """Each classification rule, one key per rule:
    k=1 insert superseded by v2 postimage  -> insert reclaimable, post live
    k=2 insert only                        -> live
    k=3 insert then v3 (post-horizon) del  -> insert live (horizon state),
                                              delete live (inside retention)
    k=4 insert then v2 delete (<= horizon) -> BOTH reclaimable (key absent
                                              at the horizon snapshot)
    preimages <= horizon always reclaimable."""
    from adventureworkslakehousepoc_spark.operators.maintenance import vacuum_plan

    log = _stage_log(
        spark,
        [
            (1, "a", "insert", 1),
            (1, "a", "update_preimage", 2),
            (1, "A", "update_postimage", 2),
            (2, "b", "insert", 1),
            (3, "c", "insert", 1),
            (3, "c", "delete", 3),
            (4, "d", "insert", 1),
            (4, "d", "delete", 2),
        ],
    )
    out = {
        (r.file_version, r.k): r
        for r in vacuum_plan(
            log,
            key_cols=["k"],
            horizon_version=2,
            file_cols=[F.col("_commit_version").alias("file_version"), F.col("k")],
            row_bytes=F.length("payload"),
        ).collect()
    }
    assert out[(1, 1)].action == "delete"          # superseded insert
    # the (version=2, k=1) file holds the preimage (reclaimable) and the
    # postimage (horizon state, live) -> mixed, must rewrite
    assert out[(2, 1)].n_rows == 2
    assert out[(2, 1)].n_reclaimable == 1
    assert out[(2, 1)].action == "rewrite"
    assert out[(1, 2)].action == "keep"            # live lone insert
    assert out[(1, 3)].action == "keep"            # horizon state for k=3
    assert out[(3, 3)].action == "keep"            # post-horizon delete live
    assert out[(1, 4)].action == "delete"          # key absent at horizon
    assert out[(2, 4)].action == "delete"          # the <=H delete marker too


def test_vacuum_plan_bytes_and_action_consistency(spark):
    """bytes_reclaimable <= bytes_total, and action agrees with the row
    counts on every file."""
    from adventureworkslakehousepoc_spark.operators.maintenance import vacuum_plan

    log = _stage_log(
        spark,
        [(i, "x" * (1 + i % 5), "insert", 1) for i in range(50)]
        + [(i, "y" * (1 + i % 5), "update_postimage", 2) for i in range(0, 50, 3)],
    )
    out = vacuum_plan(
        log,
        key_cols=["k"],
        horizon_version=2,
        file_cols=[F.col("_commit_version").alias("file_version"), (F.col("k") % 4).alias("b")],
        row_bytes=F.length("payload"),
    ).collect()
    assert out
    for r in out:
        assert 0 <= r.n_reclaimable <= r.n_rows
        assert 0 <= r.bytes_reclaimable <= r.bytes_total
        expect = (
            "delete"
            if r.n_reclaimable == r.n_rows
            else ("keep" if r.n_reclaimable == 0 else "rewrite")
        )
        assert r.action == expect, r


# ---------------------------------------------------------------------------
# streaming expectations
# ---------------------------------------------------------------------------


def test_streaming_expectations_fail_policy_aborts_stream(spark, tmp_path):
    """expect_or_fail inside a streaming plan: a violating row must abort
    the stream (ingest-gate behavior), not silently drop or pass."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as em

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, -3], type=pa.int64()),
            "text": ["good doc here", "another fine doc", "bad id doc"],
            "lang": ["en", "en", "en"],
            "source": ["s1", "s1", "s2"],
            "n_chars": pa.array([200, 300, 400], type=pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    q = em.queries()["st_expectations_gate"]
    with pytest.raises(Exception, match="nonnegative_id"):
        q(spark, str(tmp_path)).collect()


def test_streaming_expectations_gate_matches_batch_filter(spark, tmp_path):
    """Drop constraints inside the stream admit exactly the rows the batch
    filter would — NULL lang and short docs dropped, clean rows kept."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as em

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": ["keep me", "short", "no lang", "keep too"],
            "lang": ["en", "en", None, "de"],
            "source": ["s1", "s1", "s2", "s2"],
            "n_chars": pa.array([150, 50, 500, 250], type=pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    q = em.queries()["st_expectations_gate"]
    out = {r.source: (r.n_docs, r.total_chars) for r in q(spark, str(tmp_path)).collect()}
    assert out == {"s1": (1, 150), "s2": (1, 250)}, out


# ---------------------------------------------------------------------------
# dp_clipped_noisy_sums
# ---------------------------------------------------------------------------


def test_dp_clipped_sums_bound_single_user_influence(spark):
    """The DP property the clip exists for: adding/removing ONE user moves
    sum_clipped by at most the clip bound, no matter how extreme that
    user's raw contribution is — and the noise draw is deterministic per
    group key (independent of the data), so the release is replayable."""
    from adventureworkslakehousepoc_spark.operators.privacy import (
        dp_clipped_noisy_sums,
    )

    base_rows = [(u, "g", 1.0) for u in range(50)]
    whale = [(999, "g", 1.0e6)]  # raw contribution 1e6, clip 2.0

    def release(rows):
        df = spark.createDataFrame(rows, "user_id bigint, event_type string, value double")
        (r,) = dp_clipped_noisy_sums(
            df, ["event_type"], "user_id", "value", clip_micros=2_000_000
        ).collect()
        return r

    r_base = release(base_rows)
    r_whale = release(base_rows + whale)
    assert r_base.sum_clipped == 50.0
    assert r_whale.sum_clipped == 52.0, "whale clamps to exactly the clip bound"
    # deterministic noise: same group key -> identical noise offset
    assert abs(
        (r_whale.sum_noisy - r_whale.sum_clipped)
        - (r_base.sum_noisy - r_base.sum_clipped)
    ) < 1e-9
    # noise scale is clip/eps: halving the clip halves the noise exactly
    (r_half,) = (
        dp_clipped_noisy_sums(
            spark.createDataFrame(base_rows, "user_id bigint, event_type string, value double"),
            ["event_type"], "user_id", "value", clip_micros=1_000_000,
        ).collect()
    )
    n_full = r_base.sum_noisy - r_base.sum_clipped
    n_half = r_half.sum_noisy - r_half.sum_clipped
    assert abs(n_full - 2 * n_half) < 1e-5, (n_full, n_half)
