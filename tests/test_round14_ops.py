"""Round-14 operator tests: VACUUM apply (snapshot equivalence, per-file
actions) and streaming expectation counters."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from adventureworkslakehousepoc_spark.catalog import load_tables


# ---------------------------------------------------------------------------
# vacuum_apply
# ---------------------------------------------------------------------------


def _stage_log(spark, sf_dir):
    from adventureworkslakehousepoc_spark.queries.streaming_queries import (
        _build_change_log,
    )

    return _build_change_log(spark, sf_dir)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_vacuum_apply_preserves_at_or_after_horizon_snapshots(spark, sf_dir):
    """The apply contract: every snapshot_as_of(v) for v >= horizon (and
    latest_snapshot) is IDENTICAL pre/post vacuum, while the log physically
    shrinks by exactly the planner's reclaimable row count."""
    from adventureworkslakehousepoc_spark.operators.maintenance import (
        vacuum_apply,
        vacuum_plan,
    )
    from adventureworkslakehousepoc_spark.streaming.cdf import (
        latest_snapshot,
        snapshot_as_of,
    )

    cf = _stage_log(spark, sf_dir)
    log_pre = cf.read_batch(spark)
    pre_rows = log_pre.count()
    pre = {v: _canon(snapshot_as_of(log_pre, ["c_custkey"], v)) for v in (2, 3)}
    pre_latest = _canon(latest_snapshot(log_pre, ["c_custkey"]))
    planned_reclaim = (
        vacuum_plan(
            log_pre,
            ["c_custkey"],
            2,
            file_cols=[F.col("_commit_version").alias("v")],
        )
        .agg(F.sum("n_reclaimable"))
        .collect()[0][0]
    )

    stats = vacuum_apply(spark, cf.path, ["c_custkey"], horizon_version=2)

    log_post = cf.read_batch(spark)
    assert log_post.count() == pre_rows - stats["rows_removed"]
    assert stats["rows_removed"] == planned_reclaim
    assert stats["rows_removed"] > 0
    for v in (2, 3):
        assert _canon(snapshot_as_of(log_post, ["c_custkey"], v)) == pre[v], v
    assert _canon(latest_snapshot(log_post, ["c_custkey"])) == pre_latest
    # idempotent: a second vacuum at the same horizon reclaims nothing
    stats2 = vacuum_apply(spark, cf.path, ["c_custkey"], horizon_version=2)
    assert stats2["rows_removed"] == 0
    assert stats2["deleted_files"] == 0 and stats2["rewritten_files"] == 0


def test_vacuum_apply_keep_files_untouched_and_crash_safe_swap(spark, sf_dir):
    """keep-action files must survive byte-identical (hardlink, zero data
    movement) and no .tmp/.old residue may remain after the swap."""
    import hashlib

    from adventureworkslakehousepoc_spark.operators.maintenance import (
        vacuum_apply,
    )

    cf = _stage_log(spark, sf_dir)
    # every parquet file's pre-vacuum bytes, keyed by content digest
    def digests(path):
        out = {}
        for name in os.listdir(path):
            if name.endswith(".parquet"):
                with open(os.path.join(path, name), "rb") as f:
                    out[name] = hashlib.sha256(f.read()).hexdigest()
        return out

    pre = digests(cf.path)
    stats = vacuum_apply(spark, cf.path, ["c_custkey"], horizon_version=2)
    post = digests(cf.path)
    assert stats["kept_files"] > 0
    # kept files: same name, same bytes
    carried = {n: h for n, h in post.items() if n in pre}
    assert len(carried) == stats["kept_files"]
    assert all(pre[n] == h for n, h in carried.items())
    # rewritten files are new names; deleted files are gone
    new = [n for n in post if n not in pre]
    assert len(new) == (len(post) - stats["kept_files"])
    for leftover in (".vacuum.tmp", ".old", ".vacuum.manifest.tmp"):
        assert not os.path.exists(cf.path.rstrip("/") + leftover)


# ---------------------------------------------------------------------------
# streaming expectation counters
# ---------------------------------------------------------------------------


def test_streamed_counters_equal_batch_counters(spark, sf_dir):
    """The listener-accumulated streaming audit must equal the batch
    one-pass counter query on the same data, row for row — per-batch
    partials summing to the dataset totals is the whole contract."""
    from adventureworkslakehousepoc_spark.plans.expectations import (
        Expectation,
        expectation_counters,
    )
    from adventureworkslakehousepoc_spark.streaming.quality import (
        run_gated_stream_with_counters,
    )
    from adventureworkslakehousepoc_spark.streaming.runner import stream_table

    exps = [
        Expectation("lang_present", "lang IS NOT NULL", "drop"),
        Expectation("min_length", "n_chars >= 100", "drop"),
        Expectation("nonnegative_id", "doc_id >= 0", "fail"),
    ]
    docs_stream = stream_table(
        spark, sf_dir, "documents", max_files_per_trigger=1, copies=3
    )
    _mat, streamed = run_gated_stream_with_counters(
        spark, docs_stream, exps, dataset="documents_stream"
    )
    # batch reference over the SAME (3x staged) input
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tripled = docs.unionByName(docs).unionByName(docs)
    batch = expectation_counters(tripled, exps, dataset="documents_stream")
    assert _canon(streamed) == _canon(batch)
    # enforcement really dropped the violating rows from the sink
    n_kept = _mat.count()
    n_expected = (
        tripled.filter(
            F.expr("lang IS NOT NULL") & F.expr("n_chars >= 100")
        ).count()
    )
    assert n_kept == n_expected


def test_streamed_counters_multibatch_accumulation(spark, sf_dir):
    """maxFilesPerTrigger=1 over 3 staged copies forces >=3 micro-batches;
    the listener must have accumulated across all of them (batch count
    recorded), not just the last progress event."""
    from adventureworkslakehousepoc_spark.plans.expectations import Expectation
    from adventureworkslakehousepoc_spark.streaming.quality import (
        ExpectationMetricsListener,
        observe_stream_expectations,
    )
    from adventureworkslakehousepoc_spark.streaming.runner import (
        run_available_now,
        stream_table,
    )

    exps = [Expectation("min_length", "n_chars >= 100", "keep")]
    docs = stream_table(
        spark, sf_dir, "documents", max_files_per_trigger=1, copies=3
    )
    listener = ExpectationMetricsListener("expectations:multibatch:test")
    observed = observe_stream_expectations(
        docs, exps, "expectations:multibatch:test"
    )
    spark.streams.addListener(listener)
    try:
        run_available_now(observed, "st-exp-multibatch")
    finally:
        listener.wait_terminated()
        spark.streams.removeListener(listener)
    assert listener.batches >= 3, listener.batches
    base = load_tables(spark, sf_dir, ("documents",))["documents"].count()
    assert listener.totals["n_rows"] == 3 * base


# ---------------------------------------------------------------------------
# dim-ablation arrow scorer
# ---------------------------------------------------------------------------


def test_dim_ablation_arrow_scorer_bit_identical(spark, sf_dir):
    """The Arrow fast path must reproduce the SQL-HOF reference scorer
    BIT-for-bit (np.cumsum = the same sequential left-fold as the SQL
    aggregate), not merely approximately — same rows, same recall ppm."""
    from adventureworkslakehousepoc_spark.operators.similarity import (
        dim_ablation_recall,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    arrow = _canon(dim_ablation_recall(emb, max_queries=64, scorer="arrow"))
    sql = _canon(dim_ablation_recall(emb, max_queries=64, scorer="sql"))
    assert arrow == sql
    full = [r for r in arrow if r[0] == 64]
    assert full and all(r[2] == 1_000_000 for r in full)  # full dim: recall 1


def test_dim_ablation_arrow_requires_bounded_queries(spark, sf_dir):
    from adventureworkslakehousepoc_spark.operators.similarity import (
        dim_ablation_recall,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    with pytest.raises(ValueError, match="BOUNDED"):
        dim_ablation_recall(emb, max_queries=None, scorer="arrow")
    with pytest.raises(ValueError, match="unknown scorer"):
        dim_ablation_recall(emb, scorer="gemm")


# ---------------------------------------------------------------------------
# CDF schema evolution
# ---------------------------------------------------------------------------


def test_schema_evolution_reconciliation_and_read(spark, tmp_path):
    """Add-column (old rows NULL) and int->bigint widening reconcile; an
    incompatible type pair (string vs int) raises like Delta would."""
    from adventureworkslakehousepoc_spark.streaming.cdf import (
        _widened,
        evolved_schema,
        read_batch_evolved,
    )

    p = str(tmp_path / "log")
    spark.createDataFrame([(1, 10), (2, 20)], "k bigint, v int").write.mode(
        "append"
    ).parquet(p)
    spark.createDataFrame(
        [(3, 2**40, "x")], "k bigint, v bigint, note string"
    ).write.mode("append").parquet(p)

    schema = dict(evolved_schema(p))
    assert schema == {"k": "bigint", "v": "bigint", "note": "string"}
    got = sorted(
        (r.k, r.v, r.note) for r in read_batch_evolved(spark, p).collect()
    )
    assert got == [(1, 10, None), (2, 20, None), (3, 2**40, "x")]

    assert _widened("int", "bigint") == "bigint"
    assert _widened("float", "double") == "double"
    assert _widened("string", "string") == "string"
    with pytest.raises(ValueError, match="cannot reconcile"):
        _widened("string", "int")


def test_schema_evolution_plain_reader_would_fail(spark, tmp_path):
    """The motivation pin: Spark's own parquet read of the mixed-schema log
    either drops the added column (first-footer schema) or hard-fails with
    mergeSchema — the evolved reader is the only correct path."""
    p = str(tmp_path / "log2")
    spark.createDataFrame([(1, 10)], "k bigint, v int").write.mode(
        "append"
    ).parquet(p)
    spark.createDataFrame([(2, 2**40)], "k bigint, v bigint").write.mode(
        "append"
    ).parquet(p)
    with pytest.raises(Exception, match="(?i)merge|convert|compatible"):
        spark.read.option("mergeSchema", "true").parquet(p).collect()


def test_agg_referential_quarantine_routes_orphans(spark):
    """quarantine-policy RI: orphans leave the kept relation (like drop)
    but stay addressable, tagged with the constraint name; NULL fks stay
    in the kept relation and never quarantine (MATCH SIMPLE); kept and
    quarantined partition the non-NULL-fk input disjointly."""
    import datetime as dt

    from adventureworkslakehousepoc_spark.plans.expectations import (
        expect_referential,
    )
    from adventureworkslakehousepoc_spark.plans.registry import (
        DatasetRegistry,
        PipelineContext,
    )

    reg = DatasetRegistry()

    @reg.table("dim")
    def dim(ctx):
        return ctx.read("dim_src")

    @reg.table("fact_parked")
    @expect_referential("fk_known", ["k"], "dim", ["dk"], policy="quarantine")
    def fact_parked(ctx):
        return ctx.read("fact_src")

    t = dt.datetime(2024, 1, 1)
    fact = spark.createDataFrame(
        [(1, "ok", t), (9, "orphan", t), (None, "null_fk", t)],
        "k int, v string, ts timestamp",
    )
    dim_df = spark.createDataFrame([(1,), (2,)], "dk int")
    ctx = PipelineContext(
        reg,
        spark,
        catalog_reader=lambda n: {"fact_src": fact, "dim_src": dim_df}[n],
    )
    kept = sorted(r.v for r in ctx.dataframe("fact_parked").collect())
    assert kept == ["null_fk", "ok"]
    parked = [
        (r.v, r._violated)
        for r in ctx.aggregate_quarantine("fact_parked").collect()
    ]
    assert parked == [("orphan", "fk_known")]
    # audit of the enforced relation: clean by construction
    audit = {
        r.expectation: r.n_violations
        for r in ctx.aggregate_audit("fact_parked").collect()
    }
    assert audit == {"fk_known": 0}
    # undeclared: raises
    with pytest.raises(ValueError, match="no quarantine-policy"):
        reg2 = DatasetRegistry()

        @reg2.table("plain")
        def plain(ctx2):
            return ctx2.read("fact_src")

        PipelineContext(
            reg2, spark, catalog_reader=lambda n: fact
        ).aggregate_quarantine("plain")
