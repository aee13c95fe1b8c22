"""Dataset registry / pipeline DAG tests (plans/registry.py — the DLT-layer
equivalent, SURVEY.md §3)."""

from __future__ import annotations

import os
import tempfile
import warnings

import pytest
from pyspark.sql import functions as F

from adventureworkslakehousepoc_spark.catalog import load_tables
from adventureworkslakehousepoc_spark.pipelines.medallion import medallion_context
from adventureworkslakehousepoc_spark.plans.registry import DatasetRegistry, PipelineContext


def _stream_root():
    from adventureworkslakehousepoc_spark.streaming.runner import stream_tmp_root
    import os as _os

    root = stream_tmp_root()
    _os.makedirs(root, exist_ok=True)
    return root

def test_lazy_topological_resolution(spark):
    dp = DatasetRegistry()
    order = []

    @dp.table(name="a")
    def a(ctx):
        order.append("a")
        return ctx.spark.range(3).withColumnRenamed("id", "x")

    @dp.table(name="b")
    def b(ctx):
        order.append("b")
        return ctx.read("a").withColumn("y", F.col("x") * 2)

    @dp.table(name="c")
    def c(ctx):
        order.append("c")
        return ctx.read("b").join(ctx.read("a"), "x")

    ctx = PipelineContext(dp, spark)
    df = ctx.dataframe("c")
    assert order == ["c", "b", "a"]  # lazy: pulled in dependency order
    assert df.count() == 3
    # memoized: resolving again builds nothing new
    ctx.dataframe("b")
    assert order == ["c", "b", "a"]


def test_cycle_detection(spark):
    dp = DatasetRegistry()

    @dp.table(name="x")
    def x(ctx):
        return ctx.read("y")

    @dp.table(name="y")
    def y(ctx):
        return ctx.read("x")

    with pytest.raises(ValueError, match="cycle"):
        PipelineContext(dp, spark).dataframe("x")


def test_duplicate_registration_rejected():
    dp = DatasetRegistry()

    @dp.table(name="t")
    def t1(ctx):
        return None

    with pytest.raises(ValueError, match="twice"):

        @dp.table(name="t")
        def t2(ctx):
            return None


def test_medallion_run_materializes_warehouse(spark, sf_dir):
    """End-to-end pipeline run (SURVEY.md §5.2): every silver dataset lands as
    parquet; fact_weather recomputed from the materialized warehouse matches
    the in-memory plan."""
    ctx = medallion_context(spark, sf_dir)
    wh = tempfile.mkdtemp(prefix="wh-", dir=_stream_root())
    out = ctx.run(wh, names=["dim_geo", "dim_product", "fact_sales", "fact_weather"])
    assert set(out) == {"dim_geo", "dim_product", "fact_sales", "fact_weather"}
    for name, path in out.items():
        assert os.path.isdir(path)
        materialized = spark.read.parquet(path)
        live = ctx.dataframe(name)
        assert materialized.count() == live.count(), name
        assert set(materialized.columns) == set(live.columns), name
    base = load_tables(spark, sf_dir, ("customer",))["customer"]
    assert spark.read.parquet(out["dim_geo"]).count() == base.count()


def test_partitioned_write(spark, sf_dir):
    """S8 at scale: facts partitioned by date at write time (SURVEY §4.4)."""
    import tempfile

    ctx = medallion_context(spark, sf_dir)
    wh = tempfile.mkdtemp(prefix="whp-", dir=_stream_root())
    out = ctx.run(wh, names=["fact_sales"], partition_by={"fact_sales": ["order_date"]})
    parts = sorted(
        d
        for d in os.listdir(out["fact_sales"])
        if d.startswith("order_date=") and "__HIVE_DEFAULT_PARTITION__" not in d
    )
    assert len(parts) > 1
    back = spark.read.parquet(out["fact_sales"])
    assert back.count() == ctx.dataframe("fact_sales").count()
    # partition pruning: a single-date read must reach the scan as a
    # PartitionFilter (directory-level skip), not a post-scan filter
    one = parts[0].split("=", 1)[1]
    pruned = back.filter(F.col("order_date") == one)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "order_date" in m.group(1), (
        f"date predicate did not reach the scan as a PartitionFilter:\n{plan[:800]}"
    )
    assert pruned.count() > 0
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2 and "order_date" in pf[1].split("]", 1)[0], plan[:1200]


def test_three_part_names_in_catalog(spark, sf_dir):
    """§1.1 three-level namespace: catalog.schema.table flattens through
    `qualified()` into real Spark catalog databases + tables."""
    from adventureworkslakehousepoc_spark.catalog import qualified, split_qualified

    import shutil

    name = qualified("dev_bronze", "stg_sales", "stg_customer")
    assert name == "dev_bronze__stg_sales__stg_customer"
    assert split_qualified(name) == ("dev_bronze", "stg_sales", "stg_customer")
    spark.sql("CREATE DATABASE IF NOT EXISTS dev_bronze__stg_sales")
    spark.sql("DROP TABLE IF EXISTS dev_bronze__stg_sales.stg_customer")
    # a prior interrupted run can leave the managed location behind without a
    # catalog entry — Spark refuses to reuse it (LOCATION_ALREADY_EXISTS)
    loc = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    stale = os.path.join(loc.removeprefix("file:"), "dev_bronze__stg_sales.db", "stg_customer")
    shutil.rmtree(stale, ignore_errors=True)
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    c.write.mode("overwrite").saveAsTable("dev_bronze__stg_sales.stg_customer")
    back = spark.table("dev_bronze__stg_sales.stg_customer")
    assert back.count() == c.count()
    assert "stg_customer" in [t.name for t in spark.catalog.listTables("dev_bronze__stg_sales")]


def test_registry_comments_describe(spark):
    from adventureworkslakehousepoc_spark.pipelines.medallion import build_medallion

    dp = build_medallion()
    defs = {n: dp.get(n).comment for n in dp.names()}
    assert "dim_geo" in defs and "geography" in defs["dim_geo"]
    assert all(defs[n] for n in ("dim_product", "fact_sales", "fact_weather"))


def test_malformed_csv_quarantine(spark):
    """The resilient CSV reader keeps every clean row and quarantines exactly
    the malformed lines, carrying their raw text for triage."""
    from adventureworkslakehousepoc_spark.queries.parity import (
        _CSV_ROWS,
        ensure_malformed_csv,
    )
    from adventureworkslakehousepoc_spark.sources.files import (
        read_csv_resilient,
        split_valid_corrupt,
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("station_id", T.StringType(), True),
            T.StructField("date_str", T.StringType(), True),
            T.StructField("element", T.StringType(), True),
            T.StructField("value", T.IntegerType(), True),
            T.StructField("mflag", T.StringType(), True),
            T.StructField("qflag", T.StringType(), True),
            T.StructField("sflag", T.StringType(), True),
            T.StructField("obs_time", T.StringType(), True),
        ]
    )
    valid, corrupt = split_valid_corrupt(
        read_csv_resilient(spark, ensure_malformed_csv(), schema)
    )
    assert valid.count() == len(_CSV_ROWS)
    bad = [r.raw_line for r in corrupt.collect()]
    assert len(bad) == 2
    assert any("NOT A CSV RECORD" in b for b in bad)
    assert any("not_an_int" in b for b in bad)


def test_three_part_namespace_resolves_via_real_catalog(spark, sf_dir):
    """catalog.schema.table lands on a real database + external table and is
    addressable with three-part spark_catalog SQL (reference:
    sales_aw_silver_layer_dim_customer.py:10-11 Unity-style names)."""
    import os

    from adventureworkslakehousepoc_spark.catalog import (
        read_three_part,
        register_external_table,
    )

    spark.sql("DROP TABLE IF EXISTS `dev_bronze_stg_sales`.`stg_customer`")
    two_part = register_external_table(
        spark,
        os.path.join(sf_dir, "customer.parquet"),
        "dev_bronze",
        "stg_sales",
        "stg_customer",
    )
    assert two_part == "dev_bronze_stg_sales.stg_customer"
    via_helper = read_three_part(spark, "dev_bronze", "stg_sales", "stg_customer")
    direct = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    assert via_helper.count() == direct.count()
    # full three-part SQL addressing through the session catalog
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM spark_catalog.dev_bronze_stg_sales.stg_customer"
    ).collect()[0].n
    assert n == direct.count()
    assert spark.catalog.tableExists("dev_bronze_stg_sales.stg_customer")


def test_timestamp_encoding_drift_guard(spark, tmp_path):
    """Regression tripwire for the round-3 NTZ outage: the driver may
    regenerate `events` with its ts column in any of three parquet physical
    encodings — TIMESTAMP(NANOS) (read as bigint under nanosAsLong),
    TIMESTAMP(MICROS) isAdjustedToUTC=false (reads as TIMESTAMP_NTZ), or
    TIMESTAMP(MICROS) isAdjustedToUTC=true (reads as TIMESTAMP). load_tables
    (catalog.py) must normalize ALL THREE to TimestampType with identical
    values; if the next regeneration changes encoding, this fails in one
    obvious place instead of zeroing half the correctness window."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampType

    stamps = [
        dt.datetime(2024, 5, 1, 12, 0, 0),
        dt.datetime(2024, 5, 1, 12, 0, 0, 250000),
        dt.datetime(2024, 5, 2, 23, 59, 59, 999999),
    ]
    ids = list(range(len(stamps)))
    encodings = {
        "nanos": pa.table(
            {"event_id": ids, "ts": pa.array(stamps, type=pa.timestamp("ns"))}
        ),
        "us_ntz": pa.table(
            {"event_id": ids, "ts": pa.array(stamps, type=pa.timestamp("us"))}
        ),
        "us_utc": pa.table(
            {"event_id": ids, "ts": pa.array(stamps, type=pa.timestamp("us", tz="UTC"))}
        ),
    }
    seen = {}
    for tag, tbl in encodings.items():
        d = tmp_path / tag
        d.mkdir()
        pq.write_table(tbl, d / "events.parquet", store_schema=False)
        df = load_tables(spark, str(d), ("events",))["events"]
        (ts_field,) = [f for f in df.schema.fields if f.name == "ts"]
        assert isinstance(ts_field.dataType, TimestampType), (
            f"{tag}: ts loaded as {ts_field.dataType}, want TimestampType"
        )
        seen[tag] = {r.event_id: r.ts for r in df.collect()}
    assert seen["nanos"] == seen["us_ntz"] == seen["us_utc"], (
        f"value drift across encodings: {seen}"
    )


def test_round6_driver_window_composition():
    """The driver verifies a 50-query registry prefix. Rounds 4 and 5 both
    overflowed hand-planned windows; since round 6 the order is derived
    mechanically from the row-age ledger. This asserts the derivation holds
    end-to-end: every never-driver-verified query and every changed-output
    query sits INSIDE the window, and the remainder of the registry is
    ordered stalest-first so refresh happens automatically."""
    from adventureworkslakehousepoc_spark import queries as q

    # the EFFECTIVE (self-healed) ledger — what the ordering actually uses;
    # may be ahead of the committed _row_age.py right after a driver round
    LAST_VERIFIED = q.LAST_VERIFIED

    ordered = list(q.all_queries())
    window = ordered[:q.DRIVER_WINDOW]

    never = [k for k in ordered if k not in LAST_VERIFIED]
    changed = [k for k in q._CHANGED_OUTPUT if k not in never]
    # changed-PLAN rows (r16): output-identical plan rewrites not yet
    # re-attested by a driver row run against the new plan — LIVE entries
    # only (last green row predates the round the rewrite shipped in)
    from adventureworkslakehousepoc_spark.queries._changed_plan import CHANGED_PLAN

    plan = [
        k
        for k, rnd in CHANGED_PLAN.items()
        if k in ordered
        and k not in never
        and k not in changed
        and LAST_VERIFIED.get(k, 0) < rnd
    ]
    # groups 1+2+3 must FIT the window — if this fails, the round added
    # more new/changed queries than the window can verify: stop adding.
    assert len(never) + len(changed) + len(plan) <= q.DRIVER_WINDOW, (
        f"{len(never)} never-verified + {len(changed)} changed-output "
        f"+ {len(plan)} changed-plan queries exceed the "
        f"{q.DRIVER_WINDOW}-slot driver window"
    )
    assert set(never) <= set(window), f"never-verified outside window: {set(never) - set(window)}"
    assert set(changed) <= set(window), f"changed-output outside window: {set(changed) - set(window)}"
    assert set(plan) <= set(window), f"changed-plan outside window: {set(plan) - set(window)}"
    # every CHANGED_PLAN key must exist in the registry (catch typos —
    # a misspelled entry would silently front nothing)
    assert set(CHANGED_PLAN) <= set(ordered), (
        f"CHANGED_PLAN names not in registry: {set(CHANGED_PLAN) - set(ordered)}"
    )
    # the rest is stalest-first: last-verified rounds must be non-decreasing
    rest = [k for k in ordered if k in LAST_VERIFIED and k not in changed and k not in plan]
    ages = [LAST_VERIFIED[k] for k in rest]
    assert ages == sorted(ages), "registry tail not ordered stalest-first"
    # every windowed query must carry an oracle (full hash gate, not rows-only)
    oracles = q.all_oracles()
    assert [k for k in window if k not in oracles] == []
    # ordering of queries and oracles must agree (driver zips the prefix)
    assert list(oracles)[:q.DRIVER_WINDOW] == window


def test_driver_window_schemas_are_scalar_only(spark):
    """The driver's rows-only canonicalizer sorts pandas tuples — an array/
    map/struct/binary output column crashes it (`TypeError: unhashable
    type`), which is how round 4 lost the `agg_percentiles_approx` row.
    EVERY registered query must therefore emit scalar columns only, not
    just the current 50-query window: queries past the window front the
    NEXT round's window, so a non-scalar schema there is a delayed driver
    crash. Streaming queries are excluded (building them executes streams;
    their sinks are parquet-materialized scalar relations by construction
    and each has its own oracle row)."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    offenders = {}
    for name in [n for n in qs if not n.startswith("st_")]:
        df = qs[name](spark, "/root/testdata/sf0.001")
        nonscalar = {
            f.name: f.dataType.simpleString()
            for f in df.schema.fields
            if f.dataType.simpleString().startswith(("array", "map", "struct", "binary"))
        }
        if nonscalar:
            offenders[name] = nonscalar
    assert not offenders, offenders


def test_row_age_ledger_is_current():
    """The mechanical window ordering is only correct if the ledger reflects
    the LATEST driver round. Since round 13 the registry SELF-HEALS at
    import (queries._self_heal_ledger applies newer CORRECTNESS files over
    the committed cache), so a fresh driver file can no longer leave HEAD
    red — the hard assert is on the EFFECTIVE ledger. A stale committed
    cache is downgraded to a UserWarning prompting the once-per-round
    `python scripts/row_age.py --write` persistence step (which also runs
    the DuckDB fingerprint drift detection self-healing cannot)."""
    import glob
    import re
    import warnings

    from adventureworkslakehousepoc_spark import queries as q
    from adventureworkslakehousepoc_spark.queries import _row_age

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(m.group(1))
        for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r0*(\d+)\.json$", f))
    ]
    latest = max(rounds, default=0)
    assert q.EFFECTIVE_ROUND >= latest, (
        f"self-healed ledger stuck at r{q.EFFECTIVE_ROUND} but "
        f"CORRECTNESS_r{latest:02d}.json exists — _self_heal_ledger failed "
        "to apply it"
    )
    if _row_age.GENERATED_AFTER_ROUND < latest:
        warnings.warn(
            f"committed _row_age.py cache predates r{latest} (self-healed "
            "in-memory; persist + run drift detection with "
            "`python scripts/row_age.py --write` and commit)",
            UserWarning,
            stacklevel=1,
        )


def test_self_heal_ledger_applies_newer_driver_files(tmp_path):
    """_self_heal_ledger must (1) advance LAST_VERIFIED from green rows in
    CORRECTNESS files newer than the committed cache, (2) clear changed-
    output flags attested by a green row in the NEWEST healed round only,
    (3) ignore non-green rows and unreadable files, and (4) be a no-op when
    no newer file exists."""
    import json

    from adventureworkslakehousepoc_spark import queries as q
    from adventureworkslakehousepoc_spark.queries import _row_age

    gen_after = _row_age.GENERATED_AFTER_ROUND
    committed_changed = tuple(getattr(_row_age, "CHANGED_OUTPUT", ()))

    # (4) empty repo dir → exactly the committed cache
    last, changed, rnd = q._self_heal_ledger(str(tmp_path))
    assert last == dict(_row_age.LAST_VERIFIED)
    assert changed == committed_changed
    assert rnd == gen_after

    # stage two newer rounds: N+1 greens "alpha" (and a red "beta"),
    # N+2 greens "beta" plus a rows-only (hash null) "gamma"
    def write(rnd, rows):
        with open(tmp_path / f"CORRECTNESS_r{rnd:02d}.json", "w") as f:
            json.dump(rows, f)

    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    write(gen_after + 1, {"alpha": green,
                          "beta": {**green, "rows_match": False}})
    write(gen_after + 2, {"beta": green,
                          "gamma": {**green, "hash_match": None}})
    # an older file must be ignored even if present
    write(gen_after, {"stale_row": green})
    # a truncated file must not abort healing
    (tmp_path / f"CORRECTNESS_r{gen_after + 3:02d}.json").write_text("{trunc")

    last, changed, rnd = q._self_heal_ledger(str(tmp_path))
    assert rnd == gen_after + 2
    assert last["alpha"] == gen_after + 1
    assert last["beta"] == gen_after + 2       # red in N+1, green in N+2
    assert last["gamma"] == gen_after + 2      # rows-only counts as green
    assert "stale_row" not in last or last.get("stale_row") != gen_after

    # (2) attestation: flags clear only for queries green in the NEWEST round
    orig = getattr(_row_age, "CHANGED_OUTPUT", ())
    try:
        _row_age.CHANGED_OUTPUT = ("alpha", "beta")
        last, changed, rnd = q._self_heal_ledger(str(tmp_path))
        assert "beta" not in changed, "green in newest round must attest"
        assert "alpha" in changed, "green in an OLDER healed round must NOT attest"
    finally:
        _row_age.CHANGED_OUTPUT = orig


def test_scratch_dirs_swept_at_interpreter_exit(tmp_path):
    """scratch_dir entries must be removed when the process exits — repeated
    bench/test runs in one long session must not accumulate temp dirs under
    the stream tmp root."""
    import subprocess
    import sys

    script = (
        "import os, sys; sys.path.insert(0, '/root/repo');"
        "os.environ['AWLH_STREAM_TMP'] = sys.argv[1];"
        "from adventureworkslakehousepoc_spark.streaming.runner import scratch_dir;"
        "print(scratch_dir('sweeptest'))"
    )
    out = subprocess.run(
        [sys.executable, "-c", script, str(tmp_path)],
        capture_output=True, text=True, check=True,
    )
    created = out.stdout.strip().splitlines()[-1]
    assert created.startswith(str(tmp_path))
    assert not os.path.exists(created), "scratch dir survived interpreter exit"


def test_ledger_fingerprints_are_current():
    """Mechanical changed-output detection (replaces the hand list that
    silently missed text_boilerplate_flags for two rounds): the ledger
    stores a fingerprint per query — sha256(oracle SQL + canonical DuckDB
    sf0.001 result) — and scripts/row_age.py flags drift as CHANGED_OUTPUT
    at regeneration. This tripwire forces that regeneration: any edit that
    changes a query's observable output makes the committed fingerprints
    stale, and the window would front the wrong rows. Fix with
    `python scripts/row_age.py --write` and commit."""
    import importlib.util

    from adventureworkslakehousepoc_spark import queries as q
    from adventureworkslakehousepoc_spark.queries import _row_age

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "row_age_script", os.path.join(repo, "scripts", "row_age.py")
    )
    script = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(script)

    current = script.compute_fingerprints()
    recorded = getattr(_row_age, "FINGERPRINT", {})
    drifted = sorted(
        k for k in current if recorded.get(k) != current[k]
    ) + sorted(k for k in recorded if k not in current)
    assert not drifted, (
        f"{len(drifted)} queries' output fingerprints are stale in the "
        f"ledger (first few: {drifted[:8]}) — run "
        "`python scripts/row_age.py --write` and commit"
    )
    # The registry's changed-output ordering input is the SELF-HEALED view
    # of the ledger's table: when a driver CORRECTNESS file newer than the
    # committed cache exists, _self_heal_ledger clears flags attested by
    # that round's green rows — so comparing against the committed tuple
    # would go red the moment the driver lands (the r8-r13 failure mode).
    # Assert equality against the committed tuple only when the cache is
    # current; otherwise re-derive the healed expectation independently and
    # assert against THAT, warning that a regen is due.
    committed = tuple(getattr(_row_age, "CHANGED_OUTPUT", ()))
    cache_round = int(getattr(_row_age, "GENERATED_AFTER_ROUND", 0))
    if q.EFFECTIVE_ROUND == cache_round:
        assert q._CHANGED_OUTPUT == committed
    else:
        _, healed, _ = q._self_heal_ledger()
        assert q._CHANGED_OUTPUT == healed
        warnings.warn(
            f"row-age cache generated after r{cache_round} but driver files "
            f"exist through r{q.EFFECTIVE_ROUND}; ordering is self-healed — "
            "persist it with `python scripts/row_age.py --write` and commit",
            UserWarning,
            stacklevel=1,
        )


def test_changed_output_derivation_rules():
    """The fingerprint-drift derivation in scripts/row_age.py: a drift is
    excused (attested) ONLY when the regeneration is the first after a new
    driver round AND that round green-verified the query; mid-round
    regenerations can never attest (the edit post-dates the driver run);
    existing flags persist until attested the same way."""
    import importlib.util
    import types

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "row_age_script2", os.path.join(repo, "scripts", "row_age.py")
    )
    script = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(script)
    derive = script.derive_changed_output

    def prev(gen_round, fp, changed=()):
        m = types.SimpleNamespace()
        m.GENERATED_AFTER_ROUND = gen_round
        m.FINGERPRINT = fp
        m.CHANGED_OUTPUT = changed
        return m

    # round-start regen after driver round 7: drifted q verified in r7 →
    # attested, not flagged; drifted q NOT verified in r7 → flagged
    last = {"a": 7, "b": 3}
    new_fp = {"a": "x2", "b": "y2"}
    old = prev(6, {"a": "x1", "b": "y1"})
    assert derive(last, 7, new_fp, old) == ["b"]

    # mid-round regen (ledger already at the latest driver round): drift is
    # NEVER attested, even for a query verified in that round — the edit
    # happened after the driver ran
    old = prev(7, {"a": "x1", "b": "y2"})
    assert derive(last, 7, new_fp, old) == ["a"]

    # carried flags: an old flag on an unverified query persists even with
    # no new drift; it clears once a round-start regen sees a green row
    old = prev(6, {"a": "x2", "b": "y2"}, changed=("b",))
    assert derive(last, 7, new_fp, old) == ["b"]
    old = prev(6, {"a": "x2", "b": "y2"}, changed=("a",))
    assert derive(last, 7, new_fp, old) == []

    # a flag on a query that left the registry is dropped
    old = prev(6, {"a": "x2", "b": "y2"}, changed=("gone",))
    assert derive(last, 7, new_fp, old) == []

    # first migration (no FINGERPRINT on the old module): nothing flagged
    old = types.SimpleNamespace()
    old.GENERATED_AFTER_ROUND = 6
    assert derive(last, 7, new_fp, old) == []


# ---------------------------------------------------------------------------
# Round-13: DLT-style expectations (plans/expectations.py)
# ---------------------------------------------------------------------------


def _exp_registry():
    from adventureworkslakehousepoc_spark.plans.expectations import (
        expect,
        expect_or_drop,
        expect_or_fail,
    )

    reg = DatasetRegistry()

    @reg.table("gated")
    @expect("has_name", "name IS NOT NULL")
    @expect_or_drop("positive", "v > 0")
    def gated(ctx):
        return ctx.read("raw")

    @reg.table("strict")
    @expect_or_fail("no_nulls", "v IS NOT NULL")
    def strict(ctx):
        return ctx.read("raw")

    return reg


def test_expectations_drop_and_keep_policies(spark):
    """drop removes violating rows (NULL condition = violation, plain SQL
    filter semantics); keep leaves rows untouched but is still counted."""
    raw = spark.createDataFrame(
        [(1, "a"), (-2, "b"), (None, None), (4, None)], "v int, name string"
    )
    ctx = PipelineContext(_exp_registry(), spark, catalog_reader=lambda n: raw)
    got = sorted(r.v for r in ctx.dataframe("gated").collect())
    assert got == [1, 4], got  # -2 and NULL dropped; NULL name kept


def test_expectations_fail_policy_aborts_update(spark):
    """expect_or_fail must abort the materialization on the first violating
    row — executor-side raise, not a silent NULL or a dropped row."""
    raw = spark.createDataFrame([(1, "a"), (None, "b")], "v int, name string")
    ctx = PipelineContext(_exp_registry(), spark, catalog_reader=lambda n: raw)
    with pytest.raises(Exception, match="no_nulls"):
        ctx.dataframe("strict").collect()
    # a clean table sails through the same gate
    ok = spark.createDataFrame([(1, "a")], "v int, name string")
    ctx2 = PipelineContext(_exp_registry(), spark, catalog_reader=lambda n: ok)
    assert ctx2.dataframe("strict").count() == 1


def test_expectations_observed_metrics_zero_extra_pass(spark, tmp_path):
    """With observe_expectations=True, run() harvests per-expectation
    violation counts from the SAME job that writes the table (CollectMetrics
    node) — counts are over PRE-enforcement rows, so drop victims are
    counted even though they never reach the sink."""
    raw = spark.createDataFrame(
        [(1, "a"), (-2, "b"), (None, None), (4, None)], "v int, name string"
    )
    ctx = PipelineContext(
        _exp_registry(),
        spark,
        catalog_reader=lambda n: raw,
        observe_expectations=True,
    )
    ctx.run(str(tmp_path), names=["gated"])
    m = ctx.expectation_metrics("gated")
    assert m["n_rows"] == 4
    assert m["positive"] == 2  # -2 and NULL v
    assert m["has_name"] == 2  # two NULL names (keep policy, still counted)
    # the materialized table holds only the surviving rows
    assert sorted(
        r.v for r in spark.read.parquet(str(tmp_path / "gated")).collect()
    ) == [1, 4]


def test_expectations_drop_filter_reaches_parquet_scan(spark, sf_dir):
    """Enforcement must stay plan-shaped: without the (opt-in) metrics node,
    a drop constraint is an ordinary predicate and lands in the scan's
    PushedFilters — the 100 TB posture the whole feature hangs on."""
    from adventureworkslakehousepoc_spark.plans.expectations import (
        expect_or_drop,
    )

    reg = DatasetRegistry()

    @reg.table("clean_docs")
    @expect_or_drop("min_len", "n_chars >= 100")
    def clean_docs(ctx):
        return ctx.read("documents")

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ctx = PipelineContext(reg, spark, catalog_reader=lambda n: docs)
    plan = (
        ctx.dataframe("clean_docs")._jdf.queryExecution().executedPlan().toString()
    )
    assert "GreaterThanOrEqual(n_chars,100)" in plan, plan[:2000]


def test_expectations_duplicate_name_rejected_and_policy_validated():
    from adventureworkslakehousepoc_spark.plans.expectations import (
        Expectation,
        expect,
        expect_or_drop,
    )

    with pytest.raises(ValueError, match="policy"):
        Expectation("x", "v > 0", "warn_and_pray")

    with pytest.raises(ValueError, match="declared twice"):

        @expect("same", "v > 0")
        @expect_or_drop("same", "v < 9")
        def fn(ctx):  # pragma: no cover - never called
            return None


def test_expectation_counters_requires_expectations(spark):
    from adventureworkslakehousepoc_spark.plans.expectations import (
        expectation_counters,
    )

    df = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(ValueError, match="no expectations"):
        expectation_counters(df, [])


def test_expectations_quarantine_routes_disjointly(spark):
    """expect_or_quarantine: kept ∪ quarantined = post-drop input with no
    overlap; NULL conditions route to quarantine; rows removed by an
    earlier drop never reach quarantine; the _violated tag names the
    constraint; datasets without quarantine constraints raise."""
    from adventureworkslakehousepoc_spark.plans.expectations import (
        expect_or_drop,
        expect_or_quarantine,
    )

    reg = DatasetRegistry()

    @reg.table("triaged")
    @expect_or_drop("id_present", "k IS NOT NULL")
    @expect_or_quarantine("positive", "v > 0")
    def triaged(ctx):
        return ctx.read("raw")

    raw = spark.createDataFrame(
        [(1, 5), (2, -1), (3, None), (None, -9)],
        "k int, v int",
    )
    ctx = PipelineContext(reg, spark, catalog_reader=lambda n: raw)
    kept = {r.k for r in ctx.dataframe("triaged").collect()}
    q = ctx.quarantine("triaged").collect()
    quarantined = {r.k for r in q}
    assert kept == {1}
    assert quarantined == {2, 3}, "NULL v routes to quarantine; NULL k was dropped first"
    assert {r._violated for r in q} == {"positive"}
    assert kept.isdisjoint(quarantined)

    @reg.table("no_q")
    @expect_or_drop("x", "v > 0")
    def no_q(ctx):
        return ctx.read("raw")

    with pytest.raises(ValueError, match="no quarantine"):
        ctx.quarantine("no_q")


# ---------------------------------------------------------------------------
# Round-14: dataset-level (aggregate) expectations
# ---------------------------------------------------------------------------


def _agg_exp_registry():
    from adventureworkslakehousepoc_spark.plans.expectations import (
        expect_fresh,
        expect_referential,
        expect_unique,
    )

    reg = DatasetRegistry()

    @reg.table("dim")
    def dim(ctx):
        return ctx.read("dim_src")

    @reg.table("fact_unique_fail")
    @expect_unique("pk_unique", ["k"], policy="fail")
    def fact_unique_fail(ctx):
        return ctx.read("fact_src")

    @reg.table("fact_ri_drop")
    @expect_referential("fk_exists", ["k"], "dim", ["dk"], policy="drop")
    def fact_ri_drop(ctx):
        return ctx.read("fact_src")

    @reg.table("fact_ri_fail")
    @expect_referential("fk_exists", ["k"], "dim", ["dk"], policy="fail")
    def fact_ri_fail(ctx):
        return ctx.read("fact_src")

    @reg.table("fact_fresh_fail")
    @expect_fresh(
        "recent", "ts", 3600, as_of="2024-01-01 02:00:00", policy="fail"
    )
    def fact_fresh_fail(ctx):
        return ctx.read("fact_src")

    return reg


def _agg_ctx(spark, fact_rows, dim_rows=((1,), (2,), (3,))):
    fact = spark.createDataFrame(
        list(fact_rows), "k int, v string, ts timestamp"
    )
    dim = spark.createDataFrame([(r[0],) for r in dim_rows], "dk int")

    def reader(name):
        return {"fact_src": fact, "dim_src": dim}[name]

    return PipelineContext(_agg_exp_registry(), spark, catalog_reader=reader)


def test_agg_expect_unique_fail_aborts_on_staged_duplicate(spark, tmp_path):
    """A staged duplicate key under expect_unique(policy='fail') must abort
    run() BEFORE the dataset is written — and the abort surfaces as
    AggregateExpectationError, not a silent write of bad grain."""
    import datetime as dt

    from adventureworkslakehousepoc_spark.plans.expectations import (
        AggregateExpectationError,
    )

    t = dt.datetime(2024, 1, 1, 1, 30)
    ctx = _agg_ctx(spark, [(1, "a", t), (1, "b", t), (2, "c", t)])
    with pytest.raises(AggregateExpectationError, match="pk_unique"):
        ctx.run(str(tmp_path), names=["fact_unique_fail"])
    assert not (tmp_path / "fact_unique_fail").exists()

    # clean grain sails through the same gate
    ctx2 = _agg_ctx(spark, [(1, "a", t), (2, "b", t)])
    ctx2.run(str(tmp_path), names=["fact_unique_fail"])
    assert (tmp_path / "fact_unique_fail").exists()


def test_agg_expect_referential_drop_is_match_simple(spark):
    """drop-policy RI removes orphans via a left-semi join but keeps NULL
    fks (SQL MATCH SIMPLE) — and the enforcement rides dataframe(), so
    every consumer sees the gated relation."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 1, 30)
    ctx = _agg_ctx(
        spark,
        [(1, "in_dim", t), (9, "orphan", t), (None, "null_fk", t)],
    )
    got = sorted(
        (r.k if r.k is not None else -1, r.v)
        for r in ctx.dataframe("fact_ri_drop").collect()
    )
    assert got == [(-1, "null_fk"), (1, "in_dim")], got
    # audit of the enforced relation is clean by construction
    audit = {
        r.expectation: r.n_violations
        for r in ctx.aggregate_audit("fact_ri_drop").collect()
    }
    assert audit == {"fk_exists": 0}


def test_agg_expect_referential_fail_and_fresh(spark, tmp_path):
    """fail-policy RI aborts on orphans; freshness fails when max(ts) lags
    the as-of horizon and passes inside it; empty datasets are stale."""
    import datetime as dt

    from adventureworkslakehousepoc_spark.plans.expectations import (
        AggregateExpectationError,
        freshness_status,
    )

    stale = dt.datetime(2024, 1, 1, 0, 30)  # 90 min before as_of: > 3600s
    fresh = dt.datetime(2024, 1, 1, 1, 30)  # 30 min before as_of
    ctx = _agg_ctx(spark, [(1, "a", stale), (9, "orphan", fresh)])
    with pytest.raises(AggregateExpectationError, match="fk_exists"):
        ctx.run(str(tmp_path), names=["fact_ri_fail"])

    ctx_stale = _agg_ctx(spark, [(1, "a", stale)])
    with pytest.raises(AggregateExpectationError, match="recent"):
        ctx_stale.run(str(tmp_path), names=["fact_fresh_fail"])
    ctx_fresh = _agg_ctx(spark, [(1, "a", fresh)])
    ctx_fresh.run(str(tmp_path), names=["fact_fresh_fail"])
    assert (tmp_path / "fact_fresh_fail").exists()

    # empty dataset: max(ts) is NULL -> fresh=false, NULL lag
    from adventureworkslakehousepoc_spark.plans.expectations import (
        AggregateExpectation,
    )

    empty = spark.createDataFrame([], "ts timestamp")
    exp = AggregateExpectation(
        "recent", "fresh", "keep", ts_col="ts", max_lag_seconds=3600,
        as_of="2024-01-01 02:00:00",
    )
    row = freshness_status(empty, exp).collect()[0]
    assert row.fresh is False and row.lag_seconds is None


def test_agg_expectations_validation():
    from adventureworkslakehousepoc_spark.plans.expectations import (
        AggregateExpectation,
        expect_unique,
    )

    with pytest.raises(ValueError, match="policy"):
        AggregateExpectation("x", "unique", "drop", cols=("k",))
    with pytest.raises(ValueError, match="kind"):
        AggregateExpectation("x", "monotone", "keep")
    with pytest.raises(ValueError, match="declared twice"):

        @expect_unique("same", ["a"])
        @expect_unique("same", ["b"])
        def fn(ctx):  # pragma: no cover - never called
            return None


def test_aggregate_audit_requires_declarations(spark):
    reg = DatasetRegistry()

    @reg.table("plain")
    def plain(ctx):
        return ctx.read("src")

    src = spark.createDataFrame([(1,)], "v int")
    ctx = PipelineContext(reg, spark, catalog_reader=lambda n: src)
    with pytest.raises(ValueError, match="no aggregate expectations"):
        ctx.aggregate_audit("plain")
