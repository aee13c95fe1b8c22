"""Compaction, schema evolution, multi-batch incremental equivalence, and
reference-breadth bronze fan-out."""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import functions as F

from adventureworkslakehousepoc_spark.catalog import load_tables
from adventureworkslakehousepoc_spark.operators.maintenance import compact_parquet
from adventureworkslakehousepoc_spark.pipelines.bronze import bronze_fanout
from adventureworkslakehousepoc_spark.plans.registry import DatasetRegistry
from adventureworkslakehousepoc_spark.streaming.runner import run_available_now


def _stream_root():
    from adventureworkslakehousepoc_spark.streaming.runner import stream_tmp_root
    import os as _os

    root = stream_tmp_root()
    _os.makedirs(root, exist_ok=True)
    return root

def test_compaction_reduces_files_preserves_rows(spark, sf_dir):
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    path = tempfile.mkdtemp(prefix="compact-", dir=_stream_root()) + "/t"
    ev.repartition(24).write.parquet(path)  # simulate micro-batch small files
    before = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(before) >= 24
    n = compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024, sort_within_by=["ts"])
    after = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(after) == n < len(before)
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert back.agg(F.sum("event_id")).collect()[0][0] == ev.agg(F.sum("event_id")).collect()[0][0]


def test_schema_evolution_merge(spark, sf_dir):
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    path = tempfile.mkdtemp(prefix="evolve-", dir=_stream_root()) + "/t"
    c.select("c_custkey", "c_name").write.parquet(path)
    c.select("c_custkey", "c_name", "c_acctbal").write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"c_custkey", "c_name", "c_acctbal"}
    assert merged.count() == 2 * c.count()
    # old rows surface the evolved column as null
    assert merged.filter(F.col("c_acctbal").isNull()).count() == c.count()


def test_incremental_multibatch_equals_batch(spark, sf_dir):
    """SURVEY §5.3: running incrementally (4 micro-batches) == one batch."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    src = tempfile.mkdtemp(prefix="inc-", dir=_stream_root())
    now = time.time()
    for i in range(4):
        part = ev.filter((F.col("event_id") % 4) == i)
        f = os.path.join(src, f"b{i}.parquet")
        part.toPandas().to_parquet(f, coerce_timestamps="us")
        os.utime(f, (now - 100 + i * 10, now - 100 + i * 10))
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    stream = (
        spark.readStream.schema(
            spark.read.parquet(os.path.join(src, "b0.parquet")).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    joined = stream.join(F.broadcast(cust), F.col("user_id") == F.col("c_custkey"), "left").select(
        "event_id", "user_id", "c_mktsegment"
    )
    got = run_available_now(joined, "inc-vs-batch")
    want = ev.join(F.broadcast(cust), F.col("user_id") == F.col("c_custkey"), "left").select(
        "event_id", "user_id", "c_mktsegment"
    )
    assert got.count() == want.count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bronze_fanout_at_reference_breadth(spark, sf_dir):
    """The reference registers 68 staging tables across 5 schemas from one
    config dict (bronze_structure.ipynb cell-1); same factory, same breadth."""
    sources = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events", "documents", "embeddings"]
    groups = {}
    i = 0
    for schema_idx in range(5):
        tables = []
        for k in range(14 if schema_idx < 3 else 13):
            tables.append(sources[i % len(sources)])
            i += 1
        groups[f"schema{schema_idx}"] = list(dict.fromkeys(tables))
    dp = DatasetRegistry()
    names = bronze_fanout(dp, groups)
    assert len(names) == sum(len(v) for v in groups.values())
    assert len(names) >= 40  # distinct (schema, table) combos at reference scale
    from adventureworkslakehousepoc_spark.plans.registry import PipelineContext

    def reader(name):
        return load_tables(spark, sf_dir, (name,))[name]

    ctx = PipelineContext(dp, spark, catalog_reader=reader)
    # spot-check a handful of flows materialize as passthroughs
    for name in names[:3] + names[-3:]:
        src = name.split("__", 1)[1]
        assert ctx.dataframe(name).count() == reader(src).count()


def test_zorder_clustering_enables_file_skipping(spark, sf_dir, tmp_path):
    """After Z-clustering on (l_orderkey, l_partkey), a small box predicate on
    BOTH dimensions must be satisfiable from far fewer files (by parquet
    footer min/max alone) than the unclustered layout, where every file spans
    the whole keyspace."""
    import pyarrow.parquet as pq

    from adventureworkslakehousepoc_spark.operators.maintenance import cluster_zorder

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"].select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    naive = str(tmp_path / "naive")
    zpath = str(tmp_path / "zorder")
    li.repartition(8).write.mode("overwrite").parquet(naive)
    li.repartition(8).write.mode("overwrite").parquet(zpath)
    cluster_zorder(spark, zpath, ["l_orderkey", "l_partkey"], n_files=8)

    def files_overlapping_box(path, ok_range, pk_range):
        import glob

        hits, total = 0, 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins = {"l_orderkey": None, "l_partkey": None}
            maxs = {"l_orderkey": None, "l_partkey": None}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in mins and col.statistics is not None:
                        st = col.statistics
                        mins[name] = st.min if mins[name] is None else min(mins[name], st.min)
                        maxs[name] = st.max if maxs[name] is None else max(maxs[name], st.max)
            total += 1
            if (
                mins["l_orderkey"] is not None
                and not (maxs["l_orderkey"] < ok_range[0] or mins["l_orderkey"] > ok_range[1])
                and not (maxs["l_partkey"] < pk_range[0] or mins["l_partkey"] > pk_range[1])
            ):
                hits += 1
        return hits, total

    bounds = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.min("l_partkey"), F.max("l_partkey")
    ).first()
    ok_lo, ok_hi, pk_lo, pk_hi = bounds
    # a ~1/16th box in each dimension
    ok_box = (ok_lo, ok_lo + (ok_hi - ok_lo) // 16)
    pk_box = (pk_lo, pk_lo + (pk_hi - pk_lo) // 16)
    naive_hits, naive_total = files_overlapping_box(naive, ok_box, pk_box)
    z_hits, z_total = files_overlapping_box(zpath, ok_box, pk_box)
    assert naive_total == 8 and z_total == 8
    assert naive_hits == 8  # random layout: every file spans the box
    assert z_hits < naive_hits  # clustering actually prunes
    assert z_hits <= 4  # at most half the files touch a 1/256 box
    # layout rewrite preserves the data
    assert spark.read.parquet(zpath).count() == li.count()
