"""K-means / chunking / mixture-planning operators: semantic invariants plus
the physical-plan properties the 100 TB posture depends on (broadcast
centroids, shuffle-free chunking)."""

from __future__ import annotations

from pyspark.sql import functions as F

from adventureworkslakehousepoc_spark.catalog import load_tables
from adventureworkslakehousepoc_spark.operators.clustering import (
    kmeans_assign,
    kmeans_representatives,
    quantize_vectors,
)
from adventureworkslakehousepoc_spark.operators.packing import chunk_documents
from adventureworkslakehousepoc_spark.operators.sampling import (
    mixture_token_budget,
    train_eval_split,
)


def _emb(spark, sf_dir):
    return load_tables(spark, sf_dir, ("embeddings",))["embeddings"]


def _docs(spark, sf_dir):
    return load_tables(spark, sf_dir, ("documents",))["documents"]


def test_kmeans_assign_covers_all_vectors(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    a = kmeans_assign(emb, k=8, iters=2)
    assert a.count() == emb.count()
    assert a.select("vec_id").distinct().count() == emb.count()
    clusters = {r.cluster for r in a.select("cluster").distinct().collect()}
    assert clusters <= set(range(8))


def test_kmeans_iterations_do_not_increase_inertia(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    inertias = []
    for iters in (0, 1, 2):
        a = kmeans_assign(emb, k=8, iters=iters)
        inertias.append(a.agg(F.sum("dist_u")).collect()[0][0])
    # Lloyd monotonicity: each assign+recompute step can only lower inertia
    assert inertias[0] >= inertias[1] >= inertias[2], inertias


def test_kmeans_assignment_is_partitioning_invariant(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    a1 = kmeans_assign(emb, k=8, iters=2).orderBy("vec_id").collect()
    a2 = kmeans_assign(emb.repartition(13), k=8, iters=2).orderBy("vec_id").collect()
    assert a1 == a2


def test_kmeans_centroids_are_broadcast(spark, sf_dir):
    a = kmeans_assign(_emb(spark, sf_dir), k=8, iters=1)
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_representatives_are_cluster_members(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    reps = kmeans_representatives(emb, k=8, iters=2)
    a = kmeans_assign(emb, k=8, iters=2)
    joined = reps.join(a, reps.representative_id == a.vec_id)
    bad = joined.filter(reps.cluster != a.cluster).count()
    assert bad == 0
    total = reps.agg(F.sum("n_members")).collect()[0][0]
    assert total == emb.count()


def test_quantize_is_exact_micro_units(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    row = quantize_vectors(emb).orderBy("vec_id").first()
    src = emb.orderBy("vec_id").first()
    import math

    expect = [math.floor(float(x) * 1_000_000 + 0.5) for x in src.embedding]
    assert list(row.v) == expect


def test_chunking_covers_every_token_and_has_no_shuffle(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    ch = chunk_documents(docs, chunk_tokens=32, overlap=8)
    plan = ch._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # last chunk of every doc must reach the doc's final token
    words = docs.select("doc_id", F.size(F.split("text", " ")).alias("n"))
    last = ch.groupBy("doc_id").agg(
        F.max(F.col("chunk_start") + F.col("n_chunk_tokens") - 1).alias("covered")
    )
    uncovered = last.join(words, "doc_id").filter(F.col("covered") != F.col("n")).count()
    assert uncovered == 0
    # every chunk except a doc's last has exactly chunk_tokens tokens
    mx = ch.groupBy("doc_id").agg(F.max("chunk_idx").alias("mx"))
    short_non_last = (
        ch.join(mx, "doc_id")
        .filter((F.col("chunk_idx") != F.col("mx")) & (F.col("n_chunk_tokens") != 32))
        .count()
    )
    assert short_non_last == 0


def test_mixture_budget_caps_and_rates(spark, sf_dir):
    plan = mixture_token_budget(_docs(spark, sf_dir), budget_tokens=100_000).collect()
    assert plan
    for r in plan:
        assert 0 <= r.sample_rate_micros <= 1_000_000
        assert r.planned_tokens >= 0
    # allocation never exceeds the budget
    assert sum(min(r.planned_tokens, r.actual_tokens) for r in plan) <= 100_000


def test_split_partitions_every_doc_once(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    counts = train_eval_split(docs).collect()
    assert sum(r.n_docs for r in counts) == docs.count()
    splits = {r.split for r in counts}
    assert splits <= {"train", "val", "test"}
    n_train = sum(r.n_docs for r in counts if r.split == "train")
    assert n_train >= 0.6 * docs.count()
