"""Training-sequence packing: concat-and-chunk document assembly.

Pretraining batches are built by concatenating tokenized documents into a
stream and slicing fixed-length windows (GPT-style "packing"); the pipeline
op that matters at corpus scale is assigning every document its (chunk index,
offset) in that stream WITHOUT a global sort. Packing here is per-group
(source/shard): a running token total over a per-group window gives each doc
its start offset; chunk = offset div capacity. Documents may straddle chunk
boundaries, exactly like the concat-then-chunk reference implementations.

Scale posture: groups (sources/shards) are few, so a naive per-group
running-sum window funnels the whole corpus into |groups| tasks. The prefix
sum is therefore HIERARCHICAL: range-partition on (group, id) → local
running sums within each (group, physical partition) → per-partition totals
(a tiny groups×partitions frame) → exclusive partition offsets via a window
over that tiny frame → broadcast-join the offsets back. Every full-data
stage is balanced; the only per-group sequential object is the offsets
frame. The result is partition-count-invariant (offset + local sum
reconstructs the same global prefix for any boundary placement), integer
arithmetic throughout — a DuckDB SUM OVER oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_training_sequences"]


def pack_training_sequences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    capacity: int = 512,
) -> DataFrame:
    """Assign each document its position in the per-group concatenated token
    stream: ``start_offset`` (tokens before it), ``chunk_idx`` (=
    start_offset div capacity) and ``chunk_offset`` (position within the
    chunk). Deterministic order within a group: ascending ``id_col``."""
    sc = docs.sparkSession.sparkContext
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("n_tokens"),
    ).repartitionByRange(sc.defaultParallelism, "grp", "doc_id")
    tp = t.withColumn("_pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("grp", "_pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = tp.withColumn("_lcum", F.sum("n_tokens").over(w_local))
    totals = tp.groupBy("grp", "_pid").agg(F.sum("n_tokens").alias("_psum"))
    w_prev = (
        Window.partitionBy("grp")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "grp", "_pid", F.coalesce(F.sum("_psum").over(w_prev), F.lit(0)).alias("_poff")
    )
    cum = F.col("_poff") + F.col("_lcum")
    start = cum - F.col("n_tokens")
    return (
        local.join(F.broadcast(offsets), ["grp", "_pid"])
        .select(
            "doc_id",
            F.col("grp").alias(group_col),
            "n_tokens",
            start.cast("bigint").alias("start_offset"),
            F.floor(start / capacity).cast("bigint").alias("chunk_idx"),
            (start % capacity).cast("bigint").alias("chunk_offset"),
        )
    )


def length_quantile_buckets(docs: DataFrame, col: str = "n_chars") -> DataFrame:
    """Curriculum / batch-shape bucketing: assign each document to a length
    quartile using exact distributed quantile boundaries.

    The boundary aggregate is the canonical two-phase global shape (partial
    per partition, one merged row) and rides along as a broadcast 1-row
    relation — no window over the corpus, no driver round-trip. Assignment is
    then a pure projection, so the whole operator is one keyless aggregate
    plus one codegen'd CASE. Returns the per-bucket summary (bucket id,
    count, min/max length); at 100 TB swap the exact percentile for
    ``approx_percentile`` and the shape is unchanged.
    """
    q = docs.agg(
        F.expr(f"percentile({col}, 0.25)").alias("q1"),
        F.expr(f"percentile({col}, 0.50)").alias("q2"),
        F.expr(f"percentile({col}, 0.75)").alias("q3"),
    )
    c = F.col(col)
    bucket = (
        F.when(c <= F.col("q1"), 0)
        .when(c <= F.col("q2"), 1)
        .when(c <= F.col("q3"), 2)
        .otherwise(3)
    )
    return (
        docs.crossJoin(F.broadcast(q))
        .select(c.alias(col), bucket.alias("length_bucket"))
        .groupBy("length_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(col).alias("min_chars"),
            F.max(col).alias("max_chars"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Sliding-window document chunking (RAG indexing / long-context
    pretraining): fixed ``chunk_tokens``-token windows advancing by
    ``chunk_tokens - overlap``, last window ragged. One narrow map stage —
    split, per-row chunk-count arithmetic, ``explode`` of the chunk index
    range, ``slice`` per chunk — no shuffle at all; chunk-count formula:
    1 chunk if n <= chunk_tokens else 1 + ceil((n - chunk_tokens) / stride).
    Returns (doc_id, chunk_idx, chunk_start 1-based, n_chunk_tokens,
    chunk_text)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - chunk_tokens) / F.lit(stride).cast("double")).cast("int")
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), words.alias("ws"), n_chunks.alias("nc")
    )
    ci = F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("chunk_idx")
    chunked = base.select("doc_id", "ws", ci)
    start = F.lit(1) + F.col("chunk_idx") * stride
    piece = F.slice(F.col("ws"), start, chunk_tokens)
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        start.cast("bigint").alias("chunk_start"),
        F.size(piece).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
