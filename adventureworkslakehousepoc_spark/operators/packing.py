"""Training-sequence packing: concat-and-chunk document assembly.

Pretraining batches are built by concatenating tokenized documents into a
stream and slicing fixed-length windows (GPT-style "packing"); the pipeline
op that matters at corpus scale is assigning every document its (chunk index,
offset) in that stream WITHOUT a global sort. Packing here is per-group
(source/shard): a running token total over a per-group window gives each doc
its start offset; chunk = offset div capacity. Documents may straddle chunk
boundaries, exactly like the concat-then-chunk reference implementations.

Scale posture: one shuffle on the group key; the window is partitioned (never
global), groups are shards by construction, and the arithmetic is integer —
deterministic, so a DuckDB SUM OVER oracle hash-matches.
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
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("start_offset")
    return t.select(
        "doc_id",
        F.col("grp").alias(group_col),
        "n_tokens",
        start,
        F.floor((cum - F.col("n_tokens")) / capacity).cast("bigint").alias("chunk_idx"),
        ((cum - F.col("n_tokens")) % capacity).cast("bigint").alias("chunk_offset"),
    )
