"""Training-example assembly: ordered per-conversation transcripts and
deterministic contrastive negative mining.

``assemble_transcripts`` is the SFT-corpus builder shape: one shuffle on the
conversation key with map-side partial ``collect_list``, then an
``array_sort`` over (ts, event_id, payload) structs so the assembled sequence
is deterministic no matter how partitions interleave — ``collect_list`` alone
gives partition order, which is not stable. State per key is bounded by
conversation length, never corpus size, so the aggregate scales with the
number of conversations (which grows with the data) rather than funneling.

``negative_pairs`` mines k pseudo-random negatives per anchor with no RNG and
no driver round-trip: ``offset = 1 + md5(anchor_id:j) % (n-1)`` guarantees
``neg != anchor`` and a uniform draw over the other n-1 documents, the corpus
size ``n`` rides along as a broadcast 1-row count, and the join back to the
corpus for negative-side features is a plain shuffle equi-join on doc_id.
md5-derived offsets replay bit-identically in any engine (the DuckDB oracle
casts the same 15-hex-digit prefix), so sampled pairs are reproducible across
reruns, partitionings, and engines — the property a training pipeline needs
for resumable jobs. Requires a contiguous 0..n-1 id column (the documents
table's layout; re-key with zipWithIndex/row_number otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_transcripts(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-key event transcript in (ts, event_id) order, plus span stats."""
    item = F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"))
    return events.groupBy(key).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(item)), lambda x: x["event_type"]),
            "|",
        ).alias("transcript"),
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("started_at"),
        F.max("ts").alias("ended_at"),
    )


def negative_pairs(docs: DataFrame, k: int = 4, id_col: str = "doc_id") -> DataFrame:
    """k deterministic contrastive negatives per anchor document.

    Output: (anchor_id, neg_rank, neg_id, anchor_lang, neg_lang,
    is_cross_lang, neg_source). Needs n >= 2 documents.
    """
    n = docs.agg(F.count(F.lit(1)).alias("__n_docs"))
    anchors = (
        docs.select(
            F.col(id_col).alias("anchor_id"), F.col("lang").alias("anchor_lang")
        )
        .crossJoin(F.broadcast(n))
        .select("*", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_rank"))
    )
    raw = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("anchor_id").cast("string"),
                    F.lit(":"),
                    F.col("neg_rank").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    with_neg = anchors.select(
        "anchor_id",
        "anchor_lang",
        "neg_rank",
        F.pmod(
            F.col("anchor_id") + F.lit(1) + F.pmod(raw, F.col("__n_docs") - F.lit(1)),
            F.col("__n_docs"),
        ).alias("neg_id"),
    )
    negs = docs.select(
        F.col(id_col).alias("neg_id"),
        F.col("lang").alias("neg_lang"),
        F.col("source").alias("neg_source"),
    )
    return with_neg.join(negs, "neg_id").select(
        "anchor_id",
        "neg_rank",
        "neg_id",
        "anchor_lang",
        "neg_lang",
        (F.col("anchor_lang") != F.col("neg_lang")).alias("is_cross_lang"),
        "neg_source",
    )
