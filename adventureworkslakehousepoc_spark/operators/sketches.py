"""Count-min sketch: fixed-size mergeable frequency state.

The exact token-frequency table is vocabulary-scale — fine for one corpus
audit, but streaming ingestion and cross-shard monitoring at 100 TB want a
frequency summary whose SIZE does not grow with the vocabulary. The
count-min sketch (Cormode & Muthukrishnan 2005) is that summary: a d×w grid
of counters where every token increments one counter per hash row, point
estimates are the MIN over a token's d cells, and the guarantee is
one-sided — estimate ≥ exact always, overestimate ≤ εN with probability
1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Spark shape: the grid IS a (row, bucket) partial aggregate — map-side
combine collapses every partition's token instances into ≤ d·w cells before
the exchange, so the shuffle moves a constant-size sketch regardless of
corpus or vocabulary size, and two sketches merge by adding cells
(associative — the incremental/streaming update is the same aggregate).

Hashing is md5-salted per row (`md5(j || '|' || token)` → first 15 hex
chars → bigint → mod w): deterministic, engine-portable (DuckDB replays it
verbatim), and row-independent enough for the CM guarantee in practice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_cells", "cms_heavy_hitters"]


def _bucket(row: Column, token: Column, w: int) -> Column:
    h = F.md5(F.concat_ws("|", row.cast("string"), token))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % F.lit(w)


def cms_cells(
    tokens: DataFrame, token_col: str = "token", d: int = 4, w: int = 256
) -> DataFrame:
    """The d×w sketch grid over a token-instance frame: one
    (row, bucket)-keyed count aggregate, map-side-combined to ≤ d·w cells
    per partition before the exchange. Returns (j, bucket, c)."""
    j = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("j")
    return (
        tokens.select(F.col(token_col).alias("_tok"))
        .select("_tok", j)
        .select("j", _bucket(F.col("j"), F.col("_tok"), w).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_heavy_hitters(
    docs: DataFrame,
    d: int = 4,
    w: int = 256,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Heavy-hitter audit of the count-min sketch against ground truth:
    the corpus's true top-``k`` tokens (exact count, TakeOrderedAndProject
    cut with token tie-breaks) probed against the sketch — estimate = MIN
    over the token's d cells, overestimate = estimate − exact (≥ 0 by the
    CM one-sided guarantee; a negative value means the sketch is broken).

    At 100 TB the candidate set comes from the stream (or a prior round's
    hitters) and each point query costs O(d) cell lookups against the
    broadcastable d·w-cell grid; the vocabulary-scale exact count here
    exists to VERIFY the sketch, mirroring approx_distinct_sketch's
    estimate-vs-exact contract.

    Returns (token, exact_count, cms_estimate, overestimate).
    """
    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    cells = cms_cells(toks, "token", d, w)
    topk = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("token"))
        .limit(k)
    )
    probe = topk.select(
        "token",
        "exact_count",
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("j"),
    ).withColumn("bucket", _bucket(F.col("j"), F.col("token"), w))
    return (
        probe.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            "token",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
        )
    )
