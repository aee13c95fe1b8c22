"""Iterative graph algorithms over DataFrames: connected components by
min-label propagation.

The canonical use here: collapse near-duplicate *pairs* (MinHash/SimHash
output) into duplicate *clusters* and elect one representative per cluster —
the final step of corpus dedup. Each iteration is one shuffle
(join + min-aggregate); convergence takes O(log(diameter)) rounds and the
loop's only driver-side work is the convergence check (a count), never data.

At 100 TB: the edge list is the (tiny) near-dup pair set, not the corpus, so
iterations run on |pairs| rows; checkpoint every few rounds to truncate
lineage on long chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iterations: int = 20
) -> DataFrame:
    """Returns (node, component) where component = min node id reachable.
    ``edges`` is an undirected pair list; isolated nodes don't appear."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("label"))
        .select("u", F.least("u", "label").alias("label"))
        .persist()
    )
    for _ in range(max_iterations):
        # propagate: each node takes min(own label, neighbors' labels).
        # Each round persists its result — without this the lineage re-derives
        # every prior round per iteration (quadratic recompute).
        neighbor_labels = (
            sym.alias("e")
            .join(labels.alias("l"), F.col("e.v") == F.col("l.u"))
            .select(F.col("e.u").alias("u"), F.col("l.label").alias("label"))
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("u")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.u") == F.col("o.u"))
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))
