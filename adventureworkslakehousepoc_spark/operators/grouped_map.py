"""Batch Arrow grouped-map (``applyInPandas``) operator.

``groupBy(...).applyInPandas`` is the escape hatch for per-group kernels the
built-in operators can't express (per-group PCA/whitening, constrained
optimization, model scoring with per-group state). The kernel here — per-label
embedding centroids — IS deliberately SQL-expressible, so the DuckDB oracle
hash-checks the Arrow plumbing itself (schema mapping, group assembly, numpy
round-trip), exactly like the multimodal decode stub pattern: the surface is
real and tested even though the demo kernel is simple.

Determinism contract: every float crosses into integer micro-units per
COMPONENT (one quantization per value), so all cross-vector accumulation is
int64 — group-order- and partitioning-independent, bit-identical to the
oracle's replay.

Scale posture: one shuffle on the group key; each group materializes in one
python worker's memory as an Arrow batch (n_vecs × dim × 8 bytes — size
groups accordingly or pre-aggregate). Skewed/huge groups belong in the
declarative two-phase form instead (see ``embedding_norm_histogram``); the
grouped-map form is for kernels that genuinely need the whole group at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["label_centroids"]

_SCHEMA = "label int, n_vecs long, c0_micros long, c1_micros long, centroid_sumsq long"


def _centroid_kernel(pdf):
    import numpy as np
    import pandas as pd

    mat = np.stack([np.asarray(a, dtype=np.float64) for a in pdf["embedding"]])
    q = np.floor(mat * 1000000.0 + 0.5).astype(np.int64)
    s = q.sum(axis=0)
    n = len(pdf)
    # float64 division then floor — exact while |s| < 2^53 and 1/n > ulp(s/n);
    # the oracle performs the identical double division, so both floor alike
    mean = np.floor(s / n).astype(np.int64)
    return pd.DataFrame(
        {
            "label": [int(pdf["label"].iloc[0])],
            "n_vecs": [n],
            "c0_micros": [int(mean[0])],
            "c1_micros": [int(mean[1])],
            "centroid_sumsq": [int((mean * mean).sum())],
        }
    )


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid summary via Arrow grouped map: component-wise
    micro-unit quantization → int64 sums → floored per-dim mean; reports the
    first two centroid components and the centroid's squared norm (in
    micro-unit²). Plans as ``FlatMapGroupsInPandas`` (Arrow batches, never
    row-at-a-time Python)."""
    return (
        embeddings.select("label", "embedding")
        .groupBy("label")
        .applyInPandas(_centroid_kernel, _SCHEMA)
    )
