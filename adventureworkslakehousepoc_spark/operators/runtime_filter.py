"""Hash-bucket runtime filter: a broadcastable Bloom-style semi-filter that
prunes a large probe side before an expensive shuffle join.

Spark injects this shape itself when ``spark.sql.optimizer.runtime.bloomFilter
.enabled`` fires, but the planning heuristics are statistics-dependent and the
underlying ``bloom_filter_agg`` aggregate is not exposed to SQL in Spark 4.1
(probed: UNRESOLVED_ROUTINE), so this operator builds the same filter from
public primitives:

1. build side's join keys -> ``pmod(xxhash64(key), n_buckets)`` buckets;
2. the DISTINCT bucket ids (<= n_buckets rows, each one long) are a tiny
   relation that Spark BROADCASTs;
3. the probe side keeps only rows whose key hashes into an occupied bucket —
   a LEFT SEMI BroadcastHashJoin: O(1) per probe row, zero probe-side shuffle.

False positives (bucket collisions) are allowed by construction — the exact
join that follows removes them — so the composed result is value-identical to
the unfiltered join while shuffling only the surviving fraction of the probe.

100 TB framing: with a selective build side (say 1 % of orders survive a
predicate) and 2^20 buckets, the occupied-bucket relation is <= ~1 M longs
(~8 MB, usually far less) regardless of probe size, and the probe shuffle
shrinks by roughly the build-side selectivity. The build side itself may be
far past the broadcast threshold — only its bucket projection needs to fit.

Reference parity: the reference's engine pushes join-key predicates into its
scan layer (SURVEY.md §4, filter pushdown); this is the distributed analogue
for join pruning, and the manual form of Spark's own runtime bloom filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket_filter_keys(
    build: DataFrame, build_key: Column | str, n_buckets: int = 1 << 20
) -> DataFrame:
    """Distinct occupied bucket ids of the build side's join key.

    One shuffle over the (already filtered) build side; output is bounded by
    ``n_buckets`` rows of a single long column, independent of build size.
    """
    key = F.col(build_key) if isinstance(build_key, str) else build_key
    return build.select(
        F.pmod(F.xxhash64(key), F.lit(n_buckets)).alias("__rf_bucket")
    ).distinct()


def prune_with_hash_bucket_filter(
    probe: DataFrame,
    probe_key: Column | str,
    build: DataFrame,
    build_key: Column | str,
    n_buckets: int = 1 << 20,
) -> DataFrame:
    """Drop probe rows whose key cannot appear on the build side.

    Superset-correct: every probe row that would survive the exact join is
    kept (same hash, same bucket); collisions add false positives only, which
    the caller's exact join eliminates. Plans as a LEFT SEMI
    BroadcastHashJoin over the occupied-bucket relation.
    """
    key = F.col(probe_key) if isinstance(probe_key, str) else probe_key
    buckets = hash_bucket_filter_keys(build, build_key, n_buckets)
    return probe.join(
        F.broadcast(buckets),
        F.pmod(F.xxhash64(key), F.lit(n_buckets)) == F.col("__rf_bucket"),
        "left_semi",
    )
