"""Deterministic key-salting for skewed joins.

AQE's skew-join split (enabled in the session) handles most runtime skew; the
explicit salt is for the pathological case AQE can't fix — a single hot key
whose *build side* row must meet millions of probe rows. The large side gets
a deterministic salt in ``[0, n)`` derived from its own columns (no ``rand()``
— results must be reproducible run-to-run); the small side is exploded ×n so
every salted partition finds its match. Join output is row-identical to the
unsalted join (asserted in tests), only the shuffle distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    large: DataFrame,
    small: DataFrame,
    large_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join with the hot-key shuffle spread over ``n_salts`` partitions.

    ``salt_source`` names a column on the large side whose hash spreads rows
    across salts (defaults to the first non-key column); the salt is
    ``pmod(hash(salt_source), n)`` — deterministic, no RNG.

    Only ``inner`` and ``left`` joins are supported: the small side is
    exploded ×n_salts, so a right/full outer join would emit n_salts
    null-padded copies of every unmatched small-side row — not row-identical
    to the unsalted join. Flip the sides (the unmatched-preserving side must
    be the salted large one) or dedupe externally for those shapes.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only (got {how!r}): the "
            "exploded small side would duplicate unmatched rows under "
            "right/full outer joins"
        )
    src = salt_source or next(c for c in large.columns if c != large_key)
    salted_large = large.withColumn("_salt", F.pmod(F.hash(F.col(src)), F.lit(n_salts)))
    exploded_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    cond = (F.col(f"l.{large_key}") == F.col(f"r.{small_key}")) & (
        F.col("l._salt") == F.col("r._salt")
    )
    return (
        salted_large.alias("l")
        .join(exploded_small.alias("r"), cond, how)
        .drop("_salt")
    )
