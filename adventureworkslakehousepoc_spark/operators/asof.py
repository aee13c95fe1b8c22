"""As-of (point-in-time) join — an operator Spark lacks natively, composed
from existing DataFrame ops (no UDF, no per-row subquery).

Semantics: for each left row, attach the latest right row whose event time is
≤ the left row's time, per key ("backward" direction; the shape used for
point-in-time feature lookups and slowly-changing enrichment).

Implementation is the scalable union-sort trick: tag both sides, union, sort
per key by (time, side) with right rows first on ties, and carry right-side
values forward with ``last_value(..., ignoreNulls)``. Cost: one shuffle on
the key + one per-partition sort — the same complexity as a sort-merge join,
no matter how many right rows precede each left row (a naive range join would
explode |left| × |matching-right| before aggregation).

Oracle form: DuckDB's native ``ASOF LEFT JOIN`` reproduces the semantics
exactly, which keeps this operator hash-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_join_forward", "point_in_time_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
) -> DataFrame:
    """Backward as-of join.

    ``on`` is the equi-key column name on both sides; ``left_cols`` /
    ``right_cols`` are the payload columns to carry through (exclusive of key
    and time columns). Right rows sort before left rows at equal timestamps,
    so a right event at exactly the left time matches (``r.t <= l.t``).

    The matched right row is carried as ONE struct (time + all payload
    columns) through a single ``last(ignorenulls)`` — per-column carries
    would stitch values from different right rows whenever a newer right
    row's payload column is legitimately NULL. Ties among right rows at equal
    (key, time) resolve deterministically to the greatest payload struct
    (compared field-by-field: time, then ``right_cols`` in order), via the
    struct participating in the window sort.
    """
    from pyspark.sql.types import StructField, StructType

    lt = F.col(left_time)
    rt = F.col(right_time)
    r_schema = {f.name: f for f in right.schema.fields}
    r_struct_type = StructType(
        [StructField(right_time, r_schema[right_time].dataType)]
        + [StructField(c, r_schema[c].dataType) for c in right_cols]
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        lt.alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        lt.alias(left_time),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        rt.alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        F.lit(None).cast(dict(left.dtypes)[left_time]).alias(left_time),
        F.struct(rt.alias(right_time), *[F.col(c) for c in right_cols]).alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_t"), F.asc("_side"), F.asc("_r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_k",
        "_side",
        *[F.col(c) for c in left_cols],
        F.col(left_time),
        F.last(F.col("_r"), ignorenulls=True).over(w).alias("_r"),
    )
    return carried.filter(F.col("_side") == 1).select(
        F.col("_k").alias(on),
        *left_cols,
        left_time,
        *[F.col(f"_r.{c}").alias(c) for c in right_cols],
        F.col(f"_r.{right_time}").alias(right_time),
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Forward as-of join (pandas ``merge_asof(direction='forward')``): for
    each left row, the EARLIEST right row with ``r.t ≥ l.t`` per key —
    "what happened next" attribution (next purchase after a click, next
    error after a deploy). With ``tolerance_seconds``, matches further than
    the tolerance are nulled out (the carry still costs one window — the
    tolerance is a post-filter, not a second join).

    Same union-sort shape and cost as the backward ``asof_join`` (one key
    shuffle + one per-partition sort), with the frame reversed:
    ``first(ignorenulls)`` over ``[current, +∞)``; right rows sort AFTER
    left rows at equal timestamps so an exactly-simultaneous right event
    matches. Ties among right rows at equal (key, time) resolve to the
    smallest payload struct — matching an ORDER BY (time, payload...) pick
    in the oracle."""
    from pyspark.sql.types import StructField, StructType

    lt = F.col(left_time)
    rt = F.col(right_time)
    r_schema = {f.name: f for f in right.schema.fields}
    r_struct_type = StructType(
        [StructField(right_time, r_schema[right_time].dataType)]
        + [StructField(c, r_schema[c].dataType) for c in right_cols]
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        lt.alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in left_cols],
        lt.alias(left_time),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        rt.alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        F.lit(None).cast(dict(left.dtypes)[left_time]).alias(left_time),
        F.struct(rt.alias(right_time), *[F.col(c) for c in right_cols]).alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_t"), F.asc("_side"), F.asc("_r"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "_k",
        "_side",
        *[F.col(c) for c in left_cols],
        F.col(left_time),
        F.first(F.col("_r"), ignorenulls=True).over(w).alias("_r"),
    )
    if tolerance_seconds is not None:
        # exact microsecond arithmetic — a cast("long") truncates to whole
        # seconds and flips boundary membership vs an engine comparing full
        # timestamps (the w4 RANGE-frame drift, same trap)
        in_tol = F.unix_micros(F.col(f"_r.{right_time}")) - F.unix_micros(
            F.col(left_time)
        ) <= F.lit(int(tolerance_seconds) * 1_000_000)
        carried = carried.withColumn("_r", F.when(in_tol, F.col("_r")))
    return carried.filter(F.col("_side") == 0).select(
        F.col("_k").alias(on),
        *left_cols,
        left_time,
        *[F.col(f"_r.{c}").alias(c) for c in right_cols],
        F.col(f"_r.{right_time}").alias(right_time),
    )


def point_in_time_join(
    facts: DataFrame,
    dim_history: DataFrame,
    fact_key: str,
    dim_key: str,
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Temporal (point-in-time) join: each fact row picks the dimension
    VERSION that was valid at the fact's event time —
    ``valid_from ≤ ts < valid_to`` (open-ended current version: NULL
    valid_to). The consumption side of SCD2: reports join facts to the
    dimension as it WAS, not as it is.

    Scale: an equi-join on the natural key carries the interval predicate in
    the join condition, so it plans as ONE key-partitioned shuffle join with
    the range check evaluated in-join (each key's version list is tiny —
    version counts, not row counts). No window, no broadcast of the fact."""
    f = facts.alias("f")
    d = dim_history.alias("d")
    cond = (
        (F.col(f"f.{fact_key}") == F.col(f"d.{dim_key}"))
        & (F.col(f"f.{ts_col}") >= F.col(f"d.{valid_from}"))
        & (
            F.col(f"d.{valid_to}").isNull()
            | (F.col(f"f.{ts_col}") < F.col(f"d.{valid_to}"))
        )
    )
    return f.join(d, cond)
