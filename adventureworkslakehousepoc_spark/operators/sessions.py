"""Sessionization: gap-based event sessions, batch and streaming.

Batch form is the lag/cumulative-flag construction (one window shuffle per
key, no state); streaming form uses Spark's native ``session_window`` with a
watermark (merging per-key state, evicted as the watermark passes).

Boundary note: an event exactly ``gap`` after its predecessor starts a new
session in Spark's ``session_window`` (windows are half-open) but would merge
in a ``diff > gap`` lag-construction; the batch operator therefore uses
``diff >= gap`` to split, matching streaming semantics. Microsecond event
times make exact-boundary collisions vanishingly rare either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_window_agg"]


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch gap-sessionization. Returns one row per session:
    (key, session_idx, session_start, session_end, n_events)."""
    w_order = Window.partitionBy(key).orderBy(F.asc(time_col), F.asc(order_tiebreak))
    # cast through TIMESTAMP first: numeric casts are illegal on TIMESTAMP_NTZ,
    # and NTZ→TIMESTAMP is value-preserving under the pinned-UTC session tz
    ts_sec = F.col(time_col).cast("timestamp").cast("double")
    gap = ts_sec - F.lag(ts_sec).over(w_order)
    flagged = events.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap >= gap_minutes * 60), 1).otherwise(0),
    )
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_idx = flagged.withColumn("session_idx", F.sum("_new_session").over(w_cum))
    return with_idx.groupBy(F.col(key), F.col("session_idx")).agg(
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def session_window_agg(
    events: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Streaming session windows (native stateful operator): watermarked
    merging session state per key; append mode emits a session once the
    watermark passes its end (last event + gap)."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.session_window(F.col(time_col), gap), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end_plus_gap"),
            "n_events",
        )
    )
