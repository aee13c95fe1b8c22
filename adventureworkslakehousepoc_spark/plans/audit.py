"""Physical-plan capture for eagerly-materializing operators.

The round-6 leak sweep made several operators eagerly
``localCheckpoint(eager=True)`` their (pair-list-scale) results so
corpus-scale caches can be released before returning. Correct — but it
blinded the mechanical plan audit: by the time ``scripts/plan_report.py``
explains the returned frame, the plan is a checkpoint scan and every
feature counter reads zero, so the anti-pattern scan never sees the real
execution plan. Same story for one-slot-cached frames, which downstream
plans show only as ``InMemoryTableScan``.

Fix: operators route their final materialization through
``eager_checkpoint`` (and ``_fresh_cache`` calls ``record_plan``), which —
ONLY while a ``capture_plans()`` context is active — stringifies the
pre-checkpoint executed plan into the active sink. Zero overhead outside
the audit: the sink is None and the helpers reduce to the plain calls.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_SINK: list[tuple[str, str]] | None = None


@contextmanager
def capture_plans():
    """Collect (label, executed-plan string) for every audited
    materialization that runs inside the block. Not reentrant; the plan
    report is a single-threaded sweep."""
    global _SINK
    prev, _SINK = _SINK, []
    try:
        yield _SINK
    finally:
        _SINK = prev


def record_plan(label: str, df: DataFrame) -> None:
    """If a capture is active, record df's pre-materialization physical
    plan. Explain failures never break the operator — the audit is
    best-effort by design."""
    if _SINK is not None:
        try:
            _SINK.append(
                (label, df._jdf.queryExecution().executedPlan().toString())
            )
        except Exception:
            pass


def eager_checkpoint(df: DataFrame, label: str) -> DataFrame:
    """``df.localCheckpoint(eager=True)`` with plan capture for the audit."""
    record_plan(label, df)
    return df.localCheckpoint(eager=True)
