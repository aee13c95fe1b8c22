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


# ---------------------------------------------------------------------------
# Loop-invariant HOF audit (round-11 lesson, round-12 gate). Catalyst's
# CollapseProject inlines an adjacent projection's computed column into
# every reference — including references INSIDE a higher-order-function
# lambda, where interpreted evaluation then re-computes the producer PER
# ELEMENT: the codec folds were re-hexing the whole payload per sample
# (O(len^2) per row) and every token-scale explode was re-splitting the
# document per shingle. The fix is the one-element let-binding idiom
# `transform(array(<producer>), v -> <body over v>)`. This audit detects
# the BROKEN shape mechanically in a plan string: an expensive producer
# call inside a lambdafunction body whose own arguments reference no
# lambda variable — i.e. a loop-invariant expensive expression that
# Catalyst will happily re-evaluate per element.
# ---------------------------------------------------------------------------

# Producers whose per-call cost is linear in their input (so per-element
# re-evaluation multiplies a row-linear cost into row-quadratic). Cheap
# per-call scalars (arithmetic, comparisons, element_at) are exempt.
_EXPENSIVE_PRODUCERS = (
    "split(",
    "hex(",
    "unhex(",
    "regexp_extract(",
    "regexp_replace(",
    "regexp_extract_all(",
    "sha2(",
    "md5(",
    "repeat(",
    "reverse(",
    "translate(",
)


def _balanced_span(text: str, open_idx: int) -> str:
    """Return the substring of ``text`` from the '(' at ``open_idx`` through
    its matching ')'. Plan strings never nest quotes around parens, so a
    plain depth counter is exact."""
    depth = 0
    for j in range(open_idx, len(text)):
        c = text[j]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return text[open_idx : j + 1]
    return text[open_idx:]  # unbalanced tail (truncated plan) — best effort


def find_loop_invariant_hof_calls(plan: str) -> list[str]:
    """Scan a (logical or physical) plan string for expensive producer
    calls that sit INSIDE a ``lambdafunction(...)`` body but whose own
    argument subtree references no ``lambda`` variable — the exact
    CollapseProject cost-multiplication shape SCALE.md documents. Returns
    one snippet per offending call (deduplicated); empty list = clean.

    The let-binding idiom passes by construction: in
    ``transform(array(split(x)), v -> ...element_at(v, i)...)`` the
    ``split`` sits in the transform's INPUT (outside every lambda body)
    and the body's calls all reference ``lambda v``.

    Scans LINE BY LINE (each plan node prints on one line) and skips
    FileScan metadata lines (``DataFilters:`` etc.): those are
    width-truncated mid-expression regardless of maxToStringFields,
    and a truncated line's unbalanced parens would otherwise make one
    lambda span swallow every node below it (observed: the quality-gate
    Filter's pushed-down copy flagged clean projections two joins
    away). The metadata lines only duplicate Filter/Project nodes that
    ARE scanned in full."""
    hits: list[str] = []
    for line in plan.splitlines():
        if (
            "DataFilters:" in line
            or "PushedFilters:" in line
            or "PartitionFilters:" in line
        ):
            continue
        pos = 0
        while True:
            k = line.find("lambdafunction(", pos)
            if k < 0:
                break
            body = _balanced_span(line, k + len("lambdafunction"))
            pos = k + len("lambdafunction(")  # nested lambdas scanned too
            for fn in _EXPENSIVE_PRODUCERS:
                j = 0
                while True:
                    i = body.find(fn, j)
                    if i < 0:
                        break
                    args = _balanced_span(body, i + len(fn) - 1)
                    j = i + len(fn)
                    if "lambda " not in args:
                        snippet = (fn + args)[:120]
                        if snippet not in hits:
                            hits.append(snippet)
    return hits
