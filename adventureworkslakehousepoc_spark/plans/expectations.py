"""DLT-style data-quality expectations for registry datasets (SURVEY.md §3).

The reference's DLT/Lakeflow framework ships row-level quality constraints —
``@dp.expect(name, condition)`` records violations, ``@dp.expect_or_drop``
filters violating rows, ``@dp.expect_or_fail`` aborts the pipeline update —
declared as decorators on the same generator functions ``@dp.table``
registers (the reference's seven pipeline files don't call them, but the
platform's table contract includes them; this is the registry's missing
quality gate). Spark-first re-expression:

- A constraint is a SQL boolean expression over the dataset's columns,
  evaluated row-wise INSIDE the dataset's own plan — ``drop`` is a plain
  ``filter`` (pushes down, prunes, vectorizes like any predicate), ``fail``
  is a ``filter`` whose else-branch is ``raise_error`` (the job aborts on
  the FIRST violating row, executor-side, with no extra pass or driver
  round-trip), ``keep`` leaves rows untouched.
- Violation COUNTERS are a single partial-aggregated pass computing every
  expectation's count in one job (one row out per expectation via the
  explode-from-aggregate idiom — no per-expectation scans, no driver loop),
  exposed both as a standalone auditable DataFrame
  (``expectation_counters``) and — during ``PipelineContext.run()``
  materialization — as ``DataFrame.observe`` metrics collected during the
  SAME job that writes the table (zero additional scans, the Spark-native
  equivalent of DLT's event-log expectation metrics).

At 100 TB: constraints ride the scan (predicate pushdown applies to
deterministic conjuncts), the counter pass is map-side-combined to
|expectations| cells per task, and nothing ever collects row data.

Relationship to ``operators/quality.py`` (round 4): that module ships the
STANDALONE helpers — ``expectation_metrics`` (one-pass pass/fail counts for
an ad-hoc dict of predicates, driver row ``dq_expectations_orders``) and a
drop-only ``enforce_expectations``. This module is the PIPELINE contract on
top: named policies per constraint (keep/drop/fail) declared as decorators
on registry generators, fail-abort semantics, and run()-time observed
metrics — what DLT actually exposes to a table author.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Expectation",
    "expect",
    "expect_or_drop",
    "expect_or_fail",
    "expect_or_quarantine",
    "expectations_of",
    "apply_expectations",
    "quarantine_rows",
    "expectation_counters",
]

_ATTR = "_awlh_expectations"

_POLICIES = ("keep", "drop", "fail", "quarantine")


@dataclass(frozen=True)
class Expectation:
    """One declared row constraint: ``condition`` is a SQL boolean
    expression over the dataset's columns; ``policy`` decides what happens
    to rows where it is false (NULL counts as a violation, as in DLT)."""

    name: str
    condition: str
    policy: str = "keep"

    def __post_init__(self) -> None:
        if self.policy not in _POLICIES:
            raise ValueError(
                f"expectation {self.name!r}: policy must be one of "
                f"{_POLICIES}, got {self.policy!r}"
            )

    def passes(self) -> F.Column:
        """True exactly when the row satisfies the constraint — a NULL
        condition result is a violation (mirrors DLT, and keeps drop/fail
        semantics well-defined on NULL-bearing columns)."""
        return F.coalesce(F.expr(self.condition), F.lit(False))


def _decorate(name: str, condition: str, policy: str):
    exp = Expectation(name, condition, policy)

    def deco(fn: Callable) -> Callable:
        existing = list(getattr(fn, _ATTR, ()))
        if any(e.name == exp.name for e in existing):
            raise ValueError(f"expectation {exp.name!r} declared twice on {fn}")
        # prepend: decorators stack bottom-up, so declaration order reads
        # top-down like DLT's
        setattr(fn, _ATTR, (exp, *existing))
        return fn

    return deco


def expect(name: str, condition: str):
    """Record-only constraint (DLT ``@dp.expect``): violations are counted
    but rows flow through."""
    return _decorate(name, condition, "keep")


def expect_or_drop(name: str, condition: str):
    """Filtering constraint (DLT ``@dp.expect_or_drop``): violating rows are
    dropped from the dataset (a plain pushdown-eligible filter)."""
    return _decorate(name, condition, "drop")


def expect_or_fail(name: str, condition: str):
    """Aborting constraint (DLT ``@dp.expect_or_fail``): the FIRST violating
    row raises executor-side and fails the pipeline update."""
    return _decorate(name, condition, "fail")


def expect_or_quarantine(name: str, condition: str):
    """Routing constraint: violating rows leave the dataset (like ``drop``)
    but stay ADDRESSABLE as a quarantine relation (``quarantine_rows`` /
    ``PipelineContext.quarantine``) for triage — the expectations analog of
    the suite's malformed-CSV quarantine (sources/files.py::
    split_valid_corrupt). DLT core ships drop-or-fail only; quarantine is
    the standard production pattern layered on top (route, don't lose)."""
    return _decorate(name, condition, "quarantine")


def expectations_of(fn: Callable) -> tuple[Expectation, ...]:
    return tuple(getattr(fn, _ATTR, ()))


def apply_expectations(
    df: DataFrame, expectations: Sequence[Expectation], dataset: str = "<dataset>"
) -> DataFrame:
    """Enforce the declared policies inside the dataset's own plan.

    ``drop``/``quarantine`` → ``filter(passes)`` (the quarantined
    complement is materialized separately by ``quarantine_rows``);
    ``fail`` → a filter whose false branch is ``raise_error`` (abort on
    first violation, no extra pass); ``keep`` → untouched. Order follows
    declaration order: a row dropped by an earlier expectation is never
    seen by a later ``fail``.
    """
    out = df
    for exp in expectations:
        if exp.policy == "quarantine":
            out = out.filter(F.expr(exp.condition))
            continue
        if exp.policy == "drop":
            # plain SQL ternary logic: a NULL condition already fails the
            # filter, so this IS NULL-is-violation — and unlike a
            # coalesce(cond, false) wrapper, the bare predicate is
            # pushdown-translatable (lands in the parquet scan's
            # PushedFilters; verified by test_registry.py)
            out = out.filter(F.expr(exp.condition))
        elif exp.policy == "fail":
            out = out.filter(
                F.when(exp.passes(), F.lit(True)).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                f"expectation {exp.name!r} violated on "
                                f"dataset {dataset!r} "
                                f"(condition: {exp.condition}); row: "
                            ),
                            F.to_json(F.struct("*")),
                        )
                    )
                )
            )
    return out


def quarantine_rows(
    df: DataFrame, expectations: Sequence[Expectation], dataset: str = "<dataset>"
) -> DataFrame:
    """The quarantine relation: every row a ``quarantine`` constraint routed
    OUT of the dataset, tagged with the violated constraint's name in
    ``_violated``. Replays the enforcement chain so ordering semantics
    match ``apply_expectations`` exactly — a row removed by an EARLIER
    drop/quarantine constraint is not re-quarantined by a later one, and
    kept ∪ quarantined = post-drop input, disjointly (the complement of a
    plain SQL filter is cond-false-or-NULL, which is ``~passes()``).

    Plan shape: one extra filter branch per quarantine constraint over the
    same scan — Spark shares the scan across branches when the consumer
    materializes both (and at worst re-scans; never shuffles).
    """
    out = df
    parts: list[DataFrame] = []
    for exp in expectations:
        if exp.policy == "drop":
            out = out.filter(F.expr(exp.condition))
        elif exp.policy == "quarantine":
            parts.append(
                out.filter(~exp.passes()).withColumn(
                    "_violated", F.lit(exp.name)
                )
            )
            out = out.filter(F.expr(exp.condition))
        # keep: no effect on routing; fail: aborts the main relation, not a
        # routing policy
    if not parts:
        raise ValueError(
            f"quarantine_rows: dataset {dataset!r} declares no quarantine "
            "expectations"
        )
    q = parts[0]
    for p in parts[1:]:
        q = q.unionByName(p)
    return q


def expectation_counters(
    df: DataFrame, expectations: Sequence[Expectation], dataset: str = "<dataset>"
) -> DataFrame:
    """Violation counters as ONE aggregate pass over the PRE-enforcement
    dataset: per expectation ``(dataset, expectation, policy, n_rows,
    n_violations, violation_ppm)``. All expectations' counts reduce in the
    same map-side-combined aggregate; the per-expectation rows come from
    exploding an array of structs built from the aggregate's single row —
    no per-expectation scans, no driver loop, no collect."""
    if not expectations:
        raise ValueError("expectation_counters: no expectations declared")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")] + [
        F.sum((~e.passes()).cast("bigint")).cast("bigint").alias(f"_v{i}")
        for i, e in enumerate(expectations)
    ]
    one = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(e.name).alias("expectation"),
                F.lit(e.policy).alias("policy"),
                F.col(f"_v{i}").alias("n_violations"),
            )
            for i, e in enumerate(expectations)
        ]
    )
    return one.select(
        F.lit(dataset).alias("dataset"),
        F.col("_n").alias("n_rows"),
        F.explode(structs).alias("e"),
    ).select(
        "dataset",
        F.col("e.expectation").alias("expectation"),
        F.col("e.policy").alias("policy"),
        "n_rows",
        F.col("e.n_violations").alias("n_violations"),
        F.when(F.col("n_rows") > 0, F.floor(F.col("e.n_violations") * 1000000 / F.col("n_rows")))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("violation_ppm"),
    )
