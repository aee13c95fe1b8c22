"""Query registry: maps SURVEY.md §2 inventory rows (and extension operators)
to (Spark callable, DuckDB oracle SQL) pairs consumed by ``__spark_entry__``.

Registration ORDER matters: the driver's per-round correctness pass covers a
50-query prefix of the registry, so each round must front the queries most
in need of a fresh driver row. Rounds 4 and 5 both overflowed hand-planned
windows; since round 6 the order is MECHANICAL, derived from the row-age
ledger (``_row_age.py``, regenerated per round by ``scripts/row_age.py``):

1. queries with NO driver row ever (new this round, or prior-round window
   overflow), in registration order;
2. ``_CHANGED_OUTPUT`` — queries whose output changed after their last
   green driver row, so the old row no longer attests current behavior;
3. everything else ascending by (last-verified round, name) — the stalest
   rows refresh first, automatically.

tests/test_registry.py::test_round6_driver_window_composition enforces the
derivation (and that groups 1+2 actually fit the 50-slot window), so a new
registration can never silently land past position 50 again.

Every registered query is ALSO oracle-compared locally by
tests/test_oracle_parity.py each session regardless of window position.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import _row_age
from ._row_age import LAST_VERIFIED

# Driver window size (prefix of the registry the driver's correctness pass
# covers each round).
DRIVER_WINDOW = 50

# Queries whose OUTPUT changed after their last green driver row — derived
# MECHANICALLY by scripts/row_age.py from per-query output fingerprints
# (sha256 of oracle SQL + canonical sf0.001 DuckDB result): a drift against
# the previous ledger's fingerprint flags the query until a fresh driver
# row attests the new behavior. The former hand-maintained list silently
# missed text_boilerplate_flags for two rounds; nothing is hand-edited now.
# (getattr: tolerate a pre-fingerprint ledger during regeneration itself.)
_CHANGED_OUTPUT = tuple(getattr(_row_age, "CHANGED_OUTPUT", ()))


def _round6_order(merged: dict) -> dict:
    """Mechanical driver-window ordering from the row-age ledger:
    never-verified first (registration order), then changed-output rows,
    then everything ascending by (last-verified round, name)."""
    never = [k for k in merged if k not in LAST_VERIFIED]
    changed = [k for k in _CHANGED_OUTPUT if k in merged and k not in never]
    rest = sorted(
        (k for k in merged if k not in never and k not in changed),
        key=lambda k: (LAST_VERIFIED[k], k),
    )
    return {k: merged[k] for k in (*never, *changed, *rest)}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import advanced, analytics, extensions, parity, streaming_queries, tpch_suite

    out: dict[str, Callable] = {}
    out.update(parity.QUERIES)
    out.update(extensions.QUERIES)
    out.update(streaming_queries.QUERIES)
    out.update(analytics.QUERIES)
    out.update(advanced.QUERIES)
    out.update(tpch_suite.QUERIES)
    return _round6_order(out)


def all_oracles() -> dict[str, str]:
    from . import advanced, analytics, extensions, parity, streaming_queries, tpch_suite

    out: dict[str, str] = {}
    out.update(parity.ORACLE)
    out.update(extensions.ORACLE)
    out.update(streaming_queries.ORACLE)
    out.update(analytics.ORACLE)
    out.update(advanced.ORACLE)
    out.update(tpch_suite.ORACLE)
    return _round6_order(out)
