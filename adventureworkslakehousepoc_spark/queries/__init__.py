"""Query registry: maps SURVEY.md §2 inventory rows (and extension operators)
to (Spark callable, DuckDB oracle SQL) pairs consumed by ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import parity

    out: dict[str, Callable] = {}
    out.update(parity.QUERIES)
    try:
        from . import extensions

        out.update(extensions.QUERIES)
    except ImportError:
        pass
    return out


def all_oracles() -> dict[str, str]:
    from . import parity

    out: dict[str, str] = {}
    out.update(parity.ORACLE)
    try:
        from . import extensions

        out.update(extensions.ORACLE)
    except ImportError:
        pass
    return out
