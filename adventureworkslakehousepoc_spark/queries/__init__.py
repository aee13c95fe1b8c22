"""Query registry: maps SURVEY.md §2 inventory rows (and extension operators)
to (Spark callable, DuckDB oracle SQL) pairs consumed by ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import advanced, analytics, extensions, parity, streaming_queries, tpch_suite

    out: dict[str, Callable] = {}
    out.update(parity.QUERIES)
    out.update(extensions.QUERIES)
    out.update(streaming_queries.QUERIES)
    out.update(analytics.QUERIES)
    out.update(advanced.QUERIES)
    out.update(tpch_suite.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    from . import advanced, analytics, extensions, parity, streaming_queries, tpch_suite

    out: dict[str, str] = {}
    out.update(parity.ORACLE)
    out.update(extensions.ORACLE)
    out.update(streaming_queries.ORACLE)
    out.update(analytics.ORACLE)
    out.update(advanced.ORACLE)
    out.update(tpch_suite.ORACLE)
    return out
