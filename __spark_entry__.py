"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star query at sf0.001; ``queries()`` maps
every implemented operator from SURVEY.md §2 (plus extension operators) to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the DuckDB
oracle for each SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: lineitem ⋈ orders ⋈ broadcast(customer) star join →
    exact-decimal revenue by order month × market segment."""
    from adventureworkslakehousepoc_spark.queries.parity import flagship

    return flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from adventureworkslakehousepoc_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from adventureworkslakehousepoc_spark.queries import all_oracles

    return all_oracles()
