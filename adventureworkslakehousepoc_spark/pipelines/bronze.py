"""Config-driven bronze fan-out (SURVEY.md §2.1 S9).

The reference registers 68 passthrough streaming staging tables from a
``{schema: [tables]}`` dict with a closure factory
(``aw_bronze_layer/src/adventureworks/BronzeLayer/bronze_structure.ipynb``
cell-1: ``schema_groups`` + ``create_stg_table``). Same shape here: the table
list is pure config; each entry becomes a ``stg_<table>`` dataset that reads
the source (batch or stream, decided by the context's catalog reader) and
passes rows through unchanged. One consolidated pipeline fanning out to many
small sinks is the low-consumption design the reference's notebook documents.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame

from ..plans.registry import DatasetRegistry, PipelineContext

__all__ = ["bronze_fanout", "TESTDATA_SCHEMA_GROUPS"]

# testdata analog of the reference's 5-schema / 68-table schema_groups dict
TESTDATA_SCHEMA_GROUPS: dict[str, tuple[str, ...]] = {
    "sales": ("customer", "orders", "lineitem"),
    "production": ("part", "supplier"),
    "person": ("nation", "region"),
    "telemetry": ("events",),
    "corpus": ("documents", "embeddings"),
}


def bronze_fanout(
    registry: DatasetRegistry,
    schema_groups: Mapping[str, Sequence[str]] = TESTDATA_SCHEMA_GROUPS,
    prefix: str = "stg",
) -> list[str]:
    """Register one passthrough dataset per (schema, table). Returns the
    registered dataset names (``stg_<schema>__<table>`` style flattening of the
    reference's ``catalog.stg_<schema>.stg_<table>`` three-part names)."""
    names: list[str] = []

    def make(source: str, target: str) -> None:
        # closure factory, one per table — reference create_stg_table
        @registry.table(name=target, comment=f"passthrough staging of {source}")
        def _stg(ctx: PipelineContext, _source: str = source) -> DataFrame:
            return ctx.read(_source)

    for schema, tables in schema_groups.items():
        for table in tables:
            target = f"{prefix}_{schema}__{table}"
            make(table, target)
            names.append(target)
    return names
