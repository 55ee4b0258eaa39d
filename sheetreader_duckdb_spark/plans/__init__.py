"""Query-plan corpus: the declared operator surface (SURVEY.md §2).

Every entry pairs a Spark DataFrame program with the equivalent ANSI SQL the
DuckDB oracle runs — the driver hash-compares results at sf0.01
(order-insensitive, column names matched). Registration is decorator-based so
``__spark_entry__.queries()`` / ``oracle_sql()`` are assembled automatically.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = ""):
    """Register a (Spark program, DuckDB oracle SQL) pair."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules that populate REGISTRY.
    from sheetreader_duckdb_spark.plans import relational  # noqa: F401
    from sheetreader_duckdb_spark.plans import northstar  # noqa: F401
    from sheetreader_duckdb_spark.plans import ingestion  # noqa: F401
    from sheetreader_duckdb_spark.plans import streaming_queries  # noqa: F401

    return dict(REGISTRY)
