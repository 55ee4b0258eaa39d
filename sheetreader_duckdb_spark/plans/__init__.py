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
    """Register a (Spark program, DuckDB oracle SQL) pair.

    Each registered query releases the previous query's deferred operator
    caches on construction (session.release_deferred) — so a sequential
    corpus run (driver, bench, tests) holds at most one query's persisted
    intermediates at a time, with no eager checkpoint cost inside any
    single query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            from sheetreader_duckdb_spark.session import release_deferred

            release_deferred()
            return fn(spark, sf_dir)

        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(name=name, fn=run, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules that populate REGISTRY.
    from sheetreader_duckdb_spark.plans import relational  # noqa: F401
    from sheetreader_duckdb_spark.plans import tpch  # noqa: F401
    from sheetreader_duckdb_spark.plans import northstar  # noqa: F401
    from sheetreader_duckdb_spark.plans import ingestion  # noqa: F401
    from sheetreader_duckdb_spark.plans import streaming_queries  # noqa: F401

    return dict(REGISTRY)
