"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship TPC-H Q1 over sf0.001.
``queries()`` / ``oracle_sql()`` — assembled from the package's query registry
(sheetreader_duckdb_spark.plans): every implemented operator from SURVEY.md §2
appears in both dicts (oracle omitted only for non-SQL-expressible ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sheetreader_duckdb_spark.plans import all_queries
    from sheetreader_duckdb_spark.session import configure_session

    configure_session(spark)
    return all_queries()["h08_agg_tpch_q1"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sheetreader_duckdb_spark.plans import all_queries
    from sheetreader_duckdb_spark.session import configure_session

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return spec.fn(spark, sf_dir)

        return run

    return {name: wrap(spec) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from sheetreader_duckdb_spark.plans import all_queries

    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None}
