"""Quality filtering (operators/text.py quality_keep): DuckDB oracle parity
of the keep decision, scan-speed plan, and threshold behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle import diff, duckdb_connection
from sheetreader_duckdb_spark.operators import text as X
from sheetreader_duckdb_spark.tables import T

# DuckDB side generated from the SAME rules dict as the Spark side.
_SQL = f"SELECT doc_id, {X.quality_keep_sql('text')} AS keep FROM documents"


def test_quality_keep_matches_oracle(spark, sf_dir):
    con = duckdb_connection(sf_dir)
    d = T(spark, sf_dir, "documents")
    sdf = d.select("doc_id", X.quality_keep(F.col("text")).alias("keep"))
    assert diff(sdf, con, _SQL) == []


def test_quality_keep_splits_corpus(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    counts = dict(
        d.select(X.quality_keep(F.col("text")).alias("k")).groupBy("k").count().collect()
    )
    assert counts.get(True, 0) > 0  # the synthetic corpus is mostly real text
    assert sum(counts.values()) == d.count()


def test_quality_keep_zero_shuffle(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    plan = (
        d.select("doc_id", X.quality_keep(F.col("text")).alias("keep"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_custom_rules(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    # impossible band -> keeps nothing
    none = d.filter(X.quality_keep(F.col("text"), {"n_ws_tokens": (10**9, 10**10)}))
    assert none.count() == 0
