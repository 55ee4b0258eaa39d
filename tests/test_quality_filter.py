"""Quality filtering (operators/text.py quality_keep): DuckDB oracle parity
of the keep decision, scan-speed plan, and threshold behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle import diff, duckdb_connection
from sheetreader_duckdb_spark.operators import text as X
from sheetreader_duckdb_spark.tables import T

# DuckDB rendering of the same signals (matches n07's SQL fragments).
_STOP_SET = ", ".join(f"'{w}'" for w in X.STOPWORDS)
_SQL = f"""
WITH sig AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
           CAST(length(replace(text, ' ', '')) AS BIGINT) AS non_space,
           CAST(len(list_filter(string_split(lower(text), ' '),
                    x -> x IN ({_STOP_SET}))) AS BIGINT) AS n_stop
    FROM documents
)
SELECT doc_id,
       (n_ws BETWEEN 50 AND 100000)
       AND (non_space / n_ws BETWEEN 3 AND 10)
       AND (n_stop / n_ws BETWEEN 0.01 AND 1.0) AS keep
FROM sig
"""


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
