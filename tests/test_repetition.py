"""Repetition quality signals (operators/text.py repetition_signals):
DuckDB oracle parity over the documents table and hand-computed fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle import diff, duckdb_connection
from sheetreader_duckdb_spark.operators.text import repetition_signals
from sheetreader_duckdb_spark.tables import T


def test_repetition_hand_computed(spark):
    rows = [
        # "a b a b a b": bigrams = [a b, b a, a b, b a, a b] → 5 grams,
        # counts {a b: 3, b a: 2}; top = 3/5; all 5 occurrences duplicated.
        (1, "a b a b a b"),
        # all-distinct bigrams
        (2, "w x y z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_signals(df, "doc_id", "text", n=2).collect()}
    assert got[1]["top_gram_frac"] == 3 / 5
    assert got[1]["dup_gram_frac"] == 1.0
    assert got[2]["top_gram_frac"] == 1 / 3
    assert got[2]["dup_gram_frac"] == 0.0


def test_repetition_matches_oracle(spark, sf_dir):
    con = duckdb_connection(sf_dir)
    d = T(spark, sf_dir, "documents")
    sdf = repetition_signals(d, "doc_id", "text", n=2)
    sql = """
    WITH grams AS (
        SELECT doc_id, w[i + 1] || ' ' || w[i + 2] AS g
        FROM (SELECT doc_id, w, unnest(range(len(w) - 1)) AS i
              FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                    FROM documents)
              WHERE len(w) >= 2)
    ),
    per_gram AS (
        SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c
        FROM grams GROUP BY doc_id, g
    )
    SELECT doc_id,
           MAX(c) / SUM(c) AS top_gram_frac,
           SUM(CASE WHEN c > 1 THEN c ELSE 0 END) / SUM(c) AS dup_gram_frac
    FROM per_gram GROUP BY doc_id
    """
    assert diff(sdf, con, sql) == []
