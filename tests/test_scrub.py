"""PII scrubbing (operators/text.py scrub_pii): planted-fixture behavior and
DuckDB oracle parity of the chained regex (RE2 vs Java regex agreement on
the restricted pattern syntax)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle import diff, duckdb_connection
from sheetreader_duckdb_spark.operators import text as X
from sheetreader_duckdb_spark.tables import T


def test_scrub_planted_fixtures(spark):
    rows = [
        (1, "contact me at jane.doe+x@example.co.uk for details"),
        (2, "see https://example.com/a?b=c#frag and http://t.co/xyz now"),
        (3, "call +1 (555) 123-4567 or 555-123-4567 today"),
        (4, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["s"] for r in df.select("id", X.scrub_pii(F.col("text")).alias("s")).collect()}
    assert got[1] == "contact me at [EMAIL] for details"
    assert got[2] == "see [URL] and [URL] now"
    assert "[PHONE]" in got[3] and "4567" not in got[3]
    assert got[4] == "no pii here at all"


def test_scrub_matches_oracle_on_documents(spark, sf_dir):
    """Same chained regex in DuckDB (RE2) must produce identical text."""
    con = duckdb_connection(sf_dir)
    d = T(spark, sf_dir, "documents")
    sdf = d.select("doc_id", X.scrub_pii(F.col("text")).alias("scrubbed"))
    expr = "text"
    for _name, pattern, token in X.SCRUB_PATTERNS:
        pat = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat}', '{token}', 'g')"
    assert diff(sdf, con, f"SELECT doc_id, {expr} AS scrubbed FROM documents") == []


def test_scrub_zero_shuffle(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    plan = (
        d.select("doc_id", X.scrub_pii(F.col("text")).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
