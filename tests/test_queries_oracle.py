"""Differential test: every registered query vs the DuckDB oracle (the local
replica of the driver's t2 gate). Runs at sf0.001 by default; set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full-size check."""

from __future__ import annotations

import pytest

from sheetreader_duckdb_spark.plans import all_queries
from tests.oracle import diff, duckdb_connection

QUERIES = all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors driver behavior
        return
    problems = diff(df, con, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_contract_shapes():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
