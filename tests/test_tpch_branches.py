"""Full-fidelity per-branch oracle diffs for the adapted TPC-H suite.

The driver sees the suite as two tagged-union entries (t01/t03 — the
CORRECTNESS log caps at 50 rows); this file keeps every branch verified
against its OWN oracle on its native columns, so a mapping bug in the
union projection cannot mask a branch regression (and vice versa)."""

from __future__ import annotations

import pytest

from sheetreader_duckdb_spark.plans.tpch import TPCH_BRANCHES
from tests.oracle import diff, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(TPCH_BRANCHES))
def test_branch_matches_oracle(name, spark, sf_dir, con):
    fn, oracle, _doc = TPCH_BRANCHES[name]
    problems = diff(fn(spark, sf_dir), con, oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_branch_inventory():
    # The union maps in plans/tpch.py must cover every collected branch.
    from sheetreader_duckdb_spark.plans.tpch import _AGG_MAP, _SUBQ_MAP

    assert set(_AGG_MAP) | set(_SUBQ_MAP) == set(TPCH_BRANCHES)
    assert not set(_AGG_MAP) & set(_SUBQ_MAP)
    assert len(TPCH_BRANCHES) == 19
