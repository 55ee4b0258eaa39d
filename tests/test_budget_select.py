"""Token-budget corpus selection (operators/sampling.py budget_select /
budget_select_global, operators/ranking.py with_global_cumsum) vs a
brute-force greedy reference, plus the no-single-partition-window plan
property of the global form."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators.ranking import with_global_cumsum
from sheetreader_duckdb_spark.operators.sampling import (
    budget_select,
    budget_select_global,
)
from sheetreader_duckdb_spark.session import release_deferred


def _ref_greedy(rows, budget):
    """rows: [(id, tokens)] already in selection order → kept ids."""
    kept, total = [], 0
    for i, t in rows:
        if total + t <= budget:
            kept.append(i)
            total += t
    return kept


def _ref_prefix(rows, budget):
    """Prefix semantics (what the operator implements): keep while the
    running total INCLUDING the row stays <= budget — a row that overflows
    stops the prefix even if a later smaller row would still fit."""
    kept, total = [], 0
    for i, t in rows:
        total += t
        if total > budget:
            break
        kept.append(i)
    return kept


def test_per_group_prefix_semantics(spark):
    # src a: tokens 40, 30, 50, 10 in rank order, budget 80 -> keep first
    # two (cum 40, 70); the 50 overflows and STOPS the prefix — the
    # trailing 10 is not taken even though 70 + 10 <= 80.
    rows = [
        ("a", 1, 1, 40), ("a", 2, 2, 30), ("a", 3, 3, 50), ("a", 4, 4, 10),
        ("b", 5, 1, 100), ("b", 6, 2, 1),
    ]
    df = spark.createDataFrame(rows, "src string, id long, rank long, toks long")
    out = budget_select(df, ["src"], ["rank", "id"], "toks", budget=80)
    kept = sorted(r["id"] for r in out.collect())
    assert kept == [1, 2]  # b's first row (100) overflows immediately

    ref_a = _ref_prefix([(1, 40), (2, 30), (3, 50), (4, 10)], 80)
    assert sorted(ref_a) == [1, 2]
    # NOTE the deliberate difference from greedy skip-and-continue:
    assert _ref_greedy([(1, 40), (2, 30), (3, 50), (4, 10)], 80) == [1, 2, 4]


def test_per_group_matches_reference_randomized(spark):
    import random

    rng = random.Random(7)
    rows = []
    for g in ("x", "y", "z"):
        for i in range(60):
            rows.append((g, len(rows), rng.randint(1, 50)))
    df = spark.createDataFrame(rows, "src string, id long, toks long")
    budget = 300
    out = budget_select(df, ["src"], ["id"], "toks", budget=budget)
    got = sorted(r["id"] for r in out.collect())
    ref = []
    for g in ("x", "y", "z"):
        grp = [(i, t) for s, i, t in rows if s == g]
        ref.extend(_ref_prefix(grp, budget))
    assert got == sorted(ref)


def test_global_cumsum_matches_serial(spark):
    rows = [(i, (i * 37) % 100 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, toks long")
    out = with_global_cumsum(df, ["id"], "toks", cum_col="cum", num_partitions=8)
    got = {r["id"]: r["cum"] for r in out.collect()}
    release_deferred()
    total = 0
    for i, t in rows:
        total += t
        assert got[i] == total


def test_global_budget_matches_per_group_single_group(spark):
    rows = [(i, (i * 13) % 40 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, toks long")
    budget = 1500
    g = budget_select_global(df, ["id"], "toks", budget, num_partitions=8)
    got = sorted(r["id"] for r in g.collect())
    release_deferred()
    ref = _ref_prefix(rows, budget)
    assert got == sorted(ref)


def test_global_form_has_no_partitionless_window(spark):
    df = spark.createDataFrame([(i, 5) for i in range(100)], "id long, toks long")
    out = budget_select_global(df, ["id"], "toks", 200, num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_pid" in line  # every window is partitioned by _pid
    release_deferred()


def test_budget_validation(spark):
    df = spark.createDataFrame([(1, 2)], "id long, toks long")
    with pytest.raises(ValueError):
        budget_select(df, ["id"], ["id"], "toks", budget=-1)
    with pytest.raises(ValueError):
        budget_select_global(df, ["id"], "toks", budget=-1)


def test_zero_budget_keeps_nothing(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "id long, toks long")
    assert budget_select(df, ["id"], ["id"], "toks", budget=0).count() == 0
