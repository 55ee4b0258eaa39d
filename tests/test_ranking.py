"""Distributed global ranking operator (operators/ranking.py): equivalence
with Spark's single-partition window on edge shapes — ties broken by a
unique key, n < n_tiles, uneven tile sizes — and the no-single-partition
plan property."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators.ranking import (
    with_global_ntile,
    with_global_rank,
)


def _reference(spark, rows, n_tiles):
    df = spark.createDataFrame(rows, "id long, key double")
    w = Window.orderBy("key", "id")
    return {
        (r["id"], r["rn"], r["tile"])
        for r in df.select(
            "id",
            F.row_number().over(w).cast("long").alias("rn"),
            F.ntile(n_tiles).over(w).cast("long").alias("tile"),
        ).collect()
    }


@pytest.mark.parametrize(
    "n_rows,n_tiles",
    [(1, 4), (3, 4), (4, 4), (10, 4), (103, 4), (103, 7), (64, 8)],
)
def test_global_ntile_matches_window(spark, n_rows, n_tiles):
    # keys with heavy ties: key = id % 5 → tie-break on id required
    rows = [(i, float(i % 5)) for i in range(n_rows)]
    df = spark.createDataFrame(rows, "id long, key double")
    got = {
        (r["id"], r["rn"], r["tile"])
        for r in with_global_ntile(
            df, ["key", "id"], n_tiles=n_tiles, num_partitions=4
        ).collect()
    }
    assert got == _reference(spark, rows, n_tiles)


def test_global_rank_dense_sequence(spark):
    rows = [(i, float(997 - i)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, key double")
    out = with_global_rank(df, ["key", "id"], num_partitions=8).collect()
    ranks = sorted(r["rn"] for r in out)
    assert ranks == list(range(1, 201))
    # descending key → rank order is reverse id order
    by_rank = {r["rn"]: r["id"] for r in out}
    assert by_rank[1] == 199 and by_rank[200] == 0


def test_plan_has_no_partitionless_window(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(50)], "id long, key double")
    ranked = with_global_ntile(df, ["key", "id"], n_tiles=4, num_partitions=4)
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_pid" in line  # every window is partitioned by _pid


def test_deferred_release_bounds_cache(spark):
    """The internal range-shuffle cache must survive until the lazy result
    is consumed, then be released by session.release_deferred (which every
    declared query's wrapper calls on construction) — so a corpus run holds
    at most one query's intermediates (ADVICE r02, without the eager
    checkpoint's extra write+read of the result)."""
    from sheetreader_duckdb_spark.session import release_deferred

    release_deferred()  # clean slate
    sc = spark.sparkContext._jsc.sc()
    base = sc.getPersistentRDDs().size()
    df = spark.createDataFrame([(i, float(i % 7)) for i in range(300)], "id long, key double")
    out = with_global_rank(df, ["key", "id"], num_partitions=4)
    # Cache alive while the result is consumed (correct ranks), ...
    assert sorted(r["rn"] for r in out.collect()) == list(range(1, 301))
    assert sc.getPersistentRDDs().size() == base + 1
    # ... then released wholesale — nothing persists after the drain.
    assert release_deferred() == 1
    assert sc.getPersistentRDDs().size() == base

    out2 = with_global_ntile(df, ["key", "id"], n_tiles=4, num_partitions=4)
    assert out2.count() == 300
    assert release_deferred() == 1
    assert sc.getPersistentRDDs().size() == base


def test_declared_query_construction_releases_previous_caches(spark):
    """Constructing any declared query drains the deferred-release registry:
    h12c (global ntile) leaves its range shuffle deferred; building the next
    query must release it."""
    from sheetreader_duckdb_spark.plans import all_queries
    from sheetreader_duckdb_spark.session import release_deferred

    release_deferred()
    sc = spark.sparkContext._jsc.sc()
    base = sc.getPersistentRDDs().size()
    corpus = all_queries()
    out = corpus["h12c_global_ntile"].fn(spark, "/root/testdata/sf0.001")
    assert out.count() > 0
    assert sc.getPersistentRDDs().size() == base + 1
    corpus["h13_sort_topk"].fn(spark, "/root/testdata/sf0.001")
    assert sc.getPersistentRDDs().size() == base
