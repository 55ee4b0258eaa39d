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


def test_eager_release_unpersists_intermediate(spark):
    """eager_release must drop the internal range-shuffle cache before
    returning: exactly ONE persistent RDD may remain (the checkpointed
    result, whose lifetime the caller owns) — two would mean the
    intermediate leaked (ADVICE r02)."""
    sc = spark.sparkContext._jsc.sc()
    base = sc.getPersistentRDDs().size()
    df = spark.createDataFrame([(i, float(i % 7)) for i in range(300)], "id long, key double")
    out = with_global_rank(df, ["key", "id"], num_partitions=4, eager_release=True)
    assert sc.getPersistentRDDs().size() == base + 1
    # and the result is still correct after the release
    assert sorted(r["rn"] for r in out.collect()) == list(range(1, 301))

    out2 = with_global_ntile(
        df, ["key", "id"], n_tiles=4, num_partitions=4, eager_release=True
    )
    assert sc.getPersistentRDDs().size() == base + 2  # one per checkpointed result
    assert out2.count() == 300
