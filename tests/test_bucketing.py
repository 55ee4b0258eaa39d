"""Bucketed co-located joins (operators/bucketing.py): the written pair joins
with NO Exchange on either side, results match the plain shuffle join, and
bucket pruning kicks in for key-equality filters."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators.bucketing import write_bucketed
from sheetreader_duckdb_spark.tables import T

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bucketed"))
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(
        orders, "b_orders", "o_orderkey", N_BUCKETS,
        sort_by="o_orderkey", path=os.path.join(root, "orders"),
    )
    write_bucketed(
        lineitem, "b_lineitem", "l_orderkey", N_BUCKETS,
        sort_by="l_orderkey", path=os.path.join(root, "lineitem"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _join(spark, bucketed_pair):
    o, l = bucketed_pair
    return (
        spark.table(o)
        .join(spark.table(l), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _join(spark, bucketed_pair)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    join_part = plan.split("HashAggregate")[-1]  # below the agg: the join itself
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_part  # co-located: neither side shuffles


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_pair):
    got = {tuple(r) for r in _join(spark, bucketed_pair).collect()}
    orders = T(spark, sf_dir, "orders")
    lineitem = T(spark, sf_dir, "lineitem")
    expect = {
        tuple(r)
        for r in (
            orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
            .collect()
        )
    }
    assert got == expect


def test_bucket_pruning_on_key_filter(spark, bucketed_pair):
    # DisableUnnecessaryBucketedScan drops the bucketed layout for a bare
    # filter; pin autoBucketedScan off to observe the pruning itself.
    o, _ = bucketed_pair
    any_key = spark.table(o).select("o_orderkey").first()[0]
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        plan = (
            spark.table(o)
            .filter(F.col("o_orderkey") == any_key)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    assert "SelectedBucketsCount: 1 out of" in plan


def test_rejects_bad_buckets(spark, sf_dir):
    d = T(spark, sf_dir, "orders")
    with pytest.raises(ValueError):
        write_bucketed(d, "t", "o_orderkey", 0)
