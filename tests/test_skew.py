"""Salted two-phase aggregation (operators/skew.py): exact equivalence with
the plain groupBy on real tables, an adversarial 99%-one-key fixture, and
the bounded-phase-2 property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators.skew import salted_agg
from sheetreader_duckdb_spark.tables import T

AGGS = {
    "n": ("count", "*"),
    "qty": ("sum", "l_quantity"),
    "mn": ("min", "l_discount"),
    "mx": ("max", "l_extendedprice"),
    "avg_qty": ("avg", "l_quantity"),
}


def _plain(df):
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("qty"),
        F.min("l_discount").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
        F.avg("l_quantity").alias("avg_qty"),
    )


def test_equivalence_on_lineitem(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    got = {tuple(r) for r in salted_agg(li, ["l_returnflag"], AGGS, n_salts=16).collect()}
    expect = {tuple(r) for r in _plain(li).collect()}
    assert got == expect


def test_adversarial_heavy_hitter(spark):
    # 99% of rows share one key — the shape that stalls an unsalted reducer.
    rows = [(("hot" if i % 100 else f"cold{i}"), i % 7, float(i % 11)) for i in range(5000)]
    df = spark.createDataFrame(rows, "k string, a long, b double")
    aggs = {
        "n": ("count", "*"),
        "sa": ("sum", "a"),
        "mn": ("min", "b"),
        "mx": ("max", "b"),
        "avg_a": ("avg", "a"),
    }
    got = {tuple(r) for r in salted_agg(df, ["k"], aggs, n_salts=8).collect()}
    expect = {
        tuple(r)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("a").alias("sa"),
            F.min("b").alias("mn"),
            F.max("b").alias("mx"),
            F.avg("a").alias("avg_a"),
        )
        .collect()
    }
    assert got == expect


def test_phase2_rows_bounded(spark):
    rows = [("hot", i) for i in range(2000)] + [("cold", 1)]
    df = spark.createDataFrame(rows, "k string, v long")
    n_salts = 8
    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy("k", "__salt").agg(F.sum("v").alias("s"))
    # phase-2 input ≤ distinct_keys × n_salts regardless of skew
    assert partial.count() <= 2 * n_salts


def test_identical_duplicate_rows_spread_across_salts(spark):
    """The motivating case: byte-identical rows (one template document
    repeated). A content-derived salt would put them all on one reducer;
    the row-position salt must spread them AND aggregate exactly."""
    df = spark.createDataFrame([("tpl", 1.0)] * 4000, "k string, v double").repartition(4)
    n_salts = 8
    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    used = salted.select("__salt").distinct().count()
    assert used == n_salts  # duplicates spread over every salt
    got = salted_agg(df, ["k"], {"n": ("count", "*"), "s": ("sum", "v")}, n_salts=n_salts)
    assert [tuple(r) for r in got.collect()] == [("tpl", 4000, 4000.0)]


def test_rejects_unsupported(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError):
        salted_agg(li, ["l_returnflag"], {"x": ("median", "l_quantity")})
    with pytest.raises(ValueError):
        salted_agg(li, ["l_returnflag"], {"n": ("count", "*")}, n_salts=0)
