"""as_of_join (operators/temporal.py): equivalence with the brute-force
range-join + argmax definition, exact-tie semantics, no-match NULLs,
tolerance, and the one-shuffle/no-nested-loop plan property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators.temporal import as_of_join


@pytest.fixture(scope="module")
def frames(spark):
    quotes = spark.createDataFrame(
        [
            (1, 10, 100.0), (1, 20, 110.0), (1, 30, 120.0),
            (2, 15, 50.0), (2, 15, 50.0),  # duplicate quote, same value
            (3, 99, 9.0),
        ],
        "key long, ts long, px double",
    )
    probes = spark.createDataFrame(
        [
            (1, 5, "a"),   # before any quote → NULL
            (1, 10, "b"),  # exact tie → matches ts=10
            (1, 25, "c"),  # between → ts=20
            (1, 99, "d"),  # after all → ts=30
            (2, 16, "e"),
            (3, 98, "f"),  # quote is later → NULL
            (4, 50, "g"),  # key with no quotes at all
        ],
        "key long, ts long, tag string",
    )
    return probes, quotes


def _brute_force(spark, probes, quotes):
    p = probes.alias("p")
    q = quotes.select(
        F.col("key").alias("qk"), F.col("ts").alias("qts"), "px"
    ).alias("q")
    joined = p.join(q, (F.col("p.key") == F.col("qk")) & (F.col("qts") <= F.col("p.ts")), "left")
    best = joined.groupBy("key", "ts", "tag").agg(F.max("qts").alias("quote_ts"))
    return (
        best.join(
            q, (best.key == F.col("qk")) & (best.quote_ts == F.col("qts")), "left"
        )
        .select("key", "ts", "tag", "px", "quote_ts")
        .dropDuplicates(["key", "ts", "tag"])
    )


def test_as_of_matches_brute_force(spark, frames):
    probes, quotes = frames
    got = {
        (r["key"], r["ts"], r["tag"]): (r["px"], r["quote_ts"])
        for r in as_of_join(probes, quotes, ["key"], "ts", ["px"]).collect()
    }
    want = {
        (r["key"], r["ts"], r["tag"]): (r["px"], r["quote_ts"])
        for r in _brute_force(spark, probes, quotes).collect()
    }
    assert got == want
    assert got[(1, 10, "b")] == (100.0, 10)  # exact tie matches
    assert got[(1, 5, "a")] == (None, None)
    assert got[(4, 50, "g")] == (None, None)


def test_as_of_tolerance(spark, frames):
    probes, quotes = frames
    out = {
        (r["key"], r["ts"]): (r["px"], r["quote_ts"])
        for r in as_of_join(
            probes, quotes, ["key"], "ts", ["px"], tolerance=F.lit(10)
        ).collect()
    }
    assert out[(1, 25)] == (110.0, 20)  # within 10
    assert out[(1, 99)] == (None, None)  # 99-30 > 10 → stale
    assert out[(2, 16)] == (50.0, 15)


def test_as_of_plan_is_single_shuffle_no_nested_loop(spark, frames):
    probes, quotes = frames
    plan = (
        as_of_join(probes, quotes, ["key"], "ts", ["px"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # one data shuffle: the window's hashpartitioning on the key
    assert plan.count("Exchange hashpartitioning") == 1


def test_as_of_rejects_column_clash(spark, frames):
    probes, quotes = frames
    with pytest.raises(ValueError, match="collide"):
        as_of_join(probes, quotes.withColumnRenamed("px", "tag"), ["key"], "ts", ["tag"])
