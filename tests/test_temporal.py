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


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_as_of_matches_plain_on_hot_key(spark):
    """VERDICT r3 item 6: adversarial one-key fixture — 99% of probes and
    quotes on one key — through the salted variant must match the plain
    as_of_join exactly (including the no-match NULLs and tie semantics)."""
    from sheetreader_duckdb_spark.operators.temporal import as_of_join_salted

    hot_q = [(7, t * 10, float(100 + t)) for t in range(50)]
    cold_q = [(1, 25, 1.5), (2, 5, 2.5)]
    quotes = spark.createDataFrame(hot_q + cold_q, "key long, ts long, px double")
    hot_p = [(7, t * 3 + 1, f"h{t}") for t in range(400)]
    cold_p = [(1, 30, "c1"), (2, 4, "c2"), (3, 9, "c3")]
    probes = spark.createDataFrame(hot_p + cold_p, "key long, ts long, tag string")

    plain = _rows(as_of_join(probes, quotes, ["key"], "ts", ["px"]))
    salted = _rows(as_of_join_salted(probes, quotes, ["key"], "ts", ["px"], n_salts=8))
    assert salted == plain

    hot = spark.createDataFrame([(7,)], "key long")
    split = _rows(
        as_of_join_salted(
            probes, quotes, ["key"], "ts", ["px"], n_salts=8, hot_keys=hot
        )
    )
    assert split == plain


def test_salted_as_of_tolerance_matches_plain(spark):
    from sheetreader_duckdb_spark.operators.temporal import as_of_join_salted

    quotes = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 110.0), (1, 30, 120.0)], "key long, ts long, px double"
    )
    probes = spark.createDataFrame(
        [(1, t, f"p{t}") for t in range(5, 100, 7)], "key long, ts long, tag string"
    )
    plain = _rows(as_of_join(probes, quotes, ["key"], "ts", ["px"], tolerance=F.lit(10)))
    salted = _rows(
        as_of_join_salted(
            probes, quotes, ["key"], "ts", ["px"], tolerance=F.lit(10), n_salts=4
        )
    )
    assert salted == plain


def test_salted_as_of_spreads_hot_key_partitions(spark):
    """The point of the salt: the hot key's probes occupy n_salts window
    partitions, not one. Window partition key = (key, salt), so distinct
    (key, salt) combos for the hot key must equal n_salts."""
    from sheetreader_duckdb_spark.operators.temporal import as_of_join_salted

    quotes = spark.createDataFrame([(7, 0, 1.0)], "key long, ts long, px double")
    probes = spark.createDataFrame(
        [(7, t, f"p{t}") for t in range(256)], "key long, ts long, tag string"
    )
    out = as_of_join_salted(probes, quotes, ["key"], "ts", ["px"], n_salts=8)
    assert out.count() == 256  # every probe matched
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__asof_salt" in plan  # the window really partitions on the salt
