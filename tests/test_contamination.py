"""Eval-set decontamination (operators/dedup.py contamination): DuckDB oracle
parity over the hash-split corpus, synthetic contaminated fixture, and plan
shape (no cross products, distinct-gram build side)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle import diff, duckdb_connection
from sheetreader_duckdb_spark.operators import sampling as SM
from sheetreader_duckdb_spark.operators.dedup import contamination
from sheetreader_duckdb_spark.tables import T

WEIGHTS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
K = 3  # small k so the synthetic corpus has real overlap to detect


def _splits(spark, sf_dir):
    d = T(spark, sf_dir, "documents").withColumn(
        "split", SM.hash_split("doc_id", WEIGHTS, seed="corpus-v1")
    )
    return d.filter(F.col("split") == "train"), d.filter(F.col("split") != "train")


def test_contamination_matches_oracle(spark, sf_dir):
    con = duckdb_connection(sf_dir)
    train, ev = _splits(spark, sf_dir)
    sdf = contamination(train, ev, "doc_id", "text", k=K)
    case = SM.split_case_sql("doc_id", WEIGHTS, seed="corpus-v1")
    sql = f"""
    WITH tagged AS (SELECT doc_id, text, {case} AS split FROM documents),
    tr_sh AS (
        SELECT DISTINCT w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3] AS sh
        FROM (SELECT w, unnest(range(len(w) - 2)) AS i
              FROM (SELECT string_split(lower(text), ' ') AS w
                    FROM tagged WHERE split = 'train')
              WHERE len(w) >= 3)
    ),
    ev_sh AS (
        SELECT DISTINCT doc_id, w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3] AS sh
        FROM (SELECT doc_id, w, unnest(range(len(w) - 2)) AS i
              FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                    FROM tagged WHERE split != 'train')
              WHERE len(w) >= 3)
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
              FROM ev_sh GROUP BY doc_id),
    hits AS (SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
             FROM ev_sh e JOIN tr_sh t USING (sh) GROUP BY e.doc_id)
    SELECT h.doc_id AS id, h.n_hits, s.n_shingles,
           h.n_hits / s.n_shingles AS hit_ratio
    FROM hits h JOIN sizes s USING (doc_id)
    """
    assert diff(sdf, con, sql) == []


def test_planted_contamination_detected(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [
            (10, "something about the quick brown fox jumps over the lazy dog"),
            (11, "entirely unrelated words with no shared grams at all here"),
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in contamination(train, ev, "doc_id", "text", k=8).collect()}
    assert 10 in got and 11 not in got
    assert got[10]["n_hits"] >= 1


def test_no_cartesian_in_plan(spark, sf_dir):
    train, ev = _splits(spark, sf_dir)
    plan = (
        contamination(train, ev, "doc_id", "text", k=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_broadcast_eval_is_result_identical(spark, sf_dir):
    """The broadcast-eval path must return EXACTLY the default result
    (the pre-distinct semi join drops only grams the exact join would
    drop), with the broadcast probe visible in the executed plan and the
    train-side distinct operating on the residue above it."""
    from sheetreader_duckdb_spark.tables import T

    d = T(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 3 != 0)
    ev = d.filter(F.col("doc_id") % 3 == 0).limit(40)
    plain = {
        (r.id, r.n_hits, r.n_shingles)
        for r in contamination(train, ev, "doc_id", "text", k=8).collect()
    }
    fast = contamination(
        train, ev, "doc_id", "text", k=8, broadcast_eval=True
    )
    got = {(r.id, r.n_hits, r.n_shingles) for r in fast.collect()}
    assert got == plain and plain  # non-trivial corpus overlap exists
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_broadcast_eval_empty_eval(spark, sf_dir):
    from sheetreader_duckdb_spark.tables import T

    d = T(spark, sf_dir, "documents")
    empty = d.filter(F.lit(False))
    assert (
        contamination(d, empty, "doc_id", "text", broadcast_eval=True).count()
        == 0
    )
