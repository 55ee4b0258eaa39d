"""Deterministic sampling operators (operators/sampling.py): DuckDB oracle
parity for the split/sample/stratified expressions, determinism under
repartitioning, nested-sample monotonicity, and exact per-stratum counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle import diff, duckdb_connection
from sheetreader_duckdb_spark.operators import sampling as SM
from sheetreader_duckdb_spark.tables import T

WEIGHTS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_connection(sf_dir)


def test_hash_split_matches_oracle(spark, sf_dir, con):
    d = T(spark, sf_dir, "documents")
    sdf = d.select(
        "doc_id", SM.hash_split("doc_id", WEIGHTS, seed="corpus-v1").alias("split")
    )
    case = SM.split_case_sql("doc_id", WEIGHTS, seed="corpus-v1")
    assert diff(sdf, con, f"SELECT doc_id, {case} AS split FROM documents") == []


def test_hash_sample_matches_oracle(spark, sf_dir, con):
    d = T(spark, sf_dir, "documents")
    sdf = SM.hash_sample(d.select("doc_id"), "doc_id", 0.25, seed="dev")
    pred = SM.sample_predicate_sql("doc_id", 0.25, seed="dev")
    assert diff(sdf, con, f"SELECT doc_id FROM documents WHERE {pred}") == []


def test_stratified_sample_matches_oracle(spark, sf_dir, con):
    d = T(spark, sf_dir, "documents")
    sdf = SM.stratified_sample(
        d.select("doc_id", "source"), ["source"], 5, "doc_id", seed="s1"
    ).select("source", "doc_id")
    sql = """
    SELECT source, doc_id FROM (
        SELECT source, doc_id,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('s1:' || doc_id), doc_id) AS rn
        FROM documents
    ) WHERE rn <= 5
    """
    assert diff(sdf, con, sql) == []


def test_split_deterministic_under_repartition(spark, sf_dir):
    d = T(spark, sf_dir, "documents").select("doc_id")
    col = SM.hash_split("doc_id", WEIGHTS, seed="corpus-v1").alias("split")
    a = {tuple(r) for r in d.select("doc_id", col).collect()}
    b = {tuple(r) for r in d.repartition(7).select("doc_id", col).collect()}
    assert a == b


def test_split_covers_all_rows_with_sane_fractions(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    counts = dict(
        d.select(SM.hash_split("doc_id", WEIGHTS, seed="corpus-v1").alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    n = d.count()
    assert sum(counts.values()) == n
    # Hash uniformity at small n is loose; just pin the ordering and presence.
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"]
    assert counts["train"] > counts["test"]


def test_hash_sample_boundary_fractions(spark, sf_dir):
    d = T(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    # 1.0 keeps every row (the full-coverage threshold is the "g" sentinel,
    # which sorts above any hex bucket), 0.0 keeps none.
    assert SM.hash_sample(d, "doc_id", 1.0).count() == n
    assert SM.hash_sample(d, "doc_id", 0.0).count() == 0


def test_hash_sample_nested_for_growing_fraction(spark, sf_dir):
    d = T(spark, sf_dir, "documents").select("doc_id")
    small = {r[0] for r in SM.hash_sample(d, "doc_id", 0.1, seed="x").collect()}
    large = {r[0] for r in SM.hash_sample(d, "doc_id", 0.4, seed="x").collect()}
    assert small <= large
    assert len(small) < len(large)


def test_stratified_sample_exact_counts(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    got = dict(
        SM.stratified_sample(d, ["source"], 3, "doc_id").groupBy("source").count().collect()
    )
    sizes = dict(d.groupBy("source").count().collect())
    assert got == {s: min(3, sz) for s, sz in sizes.items()}


def test_split_zero_shuffle_plan(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    plan = (
        d.select("doc_id", SM.hash_split("doc_id", WEIGHTS).alias("split"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # scan-speed projection, no shuffle


def test_mix_sources_matches_oracle(spark, sf_dir, con):
    d = T(spark, sf_dir, "documents")
    fr = {"src0": 1.0, "src1": 0.5, "src2": 0.1}
    sdf = SM.mix_sources(d.select("doc_id", "source"), "source", fr, "doc_id", seed="mx")
    preds = " OR ".join(
        f"(source = '{s}' AND {SM.sample_predicate_sql('doc_id', f, seed='mx')})"
        for s, f in fr.items()
    )
    assert diff(sdf, con, f"SELECT doc_id, source FROM documents WHERE {preds}") == []


def test_mix_sources_behavior(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    fr = {"src0": 1.0, "src1": 0.5}
    out = SM.mix_sources(d, "source", fr, "doc_id")
    counts = dict(out.groupBy("source").count().collect())
    full = dict(d.groupBy("source").count().collect())
    assert set(counts) <= {"src0", "src1"}  # unlisted sources dropped
    assert counts["src0"] == full["src0"]  # fraction 1.0 keeps all
    assert 0 < counts.get("src1", 0) < full["src1"]
    # nested under fraction growth (same seed)
    small = {r[0] for r in SM.mix_sources(d, "source", {"src1": 0.2}, "doc_id").select("doc_id").collect()}
    large = {r[0] for r in SM.mix_sources(d, "source", {"src1": 0.6}, "doc_id").select("doc_id").collect()}
    assert small <= large


def test_split_matches_independent_python_implementation(spark, sf_dir):
    """Row-by-row agreement with a hashlib-based reimplementation — pins the
    exact key rendering ('seed:' + base-10 id) and threshold arithmetic
    against a third engine (CPython), not just DuckDB."""
    import hashlib

    def py_split(doc_id):
        b = hashlib.md5(f"corpus-v1:{doc_id}".encode()).hexdigest()[:4]
        if b < format(round(0.8 * 65536), "04x"):
            return "train"
        if b < format(round(0.9 * 65536), "04x"):
            return "val"
        return "test"

    d = T(spark, sf_dir, "documents").select("doc_id")
    got = dict(
        d.select("doc_id", SM.hash_split("doc_id", WEIGHTS, seed="corpus-v1").alias("s"))
        .collect()
    )
    assert got == {k: py_split(k) for k in got}


def test_hex_threshold_properties():
    """Pure-function contract of the bucket threshold (no Spark needed):
    exact quantization, monotonicity under string compare, sentinel at 1.0."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sheetreader_duckdb_spark.operators.sampling import _hex_threshold

    @settings(max_examples=300, deadline=None)
    @given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
    def check(f):
        t = _hex_threshold(f)
        n = round(f * 65536)
        if n == 65536:
            assert t == "g"
            assert t > "ffff"  # sorts above every bucket
        else:
            assert len(t) == 4
            # exact quantization: buckets strictly below t == n
            assert int(t, 16) == n
        # monotone: a larger fraction never yields a smaller threshold
        for g in (0.0, f / 2, f, min(1.0, f * 1.5)):
            if g <= f:
                assert _hex_threshold(g) <= t

    check()


def test_weight_validation():
    with pytest.raises(ValueError):
        SM.hash_split("k", [("a", 0.5), ("b", 0.4)])  # sums to 0.9
    with pytest.raises(ValueError):
        SM.hash_split("k", [("a", 0.5), ("a", 0.5)])  # duplicate name
    with pytest.raises(ValueError):
        SM.hash_split("k", [])


# -- sqrt-temperature mixture sampling --------------------------------------

def _temp_corpus(spark):
    rows = []
    rid = 0
    for grp, n in (("big", 300), ("mid", 150), ("small", 50)):
        for _ in range(n):
            rows.append((rid, grp))
            rid += 1
    return spark.createDataFrame(rows, "doc_id long, src string")


def _temp_brute(rows, seed="temp", nchars=4):
    import hashlib

    counts = {}
    for _i, g in rows:
        counts[g] = counts.get(g, 0) + 1
    nmin = min(counts.values())
    kept = set()
    for i, g in rows:
        b = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:nchars], 16)
        if b * b * counts[g] < (16 ** (2 * nchars)) * nmin:
            kept.add(i)
    return kept, counts, nmin


def test_sqrt_temperature_matches_bruteforce(spark):
    df = _temp_corpus(spark)
    rows = [(r.doc_id, r.src) for r in df.collect()]
    want, _, _ = _temp_brute(rows)
    got = {
        r.doc_id
        for r in SM.sqrt_temperature_sample(df, "src", "doc_id").collect()
    }
    assert got == want


def test_sqrt_temperature_flattens_and_keeps_smallest(spark):
    df = _temp_corpus(spark)
    kept = SM.sqrt_temperature_sample(df, "src", "doc_id")
    counts = {r.src: r["count"] for r in kept.groupBy("src").count().collect()}
    # the smallest source is kept in full (p = 1)
    assert counts["small"] == 50
    # expectations: 300·sqrt(50/300)=122.5, 150·sqrt(50/150)=86.6 — allow
    # binomial noise (±4σ ≈ ±34 and ±26)
    assert 88 <= counts["big"] <= 157
    assert 60 <= counts["mid"] <= 113
    # flattening: the big/small kept ratio must be far below the 6× input
    # ratio (expected sqrt(6) ≈ 2.45)
    assert counts["big"] / counts["small"] < 4


def test_sqrt_temperature_deterministic_under_partitioning(spark):
    df = _temp_corpus(spark)
    a = sorted(
        r.doc_id for r in SM.sqrt_temperature_sample(df, "src", "doc_id").collect()
    )
    b = sorted(
        r.doc_id
        for r in SM.sqrt_temperature_sample(
            df.repartition(13), "src", "doc_id"
        ).collect()
    )
    assert a == b


def test_temperature_predicate_sql_parity(spark):
    import duckdb

    df = _temp_corpus(spark)
    spark_kept = sorted(
        r.doc_id
        for r in SM.sqrt_temperature_sample(df, "src", "doc_id").collect()
    )
    con = duckdb.connect()
    rows = [(r.doc_id, r.src) for r in df.collect()]
    con.execute("CREATE TABLE t (doc_id BIGINT, src VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    pred = SM.temperature_predicate_sql("doc_id", "c.tn", "(SELECT MIN(tn) FROM c)")
    duck_kept = [
        r[0]
        for r in con.execute(
            "WITH c AS (SELECT src, COUNT(*) AS tn FROM t GROUP BY src) "
            f"SELECT doc_id FROM t JOIN c USING (src) WHERE {pred} ORDER BY doc_id"
        ).fetchall()
    ]
    assert duck_kept == spark_kept
