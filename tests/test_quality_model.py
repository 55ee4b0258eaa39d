"""Trainable quality classifier (operators/quality_model.py): distributed
training separates synthetic good/bad docs, the codegen'd score expression
matches pyspark.ml's probability output, training is deterministic, and
the rational-feature margin is bit-identical in DuckDB."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators import quality_model as Q

GOOD_WORDS = "the quick brown fox jumps over a lazy dog and then it rests".split()
JUNK_WORDS = ["$$$!!!", "###", "@@@@", "%%^^&&", "!!!", "***??"]


def _mk_docs(spark, n=300, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if i % 2 == 0:  # natural-ish text: stopwords, short words, no punct
            words = [rng.choice(GOOD_WORDS) for _ in range(rng.randint(20, 60))]
            label = 1.0
        else:  # junk: punctuation spam, no stopwords, long "words"
            words = [rng.choice(JUNK_WORDS) * rng.randint(1, 3) for _ in range(rng.randint(5, 30))]
            label = 0.0
        text = " ".join(words)
        rows.append((i, text, len(text), label))
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, n_chars bigint, label double"
    )


@pytest.fixture(scope="module")
def trained(spark):
    docs = Q.add_quality_features(_mk_docs(spark))
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)
    model = Q.train_quality_model(train, "label")
    return docs, train, test, model


def test_separates_good_from_junk(spark, trained):
    docs, train, test, model = trained
    feats = {n: F.col(n) for n in Q.QUALITY_FEATURES}
    scored = test.withColumn("p", Q.score_expr(model, feats))
    acc = scored.filter(
        ((F.col("p") > 0.5) & (F.col("label") == 1.0))
        | ((F.col("p") <= 0.5) & (F.col("label") == 0.0))
    ).count() / test.count()
    assert acc >= 0.95


def test_score_expr_matches_mllib_probability(spark, trained):
    # The collected-coefficients expression must reproduce what the ml
    # model itself computes — coefficients come back de-standardized.
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    docs, train, test, model = trained
    assembler = VectorAssembler(
        inputCols=list(Q.QUALITY_FEATURES), outputCol="__features"
    )
    lr = LogisticRegression(featuresCol="__features", labelCol="label")
    fitted = lr.fit(assembler.transform(train))
    probs = fitted.transform(assembler.transform(test))
    ml_p = {r["doc_id"]: float(r["probability"][1]) for r in probs.collect()}
    feats = {n: F.col(n) for n in Q.QUALITY_FEATURES}
    ours = {
        r["doc_id"]: r["p"]
        for r in test.withColumn("p", Q.score_expr(model, feats)).collect()
    }
    assert ml_p.keys() == ours.keys()
    for k in ml_p:
        assert ours[k] == pytest.approx(ml_p[k], abs=1e-9)


def test_training_is_deterministic(spark, trained):
    docs, train, _test, model = trained
    again = Q.train_quality_model(train, "label")
    assert again == model


def test_margin_sql_bit_identical_in_duckdb(spark, trained):
    # Cross-engine witness: rational features only (the n07 oracle shape) —
    # IEEE products + fixed-order sum must match to the last bit.
    docs, *_ = trained
    frozen = {
        "features": ["stop_ratio", "punct_ratio", "mean_word_len"],
        "weights": [10.0, -8.0, 0.35],
        "intercept": -4.0,
    }
    exprs = Q.quality_feature_exprs(F.col("text"), F.col("n_chars"))
    spark_m = {
        r["doc_id"]: r["m"]
        for r in docs.select(
            "doc_id", Q.margin_expr(frozen, exprs).alias("m")
        ).collect()
    }
    pdf = docs.select("doc_id", "text", "n_chars").toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    sqls = Q.quality_feature_sqls()
    duck_m = dict(
        con.execute(
            f"SELECT doc_id, {Q.margin_sql(frozen, sqls)} AS m FROM documents"
        ).fetchall()
    )
    assert spark_m.keys() == duck_m.keys()
    for k, v in spark_m.items():
        assert v == duck_m[k], (k, v, duck_m[k])  # exact, not approx


def test_log_feature_close_cross_engine(spark, trained):
    # log1p vs ln(1+x) is transcendental — close, not bit-pinned, which is
    # why log_n_ws stays OUT of the frozen oracle witness.
    docs, *_ = trained
    spark_v = {
        r["doc_id"]: r["log_n_ws"] for r in docs.select("doc_id", "log_n_ws").collect()
    }
    pdf = docs.select("doc_id", "text").toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    duck_v = dict(
        con.execute(
            f"SELECT doc_id, {Q.quality_feature_sqls()['log_n_ws']} FROM documents"
        ).fetchall()
    )
    for k, v in spark_v.items():
        assert v == pytest.approx(duck_v[k], abs=1e-12)
