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


@pytest.mark.parametrize(
    "weights,intercept",
    [
        ([10.0, -8.0, 0.35], -4.0),  # the frozen n07 witness values
        # repr-noisy doubles: the literals must round-trip through repr()
        # into BOTH parsers to the identical IEEE-754 bit pattern.
        ([0.1 + 0.2, -1e-17, 123456789.123456789], 1.0 / 3.0),
    ],
)
def test_margin_cross_engine(spark, trained, weights, intercept):
    # Cross-engine witness semantics (the n07 oracle shape): feature
    # values and the QUANTIZED margin are exact across engines; the raw
    # double margin is NOT a fair exactness target because DuckDB may
    # FMA-contract the multiply-add chain (measured 1-ulp drift), while
    # Spark follows strict left-assoc IEEE — which we pin against a pure
    # Python evaluation.
    docs, *_ = trained
    frozen = {
        "features": ["stop_ratio", "punct_ratio", "mean_word_len"],
        "weights": weights,
        "intercept": intercept,
    }
    exprs = Q.quality_feature_exprs(F.col("text"), F.col("n_chars"))
    rows = docs.select(
        "doc_id",
        *[exprs[n].alias(n) for n in frozen["features"]],
        Q.margin_expr(frozen, exprs).alias("m"),
        Q.margin_quantized_expr(frozen, exprs).alias("mq"),
    ).collect()
    # Spark == strict left-associated IEEE over its own feature values.
    for r in rows:
        acc = frozen["intercept"]
        for name, w in zip(frozen["features"], weights):
            acc = acc + w * r[name]
        assert r["m"] == acc, (r["doc_id"], r["m"], acc)
    pdf = docs.select("doc_id", "text", "n_chars").toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    sqls = Q.quality_feature_sqls()
    duck = dict(
        con.execute(
            f"SELECT doc_id, ({Q.margin_sql(frozen, sqls)},"
            f" {Q.margin_quantized_sql(frozen, sqls)}) FROM documents"
        ).fetchall()
    )
    assert duck.keys() == {r["doc_id"] for r in rows}
    calibrated = max(abs(x) for x in weights + [intercept]) < 1e3
    for r in rows:
        dm, dmq = duck[r["doc_id"]]
        assert dm == pytest.approx(r["m"], rel=1e-14)  # ulp-level only
        if calibrated:
            # Quantization absorbs ulp drift while |margin|·scale·2⁻⁵² ≪ 1
            # — exact for any calibrated model (n07's margins are O(10)).
            assert dmq == r["mq"], (r["doc_id"], dmq, r["mq"])
        else:
            # Pathological 1e8-scale weights: a 1-ulp margin drift can
            # cross a quantization boundary — off by at most one step.
            assert abs(dmq - r["mq"]) <= 1, (r["doc_id"], dmq, r["mq"])


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
