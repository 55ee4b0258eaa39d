"""BM25 scoring (operators/retrieval.py): pinned against a pure-Python
reference at 1e-9, DuckDB twin parity on the quantized witness, and the
determinism/edge contracts (fixed summation order, unmatched docs
absent, distinct-terms guard)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators import retrieval as R

DOCS = [
    (0, "spark window stream hash window"),
    (1, "hash hash hash join merge"),
    (2, "stream processing with spark and spark again"),
    (3, "completely unrelated text about nothing"),
    (4, "window"),
    (5, ""),
    (6, "spark stream window hash spark stream window hash"),
]
TERMS = ["window", "stream", "hash", "spark"]


def _ref_scores(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split(" ") for i, t in docs}
    n = len(toks)
    tdl = sum(len(w) for w in toks.values())
    out = {}
    for i, w in toks.items():
        dl = len(w)
        score = 0.0
        matched = 0
        for t in terms:  # fixed order — matches the pivot chain
            tf = w.count(t)
            if not tf:
                continue
            matched += 1
            df = sum(1 for ww in toks.values() if t in ww)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            score += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * (dl * n) / tdl)
            )
        if matched:
            out[i] = (matched, dl, score)
    return out


def test_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.matched, r.dl, r.score, r.score_q)
        for r in R.bm25_scores(df, "doc_id", "text", TERMS).collect()
    }
    want = _ref_scores(DOCS, TERMS)
    assert set(got) == set(want)
    for i, (m, dl, s) in want.items():
        gm, gdl, gs, gq = got[i]
        assert (gm, gdl) == (m, dl)
        assert abs(gs - s) < 1e-9
        assert gq == math.floor(s * R.BM25_QUANT)


def test_duckdb_twin_quantized_parity(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.matched, r.dl, r.score_q)
        for r in R.bm25_scores(df, "doc_id", "text", TERMS).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
    duck = {
        r[0]: (r[1], r[2], r[4])
        for r in con.execute(
            "SELECT doc_id, matched, dl, score, score_q FROM "
            + R.bm25_sql("docs", "doc_id", "text", TERMS)
        ).fetchall()
    }
    assert duck == got


def test_topk_deterministic_and_ranked(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    top = R.bm25_topk(df, "doc_id", "text", TERMS, k=3).collect()
    qs = [r.score_q for r in top]
    assert qs == sorted(qs, reverse=True)
    a = [r.doc_id for r in top]
    b = [
        r.doc_id
        for r in R.bm25_topk(
            df.repartition(5), "doc_id", "text", TERMS, k=3
        ).collect()
    ]
    assert a == b
    # doc 6 is saturated with query terms; it must rank first
    assert a[0] == 6


def test_unmatched_docs_absent_and_guards(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    ids = {r.doc_id for r in R.bm25_scores(df, "doc_id", "text", TERMS).collect()}
    assert 3 not in ids and 5 not in ids
    with pytest.raises(ValueError):
        R.bm25_scores(df, "doc_id", "text", [])
    with pytest.raises(ValueError):
        R.bm25_scores(df, "doc_id", "text", ["a", "a"])


def test_corpus_scale_smoke(spark, sf_dir):
    from sheetreader_duckdb_spark.tables import T

    d = T(spark, sf_dir, "documents")
    top = R.bm25_topk(d, "doc_id", "text", TERMS, k=10).collect()
    assert len(top) == 10
    assert all(r.matched >= 1 for r in top)


def test_sql_twin_escapes_quoted_terms(spark):
    # A term containing an apostrophe must neither break the generated
    # oracle SQL nor desync the engines (ADVICE r5: reuse _sql_quote).
    docs = DOCS + [(7, "o'brien wrote spark o'brien")]
    terms = ["o'brien", "spark"]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.matched, r.dl, r.score_q)
        for r in R.bm25_scores(df, "doc_id", "text", terms).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", docs)
    duck = {
        r[0]: (r[1], r[2], r[4])
        for r in con.execute(
            "SELECT doc_id, matched, dl, score, score_q FROM "
            + R.bm25_sql("docs", "doc_id", "text", terms)
        ).fetchall()
    }
    assert duck == got
    assert got[7][0] == 2  # both terms matched in the planted doc
