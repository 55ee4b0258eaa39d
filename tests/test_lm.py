"""LM scoring + DSIR importance selection (operators/lm.py).

Exact-integer/rational columns are pinned by brute-force Python references
and DuckDB differentials (no tolerance); the transcendental ll/ppl path is
pinned against a pure-Python reimplementation at 1e-9 relative tolerance.
"""

from __future__ import annotations

import collections
import hashlib
import math

import pytest
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators import lm as L
from tests import oracle


FIXTURE = [
    (1, "the cat sat on the mat", "src0"),
    (2, "the cat sat", "src0"),
    (3, "a dog ran fast", "src1"),
    (4, "the cat ran on the mat", "src1"),
    (5, "zeta", "src1"),  # single token: no bigrams
    (6, "the cat sat on the mat", "src1"),  # exact dup of 1
]


def _docs(spark):
    return spark.createDataFrame(FIXTURE, "doc_id long, text string, source string")


def _toks(t):
    return t.lower().split(" ")


def _bigrams(t):
    w = _toks(t)
    return [f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)]


# --------------------------------------------------------------------------
# LM
# --------------------------------------------------------------------------
def _py_tables(ref_texts):
    uni = collections.Counter(t for x in ref_texts for t in _toks(x))
    bi = collections.Counter(g for x in ref_texts for g in _bigrams(x))
    return uni, bi


def test_lm_doc_stats_matches_python(spark):
    docs = _docs(spark)
    ref = docs.filter("source = 'src0'")
    uni, bi = L.lm_tables(ref)
    got = {
        r["doc_id"]: r.asDict()
        for r in L.lm_doc_stats(docs, uni, bi).collect()
    }
    puni, pbi = _py_tables([t for _, t, s in FIXTURE if s == "src0"])
    for doc_id, text, _src in FIXTURE:
        grams = _bigrams(text)
        if not grams:
            assert doc_id not in got  # <2 tokens: no row
            continue
        row = got[doc_id]
        assert row["n_bigrams"] == len(grams)
        assert row["oov_bigrams"] == sum(1 for g in grams if g not in pbi)
        s12 = sum(pbi.get(g, 0) for g in grams)
        sctx = sum(puni.get(g.split(" ")[0], 0) for g in grams)
        assert row["sum_c12"] == s12
        assert row["sum_ctx"] == sctx
        assert row["mean_c12"] == s12 / len(grams)
        assert row["mean_ctx"] == sctx / len(grams)


def test_lm_loglik_matches_python(spark):
    docs = _docs(spark)
    ref = docs.filter("source = 'src0'")
    uni, bi = L.lm_tables(ref)
    alpha = 0.5
    got = {r["doc_id"]: r.asDict() for r in L.lm_loglik(docs, uni, bi, alpha=alpha).collect()}
    puni, pbi = _py_tables([t for _, t, s in FIXTURE if s == "src0"])
    vocab = len(puni) + 1
    for doc_id, text, _src in FIXTURE:
        grams = _bigrams(text)
        if not grams:
            continue
        ll = sum(
            math.log((pbi.get(g, 0) + alpha) / (puni.get(g.split(" ")[0], 0) + alpha * vocab))
            for g in grams
        )
        row = got[doc_id]
        assert row["ll"] == pytest.approx(ll, rel=1e-9)
        assert row["ppl"] == pytest.approx(math.exp(-ll / len(grams)), rel=1e-9)
        # in-reference docs have zero OOV mass => likelier than the dup-free
        # out-of-domain doc 3 built from unseen grams
    assert got[1]["ll"] > got[3]["ll"]


def test_lm_doc_stats_duckdb_parity(spark, sf_dir):
    from sheetreader_duckdb_spark.tables import T

    docs = T(spark, sf_dir, "documents")
    ref = docs.filter("source IN ('src0', 'src1')")
    uni, bi = L.lm_tables(ref)
    res = L.lm_doc_stats(docs, uni, bi)
    con = oracle.duckdb_connection(sf_dir)
    sql = """
    WITH tr AS (
        SELECT string_split(lower(text), ' ') AS w FROM documents
        WHERE source IN ('src0', 'src1')
    ),
    uni AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS c1
        FROM (SELECT unnest(w) AS tok FROM tr) GROUP BY tok
    ),
    bi AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS c12
        FROM (SELECT w[i + 1] || ' ' || w[i + 2] AS g
              FROM (SELECT w, unnest(range(len(w) - 1)) AS i
                    FROM tr WHERE len(w) >= 2))
        GROUP BY g
    ),
    vg AS (
        SELECT doc_id, w[i + 1] AS w1, w[i + 1] || ' ' || w[i + 2] AS g
        FROM (SELECT doc_id, w, unnest(range(len(w) - 1)) AS i
              FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                    FROM documents)
              WHERE len(w) >= 2)
    ),
    vgc AS (
        SELECT doc_id, g, w1, CAST(COUNT(*) AS BIGINT) AS c
        FROM vg GROUP BY doc_id, g, w1
    )
    SELECT vgc.doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN bi.c12 IS NULL THEN c ELSE 0 END) AS BIGINT)
               AS oov_bigrams,
           CAST(SUM(c * COALESCE(bi.c12, 0)) AS BIGINT) AS sum_c12,
           CAST(SUM(c * COALESCE(uni.c1, 0)) AS BIGINT) AS sum_ctx,
           CAST(SUM(c * COALESCE(bi.c12, 0)) AS DOUBLE) / CAST(SUM(c) AS BIGINT)
               AS mean_c12,
           CAST(SUM(c * COALESCE(uni.c1, 0)) AS DOUBLE) / CAST(SUM(c) AS BIGINT)
               AS mean_ctx
    FROM vgc LEFT JOIN bi USING (g) LEFT JOIN uni ON vgc.w1 = uni.tok
    GROUP BY vgc.doc_id
    """
    assert oracle.diff(res, con, sql) == []


def test_lm_partitioning_invariance(spark):
    docs = _docs(spark)
    uni, bi = L.lm_tables(docs)
    a = sorted(map(tuple, L.lm_doc_stats(docs, uni, bi).collect()))
    b = sorted(
        map(
            tuple,
            L.lm_doc_stats(docs.repartition(7), uni.repartition(3), bi).collect(),
        )
    )
    assert a == b


# --------------------------------------------------------------------------
# DSIR
# --------------------------------------------------------------------------
def _py_bucket(feat, seed="dsir", nchars=3):
    return hashlib.md5(f"{seed}:{feat}".encode()).hexdigest()[:nchars]


def _py_dsir(rows, target_source):
    per_doc = {}
    for doc_id, text, src in rows:
        c = collections.Counter(
            _py_bucket(f) for f in _toks(text) + _bigrams(text)
        )
        per_doc[doc_id] = (c, src)
    tgt = collections.Counter()
    raw = collections.Counter()
    for c, src in per_doc.values():
        raw.update(c)
        if src == target_source:
            tgt.update(c)
    out = {}
    for doc_id, (c, _src) in per_doc.items():
        num = sum(n * (tgt.get(b, 0) + 1) for b, n in c.items())
        den = sum(n * (raw.get(b, 0) + 1) for b, n in c.items())
        out[doc_id] = (num, den, num / den)
    return out


def test_dsir_scores_match_python(spark):
    docs = _docs(spark)
    got = {
        r["doc_id"]: (r["num"], r["den"], r["score"])
        for r in L.dsir_scores(docs, F.col("source") == "src0").collect()
    }
    want = _py_dsir(FIXTURE, "src0")
    assert got == want
    # exact duplicates score identically; src0-domain docs outrank doc 3
    assert got[1] == got[6]
    assert got[1][2] > got[3][2]


def test_dsir_select_deterministic_and_distributed(spark):
    docs = _docs(spark)
    scored = L.dsir_scores(docs, F.col("source") == "src0")
    sel = L.dsir_select(scored, 3)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    ids = [r["doc_id"] for r in sel.collect()]
    ids2 = [r["doc_id"] for r in L.dsir_select(
        L.dsir_scores(docs.repartition(5), F.col("source") == "src0"), 3
    ).collect()]
    assert ids == ids2
    # ties (docs 1 and 6 share a score) break by doc_id: 1 admitted first
    assert ids == sorted(ids, key=lambda i: (-_py_dsir(FIXTURE, "src0")[i][2], i))


def test_dsir_duckdb_parity(spark, sf_dir):
    from sheetreader_duckdb_spark.tables import T

    docs = T(spark, sf_dir, "documents")
    scored = L.dsir_scores(
        docs, F.col("source") == "src0", carry=["source"]
    )
    sel = L.dsir_select(scored, 25)
    con = oracle.duckdb_connection(sf_dir)
    sql = """
    WITH feats AS (
        SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS feat
        FROM documents
        UNION ALL
        SELECT doc_id, source, w[i + 1] || ' ' || w[i + 2] AS feat
        FROM (SELECT doc_id, source, w, unnest(range(len(w) - 1)) AS i
              FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS w
                    FROM documents)
              WHERE len(w) >= 2)
    ),
    fb AS (
        SELECT doc_id, source, substr(md5('dsir:' || feat), 1, 3) AS b,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM feats GROUP BY doc_id, source, b
    ),
    tgt AS (SELECT b, CAST(SUM(c) AS BIGINT) AS t FROM fb
            WHERE source = 'src0' GROUP BY b),
    raw AS (SELECT b, CAST(SUM(c) AS BIGINT) AS r FROM fb GROUP BY b),
    sc AS (
        SELECT doc_id, source,
               CAST(SUM(c * (COALESCE(t, 0) + 1)) AS BIGINT) AS num,
               CAST(SUM(c * (COALESCE(r, 0) + 1)) AS BIGINT) AS den
        FROM fb LEFT JOIN tgt USING (b) LEFT JOIN raw USING (b)
        GROUP BY doc_id, source
    )
    SELECT doc_id, source, num, den, CAST(num AS DOUBLE) / den AS score
    FROM sc ORDER BY CAST(num AS DOUBLE) / den DESC, doc_id LIMIT 25
    """
    assert oracle.diff(sel, con, sql) == []
