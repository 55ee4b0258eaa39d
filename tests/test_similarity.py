"""Similarity-search operator tests (SURVEY.md §2.3 N3).

Pins the quality contract of the approximate path: SRP-LSH with the n05b
declared config must recover ≥ 0.9 of the exact brute-force top-5, and the
SRP-bucketed near-dup must be a subset of the exact O(n²) near-dup result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators import similarity as S
from sheetreader_duckdb_spark.tables import T


def _pairs(df, a="qid", b="cid"):
    return {(r[a], r[b]) for r in df.collect()}


def test_lsh_topk_recall_at_declared_config(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = _pairs(S.brute_force_topk(e, q, k=5))
    approx = _pairs(
        S.lsh_topk(e, q, dim=64, k=5, n_planes=6, n_tables=16, multi_probe=True)
    )
    recall = len(exact & approx) / len(exact)
    assert len(exact) == 50
    assert recall >= 0.9, f"recall@5 = {recall:.3f} below 0.9"


def test_lsh_topk_single_table_is_subset_of_exact_rerank(spark, sf_dir):
    # Every reported neighbor must carry its true cosine (exact re-rank):
    # scores of approx results match the exact scores for the same pairs.
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    exact = {
        (r["qid"], r["cid"]): r["cosine"]
        for r in S.brute_force_topk(e, q, k=10_000).collect()  # all pairs
    }
    approx = S.lsh_topk(e, q, dim=64, k=5, n_planes=8, n_tables=2).collect()
    for r in approx:
        assert exact[(r["qid"], r["cid"])] == r["cosine"]


def test_srp_neardup_subset_of_exact(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings")
    exact = _pairs(S.embedding_neardup_pairs(e, threshold=0.4), "id_a", "id_b")
    bucketed = _pairs(S.srp_neardup_pairs(e, n_planes=6, threshold=0.4), "id_a", "id_b")
    assert bucketed <= exact
    assert bucketed  # the bucketing keeps at least some true near-dups


def test_ivf_topk_recall(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = _pairs(S.brute_force_topk(e, q, k=5))
    approx = _pairs(S.ivf_topk(e, q, k=5, n_cells=8, n_probe=4))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"IVF recall@5 = {recall:.3f}"
    # probing every cell is exhaustive → exact
    full = _pairs(S.ivf_topk(e, q, k=5, n_cells=8, n_probe=8))
    assert full == exact


def test_ivf_scores_are_exact_cosines(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    exact = {
        (r["qid"], r["cid"]): r["cosine"]
        for r in S.brute_force_topk(e, q, k=10_000).collect()
    }
    for r in S.ivf_topk(e, q, k=5, n_cells=8, n_probe=2).collect():
        assert exact[(r["qid"], r["cid"])] == r["cosine"]


def test_srp_neardup_plan_has_no_cartesian(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings")
    plan = S.srp_neardup_pairs(e)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
