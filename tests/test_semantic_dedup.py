"""SemDeDup (operators/similarity.py semantic_dedup_pairs/_keep): exact
precision of the cosine verify, planted-duplicate recall through the cell
bucketing, transitive keep-set semantics, and the constant-plan assignment
reuse."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators.similarity import (
    embedding_neardup_pairs,
    semantic_dedup_keep,
    semantic_dedup_pairs,
)

DIM = 16


def _unit(rng):
    v = [rng.gauss(0, 1) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _perturb(v, rng, eps):
    w = [x + rng.gauss(0, eps) for x in v]
    n = math.sqrt(sum(x * x for x in w))
    return [x / n for x in w]


def _planted_corpus(spark, n_base=40, dup_groups=8, copies=3, seed=11):
    """n_base well-separated random vectors plus dup_groups clusters of
    near-identical copies (cosine ≈ 0.999). Returns (df, true_pairs)."""
    rng = random.Random(seed)
    rows, gid = [], 0
    for i in range(n_base):
        rows.append((gid, _unit(rng)))
        gid += 1
    true_groups = []
    for _ in range(dup_groups):
        base = _unit(rng)
        ids = []
        for _ in range(copies):
            rows.append((gid, _perturb(base, rng, 0.01)))
            ids.append(gid)
            gid += 1
        true_groups.append(ids)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    pairs = {
        (a, b)
        for ids in true_groups
        for a in ids
        for b in ids
        if a < b
    }
    return df, pairs, true_groups


def test_precision_is_exact(spark):
    df, _, _ = _planted_corpus(spark)
    got = semantic_dedup_pairs(df, n_cells=8, threshold=0.95).collect()
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(df, threshold=0.95).collect()
    }
    for r in got:
        assert (r["id_a"], r["id_b"]) in exact  # every emitted pair is real
        assert r["cosine"] >= 0.95


def test_planted_duplicate_recall(spark):
    df, true_pairs, _ = _planted_corpus(spark)
    got = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(df, n_cells=8, threshold=0.95).collect()
    }
    # Near-identical vectors share a nearest centroid essentially always;
    # pin a conservative floor so a bucketing regression is caught.
    recall = len(got & true_pairs) / len(true_pairs)
    assert recall >= 0.9, f"planted-duplicate recall {recall}"


def test_keep_set_one_representative_per_cluster(spark):
    df, _, true_groups = _planted_corpus(spark)
    kept = {r["vec_id"] for r in semantic_dedup_keep(df, n_cells=8).collect()}
    for ids in true_groups:
        found = kept & set(ids)
        # transitive cluster -> at most one survivor; the min id when the
        # whole group was detected
        assert len(found) <= 1 or found == {min(ids)}
    # every base (unpaired) vector survives
    assert set(range(40)) <= kept


def test_precomputed_centroids_skip_lloyd(spark):
    from sheetreader_duckdb_spark.operators.similarity import ivf_centroids

    df, true_pairs, _ = _planted_corpus(spark)
    cents = ivf_centroids(df, n_cells=8)
    a = semantic_dedup_pairs(df, n_cells=8, centroids=cents).collect()
    b = semantic_dedup_pairs(df, n_cells=8).collect()
    key = lambda r: (r["id_a"], r["id_b"])  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_vectorized_score_bit_identical_to_expr(spark):
    """score='vectorized' (per-cell GEMM block via applyInPandas) must
    reproduce the expression form exactly — same pairs, same cells, and
    the cosine doubles bit for bit (sequential per-dimension accumulation
    replays the fold's IEEE sequence; dot and na·nb are commutative in
    IEEE, so the positional pair orientation cannot matter)."""
    df, _, _ = _planted_corpus(spark)
    for thr in (0.5, 0.95):
        want = {
            (r["id_a"], r["id_b"], r["cell"], r["cosine"])
            for r in semantic_dedup_pairs(df, n_cells=8, threshold=thr).collect()
        }
        got = {
            (r["id_a"], r["id_b"], r["cell"], r["cosine"])
            for r in semantic_dedup_pairs(
                df, n_cells=8, threshold=thr, score="vectorized"
            ).collect()
        }
        assert got == want
        assert want  # non-vacuous at 0.5


def test_vectorized_keep_set_matches_expr(spark):
    df, _, groups = _planted_corpus(spark)
    want = {r["vec_id"] for r in semantic_dedup_keep(df, n_cells=8).collect()}
    got = {
        r["vec_id"]
        for r in semantic_dedup_keep(df, n_cells=8, score="vectorized").collect()
    }
    assert got == want


def test_vectorized_single_shuffle_plan(spark):
    """The vectorized form's whole pre-pair pipeline is map-side: exactly
    ONE exchange (the cell shuffle feeding applyInPandas) — the join form
    shuffles both self-join sides."""
    df, _, _ = _planted_corpus(spark)
    plan = (
        semantic_dedup_pairs(df, n_cells=8, score="vectorized")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
