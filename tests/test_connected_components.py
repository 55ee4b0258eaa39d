"""connected_components (operators/dedup.py): hash-min label propagation
vs a driver-side union-find reference on randomized pair graphs, plus the
convergence-bound and cluster-keep contracts."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators.dedup import (
    cluster_dedup_keep,
    connected_components,
)


def _union_find_labels(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # Label = min node id of the component.
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for root, members in comp.items() for n in members}


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "id_a bigint, id_b bigint")


@pytest.mark.parametrize("seed", [7, 41])
def test_matches_union_find_on_random_graphs(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(200))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(150)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    expected = _union_find_labels(pairs)
    got = {
        r["node"]: r["label"]
        for r in connected_components(_pairs_df(spark, pairs)).collect()
    }
    assert got == expected


def test_chain_and_keep_set(spark):
    pairs = _pairs_df(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)])
    labels = {
        r["node"]: r["label"] for r in connected_components(pairs).collect()
    }
    assert labels == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20,
    }
    df = spark.range(0, 30).select(F.col("id").cast("bigint").alias("doc_id"))
    kept = sorted(
        r["doc_id"] for r in cluster_dedup_keep(df, pairs, "doc_id").collect()
    )
    # Non-representatives of each cluster are dropped; untouched ids stay.
    dropped = {2, 3, 11, 21, 22, 23}
    assert kept == [i for i in range(30) if i not in dropped]


def test_long_chain_needs_iterations(spark):
    # A path graph 0-1-2-...-25: hash-min needs ~diameter iterations, so a
    # tight max_iters must raise (bounded-work contract: no silent
    # mislabeling), while the default bound converges.
    chain = [(i, i + 1) for i in range(25)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs_df(spark, chain), max_iters=2)
    labels = connected_components(_pairs_df(spark, chain), max_iters=30).collect()
    assert {r["label"] for r in labels} == {0}


def test_cluster_split_never_straddles(spark):
    # Leakage-safe split (n20 'split_*' branches): the split hashes the
    # cluster representative, so every verified near-dup pair must land in
    # one split. Hashing doc_id directly fails this on any cluster whose
    # members hash to different buckets — the pin catches a refactor that
    # swaps the key back.
    from sheetreader_duckdb_spark.operators.sampling import hash_split

    random.seed(7)
    pairs = [(random.randrange(200), random.randrange(200)) for _ in range(120)]
    pairs = [(min(a, b), max(a, b)) for a, b in pairs if a != b]
    pdf = _pairs_df(spark, pairs)
    labels = connected_components(pdf)
    docs = spark.range(0, 200).select(F.col("id").cast("bigint").alias("doc_id"))
    grp = (
        docs.join(
            labels.select(F.col("node").alias("doc_id"), "label"), "doc_id", "left"
        )
        .select(
            "doc_id", F.coalesce("label", F.col("doc_id")).alias("grp")
        )
    )
    weights = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    assigned = grp.select(
        "doc_id", hash_split("grp", weights, seed="ccsplit").alias("split")
    )
    straddle = (
        pdf.join(
            assigned.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")),
            "id_a",
        )
        .join(
            assigned.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")),
            "id_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert straddle == 0
    # ... and the doc_id-keyed assignment DOES straddle on this graph,
    # otherwise the pin is vacuous.
    naive = docs.select("doc_id", hash_split("doc_id", weights, seed="ccsplit").alias("split"))
    naive_straddle = (
        pdf.join(naive.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")), "id_a")
        .join(naive.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")), "id_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert naive_straddle > 0
