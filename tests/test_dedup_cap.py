"""LSH bucket-size cap under adversarial skew (SURVEY.md §2.3 N2).

A giant near-duplicate cluster (documents that are near- but not exact
duplicates, so exact dedup does not remove them) lands every member in the
same LSH bucket in every band — O(size²) pair expansion. The cap must drop
such buckets BEFORE materializing membership lists, keep normal buckets
intact, and report what it dropped.
"""

from __future__ import annotations

import pytest

from sheetreader_duckdb_spark.operators import dedup as D

N_CLUSTER = 120  # adversarial near-dup cluster size
N_NORMAL_PAIRS = 5


@pytest.fixture(scope="module")
def adversarial_bands(spark):
    # Cluster docs share a template with a tiny unique suffix (near-dups,
    # not exact dups); normal docs come in genuinely distinct pairs.
    template = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [(i, template + f"tail{i % 2}") for i in range(N_CLUSTER)]
    for j in range(N_NORMAL_PAIRS):
        # High-Jaccard pair: 40 varied shared tokens, one differing suffix.
        text = " ".join(f"tok{j}x{i}" for i in range(40))
        rows.append((10_000 + 2 * j, text + " alpha"))
        rows.append((10_000 + 2 * j + 1, text + " beta"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = D.word_shingles(docs, "doc_id", "text", k=3)
    sigs = D.minhash_signatures_xxhash(sh, "doc_id", n_hashes=16)
    return D.lsh_bands(sigs, "doc_id", n_hashes=16, band_size=4)


def test_uncapped_explodes_capped_is_bounded(adversarial_bands):
    uncapped = D.lsh_candidate_pairs(adversarial_bands, "doc_id").count()
    capped = D.lsh_candidate_pairs(
        adversarial_bands, "doc_id", max_bucket_size=50
    ).count()
    # The cluster alone contributes ~N_CLUSTER²/2 pairs uncapped.
    assert uncapped >= (N_CLUSTER // 2) ** 2 // 2
    # Capped keeps only small-bucket pairs (normal pairs and sub-cap slices).
    assert capped <= 50 * 50
    assert capped < uncapped


def test_capped_keeps_normal_buckets(adversarial_bands):
    capped = D.lsh_candidate_pairs(adversarial_bands, "doc_id", max_bucket_size=50)
    kept = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # Every genuinely-distinct near-dup pair survives the cap.
    for j in range(N_NORMAL_PAIRS):
        assert (10_000 + 2 * j, 10_000 + 2 * j + 1) in kept


def test_oversized_audit_reports_dropped_buckets(adversarial_bands):
    audit = D.lsh_oversized_buckets(adversarial_bands, "doc_id", max_bucket_size=50)
    rows = audit.collect()
    assert rows, "adversarial cluster must show up in the audit"
    assert all(r["n_ids"] > 50 for r in rows)
    assert max(r["n_ids"] for r in rows) >= N_CLUSTER // 2
