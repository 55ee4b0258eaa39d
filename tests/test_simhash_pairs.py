"""simhash_pairs (operators/dedup.py): pigeonhole band join + Hamming
verify must equal the brute-force O(n²) pair set — banding only prunes,
never drops a qualifying pair."""

from __future__ import annotations

import random

import pytest

from sheetreader_duckdb_spark.operators.dedup import simhash_pairs


def _brute(sigs: dict[int, int], max_hamming: int) -> set[tuple[int, int, int]]:
    ids = sorted(sigs)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= max_hamming:
                out.add((a, b, h))
    return out


@pytest.mark.parametrize(
    "n_bits,max_hamming,seed", [(16, 1, 3), (16, 3, 4), (64, 3, 5)]
)
def test_matches_bruteforce(spark, n_bits, max_hamming, seed):
    rng = random.Random(seed)
    # Clustered signatures: base points plus 1-3-bit perturbations, so the
    # qualifying pair set is non-trivial at every parameterization.
    sigs: dict[int, int] = {}
    nid = 0
    for _ in range(30):
        base = rng.getrandbits(n_bits)
        for _ in range(rng.randint(1, 4)):
            v = base
            for _ in range(rng.randint(0, 3)):
                v ^= 1 << rng.randrange(n_bits)
            sigs[nid] = v
            nid += 1
    # Signed 64-bit storage (xxhash64-produced signatures are negative half
    # the time) — map through two's complement like simhash64_xxhash does.
    def signed(v):
        return v - (1 << 64) if n_bits == 64 and v >= (1 << 63) else v

    df = spark.createDataFrame(
        [(i, signed(v)) for i, v in sigs.items()], "doc_id long, simhash long"
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_pairs(
            df, "doc_id", n_bits=n_bits, max_hamming=max_hamming
        ).collect()
    }
    assert got == _brute(sigs, max_hamming)
    assert got  # clustered fixture must produce real pairs


def test_uneven_bands_rejected(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, simhash long")
    with pytest.raises(ValueError, match="divisible"):
        simhash_pairs(df, "doc_id", n_bits=16, max_hamming=2)
