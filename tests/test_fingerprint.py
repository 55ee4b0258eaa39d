"""Winnowing document fingerprints (operators/fingerprint.py) — the
Spark expression must equal a pure-Python reference implementation of
Schleimer et al. 2003 (same 32-bit md5-prefix k-gram hash, rightmost-
minimum rule, position dedup), the DuckDB twin must match bit-for-bit,
the winnowing guarantee (shared substring of length >= w + k - 1 =>
shared fingerprint) must hold on planted overlaps, and winnow_pairs
must equal the brute-force pairwise fingerprint-set intersection."""

from __future__ import annotations

import hashlib
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators import fingerprint as FP

K, W = 5, 4

EDGE_TEXTS = [
    "",
    "abc",  # shorter than k -> empty
    "abcd",
    "abcde",  # exactly k -> one hash, one window
    "abcdef",  # 1 < m < w -> single global-min window
    "abcdefgh",  # m == w
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaa",  # all k-grams identical -> heavy position dedup
    "abababababab",  # period-2 ties -> rightmost-minimum rule exercised
    "Hello, World! Hello, World!",  # case folding + exact repeat
    "Ünïcødé — mültibyte çhärs ünïcødé tail",  # utf-8 multibyte grams
]


def _ref_hashes(text: str, k: int = K) -> list[int]:
    t = text.lower()
    if len(t) < k:
        return []
    return [
        int(hashlib.md5(t[i : i + k].encode("utf-8")).hexdigest()[:8], 16)
        for i in range(len(t) - k + 1)
    ]


def _ref_selected(text: str, k: int = K, w: int = W) -> list[tuple[int, int]]:
    """(1-based pos, hash32) winnowing fingerprints, position-deduped in
    first-window order — the reference the Spark struct form must match."""
    hs = _ref_hashes(text, k)
    m = len(hs)
    if m == 0:
        return []
    out: list[tuple[int, int]] = []
    seen: set[tuple[int, int]] = set()
    for j in range(1, max(1, m - w + 1) + 1):
        win = hs[j - 1 : j - 1 + w]
        mn = min(win)
        rp = len(win) - 1 - win[::-1].index(mn)  # rightmost in-window
        fp = (j + rp, mn)
        if fp not in seen:
            seen.add(fp)
            out.append(fp)
    return out


def _ref_encoded(text: str, k: int = K, w: int = W) -> list[int]:
    enc, seen = [], set()
    for p, h in _ref_selected(text, k, w):
        e = (p * 1000003 + h) % 2147483647
        if e not in seen:
            seen.add(e)
            enc.append(e)
    return enc


def test_spark_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "id int, text string"
    )
    rows = df.select(
        "id", FP.winnow_selected_expr(F.col("text"), K, W).alias("s")
    ).collect()
    got = {r.id: [(x.p, x.h) for x in r.s] for r in rows}
    for i, t in enumerate(EDGE_TEXTS):
        assert got[i] == _ref_selected(t), repr(t)


def test_duckdb_twin_bit_for_bit(spark):
    # Same SET of encoded fingerprints on both engines (DuckDB's
    # list_distinct does not preserve element order, so the per-element
    # values — not the ordering — are the cross-engine contract; the n10
    # witness only counts and sums, both order-invariant). Spark's own
    # ordering is additionally pinned against the Python reference.
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "id int, text string"
    )
    rows = df.select(
        "id", FP.winnow_encoded_expr(F.col("text"), K, W).alias("e")
    ).collect()
    got = {r.id: list(r.e) for r in rows}
    con = duckdb.connect()
    sql = FP.winnow_encoded_sql("text", K, W)
    duck = con.execute(
        f"SELECT id, {sql} FROM (SELECT unnest(range(?)) AS id, unnest(?) AS text)",
        [len(EDGE_TEXTS), EDGE_TEXTS],
    ).fetchall()
    for i, e in duck:
        assert got[i] == _ref_encoded(EDGE_TEXTS[i]), EDGE_TEXTS[i]
        assert sorted(e) == sorted(got[i]), EDGE_TEXTS[i]


def test_winnowing_guarantee_on_planted_overlap(spark):
    # Any shared substring of length >= w + k - 1 must surface as a
    # shared fingerprint hash — the MOSS guarantee, checked on random
    # docs with a planted common chunk of exactly the threshold length.
    rng = random.Random(11)
    alpha = "abcdefghij "
    chunk = "".join(rng.choice(alpha) for _ in range(W + K - 1))
    docs = []
    for i in range(8):
        pre = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 30)))
        post = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 30)))
        docs.append((i, pre + chunk + post))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = FP.winnow_fingerprints(df, "doc_id", "text", K, W).collect()
    by_doc: dict[int, set[int]] = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    for i in range(8):
        for j in range(i + 1, 8):
            assert by_doc[i] & by_doc[j], (docs[i][1], docs[j][1])


def test_winnow_pairs_matches_bruteforce(spark):
    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    shared = "".join(rng.choice(alpha) for _ in range(25))
    docs = []
    for i in range(14):
        body = "".join(rng.choice(alpha) for _ in range(60))
        if i % 3 == 0:  # plant overlap into a third of the corpus
            cut = rng.randint(0, len(body))
            body = body[:cut] + shared + body[cut:]
        docs.append((i, body))
    min_shared = 2
    # brute force on the reference fingerprints
    sets = {i: {h for _, h in _ref_selected(t)} for i, t in docs}
    want = {
        (a, b, len(sets[a] & sets[b]))
        for a in sets
        for b in sets
        if a < b and len(sets[a] & sets[b]) >= min_shared
    }
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.shared_fps)
        for r in FP.winnow_pairs(
            df, "doc_id", "text", K, W, min_shared=min_shared, max_hash_freq=None
        ).collect()
    }
    assert got == want


def test_max_hash_freq_drops_boilerplate(spark):
    # A chunk present in EVERY doc is boilerplate. Uncapped, the
    # winnowing guarantee makes every one of the 45 pairs a candidate
    # (the boiler is far longer than w + k - 1). The postings-frequency
    # cap drops the interior boiler fingerprints (selected identically
    # in all 10 docs, freq 10 > 5), collapsing the candidate set to the
    # genuinely-rare overlap (3, 7) plus at most a handful of
    # boundary-region selections (a boiler hash picked as window-min in
    # <= 5 docs because each doc's body context differs — correctly
    # below a postings cap).
    rng = random.Random(23)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    boiler = "standard header boilerplate line common to every document"
    rare = "qqq unique shared passage zzz"
    docs = [
        (i, boiler + " " + "".join(rng.choice(alpha) for _ in range(60)))
        for i in range(10)
    ]
    docs[3] = (3, docs[3][1] + " " + rare)
    docs[7] = (7, docs[7][1] + " " + rare)
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def pairs(cap):
        return {
            (r.id_a, r.id_b)
            for r in FP.winnow_pairs(
                df, "doc_id", "text", K, W, min_shared=1, max_hash_freq=cap
            ).collect()
        }

    uncapped = pairs(None)
    assert uncapped == {(a, b) for a in range(10) for b in range(a + 1, 10)}
    capped = pairs(5)
    assert (3, 7) in capped
    assert len(capped) <= 10  # 45 boilerplate pairs collapsed


def test_xxhash64_scale_path(spark):
    # The Spark-only scale hash: selection/pair semantics must be
    # hash-agnostic — the guarantee holds, and winnow_pairs equals the
    # brute-force intersection of the engine's own fingerprint sets
    # (no Python reference needed: internal consistency is the contract;
    # cross-engine parity is the md5 path's job).
    rng = random.Random(19)
    alpha = "abcdefghij "
    chunk = "".join(rng.choice(alpha) for _ in range(W + K - 1))
    docs = []
    for i in range(10):
        pre = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
        post = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
        docs.append((i, pre + (chunk if i % 2 == 0 else "") + post))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = FP.winnow_fingerprints(df, "doc_id", "text", K, W, hash="xxhash64").collect()
    sets: dict[int, set[int]] = {i: set() for i, _ in docs}
    for r in fps:
        sets[r.doc_id].add(r.fp)
    # guarantee across the planted-chunk docs
    for a in range(0, 10, 2):
        for b in range(a + 2, 10, 2):
            assert sets[a] & sets[b]
    want = {
        (a, b, len(sets[a] & sets[b]))
        for a in sets
        for b in sets
        if a < b and len(sets[a] & sets[b]) >= 1
    }
    got = {
        (r.id_a, r.id_b, r.shared_fps)
        for r in FP.winnow_pairs(
            df, "doc_id", "text", K, W,
            min_shared=1, max_hash_freq=None, hash="xxhash64",
        ).collect()
    }
    assert got == want


def test_bad_hash_name_raises():
    with pytest.raises(ValueError):
        FP.kgram_hashes_expr(F.lit("abc"), K, hash="sha1")


@pytest.mark.parametrize("w", [2, 4, 9])
def test_density_bound(spark, w):
    # Winnowing stores at most one fingerprint per window start: the
    # fingerprint count never exceeds max(1, m - w + 1) and never hits
    # zero for m >= 1 — the storage bound the 100 TB sizing relies on.
    rng = random.Random(w)
    texts = [
        "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 80)))
        for _ in range(20)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    rows = df.select(
        "id",
        F.size(FP.winnow_selected_expr(F.col("text"), K, w)).alias("n"),
        (F.length(F.col("text")) - (K - 1)).alias("m"),
    ).collect()
    for r in rows:
        m = max(r.m, 0)
        if m == 0:
            assert r.n == 0
        else:
            assert 1 <= r.n <= max(1, m - w + 1)


def test_encoded_form_is_md5_only(spark):
    # The (p*1000003 + h) encoding is exact-BIGINT only for the 32-bit
    # md5 prefix; a full-range xxhash64 would wrap int64. The encoded
    # (witness) form must refuse the scale hash outright.
    with pytest.raises(ValueError, match="md5-only"):
        FP.winnow_encoded_expr(F.lit("abcdef"), K, W, hash="xxhash64")
