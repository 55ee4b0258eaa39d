"""Sequence packing (operators/packing.py): assignment validity (every doc
exactly once, no sequence over seq_len, contiguous positions), determinism
under repartitioning, oversized-doc flagging, packing efficiency on the
documents table, and the pure-python FFD core."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators import text as X
from sheetreader_duckdb_spark.operators.packing import _ffd_pack, pack_sequences
from sheetreader_duckdb_spark.tables import T

SEQ_LEN = 512


def _assignment(spark, sf_dir, **kw):
    d = T(spark, sf_dir, "documents")
    return pack_sequences(
        d, "doc_id", X.n_tokens(F.col("text")), SEQ_LEN, n_buckets=8, **kw
    )


def test_every_doc_assigned_exactly_once(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    got = _assignment(spark, sf_dir).select("id").collect()
    ids = [r[0] for r in got]
    assert len(ids) == len(set(ids)) == d.count()


def test_no_sequence_exceeds_seq_len(spark, sf_dir):
    over = (
        _assignment(spark, sf_dir)
        .filter(~F.col("truncated"))
        .groupBy("seq_id")
        .agg(F.sum("n_tokens").alias("total"))
        .filter(F.col("total") > SEQ_LEN)
        .count()
    )
    assert over == 0


def test_seq_positions_contiguous(spark, sf_dir):
    bad = (
        _assignment(spark, sf_dir)
        .groupBy("seq_id")
        .agg(F.count("*").alias("n"), F.max("seq_pos").alias("mx"), F.min("seq_pos").alias("mn"))
        .filter((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0))
        .count()
    )
    assert bad == 0


def test_deterministic_under_repartition(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    tok = X.n_tokens(F.col("text"))
    a = {tuple(r) for r in pack_sequences(d, "doc_id", tok, SEQ_LEN, n_buckets=8).collect()}
    b = {
        tuple(r)
        for r in pack_sequences(
            d.repartition(13), "doc_id", tok, SEQ_LEN, n_buckets=8
        ).collect()
    }
    assert a == b


def test_oversized_docs_flagged_and_isolated(spark):
    rows = [(1, 10), (2, 600), (3, 500), (4, 512)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = pack_sequences(df, "doc_id", "n", SEQ_LEN, n_buckets=2)
    by_id = {r["id"]: r for r in out.collect()}
    assert by_id[2]["truncated"] is True  # 600 > 512
    assert by_id[4]["truncated"] is False  # == seq_len: fits exactly
    # doc 2 and doc 4 must be alone in their sequences
    seq_members: dict[int, list[int]] = {}
    for r in by_id.values():
        seq_members.setdefault(r["seq_id"], []).append(r["id"])
    assert seq_members[by_id[2]["seq_id"]] == [2]
    assert seq_members[by_id[4]["seq_id"]] == [4]


def test_packing_efficiency_on_documents(spark, sf_dir):
    """FFD on the real corpus should waste far less than one-doc-per-sequence."""
    asn = _assignment(spark, sf_dir).filter(~F.col("truncated"))
    agg = asn.agg(
        F.sum("n_tokens").alias("tok"), F.count_distinct("seq_id").alias("seqs")
    ).collect()[0]
    occupancy = agg["tok"] / (agg["seqs"] * SEQ_LEN)
    assert occupancy > 0.8  # ≥80% of context tokens are real data


def test_ffd_core_properties():
    placed = _ffd_pack([10, 11, 12, 13], [300, 300, 200, 100], 512)
    # 300+200=500 and 300+100=400 → two sequences, not four
    seqs = {p[1] for p in placed}
    assert len(seqs) == 2
    assert all(not p[3] for p in placed)
    # determinism: same multiset, different order → same result
    assert placed == _ffd_pack([13, 12, 11, 10], [100, 200, 300, 300], 512)


def test_ffd_property_random_inputs():
    """Any (id, count) multiset: every doc placed once, no bin overflows,
    positions contiguous per bin, permutation-invariant."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=700), min_size=1, max_size=60),
        st.randoms(),
    )
    def check(counts, rng):
        ids = list(range(len(counts)))
        placed = _ffd_pack(ids, counts, 512)
        assert sorted(p[0] for p in placed) == ids  # each doc exactly once
        by_seq: dict[int, list] = {}
        for doc_id, s, pos, trunc in placed:
            by_seq.setdefault(s, []).append((pos, doc_id, trunc))
        for s, members in by_seq.items():
            assert sorted(p for p, _, _ in members) == list(range(len(members)))
            total = sum(counts[d] for _, d, _ in members)
            if any(t for _, _, t in members):
                assert len(members) == 1  # oversized docs isolated
            else:
                assert total <= 512
        # permutation invariance
        perm = list(zip(ids, counts))
        rng.shuffle(perm)
        assert placed == _ffd_pack([p[0] for p in perm], [p[1] for p in perm], 512)

    check()


def test_rejects_bad_seq_len(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        pack_sequences(d, "doc_id", "n_chars", 0)


# -- segment-tree first-fit: exactness + big-bucket scalability --------------


def _ffd_reference(ids, counts, seq_len):
    """The naive O(n x open-seqs) linear-scan first-fit — kept here as the
    semantic reference the segment-tree implementation must match exactly."""
    order = sorted(zip(ids, counts), key=lambda t: (-t[1], t[0]))
    room, fill, out = [], [], []
    for doc_id, n in order:
        if n >= seq_len:
            room.append(0)
            fill.append(1)
            out.append((doc_id, len(room) - 1, 0, n > seq_len))
            continue
        for s in range(len(room)):
            if room[s] >= n:
                out.append((doc_id, s, fill[s], False))
                room[s] -= n
                fill[s] += 1
                break
        else:
            room.append(seq_len - n)
            fill.append(1)
            out.append((doc_id, len(room) - 1, 0, False))
    return out


def test_ffd_segment_tree_matches_linear_scan():
    import random

    from sheetreader_duckdb_spark.operators.packing import _ffd_pack

    rng = random.Random(7)
    for trial in range(20):
        n = rng.randrange(1, 400)
        seq_len = rng.choice([64, 256, 2048])
        ids = list(range(n))
        counts = [rng.randrange(0, seq_len + seq_len // 4) for _ in range(n)]
        assert _ffd_pack(ids, counts, seq_len) == _ffd_reference(ids, counts, seq_len)


def test_ffd_500k_bucket_packs_in_seconds():
    """VERDICT r2 item 8: a 500k-doc bucket (the top of the recommended
    per-bucket range) must pack in seconds, not minutes — the naive scan
    is quadratic when most docs open fresh sequences."""
    import random
    import time

    from sheetreader_duckdb_spark.operators.packing import _ffd_pack

    rng = random.Random(11)
    n = 500_000
    ids = list(range(n))
    counts = [rng.randrange(200, 1800) for _ in range(n)]
    t0 = time.perf_counter()
    placed = _ffd_pack(ids, counts, 2048)
    dt = time.perf_counter() - t0
    assert len(placed) == n
    # validity: per-sequence fill within capacity
    fill = {}
    for doc_id, s, pos, trunc in placed:
        fill[s] = fill.get(s, 0) + counts[doc_id]
        assert not trunc
    assert all(v <= 2048 for v in fill.values())
    assert dt < 60, f"500k-doc FFD took {dt:.1f}s"
