"""Sequence packing: assign documents to fixed-length training sequences.

The last step of an LLM data pipeline — after filtering and dedup, documents
are concatenated into fixed-size context windows (e.g. 8192 tokens), and the
packing quality (fraction of non-padding tokens) directly multiplies training
throughput. Exact global bin packing is NP-hard and inherently sequential;
the standard distributed practice is bucket-local greedy packing:

1. Deterministically hash each doc into one of ``n_buckets`` packing groups
   (md5-keyed — same bucket on every run and every cluster size).
2. Within each bucket, first-fit-decreasing: sort docs by (token count desc,
   id), place each into the first open sequence with room, else open a new
   one. Greedy FFD wastes ≤ ~22% over optimal in the worst case and ~1-3%
   on natural corpus length distributions.
3. Emit (id, seq_id, seq_pos); ``seq_id`` is globally unique because it is
   namespaced by bucket.

Spark shape: ONE shuffle (groupBy bucket) + applyInPandas for the per-bucket
greedy loop — the loop is pure Python over one bucket's (id, n_tokens) pairs
only (never the text), so a bucket of 100k docs is ~1.6 MB of state. At
100 TB: size ``n_buckets`` so each bucket holds ~50-500k docs; buckets are
uniform by hash construction, so no skew. Documents longer than ``seq_len``
get a sequence of their own and are flagged (``truncated=true``) — the
caller decides whether to split or drop them.

Determinism: bucket assignment depends only on (seed, id); within a bucket
the FFD order is total (count desc, id asc) — so the full assignment is a
pure function of the input set, invariant to partitioning. Pinned by tests
(tests/test_packing.py); not SQL-expressible (greedy loop), so this operator
is test-verified rather than oracle-declared.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]


def _ffd_pack(ids: Iterable, counts: Iterable[int], seq_len: int):
    """First-fit-decreasing over one bucket. Returns (id, local_seq, pos,
    truncated) tuples. Pure function of the (id, count) multiset.

    First-fit = LOWEST-index open sequence with room, found through a max
    segment tree over per-sequence remaining room: descend left-first into
    any subtree whose max ≥ need. O(n log n) total instead of the naive
    O(n × open-sequences) linear scan — a 500k-doc bucket packs in seconds
    (pinned in tests/test_packing.py) with assignments IDENTICAL to the
    scan (the tree returns exactly the leftmost fitting sequence).
    """
    order = sorted(zip(ids, counts), key=lambda t: (-t[1], t[0]))
    n_docs = len(order)
    cap = 1
    while cap < max(1, n_docs):
        cap <<= 1
    # tree[cap + s] = remaining room of sequence s (-1 = not yet opened,
    # which never satisfies need ≥ 0); internal nodes hold subtree max.
    tree = [-1] * (2 * cap)

    def _set(pos: int, val: int) -> None:
        i = cap + pos
        tree[i] = val
        i >>= 1
        while i:
            left, right = tree[2 * i], tree[2 * i + 1]
            tree[i] = left if left >= right else right
            i >>= 1

    def _leftmost(need: int) -> int:
        if tree[1] < need:
            return -1
        i = 1
        while i < cap:
            i = 2 * i if tree[2 * i] >= need else 2 * i + 1
        return i - cap

    fill: list[int] = []  # docs already placed per open sequence
    out = []
    for doc_id, n in order:
        if n >= seq_len:
            # Oversized doc: its own (flagged) sequence, closed immediately
            # (room 0) so nothing else lands in it.
            fill.append(1)
            _set(len(fill) - 1, 0)
            out.append((doc_id, len(fill) - 1, 0, n > seq_len))
            continue
        s = _leftmost(n)
        if s >= 0:
            out.append((doc_id, s, fill[s], False))
            _set(s, tree[cap + s] - n)
            fill[s] += 1
        else:
            fill.append(1)
            _set(len(fill) - 1, seq_len - n)
            out.append((doc_id, len(fill) - 1, 0, False))
    return out


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: Column | str,
    seq_len: int,
    n_buckets: int = 1024,
    seed: str = "pack",
) -> DataFrame:
    """Pack documents into fixed-length sequences; returns the assignment
    ``(id, n_tokens, seq_id, seq_pos, truncated)``.

    ``seq_id`` = bucket * 2^32 + local sequence index (globally unique).
    ``seq_pos`` is the doc's placement order within its sequence — the
    downstream concat order. One shuffle; per-bucket Python is
    O(docs × log docs) over scalar pairs (segment-tree first-fit), never
    the payload.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    tok = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    bucket = F.pmod(
        F.xxhash64(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))),
        F.lit(n_buckets),
    ).alias("__bucket")
    slim = df.select(F.col(id_col).alias("__id"), tok.cast("long").alias("__n"), bucket)
    id_field = slim.schema["__id"].dataType.simpleString()
    out_schema = (
        f"id {id_field}, n_tokens long, seq_id long, seq_pos int, truncated boolean"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["__bucket"].iloc[0])
        placed = _ffd_pack(pdf["__id"].tolist(), pdf["__n"].tolist(), seq_len)
        n_by_id = dict(zip(pdf["__id"], pdf["__n"]))
        return pd.DataFrame(
            {
                "id": [p[0] for p in placed],
                "n_tokens": [int(n_by_id[p[0]]) for p in placed],
                "seq_id": [(b << 32) + p[1] for p in placed],
                "seq_pos": [p[2] for p in placed],
                "truncated": [p[3] for p in placed],
            }
        )

    return slim.groupBy("__bucket").applyInPandas(_pack, schema=out_schema)
