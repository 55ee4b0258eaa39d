"""Bucketed (co-located) table layout: shuffle-free joins for hot join keys.

At 100 TB the dominant cost of a fact-fact join (e.g. orders ⋈ lineitem) is
shuffling both sides on the key. Bucketing pays that shuffle ONCE at write
time: both tables are hash-partitioned into the same number of buckets on
the join key and each bucket optionally sorted, so every subsequent join
reads matching buckets side by side — SortMergeJoin with NO Exchange on
either side, on every query that touches the pair. The write-once/join-many
trade is the standard layout for a curated fact store.

Spark specifics: ``bucketBy`` requires ``saveAsTable`` (bucket metadata
lives in the catalog); pass ``path`` to keep the data external under your
own storage root. Bucket counts must match across co-located tables, and
readers get bucket pruning on equality filters over the bucket key for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort_by: str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed catalog table (external when ``path``).

    Joining two tables written with the same ``key`` semantics and
    ``n_buckets`` is shuffle-free; sorting by the key at write time also
    removes the join's Sort. One shuffle here buys zero shuffles on every
    later join against a co-located partner.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort_by is not None:
        w = w.sortBy(sort_by)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)
