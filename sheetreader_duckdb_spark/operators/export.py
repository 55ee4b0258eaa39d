"""Deterministic sharded export: the write-side of a training-data pipeline.

Training jobs consume a corpus as N shards, and reproducibility demands that
re-running the export produce the SAME shard membership and the SAME row
order within each shard — otherwise a resumed training run sees a different
data order. Spark's default write gives neither (task scheduling decides
file contents).

Shape: shard = xxhash64(seed:key) mod n_shards (uniform, key-stable), one
hash repartition so each shard's rows land in one task, sort within the
partition by (shard, order key), write with ``partitionBy(shard)`` so each
shard is its own directory regardless of how tasks were packed. Everything
is a pure function of (seed, key set): partition-count and cluster-size
invariant. One shuffle — the minimum for grouping rows into shards at all.

At 100 TB: n_shards is typically 10k-100k; the shuffle is uniform by hash
construction (no skew), and each task streams its shard sorted — no
driver-side anything.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_shard", "export_shards"]

SHARD_COL = "shard"


def with_shard(
    df: DataFrame, key: Column | str, n_shards: int, seed: str = "export"
) -> DataFrame:
    """Add the deterministic shard assignment column (no shuffle)."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    k = F.col(key) if isinstance(key, str) else key
    shard = F.pmod(
        F.xxhash64(F.concat(F.lit(seed), F.lit(":"), k.cast("string"))), F.lit(n_shards)
    ).cast("int")
    return df.withColumn(SHARD_COL, shard)


def export_shards(
    df: DataFrame,
    key: Column | str,
    n_shards: int,
    path: str,
    seed: str = "export",
    format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_shards`` deterministic shards under ``path``.

    Layout: ``path/shard=<i>/part-*.{format}``; each shard's row membership
    and within-file order (ascending by ``xxhash64(seed:key)``, ties by key)
    are pure functions of the data — re-exports are reproducible.
    """
    k = F.col(key) if isinstance(key, str) else key
    order = F.xxhash64(F.concat(F.lit(seed), F.lit(":"), k.cast("string")))
    # Tiebreak by every payload column: rows sharing a key value would
    # otherwise have no total order and their file order would depend on
    # task arrival (breaking the byte-stable re-export guarantee). Rows
    # identical in ALL columns remain interchangeable — byte-stable anyway.
    tiebreak = [F.col(c) for c in df.columns]
    out = (
        with_shard(df, key, n_shards, seed)
        .withColumn("__ord", order)
        .repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, F.col("__ord"), k, *tiebreak)
        .drop("__ord")
    )
    out.write.mode(mode).partitionBy(SHARD_COL).format(format).save(path)
