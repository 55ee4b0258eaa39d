"""Keyed MERGE (upsert/delete) into a deterministically-sharded parquet table.

The corpus-lifecycle write path: a training corpus on plain parquet needs
incremental updates — new crawl batches upserted, takedowns deleted —
without a transactional table format and without rewriting the whole
corpus. The deterministic shard layout of ``operators.export`` makes that
possible: shard membership is a pure function of the key, so a change
batch TOUCHES only ``distinct shard(key)`` of the table, and merge cost is
(batch keys' shard count) × (shard size) — independent of total corpus
size when the batch is small.

Shape (all Spark-side, nothing driver-materialized but the shard id list):

1. Assign each change row its shard (scan-speed hash expression).
2. ``collect`` the distinct touched shard ids — a list of ints, the one
   driver-side object, bounded by n_shards.
3. Read ONLY those shard directories back (partition pruning by
   construction: each shard is a ``shard=<i>`` directory), anti-join the
   change keys (dropping updated/deleted rows), union the upserts, and
   rewrite just those directories with the same deterministic within-shard
   order as export_shards — so a merged table is byte-identical to a fresh
   export of the merged dataset (pinned in tests/test_merge.py).
4. Writes go to ``shard=<i>.tmp`` siblings first, then swap via rename —
   a crashed merge leaves every live directory intact (single-writer
   crash safety, not concurrent-writer isolation: this is a layout
   convention over parquet, not a transaction log; concurrent merges need
   external serialization, e.g. one writer per table).

At 100 TB: n_shards 10k-100k keeps shards at the hundreds-of-MB scale a
task handles comfortably; a 1M-doc daily batch into a 10B-doc corpus
touches ≤ min(1M, n_shards) shards, so the rewrite is ~0.01% of a full
re-export. The anti-join inside each shard is key-equi, shuffle-free on
the table side beyond the shard read itself (the batch side is the small
one and broadcasts).

No reference analog (the reference has no write path beyond CTAS —
sheetreader_extension.cpp copies a sheet into a DuckDB table once);
this extends SURVEY.md §2.3's corpus-lifecycle north star (N1 incremental
dedup) to the storage layer.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators.export import SHARD_COL, with_shard

__all__ = ["merge_into_shards", "read_shards"]


def read_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read a sharded table written by export_shards / merge_into_shards."""
    return spark.read.option("basePath", path).parquet(f"{path}/{SHARD_COL}=*")


def _write_ordered(
    part: DataFrame, key: Column, n_shards: int, seed: str, out_path: str
) -> None:
    """Rewrite one batch of shards with export_shards' deterministic
    within-shard order (hash order, then key, then payload tiebreak)."""
    order = F.xxhash64(F.concat(F.lit(seed), F.lit(":"), key.cast("string")))
    tiebreak = [F.col(c) for c in part.columns if c != SHARD_COL]
    (
        part.withColumn("__ord", order)
        .repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, F.col("__ord"), key, *tiebreak)
        .drop("__ord")
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
        .parquet(out_path)
    )


def merge_into_shards(
    spark: SparkSession,
    changes: DataFrame,
    key: str,
    path: str,
    n_shards: int,
    seed: str = "export",
    delete_col: str | None = None,
) -> list[int]:
    """Upsert ``changes`` into the sharded parquet table at ``path`` by
    ``key``; returns the (sorted) shard ids that were rewritten.

    Semantics per change row: existing rows with the same key are replaced
    (or, when ``delete_col`` names a boolean column and it is true, removed
    without replacement). Rows with unseen keys are inserted. Untouched
    shard directories are not read, not rewritten, and keep their exact
    bytes — re-running the same merge is a no-op byte-wise.
    """
    if delete_col is not None and delete_col not in changes.columns:
        raise ValueError(f"delete_col {delete_col!r} not in changes columns")
    ch = with_shard(changes, key, n_shards, seed)
    touched = sorted(
        r[0] for r in ch.select(SHARD_COL).distinct().collect()
    )  # bounded by n_shards — the only driver-side materialization
    if not touched:
        return []

    paths = [f"{path}/{SHARD_COL}={i}" for i in touched]
    existing = [p for p in paths if os.path.isdir(p)]
    keys = ch.select(F.col(key)).distinct()
    if delete_col is None:
        upserts = ch
    else:
        upserts = ch.filter(~F.coalesce(F.col(delete_col), F.lit(False))).drop(
            delete_col
        )

    if existing:
        # basePath keeps the shard= partition column in scope; only the
        # touched directories are listed, so work is batch-proportional.
        current = spark.read.option("basePath", path).parquet(*existing)
        kept = current.join(keys, key, "left_anti")
        merged = kept.unionByName(upserts)
    else:
        merged = upserts

    tmp = f"{path}/.merge.tmp"
    _write_ordered(merged, F.col(key), n_shards, seed, tmp)

    # Swap: the tmp write may legitimately omit a touched shard (every row
    # of it was deleted) — that shard directory is removed.
    for i in touched:
        src = f"{tmp}/{SHARD_COL}={i}"
        dst = f"{path}/{SHARD_COL}={i}"
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        if os.path.isdir(src):
            os.replace(src, dst)
    shutil.rmtree(tmp, ignore_errors=True)
    return touched
