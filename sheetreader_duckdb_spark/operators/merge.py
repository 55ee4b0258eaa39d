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
   driver-side object, bounded by n_shards. The same pass validates that
   the batch is key-unique (duplicate keys would silently break the keyed
   invariant, so they raise).
3. Read ONLY those shard directories back (partition pruning by
   construction: each shard is a ``shard=<i>`` directory), anti-join the
   change keys (dropping updated/deleted rows), union the upserts, and
   rewrite just those directories with the same deterministic within-shard
   order as export_shards — so a merged table is byte-identical to a fresh
   export of the merged dataset (pinned in tests/test_merge.py).
4. Commit per touched shard with a crash-safe three-step swap: rename the
   live ``shard=<i>`` aside to ``.shard=<i>.old``, rename the new copy
   from ``.merge.tmp`` into place, then delete the ``.old``. At every
   instant a complete copy of each shard exists on disk (live, ``.old``,
   or ``.merge.tmp``); dot-prefixed names are invisible to Spark's input
   listing and to ``read_shards``'s glob. The swap loop is NOT atomic
   across shards — a crash mid-loop leaves some shards new and some old.
   ``merge_into_shards`` runs ``recover_shards`` on entry, so simply
   re-running the merge after any crash is safe: every live shard is
   restored to a complete copy before it is read, and the swap refuses to
   destroy an ``.old`` it did not create. Single-writer crash safety only,
   not concurrent-writer isolation: this is a layout convention over
   parquet, not a transaction log; concurrent merges need external
   serialization (one writer per table).

All directory metadata ops route through operators/fsutil.py: paths with a
URI scheme (``hdfs://``, ``s3a://``, ``file:``) use the JVM's Hadoop
FileSystem API — the layout works on the storage a 100 TB corpus actually
lives on — while scheme-less local paths keep the plain ``os.replace``
fast path.

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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators import fsutil
from sheetreader_duckdb_spark.operators.export import SHARD_COL, with_shard

__all__ = ["merge_into_shards", "read_shards", "recover_shards"]


def read_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read a sharded table written by export_shards / merge_into_shards."""
    return spark.read.option("basePath", path).parquet(f"{path}/{SHARD_COL}=*")


def _old_path(path: str, i: int) -> str:
    # Dot prefix keeps it out of read_shards' glob and Spark's file listing.
    return f"{path}/.{SHARD_COL}={i}.old"


def recover_shards(spark: SparkSession, path: str) -> list[int]:
    """Restore a complete copy of every shard after a crashed merge.

    For each leftover ``.shard=<i>.old``: if the live ``shard=<i>`` exists
    the swap completed — drop the ``.old``; otherwise the crash hit between
    the two renames — rename the ``.old`` back into place (the pre-merge
    copy; re-run the merge to apply the batch). Any ``.merge.tmp`` staging
    directory is removed. Returns the shard ids that were rolled back.
    """
    rolled = []
    for old in fsutil.glob_dirs(spark, f"{path}/.{SHARD_COL}=*.old"):
        i = int(old.rsplit("=", 1)[1][: -len(".old")])
        live = f"{path}/{SHARD_COL}={i}"
        if fsutil.exists(spark, live):
            fsutil.delete(spark, old)
        else:
            fsutil.rename(spark, old, live)
            rolled.append(i)
    fsutil.delete(spark, f"{path}/.merge.tmp")
    return sorted(rolled)


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
    without replacement). Rows with unseen keys are inserted. ``changes``
    must be key-unique — duplicate keys raise (there is no defined order
    between two upserts of one key in a single batch). Untouched shard
    directories are not read, not rewritten, and keep their exact bytes —
    re-running the same merge is a no-op byte-wise.
    """
    if delete_col is not None and delete_col not in changes.columns:
        raise ValueError(f"delete_col {delete_col!r} not in changes columns")
    ch = with_shard(changes, key, n_shards, seed)
    # One pass over the (small) batch: touched shards + key-uniqueness and
    # NULL-key checks (count_distinct skips NULLs, so nulls are counted
    # separately — a NULL key is not a duplicate, it has no shard).
    stats = (
        ch.groupBy(SHARD_COL)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(key)).alias("d"),
            F.sum(F.col(key).isNull().cast("long")).alias("nulls"),
        )
        .collect()
    )
    nulls = sum(r["nulls"] for r in stats)
    if nulls:
        raise ValueError(
            f"changes batch has {nulls} NULL-key row(s) for key {key!r}; "
            "a keyed merge cannot route a NULL key to a shard"
        )
    dupes = sum(r["n"] - r["d"] for r in stats)
    if dupes:
        raise ValueError(
            f"changes batch has {dupes} duplicate-key row(s) for key {key!r}; "
            "merge semantics require one change row per key (deduplicate the "
            "batch, e.g. keep the latest row per key, before merging)"
        )
    touched = sorted(r[SHARD_COL] for r in stats)
    if not touched:
        return []

    # A previous merge may have crashed mid-swap, leaving some shard's only
    # complete copy under .shard=<i>.old. Restore BEFORE listing/reading the
    # live directories: otherwise the crashed shard's surviving rows are
    # silently absent from the rewrite, and the swap loop below would then
    # delete the .old — the last copy — before installing the incomplete
    # result. After this call every live shard directory is complete.
    recover_shards(spark, path)

    paths = [f"{path}/{SHARD_COL}={i}" for i in touched]
    existing = [p for p in paths if fsutil.exists(spark, p)]
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
    fsutil.delete(spark, tmp)
    _write_ordered(merged, F.col(key), n_shards, seed, tmp)

    # Crash-safe swap, per shard: live -> .old, tmp -> live, drop .old.
    # The tmp write may legitimately omit a touched shard (every row of it
    # was deleted) — then the rename-aside is the removal. A complete copy
    # of each shard exists at every instant; see recover_shards.
    for i in touched:
        src = f"{tmp}/{SHARD_COL}={i}"
        dst = f"{path}/{SHARD_COL}={i}"
        old = _old_path(path, i)
        if fsutil.exists(spark, old):
            # recover_shards ran at merge start, so an .old appearing here
            # means another writer is mid-swap on this table. Never delete
            # it — it may be the only complete copy of the shard.
            raise RuntimeError(
                f"unexpected recovery copy {old}: another merge appears to "
                "be in flight (single-writer contract violated); run "
                "recover_shards and retry"
            )
        if fsutil.exists(spark, dst):
            fsutil.rename(spark, dst, old)
        if fsutil.exists(spark, src):
            fsutil.rename(spark, src, dst)
        fsutil.delete(spark, old)
    fsutil.delete(spark, tmp)
    return touched
