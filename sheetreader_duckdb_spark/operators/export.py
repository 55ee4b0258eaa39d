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

__all__ = ["with_shard", "export_shards", "export_webdataset"]

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


def export_webdataset(
    df: DataFrame,
    key: str,
    n_shards: int,
    path: str,
    members: "list[tuple[str, str]]",
    seed: str = "wds",
    id_width: int = 12,
    mode: str = "overwrite",
) -> None:
    """WebDataset-style tar shards — the multimodal training-data
    interchange format (one tar per shard; each sample is a group of
    same-stem entries like ``000000000042.txt`` + ``000000000042.bin``,
    consumed sequentially by dataloaders).

    ``members`` maps tar extensions to columns: ``[("txt", "text"),
    ("bin", "payload")]`` emits two entries per row (a NULL cell skips
    that entry). Everything is deterministic AND byte-stable: shard
    membership and in-tar order reuse the export machinery's
    hash-of-(seed:key) assignment/ordering, entry headers pin
    mtime=0/uid=0/gid=0 (USTAR), so a re-export produces bit-identical
    tars — resumable training sees identical sample order.

    ``mode='overwrite'`` (default) removes prior ``shard-*.tar`` and
    stale ``.tmp-*.tar`` files before writing, so a re-export with a
    smaller ``n_shards`` cannot leave old shards mixed into the layout;
    ``mode='error'`` refuses to write into a directory that already
    holds shards. Integer keys become zero-padded ``id_width`` stems;
    string keys are used verbatim (they must not contain '/' — tar
    entry names are flat). Key values must be UNIQUE: WebDataset
    loaders group entries by stem, so a repeated key would silently
    merge two samples — the writer raises on a duplicate (equal keys
    sort adjacent within a shard, so the check is streaming O(1)).

    Scale shape: one shuffle (the shard repartition); each task streams
    its sorted rows straight into tar archives via ``pyarrow.fs``
    (local/HDFS/S3 by URI) with a write-to-temp-then-rename publish per
    shard. A partition may carry several (complete) shards — hash
    collisions of shard ids over tasks — never a partial one.
    """
    if not members:
        raise ValueError("members must be non-empty")
    if mode not in ("overwrite", "error"):
        raise ValueError(f"mode must be 'overwrite' or 'error', got {mode!r}")
    from pyarrow import fs as pafs

    _fs, _base = pafs.FileSystem.from_uri(path)
    _fs.create_dir(_base, recursive=True)
    import posixpath as _pp

    existing = [
        info.path
        for info in _fs.get_file_info(pafs.FileSelector(_base, recursive=False))
        if info.is_file
        and (
            (_pp.basename(info.path).startswith("shard-")
             and info.path.endswith(".tar"))
            or (_pp.basename(info.path).startswith(".tmp-")
                and info.path.endswith(".tar"))
        )
    ]
    if existing and mode == "error":
        raise FileExistsError(
            f"export_webdataset: {len(existing)} shard/tmp tar(s) already "
            f"under {path}; pass mode='overwrite' to replace them"
        )
    for f in existing:
        _fs.delete_file(f)
    k = F.col(key)
    order = F.xxhash64(F.concat(F.lit(seed), F.lit(":"), k.cast("string")))
    cols = [key] + [c for _, c in members]
    tiebreak = [F.col(c) for c in df.columns]
    out = (
        with_shard(df, key, n_shards, seed)
        .withColumn("__ord", order)
        .repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, F.col("__ord"), k, *tiebreak)
        .select(SHARD_COL, *cols)
    )
    exts = [e for e, _ in members]
    n_cols = len(members)

    def write_partition(rows):
        import io
        import posixpath
        import tarfile
        import uuid

        from pyarrow import fs as pafs

        filesystem, base = pafs.FileSystem.from_uri(path)
        filesystem.create_dir(base, recursive=True)

        cur_shard, tar, buf = None, None, None
        prev_stem = None

        def publish():
            nonlocal tar, buf
            if tar is None:
                return
            tar.close()
            tmp = posixpath.join(base, f".tmp-{uuid.uuid4().hex}.tar")
            final = posixpath.join(base, f"shard-{cur_shard:05d}.tar")
            with filesystem.open_output_stream(tmp) as s:
                s.write(buf.getvalue())
            filesystem.move(tmp, final)
            tar, buf = None, None

        for row in rows:
            if row[0] != cur_shard:
                publish()
                cur_shard = row[0]
                buf = io.BytesIO()
                tar = tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT)
                prev_stem = None
            kv = row[1]
            if isinstance(kv, int):
                stem = f"{kv:0{id_width}d}"
            else:
                stem = str(kv)
                if "/" in stem:
                    raise ValueError(
                        f"export_webdataset: key value {stem!r} contains '/'"
                    )
            # Duplicate keys would produce two identical entry stems,
            # which WebDataset loaders merge into one conflicting sample
            # group. Equal keys hash to the same shard AND the same
            # sort key (shard, xxhash64(key), key, ...), so duplicates
            # arrive adjacent — an O(1) streaming check catches them all.
            if stem == prev_stem:
                raise ValueError(
                    f"export_webdataset: duplicate key value {kv!r} "
                    f"(entry stem {stem!r}) — sample keys must be unique"
                )
            prev_stem = stem
            for i in range(n_cols):
                val = row[2 + i]
                if val is None:
                    continue
                data = val.encode("utf-8") if isinstance(val, str) else bytes(val)
                info = tarfile.TarInfo(name=f"{stem}.{exts[i]}")
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tar.addfile(info, io.BytesIO(data))
        publish()

    out.foreachPartition(write_partition)
