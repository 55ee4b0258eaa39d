"""Keyed MERGE into a sharded parquet table (operators/merge.py): upsert /
delete semantics, batch-proportional touch set, byte-stable equivalence to
a fresh export of the merged dataset, and crash-free no-op re-merges."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators.export import export_shards
from sheetreader_duckdb_spark.operators.merge import merge_into_shards, read_shards
from sheetreader_duckdb_spark.tables import T

N_SHARDS = 8
SEED = "mrg"


def _table(spark, sf_dir, tmp, subdir):
    path = os.path.join(tmp, subdir)
    d = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    export_shards(d, "doc_id", N_SHARDS, path, seed=SEED)
    return path


def _shard_files(path):
    """{shard dir -> (file bytes, mtime_ns)} for the single part file."""
    out = {}
    for d in sorted(glob.glob(os.path.join(path, "shard=*"))):
        parts = sorted(glob.glob(os.path.join(d, "*.parquet")))
        assert len(parts) == 1, f"expected one part file in {d}"
        st = os.stat(parts[0])
        with open(parts[0], "rb") as f:
            out[os.path.basename(d)] = (f.read(), st.st_mtime_ns)
    return out


def test_merge_upsert_insert_delete_semantics(spark, sf_dir, tmp_path):
    path = _table(spark, sf_dir, str(tmp_path), "t")
    src = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    ids = [r[0] for r in src.select("doc_id").orderBy("doc_id").limit(3).collect()]
    upd, dele, ins = ids[0], ids[1], 10_000_001
    changes = spark.createDataFrame(
        [
            (upd, "patched", 1, False),
            (dele, "gone", 0, True),
            (ins, "new", 7, False),
        ],
        "doc_id long, source string, n_chars long, is_delete boolean",
    )
    touched = merge_into_shards(
        spark, changes, "doc_id", path, N_SHARDS, seed=SEED, delete_col="is_delete"
    )
    assert touched == sorted(touched) and len(touched) <= 3

    back = read_shards(spark, path)
    assert back.filter(F.col("doc_id") == upd).collect()[0]["source"] == "patched"
    assert back.filter(F.col("doc_id") == dele).count() == 0
    assert back.filter(F.col("doc_id") == ins).count() == 1
    assert back.count() == src.count()  # -1 delete +1 insert


def test_merge_equals_fresh_export_bytewise(spark, sf_dir, tmp_path):
    """A merged table must be indistinguishable from a fresh export of the
    merged dataset — same shard membership, same within-file order, same
    bytes — so downstream training jobs can't tell history from state."""
    path = _table(spark, sf_dir, str(tmp_path), "m")
    src = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    ids = [r[0] for r in src.select("doc_id").orderBy("doc_id").limit(4).collect()]
    changes = spark.createDataFrame(
        [(i, "v2", 42) for i in ids[:2]] + [(10_000_002, "fresh", 5)],
        "doc_id long, source string, n_chars long",
    )
    merge_into_shards(spark, changes, "doc_id", path, N_SHARDS, seed=SEED)

    merged_df = src.join(
        changes.select("doc_id"), "doc_id", "left_anti"
    ).unionByName(changes)
    fresh = os.path.join(str(tmp_path), "fresh")
    export_shards(merged_df, "doc_id", N_SHARDS, fresh, seed=SEED)

    got = {k: v[0] for k, v in _shard_files(path).items()}
    want = {k: v[0] for k, v in _shard_files(fresh).items()}
    assert got == want


def test_merge_touches_only_affected_shards(spark, sf_dir, tmp_path):
    path = _table(spark, sf_dir, str(tmp_path), "u")
    before = _shard_files(path)
    src = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    one = src.orderBy("doc_id").limit(1).withColumn("source", F.lit("touched"))
    touched = merge_into_shards(spark, one, "doc_id", path, N_SHARDS, seed=SEED)
    assert len(touched) == 1
    after = _shard_files(path)
    for name, (data, mtime) in after.items():
        if name == f"shard={touched[0]}":
            assert data != before[name][0]
        else:  # untouched shards keep their exact file, not even rewritten
            assert (data, mtime) == before[name]


def test_remerge_same_batch_is_byte_stable(spark, sf_dir, tmp_path):
    path = _table(spark, sf_dir, str(tmp_path), "r")
    src = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    batch = src.orderBy("doc_id").limit(5).withColumn("n_chars", F.lit(9))
    merge_into_shards(spark, batch, "doc_id", path, N_SHARDS, seed=SEED)
    first = {k: v[0] for k, v in _shard_files(path).items()}
    merge_into_shards(spark, batch, "doc_id", path, N_SHARDS, seed=SEED)
    second = {k: v[0] for k, v in _shard_files(path).items()}
    assert first == second


def test_merge_through_hadoop_fs_uri_byte_identity(spark, sf_dir, tmp_path):
    """Addressing the table as a ``file:`` URI routes every directory op
    through the Hadoop FileSystem API (fsutil) instead of os/shutil — the
    path a corpus on HDFS/object storage takes — and the merged table must
    still be byte-identical to a fresh export of the merged dataset."""
    local = _table(spark, sf_dir, str(tmp_path), "fsapi")
    uri = "file:" + local
    src = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    ids = [r[0] for r in src.select("doc_id").orderBy("doc_id").limit(3).collect()]
    changes = spark.createDataFrame(
        [(ids[0], "v2", 42, False), (ids[1], "gone", 0, True), (10_000_003, "new", 5, False)],
        "doc_id long, source string, n_chars long, is_delete boolean",
    )
    touched = merge_into_shards(
        spark, changes, "doc_id", uri, N_SHARDS, seed=SEED, delete_col="is_delete"
    )
    assert touched

    merged_df = src.join(
        changes.select("doc_id"), "doc_id", "left_anti"
    ).unionByName(changes.filter(~F.col("is_delete")).drop("is_delete"))
    fresh = os.path.join(str(tmp_path), "fresh")
    export_shards(merged_df, "doc_id", N_SHARDS, fresh, seed=SEED)
    got = {k: v[0] for k, v in _shard_files(local).items()}
    want = {k: v[0] for k, v in _shard_files(fresh).items()}
    assert got == want
    # no staging leftovers
    assert not glob.glob(os.path.join(local, ".merge.tmp"))
    assert not glob.glob(os.path.join(local, ".shard=*.old"))


def test_merge_duplicate_change_keys_raise(spark, sf_dir, tmp_path):
    path = _table(spark, sf_dir, str(tmp_path), "dup")
    changes = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2)], "doc_id long, source string, n_chars long"
    )
    import pytest

    with pytest.raises(ValueError, match="duplicate-key"):
        merge_into_shards(spark, changes, "doc_id", path, N_SHARDS, seed=SEED)


def test_recover_shards_after_simulated_crash(spark, sf_dir, tmp_path):
    """Both crash windows of the three-step swap leave a recoverable state:
    (a) live renamed aside but new copy not yet in place -> recover renames
    the .old back; (b) swap complete but .old not yet deleted -> recover
    drops the .old and keeps the new live copy."""
    import shutil

    from sheetreader_duckdb_spark.operators.merge import recover_shards

    path = _table(spark, sf_dir, str(tmp_path), "crash")
    before = {k: v[0] for k, v in _shard_files(path).items()}
    shard_dirs = sorted(glob.glob(os.path.join(path, "shard=*")))
    a = int(os.path.basename(shard_dirs[0]).split("=")[1])
    b = int(os.path.basename(shard_dirs[1]).split("=")[1])
    # window (a): mid-flight — live copy sits in .old, no live dir
    os.replace(
        os.path.join(path, f"shard={a}"), os.path.join(path, f".shard={a}.old")
    )
    # window (b): completed swap, stale .old alongside the live dir
    shutil.copytree(
        os.path.join(path, f"shard={b}"), os.path.join(path, f".shard={b}.old")
    )
    os.makedirs(os.path.join(path, ".merge.tmp"))

    rolled = recover_shards(spark, path)
    assert rolled == [a]
    after = {k: v[0] for k, v in _shard_files(path).items()}
    assert after == before
    assert not glob.glob(os.path.join(path, ".shard=*.old"))
    assert not os.path.isdir(os.path.join(path, ".merge.tmp"))


def test_merge_into_empty_table_dir(spark, sf_dir, tmp_path):
    """First batch into a brand-new table: every row is an insert."""
    path = str(tmp_path / "empty")
    os.makedirs(path)
    batch = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 2)], "doc_id long, source string, n_chars long"
    )
    merge_into_shards(spark, batch, "doc_id", path, N_SHARDS, seed=SEED)
    assert read_shards(spark, path).count() == 2


def test_rerun_after_midswap_crash_loses_nothing(spark, sf_dir, tmp_path):
    # Crash window: rename(dst, old) done, rename(src, dst) not — shard=<i>
    # is GONE and .shard=<i>.old holds its only complete copy. Re-running
    # the merge directly (no manual recover_shards) must restore that copy
    # before reading, and the merged table must equal a fresh export of the
    # merged dataset — i.e. zero rows lost.
    path = _table(spark, sf_dir, str(tmp_path), "crash2")
    src = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    some_id = src.agg(F.min("doc_id")).collect()[0][0]
    changes = spark.createDataFrame(
        [(int(some_id), "patched", 123)], "doc_id long, source string, n_chars long"
    )
    from sheetreader_duckdb_spark.operators.export import with_shard

    shard = with_shard(changes, "doc_id", N_SHARDS, SEED).collect()[0]["shard"]
    live = os.path.join(path, f"shard={shard}")
    os.rename(live, os.path.join(path, f".shard={shard}.old"))  # simulate crash

    merge_into_shards(spark, changes, "doc_id", path, N_SHARDS, seed=SEED)

    merged = read_shards(spark, path)
    expect = src.filter(F.col("doc_id") != some_id).unionByName(changes)
    assert merged.count() == expect.count()
    assert merged.join(expect, ["doc_id", "source", "n_chars"], "left_anti").count() == 0
    assert not glob.glob(os.path.join(path, ".shard=*.old"))


def test_null_change_keys_raise(spark, sf_dir, tmp_path):
    path = _table(spark, sf_dir, str(tmp_path), "nullk")
    changes = spark.createDataFrame(
        [(None, "x", 1)], "doc_id long, source string, n_chars long"
    )
    import pytest

    with pytest.raises(ValueError, match="NULL-key"):
        merge_into_shards(spark, changes, "doc_id", path, N_SHARDS, seed=SEED)
