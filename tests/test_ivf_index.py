"""Persistent IVF index (operators/similarity.py build_ivf_index /
ivf_topk_indexed): results identical to the in-memory ivf_topk on the same
corpus, and the candidate scan must be partition-pruned to probed cells."""

from __future__ import annotations

from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators.similarity import (
    build_ivf_index,
    ivf_topk,
    ivf_topk_indexed,
)
from sheetreader_duckdb_spark.tables import T


def _key(rows):
    return sorted((r["qid"], r["cid"], r["rn"], round(r["cosine"], 9)) for r in rows)


def test_indexed_search_matches_in_memory(spark, sf_dir, tmp_path):
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    path = str(tmp_path / "ivf")
    build_ivf_index(e, path, n_cells=16, n_iters=2)
    got = ivf_topk_indexed(spark, path, q, k=5, n_probe=4).collect()
    want = ivf_topk(e, q, k=5, n_probe=4, n_cells=16, n_iters=2, assign="join").collect()
    assert _key(got) == _key(want)
    assert got  # non-vacuous


def test_probe_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    path = str(tmp_path / "ivf2")
    build_ivf_index(e, path, n_cells=16, n_iters=2)
    df = ivf_topk_indexed(spark, path, q, k=5, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The assignments scan must carry a dynamic pruning expression on the
    # cell partition column — only probed cells' files are read.
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_index_layout_is_cell_partitioned(spark, sf_dir, tmp_path):
    import glob
    import os

    e = T(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf3")
    build_ivf_index(e, path, n_cells=8, n_iters=1)
    cells = sorted(glob.glob(os.path.join(path, "assignments", "cell=*")))
    assert 1 <= len(cells) <= 8
    # Every corpus vector is assigned exactly once.
    n = spark.read.parquet(f"{path}/assignments").count()
    assert n == e.count()


def test_upsert_is_batch_proportional_and_searchable(spark, sf_dir, tmp_path):
    import glob
    import os

    e = T(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") >= 100)
    batch = e.filter(F.col("vec_id") < 100).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    path = str(tmp_path / "ivf4")
    build_ivf_index(base, path, n_cells=8, n_iters=1)
    before = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(os.path.join(path, "assignments", "cell=*", "*.parquet"))
    }

    from sheetreader_duckdb_spark.operators.similarity import ivf_index_upsert

    cells = ivf_index_upsert(spark, path, batch)
    assert cells.count() == batch.count()
    # Existing assignment files untouched byte-for-byte (append-only).
    for f, mtime in before.items():
        assert os.stat(f).st_mtime_ns == mtime, f"rewrote {f}"
    total = spark.read.parquet(f"{path}/assignments").count()
    assert total == base.count() + batch.count()
    # The upserted vectors are immediately searchable.
    q = e.filter(F.col("vec_id") < 3)
    got = ivf_topk_indexed(spark, path, q, k=5, n_probe=8)
    assert got.filter(F.col("cid") >= 1_000_000).count() > 0


def test_upsert_assignment_matches_build_assignment(spark, sf_dir, tmp_path):
    """Upsert assigns with the carrier form over the STORED centroids —
    a re-upserted copy of an indexed vector (same embedding, new id) must
    land in exactly the cell the build assigned the original, for every
    vector. Pins the stored-parquet → collected-carrier path bit for bit
    (norms recompute from cvec with _centroid_table's arithmetic; doubles
    roundtrip parquet exactly)."""
    from sheetreader_duckdb_spark.operators.similarity import ivf_index_upsert

    e = T(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf5")
    build_ivf_index(e, path, n_cells=16, n_iters=2)
    built = {
        r["vec_id"]: r["cell"]
        for r in spark.read.parquet(f"{path}/assignments")
        .select("vec_id", "cell")
        .collect()
    }
    clones = e.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    got = {
        r["vec_id"] - 1_000_000: r["cell"]
        for r in ivf_index_upsert(spark, path, clones).collect()
    }
    assert got == built
