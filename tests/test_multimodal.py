"""Multimodal plumbing (SURVEY.md §2.3 N5): content addressing, feature
extraction, resize and frame-sampling — the mapInPandas batch contract is
real; codecs are stubbed ('fake' deterministic / 'error' NotImplemented)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from sheetreader_duckdb_spark.operators import multimodal as M
from sheetreader_duckdb_spark.tables import T


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    d = T(spark, sf_dir, "documents").limit(50)
    return M.attach_media_metadata(d, "doc_id", "text")


def test_features_partitioning_invariant(media):
    def key(r):
        return (r["media_id"], r["sha256"], tuple(r["feature"]))

    one = {key(r) for r in M.extract_features(media.coalesce(1), dim=4).collect()}
    many = {key(r) for r in M.extract_features(media.repartition(7), dim=4).collect()}
    assert one == many and len(one) == 50


def test_resize_deterministic_and_shaped(media):
    out = M.resize_images(media, width=32, height=16)
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["width"] == 32 and r["height"] == 16 for r in rows)
    again = M.resize_images(media.repartition(5), width=32, height=16).collect()
    assert {tuple(r) for r in rows} == {tuple(r) for r in again}


def test_sample_frames_cardinality(media):
    out = M.sample_frames(media, n_frames=3)
    assert out.count() == 150
    per = out.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r["n"] == 3 for r in per)
    # frame digests differ per index but are stable across runs
    idx0 = {r["frame_sha256"] for r in out.filter(F.col("frame_idx") == 0).collect()}
    idx1 = {r["frame_sha256"] for r in out.filter(F.col("frame_idx") == 1).collect()}
    assert idx0.isdisjoint(idx1)


@pytest.mark.parametrize("fn", [M.extract_features, M.resize_images, M.sample_frames])
def test_error_stub_raises(media, fn):
    with pytest.raises(PythonException, match="NotImplementedError"):
        fn(media.limit(2), decode_stub="error").collect()
