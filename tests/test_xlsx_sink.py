"""Distributed XLSX sink (df.write.format("sheetreader")): one workbook per
non-empty partition through the fixture writer module, exact read-back via
the sheetreader source, overwrite semantics, row-capped file splitting, and
type validation."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.tables import T


@pytest.fixture(autouse=True)
def _register(spark):
    from sheetreader_duckdb_spark import register

    register(spark)


def test_sink_roundtrip_documents(spark, sf_dir, tmp_path):
    d = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    out = str(tmp_path / "sink")
    d.repartition(4).write.format("sheetreader").mode("overwrite").save(out)
    parts = sorted(glob.glob(os.path.join(out, "*.xlsx")))
    assert len(parts) == 4
    back = spark.read.format("sheetreader").load(os.path.join(out, "*.xlsx"))
    # XLSX numerics are DOUBLE (SURVEY §1.3); values must be exact.
    got = {(int(r[0]), r[1], int(r[2])) for r in back.collect()}
    want = {tuple(r) for r in d.collect()}
    assert got == want


def test_sink_overwrite_replaces_previous_files(spark, sf_dir, tmp_path):
    d = T(spark, sf_dir, "documents").select("doc_id", "source")
    out = str(tmp_path / "ow")
    d.repartition(4).write.format("sheetreader").mode("overwrite").save(out)
    assert len(glob.glob(os.path.join(out, "*.xlsx"))) == 4
    d.limit(7).repartition(1).write.format("sheetreader").mode("overwrite").save(out)
    assert len(glob.glob(os.path.join(out, "*.xlsx"))) == 1
    assert (
        spark.read.format("sheetreader").load(os.path.join(out, "*.xlsx")).count() == 7
    )


def test_sink_row_cap_splits_files(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(250)], "id long, v string"
    ).coalesce(1)
    out = str(tmp_path / "cap")
    (
        df.write.format("sheetreader")
        .option("max_rows_per_file", "100")
        .mode("overwrite")
        .save(out)
    )
    parts = sorted(glob.glob(os.path.join(out, "*.xlsx")))
    assert len(parts) == 3  # 100 + 100 + 50
    back = spark.read.format("sheetreader").load(os.path.join(out, "*.xlsx"))
    assert {int(r["id"]) for r in back.collect()} == set(range(250))


def test_sink_date_roundtrip_both_systems(spark, tmp_path):
    rows = [
        (1, dt.date(1969, 7, 20)),
        (2, dt.date(1900, 2, 28)),
        (3, dt.date(2024, 2, 29)),
    ]
    df = spark.createDataFrame(rows, "id long, d date").coalesce(1)
    for opts in ({}, {"date1904": "true"}):
        out = str(tmp_path / ("d1904" if opts else "d1900"))
        w = df.write.format("sheetreader").mode("overwrite")
        for k, v in opts.items():
            w = w.option(k, v)
        w.save(out)
        back = spark.read.format("sheetreader").load(os.path.join(out, "*.xlsx"))
        got = {(int(r["id"]), r["d"]) for r in back.collect()}
        assert got == set(rows), opts


def test_sink_rejects_unsupported_type(spark, tmp_path):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, vec array<double>")
    with pytest.raises(Exception, match="unsupported type"):
        df.write.format("sheetreader").mode("overwrite").save(str(tmp_path / "bad"))


def test_sink_empty_partitions_write_no_files(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id long, v string").repartition(8)
    out = str(tmp_path / "empty")
    df.write.format("sheetreader").mode("overwrite").save(out)
    parts = glob.glob(os.path.join(out, "*.xlsx"))
    assert len(parts) == 1  # only the partition that held the row
    assert (
        spark.read.format("sheetreader").load(os.path.join(out, "*.xlsx")).count() == 1
    )
