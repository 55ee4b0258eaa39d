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


def test_sink_roundtrip_via_directory_path(spark, sf_dir, tmp_path):
    """load(dir) is the symmetric inverse of save(dir): a directory path
    reads every workbook in it, same as the streaming source's directory
    semantics — no *.xlsx glob required."""
    d = T(spark, sf_dir, "documents").select("doc_id", "n_chars").limit(20)
    out = str(tmp_path / "dirload")
    d.repartition(3).write.format("sheetreader").mode("overwrite").save(out)
    back = spark.read.format("sheetreader").load(out)
    got = {(int(r[0]), int(r[1])) for r in back.collect()}
    assert got == {tuple(r) for r in d.collect()}


def test_empty_directory_read_raises(spark, tmp_path):
    empty = tmp_path / "nothing"
    empty.mkdir()
    with pytest.raises(Exception, match="No files found"):
        spark.read.format("sheetreader").load(str(empty)).schema


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


def test_incremental_writer_memory_bounded(tmp_path):
    """The sink's writer must not hold the file's rows in memory: 200k rows
    of numerics + a low-cardinality string spool to disk, so peak Python
    allocation during the write stays tens-of-KB-per-row-scale (< 16 MB)
    while the produced sheet XML is far larger."""
    import tracemalloc
    import zipfile

    from sheetreader_duckdb_spark.sources.xlsx.writer import IncrementalXlsxWriter

    path = str(tmp_path / "big.xlsx")
    tracemalloc.start()
    w = IncrementalXlsxWriter(path)
    w.write_row(["id", "a", "b", "src"])
    for i in range(200_000):
        w.write_row([float(i), i * 0.5, i % 7 == 0, f"src{i % 5}"])
    w.close()
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 16 * 1024 * 1024, f"peak writer memory {peak / 1e6:.1f} MB"

    with zipfile.ZipFile(path) as zf:
        xml = zf.read("xl/worksheets/sheet1.xml")
    assert xml.count(b"<row ") == 200_001
    assert len(xml) > 5 * peak  # the XML dwarfs what we ever held


def test_sink_failed_job_leaves_no_visible_files(spark, tmp_path):
    """A task failure aborts the job: staged .tmp files are swept and no
    part-*.xlsx is ever visible (ADVICE r3: abort was a no-op and a failed
    job left orphan workbooks that later loads silently included)."""
    out = str(tmp_path / "fail")
    df = spark.range(0, 100, 1, 2).selectExpr(
        "id",
        "case when id = 99 then raise_error('boom') else concat('r', id) end as s",
    )
    with pytest.raises(Exception, match="boom"):
        df.write.format("sheetreader").mode("overwrite").save(out)
    assert glob.glob(os.path.join(out, "*.xlsx")) == []
    # The job-scoped staging directory is removed wholesale on abort; a
    # straggler task cannot recreate it (created driver-side only), so no
    # staged bytes survive a failed job.
    assert [f for f in os.listdir(out) if f.startswith(".staging-")] == []


def test_sink_commit_leaves_no_staged_files(spark, tmp_path):
    out = str(tmp_path / "clean")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").coalesce(1)
    df.write.format("sheetreader").mode("overwrite").save(out)
    names = os.listdir(out)
    assert sorted(n for n in names if n.endswith(".xlsx")) == ["part-00000-000.xlsx"]
    assert [n for n in names if n.startswith((".tmp-", ".staging-")) or ".xlsxspool-" in n] == []


def test_roundtrip_null_in_probe_rows_multi_file(spark, tmp_path, _register):
    """A NULL landing in a partition file's first two data rows used to
    kill the whole directory read: xlsx has no NULL cell (absent = NULL),
    so that file's two-row probe hit the reference-parity 'Unknown cell
    type' error. Directory reads now fall back to the DECLARED schema for
    files whose own probe is insufficient (header matched by
    string-equality with the declared names) — the sink→source roundtrip
    holds wherever the NULL lands."""
    out = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", None)], "id int, name string, x double"
    ).repartition(2)
    df.write.format("sheetreader").mode("overwrite").save(out)
    assert len(glob.glob(os.path.join(out, "*.xlsx"))) == 2
    back = spark.read.format("sheetreader").load(out)
    got = sorted((r["id"], r["name"], r["x"]) for r in back.collect())
    assert got == [(1.0, "a", 2.5), (2.0, "b", None)]


def test_header_only_workbook_in_directory_reads_zero_rows(spark, tmp_path, _register):
    """A header-only workbook (e.g. hand-made, or another writer's empty
    output) inside a directory read contributes zero rows under the
    declared-schema fallback instead of failing the 'two rows' probe."""
    from sheetreader_duckdb_spark.sources.xlsx.writer import (
        IncrementalXlsxWriter,
    )

    out = tmp_path / "mixed"
    out.mkdir()
    w = IncrementalXlsxWriter(str(out / "part-full.xlsx"), "Sheet1")
    w.write_row(["id", "v"])
    w.write_row([1.0, "a"])
    w.write_row([2.0, "b"])
    w.close()
    w = IncrementalXlsxWriter(str(out / "part-headeronly.xlsx"), "Sheet1")
    w.write_row(["id", "v"])
    w.close()
    back = spark.read.format("sheetreader").load(str(out))
    assert sorted((r["id"], r["v"]) for r in back.collect()) == [
        (1.0, "a"),
        (2.0, "b"),
    ]


def test_single_file_insufficient_probe_still_errors(spark, tmp_path, _register):
    """Reference parity is untouched where no declared schema exists:
    a schema-less single-file read whose probe can't type a column still
    raises at planning (the fallback never applies — planning IS the
    probe)."""
    from sheetreader_duckdb_spark.sources.xlsx.writer import (
        IncrementalXlsxWriter,
    )

    p = str(tmp_path / "lone.xlsx")
    w = IncrementalXlsxWriter(p, "Sheet1")
    w.write_row(["id", "x"])
    w.write_row([1.0, None])
    w.close()
    with pytest.raises(Exception, match="Unknown cell type"):
        spark.read.format("sheetreader").load(p).collect()


def test_sink_parts_carry_split_index(spark, tmp_path):
    """Every big-enough workbook the distributed sink writes carries the
    split index (VERDICT r11 task 6): a downstream sharded read of
    sink-produced parts plans seek-and-inflate intervals, not
    O(shards x file) re-inflation. Small parts are legitimately
    unindexed (below one flush interval)."""
    import glob
    import zipfile

    from pyspark.sql import functions as F

    from sheetreader_duckdb_spark.sources.xlsx import splitindex as SI

    out = str(tmp_path / "indexed_parts")
    (
        spark.range(300_000)
        .select(
            F.col("id").cast("double").alias("k"),
            F.concat(F.lit("u"), F.col("id").cast("string"), F.lit("-" + "y" * 30)).alias("txt"),
        )
        .repartition(2)
        .write.format("sheetreader")
        .mode("overwrite")
        .save(out)
    )
    parts = sorted(glob.glob(out + "/*.xlsx"))
    assert len(parts) == 2
    for p in parts:
        with zipfile.ZipFile(p) as zf:
            pts = SI.decode_split_index(zf, "xl/worksheets/sheet1.xml")
            assert pts is not None and len(pts) >= 2, p
            spts = SI.decode_sst_index(zf)
            assert spts is not None, p
    # and the sharded read of the directory is exact
    back = (
        spark.read.format("sheetreader").option("threads", "4").load(out)
    )
    agg = back.agg(F.count("*"), F.bit_xor(F.xxhash64("k", "txt"))).collect()[0]
    assert agg[0] == 300_000
