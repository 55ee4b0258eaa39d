"""fsutil text helpers: publish-by-rename write + whole-file read on both
the local-path fast path and the Hadoop FileSystem (scheme'd URI) path —
the latter is what the corpus-compaction journal uses off local disk."""

from __future__ import annotations

from sheetreader_duckdb_spark.operators import fsutil


def test_text_roundtrip_local(spark, tmp_path):
    p = str(tmp_path / "marker.json")
    assert fsutil.read_text(spark, p) is None
    fsutil.write_text(spark, p, '{"a": 1}')
    assert fsutil.read_text(spark, p) == '{"a": 1}'
    # Overwrite republishes atomically; no .writing scratch left behind.
    fsutil.write_text(spark, p, "v2 é")
    assert fsutil.read_text(spark, p) == "v2 é"
    assert not fsutil.exists(spark, p + ".writing")


def test_text_roundtrip_hadoop_uri(spark, tmp_path):
    p = "file:" + str(tmp_path / "marker.json")
    assert fsutil.read_text(spark, p) is None
    payload = '{"merged": [0, 1], "target": 1}' + "x" * 5000  # >1 JVM buffer
    fsutil.write_text(spark, p, payload)
    assert fsutil.read_text(spark, p) == payload
    assert not fsutil.exists(spark, p + ".writing")


def test_parquet_row_count_metachar_dir(spark, tmp_path):
    """r13: an sf_dir with glob metacharacters ('runs[2024]') must not
    make the footer-based count silently miss every file — the count
    feeds plan-build sizing and must always equal count(*)."""
    from sheetreader_duckdb_spark.tables import parquet_row_count

    d = tmp_path / "runs[2024]"
    (d / "t.parquet").mkdir(parents=True)
    spark.range(137).write.mode("overwrite").parquet(str(d / "t.parquet"))
    assert parquet_row_count(str(d), "t") == 137
