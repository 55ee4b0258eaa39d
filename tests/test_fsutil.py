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
