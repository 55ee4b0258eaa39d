"""Document chunking (operators/text.py chunk_documents): window plan,
coverage, carry-through columns, plan shape, and DuckDB parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators.text import chunk_documents
from sheetreader_duckdb_spark.tables import T
from tests.oracle import diff, duckdb_connection

import pytest


def test_chunk_window_plan(spark):
    rows = [
        (1, "x" * 100),   # <= size: one chunk
        (2, "y" * 500),   # == size: one chunk
        (3, "z" * 501),   # one char over: second window catches the tail
        (4, "w" * 900),   # 0..500, 400..900 — two windows
        (5, "v" * 901),   # three windows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_ord"]): (r["chunk_start"], r["n_chunk_chars"])
        for r in chunk_documents(df, "doc_id", "text", size=500, stride=400).collect()
    }
    assert got == {
        (1, 0): (0, 100),
        (2, 0): (0, 500),
        (3, 0): (0, 500), (3, 1): (400, 101),
        (4, 0): (0, 500), (4, 1): (400, 500),
        (5, 0): (0, 500), (5, 1): (400, 500), (5, 2): (800, 101),
    }


def test_chunks_reassemble_document(spark):
    """Dropping each chunk's overlap prefix (except the first) and
    concatenating in ordinal order must reproduce the document exactly."""
    import string

    text = "".join(string.ascii_letters[i % 52] for i in range(1337))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = chunk_documents(df, "doc_id", "text", size=500, stride=400).orderBy(
        "chunk_ord"
    )
    parts = [
        r["chunk_text"] if r["chunk_ord"] == 0 else r["chunk_text"][100:]
        for r in chunks.collect()
    ]
    assert "".join(parts) == text


def test_chunk_carries_metadata_and_drops_payload(spark):
    df = spark.createDataFrame(
        [(1, "src0", "en", "a" * 600)], "doc_id long, source string, lang string, text string"
    )
    out = chunk_documents(df, "doc_id", "text", size=500, stride=400)
    assert out.columns == [
        "doc_id", "source", "lang",
        "chunk_ord", "chunk_start", "chunk_text", "n_chunk_chars",
    ]
    assert out.count() == 2
    assert {r["source"] for r in out.collect()} == {"src0"}


def test_chunk_zero_shuffle(spark, sf_dir):
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    plan = (
        chunk_documents(d, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_chunk_rejects_bad_stride(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", size=500, stride=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", size=500, stride=501)


def test_chunk_property_reassembly(spark):
    """Property: for arbitrary (doc length, size, stride), the chunk count
    matches the closed form, every chunk starts at ord*stride, and
    stripping each non-first chunk's overlap prefix reassembles the doc."""
    import math

    from hypothesis import given, settings, strategies as st

    cases = []

    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=3000),
        size=st.integers(min_value=2, max_value=600),
        stride_frac=st.floats(min_value=0.05, max_value=1.0),
    )
    def collect(n, size, stride_frac):
        stride = max(1, min(size, int(size * stride_frac)))
        cases.append((n, size, stride))

    collect()
    # One Spark job per distinct (size, stride) covering all its sampled
    # docs (a Spark job per hypothesis example would be minutes of
    # overhead); doc_id encodes the case index.
    from collections import defaultdict

    texts = {
        i: "".join(chr(97 + (j % 26)) for j in range(n))
        for i, (n, _size, _stride) in enumerate(cases)
    }
    by_case = {}
    groups = defaultdict(list)
    for i, (n, size, stride) in enumerate(cases):
        groups[(size, stride)].append((i, texts[i]))
    for (size, stride), docs in groups.items():
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = chunk_documents(df, "doc_id", "text", size=size, stride=stride)
        for r in out.collect():
            by_case.setdefault(r["doc_id"], []).append(r)
    for i, (n, size, stride) in enumerate(cases):
        overlap = size - stride
        expect_chunks = max(1, math.ceil((n - overlap) / stride))
        chunks = sorted(by_case[i], key=lambda r: r["chunk_ord"])
        assert len(chunks) == expect_chunks, (n, size, stride)
        assert [c["chunk_start"] for c in chunks] == [
            k * stride for k in range(expect_chunks)
        ]
        text = texts[i]
        parts = [
            c["chunk_text"] if c["chunk_ord"] == 0 else c["chunk_text"][overlap:]
            for c in chunks
        ]
        assert "".join(parts) == text, (n, size, stride)


def test_chunk_matches_oracle(spark, sf_dir):
    con = duckdb_connection(sf_dir)
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    sdf = chunk_documents(d, "doc_id", "text", size=500, stride=400).select(
        "doc_id", "chunk_ord", "chunk_start", "chunk_text", "n_chunk_chars"
    )
    sql = """
    SELECT doc_id, CAST(ord AS INT) AS chunk_ord,
           CAST(ord * 400 AS INT) AS chunk_start,
           substring(text, ord * 400 + 1, 500) AS chunk_text,
           CAST(len(substring(text, ord * 400 + 1, 500)) AS INT) AS n_chunk_chars
    FROM (
        SELECT doc_id, text, unnest(range(
                   GREATEST(1, CAST(CEIL((length(text) - 100) / 400.0) AS BIGINT))
               )) AS ord
        FROM documents
    )
    """
    assert diff(sdf, con, sql) == []
