"""Streaming corpus builder (streaming/corpus.py): incremental dedup
against the accepted corpus, idempotent batch-addressed commits, restart
safety via checkpointed batch ids."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sheetreader_duckdb_spark.streaming.corpus import (
    accept_batch,
    read_corpus,
    run_corpus_builder,
)

SCHEMA = "doc_id long, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_accept_batch_dedups_within_and_across(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    b0 = _docs(spark, [(1, "alpha"), (2, "beta"), (3, "alpha")])  # 3 dups 1
    assert accept_batch(b0, 0, corpus, "doc_id", "text") == 2
    # Batch 1: one novel doc, one exact dup of the accepted corpus.
    b1 = _docs(spark, [(10, "beta"), (11, "gamma")])
    assert accept_batch(b1, 1, corpus, "doc_id", "text") == 1
    got = sorted(
        (r["doc_id"], r["text"]) for r in read_corpus(spark, corpus).collect()
    )
    assert got == [(1, "alpha"), (2, "beta"), (11, "gamma")]


def test_redelivered_batch_is_idempotent(spark, tmp_path):
    corpus = str(tmp_path / "corpus2")
    accept_batch(_docs(spark, [(1, "a"), (2, "b")]), 0, corpus, "doc_id", "text")
    b1 = _docs(spark, [(3, "c"), (4, "a")])
    n_first = accept_batch(b1, 1, corpus, "doc_id", "text")
    # Redelivery of the SAME batch id (checkpoint replay after a crash
    # between the docs and digests writes): the batch's own digests are
    # invisible to its dedup, so the accept-set recomputes identically and
    # overwrites its own directories — no duplicates, no loss.
    n_retry = accept_batch(b1, 1, corpus, "doc_id", "text")
    assert n_first == n_retry == 1
    got = sorted(r["doc_id"] for r in read_corpus(spark, corpus).collect())
    assert got == [1, 2, 3]


def test_streaming_end_to_end_with_restart(spark, tmp_path):
    inp = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus3")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inp)
    _docs(spark, [(1, "alpha"), (2, "beta")]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run_corpus_builder(
        spark, inp, corpus, ckpt, id_col="doc_id", text_col="text", schema=SCHEMA
    )
    assert read_corpus(spark, corpus).count() == 2
    # New files arrive (one dup, one novel); a RESTARTED query must drain
    # only the new files (checkpoint) and keep dedup guarantees.
    _docs(spark, [(3, "alpha"), (4, "delta")]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run_corpus_builder(
        spark, inp, corpus, ckpt, id_col="doc_id", text_col="text", schema=SCHEMA
    )
    got = sorted(
        (r["doc_id"], r["text"]) for r in read_corpus(spark, corpus).collect()
    )
    assert got == [(1, "alpha"), (2, "beta"), (4, "delta")]
