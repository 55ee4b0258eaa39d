"""Incremental dedup against an accepted corpus (operators/dedup.py
incremental_exact_dedup / incremental_neardup_drop): exact copies and
near-duplicates of corpus docs are dropped from a new batch, novel docs
survive; the corpus side contributes only precomputed digest/band/shingle
tables; DuckDB parity for the exact stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle import diff, duckdb_connection
from sheetreader_duckdb_spark.operators import dedup as D
from sheetreader_duckdb_spark.operators import sampling as SM
from sheetreader_duckdb_spark.tables import T


def _corpus_and_batch(spark, sf_dir):
    """Accepted corpus = hash-split 'train' docs; new batch = 'test' docs
    plus exact copies of 5 corpus docs (re-crawled pages)."""
    d = T(spark, sf_dir, "documents").withColumn(
        "split", SM.hash_split("doc_id", [("train", 0.8), ("test", 0.2)], seed="inc")
    )
    corpus = d.filter(F.col("split") == "train").select("doc_id", "text")
    dupes = (
        corpus.orderBy("doc_id")
        .limit(5)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    batch = d.filter(F.col("split") == "test").select("doc_id", "text").unionAll(dupes)
    return corpus, batch


def test_incremental_exact_dedup(spark, sf_dir):
    corpus, batch = _corpus_and_batch(spark, sf_dir)
    digests = D.exact_dedup_groups(corpus, "doc_id", "text").select("h")
    kept = D.incremental_exact_dedup(batch, "doc_id", "text", digests)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert not any(i >= 1_000_000 for i in ids)  # re-crawled copies dropped
    # every novel (test-split) doc with unique content survives
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    novel = {i for i in batch_ids if i < 1_000_000}
    assert ids == novel  # synthetic corpus: test docs are unique + novel


def test_incremental_exact_matches_oracle(spark, sf_dir):
    con = duckdb_connection(sf_dir)
    corpus, batch = _corpus_and_batch(spark, sf_dir)
    digests = D.exact_dedup_groups(corpus, "doc_id", "text").select("h")
    kept = D.incremental_exact_dedup(batch, "doc_id", "text", digests).select("doc_id")
    case = SM.split_case_sql("doc_id", [("train", 0.8), ("test", 0.2)], seed="inc")
    sql = f"""
    WITH tagged AS (SELECT doc_id, text, {case} AS split FROM documents),
    corpus AS (SELECT doc_id, text FROM tagged WHERE split = 'train'),
    dupes AS (SELECT doc_id + 1000000 AS doc_id, text FROM
              (SELECT doc_id, text FROM corpus ORDER BY doc_id LIMIT 5)),
    batch AS (SELECT doc_id, text FROM tagged WHERE split = 'test'
              UNION ALL SELECT * FROM dupes),
    existing AS (SELECT DISTINCT md5(text) AS h FROM corpus),
    novel AS (SELECT * FROM batch WHERE md5(text) NOT IN (SELECT h FROM existing)),
    keep AS (SELECT MIN(doc_id) AS doc_id FROM novel GROUP BY md5(text))
    SELECT doc_id FROM keep
    """
    assert diff(kept, con, sql) == []


def test_incremental_neardup_drop(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again today"),
            (2, "completely different corpus content about weather patterns in spring"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            # near-dup of corpus doc 1 (re-crawl with one appended word:
            # Jaccard ≈ 0.92, inside the 8-hash/4-band detection range)
            (10, "the quick brown fox jumps over the lazy dog again and again today thanks"),
            # novel
            (11, "unrelated text with entirely fresh vocabulary and no overlap at all"),
        ],
        "doc_id long, text string",
    )
    sh = D.word_shingles(corpus, "doc_id", "text", k=3)
    sigs = D.minhash_signatures_md5(sh, "doc_id", n_hashes=8)
    bands = D.lsh_bands(sigs, "doc_id", n_hashes=8, band_size=2)
    dropped = D.incremental_neardup_drop(
        batch, "doc_id", "text", existing_bands=bands, existing_shingles=sh, threshold=0.5
    )
    ids = {r["doc_id"] for r in dropped.collect()}
    assert 10 in ids
    assert 11 not in ids
