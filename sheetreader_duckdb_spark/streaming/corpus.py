"""Streaming corpus builder: file-arrival document stream → incremental
exact dedup against the accepted corpus → idempotent append.

The production loop every training corpus runs continuously: crawl batches
arrive as files; each batch is deduplicated against everything accepted so
far WITHOUT rereading the corpus (the accepted side contributes only its
stored digest table, operators/dedup.py incremental_exact_dedup), and the
survivors append. Composes the existing operators under Structured
Streaming's ``foreachBatch``.

Layout under ``corpus_path``::

    docs/batch=<id>/      accepted documents of micro-batch <id>
    digests/batch=<id>/   their content digests (h)

Exactly-once without a transaction log — the batch id IS the commit token:

* Both writes go to batch-addressed directories in ``overwrite`` mode, so
  a redelivered micro-batch (failure after partial write, checkpoint
  replay) overwrites its own directories instead of appending twice.
* The dedup anti-join reads digests of batches ``< batch_id`` ONLY. On
  redelivery the batch's own (possibly partially committed) digests are
  therefore invisible to its dedup, and the recomputed accept-set is
  byte-identical — idempotence holds even when the previous attempt died
  between the two writes.
* Batch-id partition directories also give readers partition pruning and
  make per-batch provenance a directory listing.

At 100 TB: per-batch work is batch-proportional (the corpus side is its
digest column, ~16 bytes/doc); the docs write is append-shaped (new
directories only); compaction of many small batch directories is an
offline rewrite, deliberately out of band like any LSM-ish layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators.dedup import content_digest

__all__ = ["accept_batch", "run_corpus_builder", "read_corpus"]


def read_corpus(spark: SparkSession, corpus_path: str) -> DataFrame:
    """All accepted documents (batch provenance in the ``batch`` column)."""
    return spark.read.option("basePath", f"{corpus_path}/docs").parquet(
        f"{corpus_path}/docs/batch=*"
    )


def _prior_digests(spark: SparkSession, corpus_path: str, batch_id: int) -> DataFrame:
    # Directory listing through the Hadoop FS API (operators/fsutil), so the
    # builder dedups correctly on the object storage a real corpus lives on;
    # a driver-local glob would silently return [] there and disable dedup.
    from sheetreader_duckdb_spark.operators import fsutil

    dirs = fsutil.glob_dirs(spark, f"{corpus_path}/digests/batch=*")
    if not dirs:
        return spark.createDataFrame([], "h string")
    # Explicit schema: a batch directory left data-less by a crash between
    # the docs and digests writes must not break schema inference on the
    # redelivery that would repair it.
    return (
        spark.read.schema("h string")
        .option("basePath", f"{corpus_path}/digests")
        .parquet(f"{corpus_path}/digests/batch=*")
        .withColumn(
            "batch",
            F.regexp_extract(F.input_file_name(), r"batch=(\d+)", 1).cast("long"),
        )
        .filter(F.col("batch") < batch_id)
        .select("h")
    )


def accept_batch(
    batch: DataFrame, batch_id: int, corpus_path: str, id_col: str, text_col: str
) -> int:
    """Dedup one micro-batch against the accepted corpus and commit it under
    its batch id. Returns the number of accepted rows. Idempotent per
    (batch content, batch_id) — see the module docstring."""
    spark = batch.sparkSession
    prior = _prior_digests(spark, corpus_path, batch_id)
    # distinct() first: a redelivered source commonly carries byte-identical
    # duplicate ROWS, which a keep-min-id-per-digest semi join would pass
    # through twice. (Rows sharing an id+digest but differing elsewhere are
    # a caller-contract violation, as in incremental_exact_dedup.)
    withd = batch.distinct().withColumn("__h", content_digest(text_col))
    novel = withd.join(prior.select(F.col("h").alias("__h")), "__h", "left_anti")
    # Exact dedup WITHIN the batch (min id per digest), like
    # incremental_exact_dedup — inlined so the digest column is computed
    # once and reused for the digest-store write. accepted derives from
    # novel (already anti-joined against prior — no second prior join).
    keep = novel.groupBy("__h").agg(F.min(id_col).alias(id_col))
    accepted = novel.join(keep.select(id_col), id_col, "left_semi")
    accepted = accepted.localCheckpoint()  # one computation for both writes
    n = accepted.count()
    (
        accepted.drop("__h")
        .write.mode("overwrite")
        .parquet(f"{corpus_path}/docs/batch={batch_id}")
    )
    (
        accepted.select(F.col("__h").alias("h"))
        .write.mode("overwrite")
        .parquet(f"{corpus_path}/digests/batch={batch_id}")
    )
    return n


def run_corpus_builder(
    spark: SparkSession,
    input_path: str,
    corpus_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    schema: str = "doc_id long, text string, lang string, source string, n_chars long",
    available_now: bool = True,
):
    """Run the streaming builder over a directory of arriving parquet files.

    ``available_now=True`` drains everything currently present and stops —
    the testable/batch-drain mode; ``False`` runs continuously. The
    checkpoint makes batch ids stable across restarts, which is what the
    idempotent commit keys on.
    """
    stream = spark.readStream.schema(schema).parquet(input_path)

    def sink(df: DataFrame, batch_id: int) -> None:
        accept_batch(df, batch_id, corpus_path, id_col, text_col)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
