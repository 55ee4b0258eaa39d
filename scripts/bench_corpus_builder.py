#!/usr/bin/env python3
"""Throughput witness for the streaming corpus builder (VERDICT r4 #5).

Replays $SPARK_GRAFT_SF_DIR (default sf0.1) documents as N_BATCHES
micro-batches through ``accept_batch(near_dup=True)`` — the full
dedup-on-arrival path (exact digests + MinHash/LSH vs the stored
band/shingle residue tables) — and measures the state-growth curve the
LSM layout implies: per-batch wall time grows with the number of live
batch directories until compaction folds them.

Two runs over the same batch split:

* ``no_compact``  — per-batch times across the whole replay (the curve).
* ``compact_10``  — identical, but ``compact_corpus_state`` runs inline
  after batch 10; the before/after step in per-batch time is the benefit.

Prints ONE JSON line; numbers land in BENCHNOTES.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_BATCHES = int(os.environ.get("CORPUS_BENCH_BATCHES", "20"))
WORK = os.environ.get("CORPUS_BENCH_DIR", "/tmp/sheetreader_bench_corpus")


def replay(spark, docs, n_rows: int, corpus: str, compact_every: int | None):
    from sheetreader_duckdb_spark.streaming.corpus import (
        accept_batch,
        compact_corpus_state,
    )

    shutil.rmtree(corpus, ignore_errors=True)
    per = max(1, n_rows // N_BATCHES)
    times, accepted = [], 0
    compact_s = None
    for b in range(N_BATCHES):
        lo, hi = b * per, (b + 1) * per if b < N_BATCHES - 1 else n_rows
        batch = docs.filter((docs.__rn >= lo) & (docs.__rn < hi)).select(
            "doc_id", "text"
        )
        t0 = time.perf_counter()
        accepted += accept_batch(batch, b, corpus, "doc_id", "text", near_dup=True)
        times.append(round(time.perf_counter() - t0, 3))
        if compact_every and (b + 1) % compact_every == 0:
            t0 = time.perf_counter()
            compact_corpus_state(spark, corpus)
            compact_s = round(time.perf_counter() - t0, 3)
    return {
        "accepted": accepted,
        "total_s": round(sum(times), 3),
        "rows_per_s": round(accepted / sum(times), 1),
        "per_batch_s": times,
        "compact_s": compact_s,
    }


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from sheetreader_duckdb_spark.session import configure_session

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("corpus-builder-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    configure_session(spark)

    # Stable replay order: a row number over doc_id (persisted so every
    # batch filter reuses the same assignment without re-sorting).
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .withColumn("__rn", F.row_number().over(Window.orderBy("doc_id")) - 1)
        .persist()
    )
    n_rows = docs.count()

    out = {
        "metric": "corpus_builder_neardup_replay",
        "sf_dir": SF_DIR,
        "n_rows": n_rows,
        "n_batches": N_BATCHES,
        "no_compact": replay(spark, docs, n_rows, f"{WORK}/nc", None),
        "compact_10": replay(spark, docs, n_rows, f"{WORK}/c10", 10),
    }
    docs.unpersist()
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
