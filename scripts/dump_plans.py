#!/usr/bin/env python3
"""Dump .explain('formatted') for named bench entries into a directory.

Usage: python scripts/dump_plans.py --out plans/r15 --suffix after \
           [--entries n10_token_stats,...] [--sf /root/testdata/sf0.1]

Runs from whichever tree it lives in (works inside a git worktree for
"before" dumps of an archived commit).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_ENTRIES = [
    "n10_token_stats",
    "n01_dedup_exact_pipeline",
    "n01_cur_kept",
    "n02_dedup_minhash_lsh",
    "n05_ann_bruteforce_topk",
    "n06b_embedding_neardup_srp",
    "curate_corpus",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True, choices=["before", "after"])
    ap.add_argument("--entries", default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    entries = (
        [e for e in args.entries.split(",") if e]
        if args.entries
        else DEFAULT_ENTRIES
    )
    os.makedirs(args.out, exist_ok=True)

    from pyspark.sql import SparkSession
    from sheetreader_duckdb_spark.session import configure_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dump-plans")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    configure_session(spark)

    from pyspark.sql import functions as F
    from sheetreader_duckdb_spark.plans import all_queries
    from sheetreader_duckdb_spark.session import release_deferred

    corpus = all_queries()
    try:  # bench-granularity branch overrides (mirror bench.py)
        from sheetreader_duckdb_spark.plans.northstar import (
            n01_cur_kept_branch,
            n01_dedup_core,
        )

        class _B:
            def __init__(self, fn):
                self.fn = fn

        corpus["n01_dedup_exact_pipeline"] = _B(n01_dedup_core)
        corpus["n01_cur_kept"] = _B(n01_cur_kept_branch)
    except Exception as e:  # noqa: BLE001
        print(f"branch override unavailable: {e}", file=sys.stderr)

    def _curated():
        from sheetreader_duckdb_spark.operators.sampling import hash_split
        from sheetreader_duckdb_spark.pipeline import curate_corpus
        from sheetreader_duckdb_spark.plans.relational import T

        emb = T(spark, args.sf, "embeddings")
        d = (
            T(spark, args.sf, "documents")
            .withColumn(
                "url",
                F.concat(F.lit("https://www."), F.col("source"),
                         F.lit(".com/d/"), F.col("doc_id").cast("string")),
            )
            .withColumn(
                "split",
                hash_split("doc_id", [("corpus", 0.9), ("eval", 0.1)],
                           seed="bench"),
            )
        )
        cs = d.filter(F.col("split") == "corpus").drop("split")
        ev = d.filter(F.col("split") == "eval").select("doc_id", "text")
        cur, _ = curate_corpus(
            cs, eval_df=ev, url_col="url", domain_cap=50, line_dedup=True,
            dupspan=True, pii=True, embeddings_df=emb, budget_tokens=50_000,
            seed="bench", collect_report=False)
        return cur

    for name in entries:
        try:
            if name == "curate_corpus":
                df = _curated()
            else:
                df = corpus[name].fn(spark, args.sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR: {type(e).__name__}: {e}"
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        release_deferred()
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
