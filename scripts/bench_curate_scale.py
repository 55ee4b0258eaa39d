#!/usr/bin/env python3
"""curate_corpus scale marginal: same composed pipeline at sf0.1 and sf1.

VERDICT r5 #5 asked for the end-to-end curation bench "at sf0.1 + an sf1
scale marginal". bench.py carries the sf0.1 headline entry; this script
measures the 10x point so the marginal (t_sf1 / t_sf0.1 vs the 10x data
ratio) is a recorded number instead of an inference. The sf1 corpus is
built by scripts/make_scaled_sf.py key-offset replication (documents:
one third of replica>0 docs are verbatim cross-replica duplicates, so
the dedup stages do 10x the real work, not 10x of a no-op).

Identical workload to bench.py's curate_corpus entry (production
settings: xxhash MinHash 128x8, every hygiene stage on, 10% eval split
decontamination), identical methodology (untimed warmup, min of N timed
passes, noop sink). Prints ONE JSON line; numbers land in BENCHNOTES.md.

Usage:
    python scripts/make_scaled_sf.py --src /root/testdata/sf0.1 \
        --out /tmp/sheetreader_sf1/sf1 --scale 10   # once
    python scripts/bench_curate_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SMALL = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG = os.environ.get("CURATE_SF1_DIR", "/tmp/sheetreader_sf1/sf1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PASSES = int(os.environ.get("CURATE_BENCH_PASSES", "2"))


def curated(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from sheetreader_duckdb_spark.operators.sampling import hash_split
    from sheetreader_duckdb_spark.pipeline import curate_corpus

    d = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumn(
            "url",
            F.concat(
                F.lit("https://www."),
                F.col("source"),
                F.lit(".com/d/"),
                F.col("doc_id").cast("string"),
            ),
        )
        .withColumn(
            "split",
            hash_split("doc_id", [("corpus", 0.9), ("eval", 0.1)], seed="bench"),
        )
    )
    corpus_side = d.filter(F.col("split") == "corpus").drop("split")
    eval_side = d.filter(F.col("split") == "eval").select("doc_id", "text")
    # SemDeDup on (r8): the embeddings table rides along at both scales
    # (make_scaled_sf.py replicates it with per-replica perturbation), on
    # the 'auto' scoring path — the same workload bench.py now times.
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    cur, _ = curate_corpus(
        corpus_side,
        eval_df=eval_side,
        url_col="url",
        domain_cap=50,
        line_dedup=True,
        dupspan=True,
        pii=True,
        embeddings_df=emb,
        budget_tokens=50_000,
        seed="bench",
        collect_report=False,
    )
    return cur


def measure(spark, sf_dir: str) -> dict:
    from sheetreader_duckdb_spark.session import release_deferred

    curated(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warmup
    release_deferred()
    totals = []
    for _ in range(PASSES):
        t0 = time.perf_counter()
        curated(spark, sf_dir).write.mode("overwrite").format("noop").save()
        totals.append(time.perf_counter() - t0)
        release_deferred()
    n_in = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    n_out = curated(spark, sf_dir).count()
    release_deferred()
    return {"total": round(min(totals), 3), "rows_in": n_in, "rows_out": n_out}


def main() -> int:
    if not os.path.isdir(BIG):
        print(
            json.dumps({"error": f"{BIG} missing - run make_scaled_sf.py first"})
        )
        return 1
    from sheetreader_duckdb_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", CPUS)
    spark = get_spark("bench-curate-scale")
    small = measure(spark, SMALL)
    big = measure(spark, BIG)
    marginal = round(big["total"] / small["total"], 2) if small["total"] else None
    print(
        json.dumps(
            {
                "metric": "curate_corpus_scale_marginal",
                "unit": "sec",
                "sf0.1": small,
                "sf1": big,
                "data_ratio": round(big["rows_in"] / max(1, small["rows_in"]), 2),
                "time_ratio": marginal,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
