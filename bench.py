#!/usr/bin/env python3
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline set covers the engine surface end-to-end:
  - xlsx_load_lineitem — sheetreader data-source scan of a 600k-row
    (at sf0.1) lineitem XLSX, the direct analog of BASELINE.md's
    "lineitem XLSX load time" rows (reference: ~13.6 s 1T / ~7.1 s 4T).
    The XLSX file itself is written once and cached in /tmp (write cost
    is prep, not measured).
  - TPC-H-style relational core (agg, join, window, top-k).
  - Training-data north stars (exact + MinHash dedup, ANN top-k,
    text quality, tumbling windows).

Each query runs against the `noop` sink so we measure plan execution,
not driver-side collect. One untimed warmup query absorbs JVM/codegen
startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "s01_xlsx_roundtrip",
    "h08_agg_tpch_q1",
    "h08b_tpch_q3",
    "h08c_tpch_q5",
    "h03_joins",
    "h12_window_functions",
    "h12c_global_ntile",
    "h13_sort_topk",
    "h22_cte_subquery",
    "h02b_ctas_sink",
    "n01_dedup_exact_pipeline",
    "n02_dedup_minhash_lsh",
    "n05_ann_bruteforce_topk",
    "n06b_embedding_neardup_srp",
    "n07_text_signals",
    "n13_tumbling_windows",
    "n17_tf_idf",
    "n19_asof_join",
]


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return -1.0


def main() -> None:
    from pyspark.sql import SparkSession

    from sheetreader_duckdb_spark.session import configure_session
    from sheetreader_duckdb_spark.plans import all_queries

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("sheetreader-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    configure_session(spark)
    corpus = all_queries()

    # Prep outside timing: warm the JVM/codegen path and materialize the
    # cached lineitem XLSX (s01's input) so its one-time write cost is not
    # attributed to the load measurement.
    from sheetreader_duckdb_spark.plans.ingestion import _xlsx_for_sf

    _xlsx_for_sf(SF_DIR)
    corpus["h01_scan_filter_project"].fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()

    # Warmup pass (untimed): absorbs parquet footer reads, Python worker
    # pool spin-up, and per-plan codegen; the timed pass below measures
    # steady-state execution, which is what scales to a real cluster.
    for name in HEADLINE:
        corpus[name].fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()

    # Timed passes, per-query MIN: the box runs periodic background work
    # (driver snapshots) and a single pass can randomly inflate a query 10×;
    # three passes bound the noise to the quietest window each query sees.
    # fn() runs INSIDE the timer: some queries materialize intermediate
    # state at construction (localCheckpoint in the ranking/dedup release
    # paths), and timing only the final noop write would let that real
    # compute escape the measurement.
    timings: dict[str, float] = {}
    for _pass in range(3):
        for name in HEADLINE:
            t0 = time.perf_counter()
            corpus[name].fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            dt = round(time.perf_counter() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    # Standalone operator timings for the training-data write path, so the
    # per-round record shows them individually (h02b above times the whole
    # tagged bundle): FFD packing of documents into 2048-token windows, and
    # the deterministic 8-shard export (a real parquet write, not noop —
    # the write IS the operator).
    from sheetreader_duckdb_spark.operators.export import export_shards
    from sheetreader_duckdb_spark.operators.packing import pack_sequences
    from sheetreader_duckdb_spark.plans.relational import T

    docs = T(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    packed = pack_sequences(docs, "doc_id", "n_chars", seq_len=2048, n_buckets=8)
    packed.write.mode("overwrite").format("noop").save()  # warmup
    for _pass in range(3):
        t0 = time.perf_counter()
        packed.write.mode("overwrite").format("noop").save()
        dt = round(time.perf_counter() - t0, 3)
        if "pack_documents" not in timings or dt < timings["pack_documents"]:
            timings["pack_documents"] = dt

    export_dir = "/tmp/sheetreader_bench_export"
    export_shards(docs, "doc_id", 8, export_dir, seed="bench")  # warmup
    for _pass in range(3):
        t0 = time.perf_counter()
        export_shards(docs, "doc_id", 8, export_dir, seed="bench")
        dt = round(time.perf_counter() - t0, 3)
        if "export_documents" not in timings or dt < timings["export_documents"]:
            timings["export_documents"] = dt

    # Dedicated XLSX scan measurement, directly comparable to BASELINE.md
    # "lineitem XLSX load time" — warm run, same methodology as above.
    from sheetreader_duckdb_spark import register

    register(spark)
    xlsx_df = spark.read.format("sheetreader").load(_xlsx_for_sf(SF_DIR))
    xlsx_df.write.mode("overwrite").format("noop").save()  # warmup
    best = None
    for _pass in range(3):
        t0 = time.perf_counter()
        xlsx_df.write.mode("overwrite").format("noop").save()
        dt = round(time.perf_counter() - t0, 3)
        best = dt if best is None or dt < best else best
    timings["xlsx_load_lineitem"] = best

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
