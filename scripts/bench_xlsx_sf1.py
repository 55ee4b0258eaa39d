#!/usr/bin/env python3
"""Re-witness the BASELINE.md headline at the reference's own scale
(round-2 methodology, BENCHNOTES.md:3-27): a 6M-row ~102 MB lineitem
XLSX (sf0.1's 3-column lineitem replicated 10x through our writer),
scanned via spark.read.format("sheetreader") on local[32], warm, min of
PASSES timed runs each at threads=1 / threads=4 / auto-sharding.

Reference chart (BASELINE.md): ~13.6 s at 1 thread, ~7.1 s at 4 threads.
Prints ONE JSON line; numbers land in BENCHNOTES.md per round.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PASSES = int(os.environ.get("XLSX_BENCH_PASSES", "2"))
REPLICAS = int(os.environ.get("XLSX_BENCH_REPLICAS", "10"))
CACHE = "/tmp/sheetreader_xlsx_fixture_cache"


# Table workloads matching the reference chart rows (BASELINE.md):
# lineitem = the headline 3-column numeric scan; orders = the 6-column
# date+string-heavy profile (shared strings + date-style decode), at SF1
# row parity with the chart (sf0.1 orders x10 = 1.5M rows).
TABLE = os.environ.get("XLSX_BENCH_TABLE", "lineitem")
_WORKLOADS = {
    "lineitem": {
        "cols": ["l_returnflag", "l_quantity", "l_extendedprice"],
        "baseline_1t": 13.6,
        "baseline_4t": 7.1,
    },
    "orders": {
        "cols": [
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],  # the driver testdata's orders columns (6 of TPC-H's 9)
        "baseline_1t": 8.9,
        "baseline_4t": 5.4,
    },
    # part / customer: the chart's two small tables, at SF1 row parity
    # (sf0.1 x10 = 200k / 150k rows; 6 of 9 and 5 of 8 TPC-H columns —
    # the driver testdata's subsets, same caveat as orders).
    "part": {
        "cols": [
            "p_partkey", "p_name", "p_brand", "p_type", "p_size",
            "p_retailprice",
        ],
        "baseline_1t": 1.9,
        "baseline_4t": 0.9,
    },
    "customer": {
        "cols": [
            "c_custkey", "c_name", "c_nationkey", "c_acctbal",
            "c_mktsegment",
        ],
        "baseline_1t": 2.0,
        "baseline_4t": 1.1,
    },
    # partsupp: the chart's 5th table. The driver testdata has NO partsupp,
    # so it is SYNTHESIZED at TPC-H SF1 shape (800k rows = 200k parts x 4
    # suppliers; dbgen column domains: availqty 1-9999, supplycost
    # 1.00-1000.00, comment 49-198 chars averaging ~124) with
    # deterministic hash-derived values and UNIQUE comments — dbgen
    # comments are unique, and uniqueness is what sizes the shared-string
    # table the reader must decode, so a replicated (10x-deduped) string
    # column would understate the work.
    "partsupp": {
        "cols": [
            "ps_partkey", "ps_suppkey", "ps_availqty", "ps_supplycost",
            "ps_comment",
        ],
        "baseline_1t": 5.9,
        "baseline_4t": 3.1,
        "synth_rows": 800_000,
    },
}

_PARTSUPP_SQL = """
SELECT
  CAST(i // 4 + 1 AS BIGINT)                         AS ps_partkey,
  CAST((i % 4) * 2500 + (i // 4) % 2500 + 1 AS BIGINT) AS ps_suppkey,
  CAST(1 + abs(hash(i * 3)) % 9999 AS BIGINT)        AS ps_availqty,
  ROUND(1.0 + (abs(hash(i * 5)) % 99900) / 100.0, 2) AS ps_supplycost,
  concat(
    to_hex(hash(i)), ' ',
    substr(repeat(
      'carefully final deposits wake slyly across the quiet pending '
      || 'requests sleep furiously among the bold ideas along the '
      || 'express accounts ', 2), 1,
      CAST(33 + abs(hash(i * 7)) % 150 AS INT))
  )                                                  AS ps_comment
FROM range({n}) t(i)
"""


def build_sf1_xlsx() -> str:
    os.makedirs(CACHE, exist_ok=True)
    synth = _WORKLOADS[TABLE].get("synth_rows")
    path = (
        f"{CACHE}/{TABLE}_sf1_synth{synth}.xlsx"
        if synth
        else f"{CACHE}/{TABLE}_sf1_{REPLICAS}x.xlsx"
    )
    if os.path.exists(path):
        return path
    import duckdb

    from sheetreader_duckdb_spark.sources.xlsx.writer import IncrementalXlsxWriter

    cols = _WORKLOADS[TABLE]["cols"]
    tmp = path + ".tmp"
    w = IncrementalXlsxWriter(tmp, "Sheet1")
    w.write_row(cols)
    if synth:
        rows = duckdb.sql(_PARTSUPP_SQL.format(n=synth)).fetchall()
        for r in rows:
            w.write_row(list(r))
    else:
        rows = duckdb.sql(
            f"SELECT {', '.join(cols)} FROM '{SF_DIR}/{TABLE}.parquet'"
        ).fetchall()
        for _ in range(REPLICAS):
            for r in rows:
                w.write_row(list(r))
    w.close()
    os.replace(tmp, path)
    return path


def _total_rows() -> int:
    synth = _WORKLOADS[TABLE].get("synth_rows")
    if synth:
        return synth
    import duckdb

    return duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/{TABLE}.parquet'"
    ).fetchone()[0] * REPLICAS


def main() -> None:
    from pyspark.sql import SparkSession

    from sheetreader_duckdb_spark import register

    path = build_sf1_xlsx()
    size_mb = round(os.path.getsize(path) / 1e6, 1)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("xlsx-sf1-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)

    def timed(**opts) -> float:
        reader = spark.read.format("sheetreader")
        for k, v in opts.items():
            reader = reader.option(k, v)
        reader.load(path).write.mode("overwrite").format("noop").save()  # warm
        best = float("inf")
        for _ in range(PASSES):
            t0 = time.perf_counter()
            reader = spark.read.format("sheetreader")
            for k, v in opts.items():
                reader = reader.option(k, v)
            reader.load(path).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2)

    out = {
        "metric": "xlsx_sf1_load",
        "table": TABLE,
        "file_mb": size_mb,
        "rows": _total_rows(),
        "threads_1": timed(threads=1),
        "threads_4": timed(threads=4),
        "auto": timed(),
        "baseline_1t": _WORKLOADS[TABLE]["baseline_1t"],
        "baseline_4t": _WORKLOADS[TABLE]["baseline_4t"],
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
