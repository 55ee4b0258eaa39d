#!/usr/bin/env python3
"""Witness for the retrofit indexer's economics (VERDICT r11 task 1):
take the SF1 lineitem XLSX fixture, FOREIGNIZE it (recompress every
member plainly — single deflate streams, no flush points, no comment:
the compression shape Excel/openpyxl emit), then measure the auto-shard
scan before and after ``index_xlsx``. Also times the one-off retrofit
pass itself and checks bit-equality via a full-column aggregate.

Prints ONE JSON line. Done-bar from VERDICT r10: indexed auto >= 3x
faster than the foreign control, results bit-equal.
"""

from __future__ import annotations

import json
import os
import sys
import time
import zipfile

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PASSES = int(os.environ.get("XLSX_BENCH_PASSES", "2"))
CACHE = "/tmp/sheetreader_xlsx_fixture_cache"


def foreignize(src: str, dst: str) -> str:
    if os.path.exists(dst):
        return dst
    tmp = dst + ".tmp"
    with zipfile.ZipFile(src) as zin, zipfile.ZipFile(
        tmp, "w", zipfile.ZIP_DEFLATED
    ) as zout:
        for info in zin.infolist():
            zout.writestr(info.filename, zin.read(info.filename))
    os.replace(tmp, dst)
    return dst


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bench_xlsx_sf1 import build_sf1_xlsx
    from sheetreader_duckdb_spark import index_xlsx, register

    src = build_sf1_xlsx()
    foreign = foreignize(src, f"{CACHE}/lineitem_sf1_foreign.xlsx")
    indexed = f"{CACHE}/lineitem_sf1_retrofit.xlsx"
    t0 = time.perf_counter()
    if not os.path.exists(indexed):
        res = index_xlsx(foreign, out_path=indexed)
        assert res["indexed"], res
        retrofit_sec = round(time.perf_counter() - t0, 2)
    else:
        retrofit_sec = None  # cached from a prior run

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("retrofit-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)

    def agg(path):
        # Order-insensitive EXACT comparison: xor of per-row hashes (a
        # float SUM would differ in the last bit between shard counts —
        # addition order, not cell values).
        df = spark.read.format("sheetreader").load(path)
        return tuple(
            df.agg(
                F.count("*"),
                F.bit_xor(F.xxhash64(*df.columns)),
            ).collect()[0]
        )

    def timed(path) -> float:
        rd = lambda: spark.read.format("sheetreader").load(path).write.mode(  # noqa: E731
            "overwrite"
        ).format("noop").save()
        rd()  # warm
        best = float("inf")
        for _ in range(PASSES):
            t = time.perf_counter()
            rd()
            best = min(best, time.perf_counter() - t)
        return round(best, 2)

    a, b = agg(foreign), agg(indexed)
    assert a == b, (a, b)
    control = timed(foreign)
    retro = timed(indexed)
    out = {
        "metric": "xlsx_retrofit_index",
        "table": "lineitem",
        "rows": int(a[0]),
        "file_mb": round(os.path.getsize(foreign) / 1e6, 1),
        "control_auto": control,
        "indexed_auto": retro,
        "speedup": round(control / retro, 2),
        "retrofit_pass_sec": retrofit_sec,
        "bit_equal": True,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
