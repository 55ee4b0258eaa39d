#!/usr/bin/env python3
"""Witness for the pooled stats collector (VERDICT r12 task 4).

r12's per-member thread fan-out sped up stats=False retrofits
(4.28→2.43 s at workers=4 on a 4-sheet fixture) but stats=True gained
almost nothing (8.79→8.52 s): the stats slices — cell regex + numpy
folds — are GIL-bound. r13 ships each interval's analysis to a fork
Pool (bytes in, claims out), so stats work parallelizes across BOTH
members and intervals while output bytes stay identical.

Builds a 4-sheet foreign workbook (~30 MB, the r12 recipe shape),
retrofits it at workers=1 and workers=4 with stats on and off, checks
byte-identity across worker counts, and prints ONE JSON line. Done-bar:
stats=True at workers=4 approaches the stats=False wall + one member's
stats (~max-member behavior), i.e. well under the serial stats wall.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
import zipfile

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

CACHE = "/tmp/sheetreader_xlsx_fixture_cache"
os.makedirs(CACHE, exist_ok=True)
RAW = f"{CACHE}/retro4sheet_raw.xlsx"
ROWS_PER_SHEET = 280_000
PASSES = int(os.environ.get("XLSX_BENCH_PASSES", "3"))


def build() -> str:
    if os.path.exists(RAW):
        return RAW
    from sheetreader_duckdb_spark.sources.xlsx.writer import write_xlsx

    sheets = {}
    for s in range(4):
        rows = [["id", "qty", "tag"]]
        rows.extend(
            [float(i), float((i * 7 + s) % 997), f"t{s}-{i % 5000:05d}"]
            for i in range(ROWS_PER_SHEET)
        )
        sheets[f"Sheet{s + 1}"] = rows
    tmp = RAW + ".tmp"
    write_xlsx(tmp, sheets)
    with zipfile.ZipFile(tmp) as zin, zipfile.ZipFile(
        RAW + ".f", "w", zipfile.ZIP_DEFLATED
    ) as zout:
        for info in zin.infolist():
            zout.writestr(info.filename, zin.read(info.filename))
    os.replace(RAW + ".f", RAW)
    os.remove(tmp)
    return RAW


def main() -> None:
    from sheetreader_duckdb_spark.sources.xlsx.indexer import index_xlsx

    src = build()
    res: dict = {
        "witness": "retrofit_stats_pool",
        "fixture_mb": round(os.path.getsize(src) / (1 << 20), 1),
        "sheets": 4, "rows_per_sheet": ROWS_PER_SHEET,
    }
    digests: dict = {}
    for stats in (False, True):
        for workers in (1, 4):
            key = f"stats={stats}_workers={workers}"
            walls = []
            for _ in range(PASSES):
                out = f"{CACHE}/retro4sheet_out.xlsx"
                t0 = time.perf_counter()
                r = index_xlsx(src, out_path=out, stats=stats,
                               workers=workers)
                walls.append(time.perf_counter() - t0)
                assert r["indexed"], r
            res[key] = round(min(walls), 2)
            digests[key] = hashlib.sha256(
                open(out, "rb").read()
            ).hexdigest()
            os.remove(out)
    assert digests["stats=True_workers=1"] == digests["stats=True_workers=4"]
    assert (
        digests["stats=False_workers=1"] == digests["stats=False_workers=4"]
    )
    res["byte_identical_across_workers"] = True
    res["stats_true_speedup_w4"] = round(
        res["stats=True_workers=1"] / res["stats=True_workers=4"], 2
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
