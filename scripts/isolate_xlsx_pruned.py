#!/usr/bin/env python3
"""Isolate xlsx_load_pruned: interleaved A/B at HEAD vs the r12 archived
commit (r13 session-2 flag — 1.31x/1.27x in the two same-day at-HEAD
paired blocks while yesterday's two blocks read 0.95x/1.04x on the SAME
code; sub-second entry, min-of-3, so it needs the interleaved-repeat
treatment h02b_ctas_sink and export_documents got before adjudication).

Reuses scripts/isolate_h02b.py's harness (persistent warm workers, one
per tree, ping-ponged single passes with alternating order) with a
worker body that is bench.py's entry verbatim: read_xlsx(columns=
[l_returnflag, l_quantity]) over the shared cached SF-scaled workbook,
noop sink.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
if _SCRIPTS not in sys.path:
    sys.path.insert(0, _SCRIPTS)
_REPO = os.path.dirname(_SCRIPTS)

from isolate_h02b import _pass, _start  # noqa: E402 — shared harness

_WORKER = r'''
import json, sys, time
root, sf_dir, cpus = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, root)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[" + cpus + "]")
         .appName("isolate-xlsx-pruned")
         .config("spark.sql.shuffle.partitions", cpus)
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from sheetreader_duckdb_spark import read_xlsx, register
from sheetreader_duckdb_spark.plans.ingestion import _xlsx_for_sf
register(spark)
xlsx_path = _xlsx_for_sf(sf_dir)
COLS = ["l_returnflag", "l_quantity"]

def _noop(df):
    df.write.mode("overwrite").format("noop").save()

_noop(read_xlsx(spark, xlsx_path, columns=COLS))  # warmup
print("READY", flush=True)
for line in sys.stdin:
    if line.strip() != "GO":
        break
    t0 = time.perf_counter()
    df = read_xlsx(spark, xlsx_path, columns=COLS)
    t1 = time.perf_counter()
    _noop(df)
    t2 = time.perf_counter()
    print("RES " + json.dumps({"construct": t1 - t0,
                               "exec": t2 - t1}), flush=True)
spark.stop()
'''


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--prev", default="5f250f4")
    ap.add_argument("--out", default="/tmp/isolate_xlsx_pruned.json")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    prev_full = subprocess.run(
        ["git", "rev-parse", args.prev], cwd=_REPO, capture_output=True,
        text=True, check=True,
    ).stdout.strip()
    wt = os.path.join(tempfile.gettempdir(), f"srb_isolate_{prev_full[:12]}")
    if not os.path.isdir(os.path.join(wt, "sheetreader_duckdb_spark")):
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=_REPO, capture_output=True)
        subprocess.run(["git", "worktree", "add", "--detach", wt, prev_full],
                       cwd=_REPO, check=True, capture_output=True)

    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=_REPO,
                          capture_output=True, text=True).stdout.strip()
    print(f"isolating xlsx_load_pruned: HEAD {head[:12]} vs prev "
          f"{prev_full[:12]} ({args.rounds} interleaved rounds)")

    t_start = time.time()
    cur_p = _start(_REPO, sf_dir, cpus, "xlsx_load_pruned", worker_src=_WORKER)
    prev_p = _start(wt, sf_dir, cpus, "xlsx_load_pruned", worker_src=_WORKER)

    rows = []
    try:
        for i in range(args.rounds):
            order = [("cur", cur_p), ("prev", prev_p)]
            if i % 2:
                order.reverse()
            rec = {}
            for label, p in order:
                r = _pass(p)
                rec[label] = round(r["construct"] + r["exec"], 3)
                rec[label + "_c"] = round(r["construct"], 3)
            rows.append(rec)
            print(f"  round {i}: cur {rec['cur']:.3f}s (c {rec['cur_c']:.3f})"
                  f"  prev {rec['prev']:.3f}s (c {rec['prev_c']:.3f})"
                  f"  ratio {rec['cur'] / rec['prev']:.2f}x")
    finally:
        for p in (cur_p, prev_p):
            try:
                p.stdin.close()
                p.wait(timeout=60)
            except Exception:
                p.kill()

    cur_med = statistics.median(r["cur"] for r in rows)
    prev_med = statistics.median(r["prev"] for r in rows)
    ratios = sorted(r["cur"] / r["prev"] for r in rows)
    summary = {
        "query": "xlsx_load_pruned", "head": head[:12],
        "prev": prev_full[:12], "rounds": rows,
        "cur_median": round(cur_med, 3), "prev_median": round(prev_med, 3),
        "median_ratio": round(statistics.median(ratios), 3),
        "ratio_spread": [round(ratios[0], 3), round(ratios[-1], 3)],
        "wall_sec": round(time.time() - t_start, 1),
        "sf_dir": sf_dir, "cpus": cpus,
    }
    print(json.dumps(summary))
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
