#!/usr/bin/env python3
"""Isolate h02b_ctas_sink: interleaved A/B at HEAD vs the r11 archived
commit (VERDICT r12 "What's wrong" #2 — the only entry >1.3x in BOTH
final r12 paired blocks; writer.py changed in r12, so it needs the same
interleaved-repeat treatment export_documents got before being declared
weather).

Methodology (the export_documents precedent, upgraded to paired form):
two PERSISTENT subprocess workers — one on HEAD's tree, one on a
detached worktree of the prev commit — each holding a warm SparkSession;
the parent ping-pongs single timed passes between them, alternating
which side goes first each round so slow box drift cancels. Every pass
is (construct, exec) of the same corpus entry, fresh build each time,
noop sink. Output: per-round table + per-side medians + the
median-of-ratios, printed AND written as JSON next to this script's cwd.

Usage: python scripts/isolate_h02b.py [--rounds 8] [--prev 281c996]
       [--query h02b_ctas_sink] [--out /tmp/isolate_h02b.json]
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

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r'''
import json, sys, time
root, sf_dir, cpus, qname = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
sys.path.insert(0, root)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[" + cpus + "]")
         .appName("isolate-" + qname)
         .config("spark.sql.shuffle.partitions", cpus)
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from sheetreader_duckdb_spark.session import configure_session
from sheetreader_duckdb_spark.plans import all_queries
configure_session(spark)
fn = all_queries()[qname].fn

def _noop(df):
    df.write.mode("overwrite").format("noop").save()

_noop(fn(spark, sf_dir))  # warmup: JVM + codegen + any cached fixtures
print("READY", flush=True)
for line in sys.stdin:
    if line.strip() != "GO":
        break
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    t1 = time.perf_counter()
    _noop(df)
    t2 = time.perf_counter()
    print("RES " + json.dumps({"construct": t1 - t0,
                               "exec": t2 - t1}), flush=True)
spark.stop()
'''


def _start(root: str, sf_dir: str, cpus: str, qname: str,
           worker_src: "str | None" = None) -> subprocess.Popen:
    """Launch a persistent warm-Spark worker in ``root``'s tree.
    ``worker_src`` overrides the registry-query worker body (sibling
    isolation scripts reuse this harness with their own measured pass —
    r13 review: isolate_xlsx_pruned.py had copied it verbatim)."""
    p = subprocess.Popen(
        [sys.executable, "-c", worker_src or _WORKER,
         root, sf_dir, cpus, qname],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, bufsize=1, cwd=root,
    )
    for line in p.stdout:
        if line.strip() == "READY":
            return p
        if line.startswith("RES"):  # defensive: shouldn't happen pre-READY
            continue
    raise RuntimeError(f"worker on {root} died before READY")


def _pass(p: subprocess.Popen) -> dict:
    p.stdin.write("GO\n")
    p.stdin.flush()
    for line in p.stdout:
        if line.startswith("RES "):
            return json.loads(line[4:])
    raise RuntimeError("worker died mid-pass")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--prev", default="281c996")
    ap.add_argument("--query", default="h02b_ctas_sink")
    ap.add_argument("--out", default="/tmp/isolate_h02b.json")
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
    print(f"isolating {args.query}: HEAD {head[:12]} vs prev {prev_full[:12]}"
          f" ({args.rounds} interleaved rounds, alternating order)")

    t_start = time.time()
    cur_p = _start(_REPO, sf_dir, cpus, args.query)
    prev_p = _start(wt, sf_dir, cpus, args.query)

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
        "query": args.query, "head": head[:12], "prev": prev_full[:12],
        "rounds": rows,
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
