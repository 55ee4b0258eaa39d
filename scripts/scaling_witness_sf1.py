#!/usr/bin/env python3
"""Scale-credible parallelism witness (VERDICT r14 task 6): the sf0.1
scaling block compresses everything to 1.0-1.7x at 4x cores because the
data is tiny; this runs the heaviest bench entries at SF1 (a 10x
key-offset replication of sf0.1 — scripts/make_scaled_sf.py, join
selectivities preserved) at 8 vs 32 cores, with the two sides as
persistent warm workers ping-ponging single timed passes per entry
(bench.py's interleaved pair design, so box drift cancels out of the
ratio). A ratio near 4x = data-bound (parallelises); near 1x =
plan/driver-bound.

Usage: python scripts/scaling_witness_sf1.py [--rounds 3]
       [--entries curate_corpus,...] [--out SCALING_WITNESS_sf1_r15.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench as B  # noqa: E402 — the pair-worker protocol

SF1_DIR = "/tmp/sheetreader_sf1/sf1"
DEFAULT_ENTRIES = [
    "curate_corpus",
    "n10_token_stats",
    "n01_cur_kept",
    "n01_dedup_exact_pipeline",
    "n17_tf_idf",
]


def _start(cpus: str, names: list, label: str):
    """One warm worker on THIS tree at the given core count (bench's
    worker body reads cpus from argv, so two counts can coexist)."""
    import queue
    import threading

    log = open(f"/tmp/bench_pair_{label}.log", "wb")
    try:
        p = subprocess.Popen(
            [sys.executable, "-c", B._PAIR_WORKER, REPO, SF1_DIR, cpus,
             json.dumps(names)],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=log,
            text=True, bufsize=1, cwd=REPO,
        )
    finally:
        log.close()
    q: queue.Queue = queue.Queue()

    def _pump() -> None:
        for line in p.stdout:
            q.put(line)
        q.put(None)

    threading.Thread(target=_pump, daemon=True, name=f"pair-{label}").start()
    p._pair_lines = q  # type: ignore[attr-defined]
    return p


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--entries", default=None)
    ap.add_argument("--out", default=os.path.join(
        REPO, "SCALING_WITNESS_sf1_r15.json"))
    args = ap.parse_args()
    entries = (
        [e for e in args.entries.split(",") if e]
        if args.entries
        else DEFAULT_ENTRIES
    )
    if not os.path.isdir(SF1_DIR):
        print("building the SF1 fixture (make_scaled_sf.py --scale 10)...")
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "make_scaled_sf.py"),
             "--src", "/root/testdata/sf0.1", "--out", SF1_DIR,
             "--scale", "10"],
            check=True,
        )

    # Sequential warmup (fixed /tmp fixture paths), then ping-pong.
    lo = _start("8", entries, "sf1_c8")
    B._pair_ready(lo, timeout=3600)
    hi = _start("32", entries, "sf1_c32")
    B._pair_ready(hi, timeout=3600)
    t0 = time.time()
    acc, rounds_done, dead, wall = B._pair_rounds(
        entries, hi, lo, args.rounds, budget=float("inf"),
        progress=lambda r: print(f"  round {r} done ({time.time() - t0:.0f}s)"),
    )
    for p in (lo, hi):
        B._pair_stop(p)

    rows = {}
    print(f"{'entry':30s} {'c32(min)':>9s} {'c8(min)':>9s} {'medR 8/32':>9s}")
    for name in entries:
        a = acc["cur"].get(name, {})   # hi = 32 cores rode the 'cur' slot
        b = acc["prev"].get(name, {})  # lo = 8 cores rode the 'prev' slot
        at = [c + e for c, e in zip(a.get("construct", []), a.get("exec", []))
              if c is not None and e is not None]
        bt = [c + e for c, e in zip(b.get("construct", []), b.get("exec", []))
              if c is not None and e is not None]
        pairs = [
            (y, x) for x, y in zip(
                [c + e if c is not None else None
                 for c, e in zip(a.get("construct", []), a.get("exec", []))],
                [c + e if c is not None else None
                 for c, e in zip(b.get("construct", []), b.get("exec", []))],
            ) if x is not None and y is not None
        ]
        if not at or not bt or not pairs:
            rows[name] = {"error": a.get("error") or b.get("error") or "no data"}
            print(f"{name:30s} ERROR {rows[name]['error']}")
            continue
        ratios = sorted(y / x for y, x in pairs)  # c8 / c32 speedup-of-cores
        rows[name] = {
            "c32_min": round(min(at), 3),
            "c8_min": round(min(bt), 3),
            "median_ratio_c8_over_c32": round(statistics.median(ratios), 3),
            "ratio_spread": [round(ratios[0], 3), round(ratios[-1], 3)],
            "pairs": len(pairs),
        }
        r = rows[name]
        print(f"{name:30s} {r['c32_min']:9.3f} {r['c8_min']:9.3f} "
              f"{r['median_ratio_c8_over_c32']:9.2f}")
    out = {
        "witness": "sf1_core_scaling",
        "sf_dir": SF1_DIR,
        "cpus": ["8", "32"],
        "rounds": rounds_done,
        "wall_sec": round(wall, 1),
        "entries": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
