#!/usr/bin/env python3
"""Interleaved A/B of bench entries: the WORKING TREE vs an archived
commit (default: the latest 'round N:' driver commit), using bench.py's
pair-worker protocol — the measurement instrument VERDICT r13 task 1
prescribed (two persistent warm workers, alternating order per entry,
min/median over rounds). This is the round-14 optimization loop's
before/after tool: sequential-halves comparisons on this box scatter
0.68-2.19x on identical code (BENCH_DETAIL_r14 opening baseline), so
every claimed win must come from THIS harness or an equivalent
interleaved design.

Usage: python scripts/pair_ab.py [--prev <commit>] [--rounds 5]
       [--entries n10_token_stats,n17_tf_idf] [--out /tmp/pair_ab.json]
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench as B  # noqa: E402 — the pair-worker protocol lives there


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prev", default=None,
                    help="commit for the B side (default: latest round N:)")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--entries", default=None,
                    help="comma list (default: full headline + standalone)")
    ap.add_argument("--out", default="/tmp/pair_ab.json")
    args = ap.parse_args()

    prev = args.prev
    if prev is None:
        prev = subprocess.run(
            ["git", "log", "--grep", "^round [0-9]*:", "-n", "1",
             "--format=%H"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.strip()
    prev_full = subprocess.run(
        ["git", "rev-parse", prev], cwd=REPO, capture_output=True,
        text=True, check=True,
    ).stdout.strip()

    if args.entries:
        entries = [e.strip() for e in args.entries.split(",") if e.strip()]
    else:
        entries = list(B.SENTINELS) + [
            n for n in B.STANDALONE if n not in B.SENTINELS
        ]

    scratch = tempfile.mkdtemp(prefix="pair_ab_")
    wt = os.path.join(scratch, "wt")
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, prev_full],
        cwd=REPO, check=True, capture_output=True,
    )
    print(f"A = working tree, B = {prev_full[:12]}; "
          f"{len(entries)} entries x {args.rounds} interleaved rounds")

    cur_p = prev_p = None
    acc: dict = {"cur": {}, "prev": {}}
    try:
        # Sequential warmup: several entries write fixed /tmp paths during
        # their warmup pass; two trees warming at once race each other.
        cur_p = B._pair_start(REPO, entries, "ab_cur")
        B._pair_ready(cur_p)
        prev_p = B._pair_start(wt, entries, "ab_prev")
        B._pair_ready(prev_p)
        t0 = time.time()
        for rnd in range(args.rounds):
            for i, name in enumerate(entries):
                order = [("cur", cur_p), ("prev", prev_p)]
                if (rnd + i) % 2:
                    order.reverse()
                for label, p in order:
                    slot = acc[label].setdefault(
                        name, {"construct": [], "exec": [], "total": []}
                    )
                    try:
                        r = B._pair_pass(p, name)
                    except Exception as exc:  # noqa: BLE001
                        slot["error"] = f"{type(exc).__name__}: {exc}"[:200]
                        raise
                    if "error" in r:
                        slot["error"] = r["error"]
                    else:
                        slot["construct"].append(r["construct"])
                        slot["exec"].append(r["exec"])
                        slot["total"].append(r["construct"] + r["exec"])
            print(f"  round {rnd} done ({time.time() - t0:.0f}s)")
    finally:
        for p in (cur_p, prev_p):
            if p is not None:
                B._pair_stop(p)
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)
        import shutil

        shutil.rmtree(scratch, ignore_errors=True)

    rows = {}
    print(f"{'entry':34s} {'A(min)':>8s} {'B(min)':>8s} {'minR':>6s} "
          f"{'medR':>6s}  spread")
    for name in entries:
        a, b = acc["cur"].get(name, {}), acc["prev"].get(name, {})
        if not a.get("total") or not b.get("total"):
            rows[name] = {"error": a.get("error") or b.get("error")}
            print(f"{name:34s} ERROR {rows[name]['error']}")
            continue
        ratios = sorted(
            x / y for x, y in zip(a["total"], b["total"])
        )
        rows[name] = {
            "a_min": round(min(a["total"]), 3),
            "b_min": round(min(b["total"]), 3),
            "a_min_construct": round(min(a["construct"]), 3),
            "b_min_construct": round(min(b["construct"]), 3),
            "min_ratio": round(min(a["total"]) / min(b["total"]), 3),
            "median_ratio": round(statistics.median(ratios), 3),
            "ratio_spread": [round(ratios[0], 3), round(ratios[-1], 3)],
        }
        r = rows[name]
        print(f"{name:34s} {r['a_min']:8.3f} {r['b_min']:8.3f} "
              f"{r['min_ratio']:6.2f} {r['median_ratio']:6.2f}  "
              f"{r['ratio_spread']}")
    a_tot = sum(r["a_min"] for r in rows.values() if "a_min" in r)
    b_tot = sum(r["b_min"] for r in rows.values() if "b_min" in r)
    summary = {
        "prev": prev_full[:12], "rounds": args.rounds, "entries": rows,
        "a_total_min": round(a_tot, 3), "b_total_min": round(b_tot, 3),
        "total_ratio": round(a_tot / b_tot, 3) if b_tot else None,
        "sf_dir": B.SF_DIR, "cpus": B.CPUS,
    }
    print(f"TOTAL A={a_tot:.2f}s B={b_tot:.2f}s ratio="
          f"{summary['total_ratio']}")
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
