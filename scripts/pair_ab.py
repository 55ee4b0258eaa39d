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
        # One loop, one error policy — bench.py's _pair_rounds (r14
        # review: this file used to re-implement it with a re-raise that
        # discarded the whole run on one transient pass failure, and
        # position-zip ratio pairing that misaligned after a one-sided
        # error; the shared loop appends None placeholders so index i is
        # always the same round on both sides).
        acc, rounds_done, dead, _wall = B._pair_rounds(
            entries, cur_p, prev_p, args.rounds, budget=float("inf"),
            progress=lambda rnd: print(
                f"  round {rnd} done ({time.time() - t0:.0f}s)"
            ),
        )
        if dead["cur"] or dead["prev"]:
            print(f"  WARNING: worker died (cur={dead['cur']} "
                  f"prev={dead['prev']}); reporting completed passes")
    finally:
        for p in (cur_p, prev_p):
            if p is not None:
                B._pair_stop(p)
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)
        import shutil

        shutil.rmtree(scratch, ignore_errors=True)

    def _totals(side: dict) -> list:
        # per-round totals, None where that round's pass failed
        return [
            (c + e) if c is not None else None
            for c, e in zip(side["construct"], side["exec"])
        ]

    rows = {}
    print(f"{'entry':34s} {'A(min)':>8s} {'B(min)':>8s} {'medR':>6s} "
          f"{'pminR':>6s}  spread")
    for name in entries:
        a, b = acc["cur"].get(name, {}), acc["prev"].get(name, {})
        a_tot = _totals(a) if a else []
        b_tot = _totals(b) if b else []
        # ratios only from SAME-ROUND pairs where both sides succeeded
        pairs = [
            (x, y) for x, y in zip(a_tot, b_tot)
            if x is not None and y is not None
        ]
        a_ok = [x for x in a_tot if x is not None]
        b_ok = [y for y in b_tot if y is not None]
        if not pairs:
            rows[name] = {"error": a.get("error") or b.get("error")
                          or "no complete same-round pair"}
            print(f"{name:34s} ERROR {rows[name]['error']}")
            continue
        ratios = sorted(x / y for x, y in pairs)
        rows[name] = {
            "a_min": round(min(a_ok), 3),
            "b_min": round(min(b_ok), 3),
            "a_min_construct": round(
                min(x for x in a["construct"] if x is not None), 3),
            "b_min_construct": round(
                min(x for x in b["construct"] if x is not None), 3),
            # min over SAME-ROUND paired ratios — drift-immune like the
            # median; the unpaired-minima quotient below is kept for
            # continuity but reintroduces cross-time comparison, so the
            # paired statistics lead (ADVICE r14).
            "paired_min_ratio": round(ratios[0], 3),
            "median_ratio": round(statistics.median(ratios), 3),
            "min_ratio": round(min(a_ok) / min(b_ok), 3),
            "ratio_spread": [round(ratios[0], 3), round(ratios[-1], 3)],
            "pairs": len(pairs),
        }
        r = rows[name]
        print(f"{name:34s} {r['a_min']:8.3f} {r['b_min']:8.3f} "
              f"{r['median_ratio']:6.2f} {r['paired_min_ratio']:6.2f}  "
              f"{r['ratio_spread']}")
    a_tot = sum(r["a_min"] for r in rows.values() if "a_min" in r)
    b_tot = sum(r["b_min"] for r in rows.values() if "b_min" in r)
    med_ratios = [r["median_ratio"] for r in rows.values()
                  if "median_ratio" in r]
    paired_med = (round(statistics.median(med_ratios), 3)
                  if med_ratios else None)
    summary = {
        "prev": prev_full[:12], "rounds": args.rounds, "entries": rows,
        "paired_median_of_medians": paired_med,
        "a_total_min": round(a_tot, 3), "b_total_min": round(b_tot, 3),
        "total_ratio": round(a_tot / b_tot, 3) if b_tot else None,
        "sf_dir": B.SF_DIR, "cpus": B.CPUS,
    }
    # The PAIRED statistic leads (ADVICE r14): per-entry median ratios are
    # same-round samples; the min-total quotient is cross-time and only
    # kept for continuity with older records.
    print(f"PAIRED median-of-entry-medians={paired_med}  "
          f"(min-total A={a_tot:.2f}s B={b_tot:.2f}s "
          f"ratio={summary['total_ratio']})")
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
