#!/usr/bin/env python3
"""Round-over-round bench regression gate (round-11 verdict item #3 /
round-10 item #6): diff two Bench artifacts (BENCH_FULL.json format — one
JSON object with a per-query "queries" map) and flag per-query regressions
so the BUILDER catches the next fz6042 before the judge does.

A query is flagged when BOTH hold:
  - new/old ratio > THRESHOLD (default 1.5×), and
  - the new time exceeds MIN_SEC (default 0.3 s — sub-0.3 s timings are
    dominated by per-query constant cost and flap freely).

Usage: python3 tools/bench_diff.py <old_bench.json> <new_bench.json>
       [--threshold 1.5] [--min-sec 0.3]

Exit code 1 when any query is flagged (wire into the round-close checklist:
run Bench, then bench_diff against the last committed BENCH_FULL.json, and
re-measure flagged queries with SPARK_GRAFT_BENCH_RUNS=5 on an idle host —
the BASELINE.md r6 protocol — before accepting or investigating).
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-sec", type=float, default=0.3)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    flagged, improved = [], []
    for name in common:
        o, n = old[name], new[name]
        if o <= 0 or n <= 0:  # -1 marks a failed run — report separately
            print(f"ERROR-TIMING {name}: old={o} new={n}")
            continue
        ratio = n / o
        if ratio > args.threshold and n > args.min_sec:
            flagged.append((name, o, n, ratio))
        elif ratio < 1 / args.threshold and o > args.min_sec:
            improved.append((name, o, n, ratio))

    tot_old = sum(v for k, v in old.items() if k in common and v > 0)
    tot_new = sum(v for k, v in new.items() if k in common and v > 0)
    print(f"common {len(common)} queries: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({tot_new / tot_old:.2f}x)" if common else "no common queries")
    if added:
        print(f"added ({len(added)}): {', '.join(added[:20])}"
              + (" ..." if len(added) > 20 else ""))
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed[:20])}")
    for name, o, n, r in sorted(improved, key=lambda x: x[3])[:10]:
        print(f"  faster {name}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    if flagged:
        print(f"\nREGRESSIONS (> {args.threshold}x and > {args.min_sec}s):")
        for name, o, n, r in sorted(flagged, key=lambda x: -x[3]):
            print(f"  FLAG {name}: {o:.2f}s -> {n:.2f}s ({r:.2f}x) — "
                  "re-measure with SPARK_GRAFT_BENCH_RUNS=5 idle before accepting")
        return 1
    print("no regressions flagged")
    return 0


if __name__ == "__main__":
    sys.exit(main())
