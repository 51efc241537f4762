#!/usr/bin/env python
"""Round-over-round bench floor comparison.

The perf discipline VERDICT reviews each round is "no per-query
min-of-2 floor regresses beyond noise (1.5×) against the previous
record". This tool automates that diff between two BENCH_DETAIL.json
files: new/removed queries are listed, every common query's floor is
compared, and regressions past the threshold exit non-zero so the
check can gate a commit.

Usage:
    python scripts/bench_compare.py OLD.json [NEW.json] [--ratio 1.5]
(NEW defaults to the repo's current BENCH_DETAIL.json.)

Host caveat (SCALE.md): this machine shows up to ±50% wall-clock noise
between identical runs — compare floors, never first-pass numbers, and
treat a flagged regression as "reproduce before reverting", not proof.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument(
        "new",
        nargs="?",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_DETAIL.json",
        ),
    )
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--min-floor", type=float, default=0.3,
                    help="ignore regressions below this absolute floor "
                         "(sub-300ms timings are scheduling noise)")
    ap.add_argument("--no-allowlist", action="store_true",
                    help="ignore scripts/deliberate_refloors.json and "
                         "flag every regression")
    args = ap.parse_args()

    old = json.load(open(args.old))["supplementary_min_of_2"]
    new = json.load(open(args.new))["supplementary_min_of_2"]

    # Deliberate plan-replacement re-floors (query -> round/reason/
    # max_ratio). A regression on an allowlisted key is expected up to
    # its max_ratio — the documented price of an x100/x1000-survival
    # rewrite whose historical floor came from a retired algorithm.
    # Past max_ratio the key regressed ON TOP of the trade: still red.
    allowlist: dict[str, dict] = {}
    allow_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "deliberate_refloors.json"
    )
    if not args.no_allowlist and os.path.exists(allow_path):
        allowlist = json.load(open(allow_path))["entries"]

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        cost = sum(new[k] for k in added)
        print(f"added ({len(added)}, {cost:.1f}s): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    regressions, improvements, deliberate = [], [], []
    for k in sorted(set(old) & set(new)):
        o, n = old[k], new[k]
        if n > o * args.ratio and n >= args.min_floor:
            cap = allowlist.get(k, {}).get("max_ratio", 0.0)
            if n <= o * cap:
                deliberate.append((n / o, k, o, n, allowlist[k]))
            else:
                regressions.append((n / o, k, o, n))
        elif o > n * args.ratio and o >= args.min_floor:
            improvements.append((o / n, k, o, n))
    for r, k, o, n in sorted(improvements, reverse=True):
        print(f"improved  {r:5.2f}x  {k}: {o:.2f}s -> {n:.2f}s")
    for r, k, o, n, meta in sorted(deliberate, reverse=True):
        print(f"deliberate {r:5.2f}x (cap {meta['max_ratio']}x, r{meta['round']})  "
              f"{k}: {o:.2f}s -> {n:.2f}s")
    for r, k, o, n in sorted(regressions, reverse=True):
        print(f"REGRESSED {r:5.2f}x  {k}: {o:.2f}s -> {n:.2f}s")

    so = sum(old[k] for k in set(old) & set(new))
    sn = sum(new[k] for k in set(old) & set(new))
    print(f"comparable-base floor sum: {so:.1f}s -> {sn:.1f}s "
          f"({len(set(old) & set(new))} queries)")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
