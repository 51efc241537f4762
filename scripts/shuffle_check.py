#!/usr/bin/env python
"""Row-order robustness sweep: the full differential check on a
row-SHUFFLED copy of the corpus.

The driver regenerates testdata between rounds, so any query whose
value depends on row/partition order (a rounded double sum, an
under-tie-broken top-k) is a latent red row even if today's sweep is
green. This tool makes that failure mode testable on demand: it
rewrites every table with rows in a deterministic pseudo-random order
(ORDER BY hash(row_number)) and small row groups (so Spark splits
differently too), then runs scripts/check.py against the copy. The
ORACLE reads the same shuffled files, so values are identical —
anything that flips is order-dependence by construction.

Usage:  python scripts/shuffle_check.py [--sf /root/testdata/sf0.01]
                                        [--out /tmp/sfshuf] [names...]
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys

import duckdb


def build_shuffled(src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for p in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        t = os.path.basename(p)
        con.execute(
            f"""
            COPY (
              SELECT * EXCLUDE (__rn) FROM (
                SELECT *, row_number() OVER () AS __rn
                FROM read_parquet('{p}')
              ) ORDER BY hash(__rn * 2654435761)
            ) TO '{os.path.join(out, t)}'
            (FORMAT PARQUET, ROW_GROUP_SIZE 4096)
            """
        )
        print(f"shuffled {t}", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/sfshuf")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    build_shuffled(args.sf, args.out)
    check = os.path.join(os.path.dirname(__file__), "check.py")
    return subprocess.call(
        [sys.executable, check, "--sf", args.out, *args.names]
    )


if __name__ == "__main__":
    raise SystemExit(main())
