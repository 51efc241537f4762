#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries to files.

Usage: python scripts/explain_dump.py --outdir plans/r09 --suffix _before q1 q2 ...
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    from ruleset_analysis_spark.plans.registry import all_specs
    from ruleset_analysis_spark.session import get_spark

    spark = get_spark(app_name="explain-dump", cpus=8, driver_memory="8g")
    specs = all_specs()
    os.makedirs(args.outdir, exist_ok=True)
    for name in args.names:
        df = specs[name].builder(spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.outdir, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
