#!/usr/bin/env python
"""Decompose one streaming drain (guide §1): schema probe, stream
construction, query start, micro-batch execution, memory-table read.

Usage: python scripts/profile_stream.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from ruleset_analysis_spark.session import get_spark
    from ruleset_analysis_spark.sources.parquet import path_for
    from ruleset_analysis_spark.streaming.event_streams import (
        read_event_stream,
    )
    from pyspark.sql import functions as F

    spark = get_spark(app_name="profile-stream", driver_memory="16g")
    src = path_for(sf_dir, "events")

    # warm: one batch read so parquet footers etc. are cached
    spark.read.parquet(src).count()

    for trial in range(3):
        t0 = time.time()
        stream = read_event_stream(
            spark, os.path.dirname(src), glob=os.path.basename(src)
        ).filter(F.col("ts").isNotNull())
        t1 = time.time()
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        t2 = time.time()
        q = (
            agg.writeStream.format("memory")
            .queryName(f"prof_stream_{trial}")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        t3 = time.time()
        q.awaitTermination()
        t4 = time.time()
        n = spark.table(f"prof_stream_{trial}").count()
        t5 = time.time()
        prog = [
            json.loads(p.json() if callable(p.json) else p.json)
            for p in q.recentProgress
        ]
        print(
            f"trial={trial} read_stream={t1-t0:.3f} plan={t2-t1:.3f} "
            f"start={t3-t2:.3f} drain={t4-t3:.3f} read_table={t5-t4:.3f} "
            f"rows={n} batches={len(prog)}"
        )
        for p in prog:
            dd = p.get("durationMs", {})
            print("   durationMs:", dd, "numInputRows:", p.get("numInputRows"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
