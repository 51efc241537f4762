"""Dirty-corpus smoke: no registered query may crash on degenerate rows.

The hardening commits established the engine convention 'one dirty row
must never kill a 100 TB job' (NULL payloads, empty/zero vectors,
missing JSON keys, zero-token docs — all degrade to NULL/absent, never
an ANSI abort). This test pins that property end-to-end: a doctored
corpus containing every degenerate shape is run through the full
documents/embeddings/events query surface and each query must simply
execute."""

from __future__ import annotations

import datetime
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ruleset_analysis_spark.plans.registry import all_specs

SF_DIR = "/root/testdata/sf0.001"

# EVERY registered query runs against the doctored corpus. Earlier
# rounds curated a by-hand list of documents/embeddings/events readers;
# the r4 advice caught it lagging (and 29 more readers were missing
# behind helper indirection like _payloads/cooccur_edges). The TPC-H
# tables are copied unchanged, so the relational queries cost only
# harness overhead at sf0.001 — a price worth paying for a
# maintenance-free no-crash guarantee over the full surface.
DIRTY_QUERIES = sorted(all_specs())


def _flatten(spark, df, out_dir, name):
    raw = str(out_dir / f"_{name}_raw")
    df.coalesce(1).write.mode("overwrite").parquet(raw)
    part = next(p for p in os.listdir(raw) if p.startswith("part-"))
    shutil.move(os.path.join(raw, part), str(out_dir / f"{name}.parquet"))
    shutil.rmtree(raw)


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("dirty")
    # start from the real sf0.001 corpus so joins/dims still resolve
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"):
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dirty_docs = docs.unionByName(
        spark.createDataFrame(
            [
                (100001, None, "en", "web", 0),          # NULL text
                (100002, "", "en", "web", 0),            # empty text
                (100003, "one two", "zz", "web", 7),     # < 3 tokens
                (100004, "   ", None, None, 3),          # whitespace, NULL lang
            ],
            docs.schema,
        )
    )
    _flatten(spark, dirty_docs, d, "documents")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    dirty_emb = emb.unionByName(
        spark.createDataFrame(
            [
                (200001, None, 1),                        # NULL vector
                (200002, [0.0] * dim, 1),                 # zero-norm vector
                (200003, [], 2),                          # empty vector
            ],
            emb.schema,
        )
    )
    _flatten(spark, dirty_emb, d, "embeddings")

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # ts values in whatever encoding the corpus actually uses: int64 ns
    # in round 1's files, timestamp[us] (datetime) in round 2's — the
    # fixture must round-trip through the same physical schema
    ts_is_long = isinstance(ev.schema["ts"].dataType, T.LongType)

    def _ts(epoch_s):
        if ts_is_long:
            return epoch_s * 10**9
        return datetime.datetime.fromtimestamp(epoch_s, datetime.timezone.utc).replace(tzinfo=None)

    dirty_ev = ev.unionByName(
        spark.createDataFrame(
            [
                (900001, _ts(1704067200), 1, "click", 1.0, None),        # NULL props
                (900002, _ts(1704067201), 1, "click", 1.0, "null"),      # JSON null
                (900003, _ts(1704067202), 2, "error", 1.0, "not json"),  # garbage
                (900004, _ts(1704067203), 2, "error", 1.0, '{"x": 5}'),  # no "k"
                (900005, _ts(1704067204), 3, None, None, '{"k": "abc"}'),# non-int k
                # poisoned money values: under ANSI a plain
                # round(v*100)::BIGINT cast ABORTS the whole job on any
                # of these three; the cents() try_cast contract degrades
                # them to NULL instead (operators/_util.py)
                (900006, _ts(1704067205), 4, "purchase", 1e300, "{}"),   # overflow
                (900007, _ts(1704067206), 4, "view", float("nan"), "{}"),
                (900008, _ts(1704067207), 4, "click", float("inf"), "{}"),
                # NULL ts rows: must land in the hive default partition
                # (scan_partition_pruning), never positionally pair in
                # the as-of windows (join_asof_forward/backward filter
                # them — NULLs sort first ascending in Spark while an
                # oracle ts comparison never matches NULL), and stay
                # out of time-keyed aggregates. One error and one click
                # on users that HAVE real counterparts, so a missing
                # filter would actually mispair.
                (900009, None, 1, "error", 1.0, "{}"),    # NULL-ts error
                (900010, None, 2, "click", 1.0, "{}"),    # NULL-ts click
            ],
            ev.schema,
        )
    )
    _flatten(spark, dirty_ev, d, "events")
    return str(d)


@pytest.mark.parametrize("name", DIRTY_QUERIES)
def test_query_survives_dirty_corpus(spark, dirty_dir, name):
    df = all_specs()[name].builder(spark, dirty_dir)
    df.write.format("noop").mode("overwrite").save()  # must not raise
