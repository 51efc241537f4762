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

# every registered query that reads documents, embeddings, or events
DIRTY_QUERIES = [
    "dedup_exact", "dedup_near_minhash", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_embedding_cosine", "sim_cosine_topk", "sim_pairwise_threshold",
    "sim_ann_lsh", "text_tokenize_counts", "text_lang_stats",
    "text_langid_heuristic", "text_quality_score", "text_token_count",
    "text_fingerprint", "text_rolling_fingerprint", "multimodal_join",
    "embed_array_stats", "multimodal_binary_features", "multimodal_frame_sample",
    "multimodal_resize", "json_extract", "string_regex_extract", "map_funcs",
    "udtf_split_props", "udtf_python_native", "udf_scalar_pandas",
    "udaf_grouped_pandas", "array_funcs", "agg_collect_sorted",
    # round-2 additions over the same tables
    "dedup_cluster_components", "sim_pairwise_bucketed", "text_normalize",
    "text_pii_redact", "sample_hash_deterministic", "sample_stratified_hash",
    "funnel_ordered_steps", "agg_quantiles_approx",
    # curation ops over documents (empty/NULL-text rows must chunk to
    # zero rows, not abort)
    "text_repetition_ratio", "text_contamination_ngram",
    "doc_chunk_fixed_tokens", "pack_greedy_bins", "text_rarity_score",
    "event_transition_matrix", "embed_pca_project",
    "profile_corpus_columns", "event_anomaly_mad", "event_scd2_intervals",
    "window_gaps_islands", "window_rate_limit_quota",
    "text_collocations_lift", "event_time_weighted_avg",
    "embed_centroid_per_label", "dedup_containment",
    "event_path_3gram", "event_cdc_upsert", "agg_heavy_hitters_topk",
    "json_variant_extract",
    # round-3 additions over the same tables
    "stream_late_data_policy", "event_interpolate_linear", "window_ewma",
    "text_diversity_simpson", "text_zipf_slope", "sample_topk_reservoir",
    "dedup_weighted_jaccard", "agg_bitmap_distinct", "curation_mix_weights",
    "text_bigram_surprisal", "event_concurrency_sweep",
    # round-3 session additions over the same tables
    "agg_countmin_sketch", "dedup_minhash_estimate",
    "embed_kmeans_clusters", "dedup_cluster_representatives",
    "firewall_rule_staleness", "stream_lateness_histogram",
    "graph_link_prediction", "agg_bitmap_overlap",
    "multimodal_audio_energy",
    # round-4 additions over the same tables (NULL ts rows must land in
    # the hive default partition and never match the busy-day join;
    # NULLs and degenerate text must survive the CSV/JSONL round-trips)
    "scan_partition_pruning",
    "scan_csv_roundtrip",
    "scan_jsonl_roundtrip",
    "agg_linear_regression",
    "doc_chunk_overlap",
    "curation_sample_apply",
    "funnel_conversion_lag",
    "multimodal_dhash_fingerprint",
]


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
