"""§2 addendum — deterministic sampling for training-data pipelines.

Random sampling (``df.sample``) is the wrong tool for corpus curation:
re-running the pipeline must reproduce the same split, adding data must
not reshuffle earlier decisions, and the keep/drop verdict for a
document must be derivable from the document alone (so dedup, filtering
and sampling compose in any order). The standard idiom is
*content-hash bucketing*: hash a stable key, keep the rows whose hash
falls in the sampled bucket range. Pure expression algebra — no RNG, no
state, pushes into the scan, identical on any engine that agrees on
md5 (all of them).

Scale notes: the predicate is a per-row hash + compare inside
whole-stage codegen — no shuffle, no sort, trivially parallel, and at
100 TB the sample rate is enforced *exactly per content*, not
approximately per partition like ``df.sample``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from ..sources.parquet import load


@register(
    "sample_hash_deterministic",
    category="sampling",
    oracle="""
        SELECT doc_id, source, lang
        FROM documents
        WHERE substr(md5(text), 1, 1) IN ('0', '1', '2', '3')
    """,
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~25% content-hash sample: keep documents whose md5(text) starts
    with 0-3 (4 of 16 hex buckets). Re-runs, engine swaps, and corpus
    growth all preserve membership — the reproducible train/eval split
    primitive."""
    d = load(spark, sf_dir, "documents")
    return d.filter(
        F.substring(F.md5("text"), 1, 1).isin("0", "1", "2", "3")
    ).select("doc_id", "source", "lang")


@register(
    "sample_stratified_hash",
    category="sampling",
    oracle="""
        SELECT doc_id, lang
        FROM documents
        WHERE (lang = 'en' AND substr(md5(text), 1, 1) IN
                   ('0','1','2','3','4','5','6','7'))
           OR (lang <> 'en' AND substr(md5(text), 1, 1) IN ('0','1'))
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample: different rates per stratum
    (50% of English, 12.5% of everything else — the downsample-the-
    majority-language move every multilingual corpus makes), still
    content-hash bucketed so membership is reproducible. The per-
    stratum rate is data, not code: at scale this predicate would be
    generated from a rates table and broadcast-joined; here the two
    strata inline into one codegen predicate."""
    d = load(spark, sf_dir, "documents")
    bucket = F.substring(F.md5("text"), 1, 1)
    en_keep = (F.col("lang") == "en") & bucket.isin(*"01234567")
    rest_keep = (F.col("lang") != "en") & bucket.isin("0", "1")
    return d.filter(en_keep | rest_keep).select("doc_id", "lang")
