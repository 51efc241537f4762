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

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

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


@register(
    "sample_topk_reservoir",
    category="sampling",
    oracle="""
        SELECT lang, doc_id FROM (
            SELECT lang, doc_id,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY md5(text), doc_id) AS rnk
            FROM documents
        ) WHERE rnk <= 20
    """,
)
def sample_topk_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size sample per stratum: the 20 documents
    with the smallest content hash in each language — a reservoir
    sample whose 'randomness' is the hash order, so it is reproducible,
    merge-stable (adding documents can only displace, never reshuffle)
    and needs no RNG state.

    Scale shape: rank-≤-k over a partitioned window plans as
    WindowGroupLimit in Spark 4 — per-partition k-element heaps
    pushed below the exchange, so each stratum ships at most k
    candidates per input partition instead of sorting the corpus.
    doc_id breaks the (practically impossible) hash tie
    deterministically."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5("text"), "doc_id")
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 20)
        .select("lang", "doc_id")
    )


@register(
    "sample_importance_weighted",
    category="sampling",
    oracle="""
        SELECT doc_id, n_chars,
               round(least(1.0, n_chars / 400.0), 6) AS p_keep
        FROM documents
        WHERE text IS NOT NULL AND n_chars IS NOT NULL
          AND CAST(CAST(concat('0x', substring(md5(text), 1, 15))
                   AS BIGINT) AS DOUBLE) / 1152921504606846976.0
              < least(1.0, n_chars / 400.0)
    """,
)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMPORTANCE-weighted deterministic sampling: each document's
    acceptance probability is its OWN weight (here length-proportional,
    capped at 1 — the token-weighted doc sampling move that makes a
    uniform-over-docs sample behave like a uniform-over-tokens one),
    decided by the same content-hash uniform as the rate-based
    samplers. Completes the sampling family's third axis: global rate
    (``sample_hash_deterministic``) → per-stratum rate
    (``sample_stratified_hash``) → per-ROW weight (this).

    Exactness: u is the 60-bit md5 prefix scaled by 2⁻⁶⁰ (exact in a
    double) and the weight divides an exact integer by 400.0 — one
    IEEE comparison, identical both engines, no RNG, reproducible
    under re-runs/appends/engine swaps. NULL text or NULL n_chars
    drops (under-sampling, never a crash — dirty-data convention).

    Scale: pure per-row expression algebra inside codegen on ONE scan;
    the predicate pushes to the parquet reader's row-group pruning for
    the NULL gates. No shuffle at any scale."""
    d = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    u = F.expr(
        "CAST(CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)"
        " AS DOUBLE)"
    ) / F.lit(float(2**60))
    p = F.least(F.lit(1.0), F.col("n_chars") / F.lit(400.0))
    return d.filter(u < p).select(
        "doc_id", "n_chars", F.round(p, 6).alias("p_keep")
    )
