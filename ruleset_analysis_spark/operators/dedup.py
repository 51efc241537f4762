"""§2.G — deduplication operators over ``documents`` / ``embeddings``.

The LLM-data-pipeline dedup ladder (BASELINE.json north star):

* exact        — hash-groupBy (one shuffle keyed on content hash)
* MinHash+LSH  — shingle → signature → band-bucket join (candidate
                 generation WITHOUT the O(n²) pair explosion)
* SimHash      — 64-bit sketch + banded Hamming join
* n-gram Jaccard — shared-shingle candidate join + exact verification
* embedding cosine — label-blocked near-dup pairs (see similarity.py
                 for the generic pairwise machinery)

Scale notes: every near-dup operator generates candidates through a
*blocking key* equi-join (LSH band, SimHash band, shared shingle,
label) so the shuffle is keyed and bounded; nothing ever materializes
all n² pairs. Hash functions are Spark's built-in ``xxhash64``
(JVM-side, deterministic for a fixed Spark version) — cross-engine
hash-unstable, hence rows-only grading where signatures surface.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import tokens, word_shingles
from ..plans.registry import register
from ..sources.parquet import load

# MinHash configuration: 16 permutations in 4 bands of 4 rows.
# Fixed seed list → deterministic signatures run-to-run.
_MH_SEEDS = list(range(1, 17))
_MH_BANDS = 4
_MH_ROWS = 4
_SHINGLE_K = 3


@register(
    "dedup_exact",
    category="dedup",
    oracle="""
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, keep-lowest-id: group on a 256-bit content hash (at
    100 TB one shuffles 32-byte digests, not document bodies — the
    oracle groups raw text, which is equivalent barring a SHA-256
    collision)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.sha2("text", 256).alias("content_hash"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "n_copies")
    )


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "source",
        word_shingles(tokens("text"), _SHINGLE_K).alias("shingles"),
    ).filter(F.size("shingles") > 0)


@register(
    "dedup_near_minhash",
    category="dedup",
    oracle=None,  # rows-only: xxhash64 signatures are engine-specific
)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH, pure DataFrame ops.

    shingle(k=3) → 16 minhashes → 4 bands of 4 → equi-join on
    (band_id, band_hash) for candidates → exact Jaccard verification on
    the candidate set only, keep ≥ 0.5. Candidate generation is an
    equi-join on the band hash — the LSH trick that makes near-dedup a
    keyed shuffle instead of an all-pairs product."""
    from ..functions.text import minhash_signature

    sig = _shingled(spark, sf_dir).select(
        "doc_id", "shingles", minhash_signature(F.col("shingles"), _MH_SEEDS).alias("sig")
    )
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.hash(F.slice("sig", b * _MH_ROWS + 1, _MH_ROWS)).alias(
                            "band_hash"
                        ),
                    )
                    for b in range(_MH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    sh = _shingled(spark, sf_dir).select("doc_id", "shingles")
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = (F.size("sa") + F.size("sb") - F.size(F.array_intersect("sa", "sb"))).cast(
        "double"
    )
    return (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb")), "doc_b")
        .select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


@register(
    "dedup_simhash",
    category="dedup",
    oracle=None,  # rows-only: xxhash64-derived sketch
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup pairs with banded Hamming search.

    The sketch is computed per document with nested higher-order
    functions (no shuffle): bit i of the sketch is the sign of
    Σ_tokens (±1 by bit i of xxhash64(token)). Pairs are blocked on
    16-bit bands (Hamming ≤ 3 ⇒ at least one of 4 bands equal) and
    verified with ``bit_count(xor) <= 3``."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(tokens("text")).alias("toks")
    )
    simhash = F.expr(
        """
        aggregate(
            sequence(0, 63), 0L,
            (s, i) -> s + IF(
                aggregate(toks, 0L,
                    (acc, t) -> acc + IF((shiftright(xxhash64(t), i) & 1) = 1, 1L, -1L)
                ) > 0,
                shiftleft(1L, i), 0L))
        """
    )
    sk = d.select("doc_id", simhash.alias("simhash"))
    bands = sk.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_id"),
                        F.shiftright("simhash", 16 * k)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_id", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= 3)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
    )


@register(
    "dedup_ngram_jaccard",
    category="dedup",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source,
                   unnest(string_split(lower(text), ' ')) AS term,
                   generate_subscripts(string_split(lower(text), ' '), 1) AS i
            FROM documents
        ),
        tri AS (
            SELECT DISTINCT t1.doc_id, t1.source,
                   t1.term || ' ' || t2.term || ' ' || t3.term AS tri
            FROM toks t1
            JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1
            JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.i = t1.i + 2
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM tri a JOIN tri b
              ON a.tri = b.tri AND a.source = b.source AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT inter.doc_a, inter.doc_b,
               CAST(inter.i AS DOUBLE) / (sa.n + sb.n - inter.i) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = inter.doc_a
        JOIN sizes sb ON sb.doc_id = inter.doc_b
        WHERE CAST(inter.i AS DOUBLE) / (sa.n + sb.n - inter.i) >= 0.02
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram Jaccard pairs (≥ 0.02) with *shared-shingle candidate
    generation*: pairs are produced by joining docs on a common trigram
    (within the same ``source`` block), so disjoint docs never meet —
    the exact-Jaccard analog of LSH blocking. Counts are integers, so
    jaccard is an exact rational and hash-stable cross-engine."""
    tri = _shingled(spark, sf_dir).select(
        "doc_id", "source", F.explode("shingles").alias("tri")
    )
    sizes = tri.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = tri.alias("a"), tri.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tri") == F.col("b.tri"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .filter(jac >= 0.02)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


@register(
    "dedup_embedding_cosine",
    category="dedup",
    oracle="""
        WITH elem AS (
            SELECT vec_id, label,
                   CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ),
        nrm AS (SELECT vec_id, sqrt(sum(x * x)) AS n FROM elem GROUP BY vec_id),
        dots AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
                   sum(a.x * b.x) AS d
            FROM elem a JOIN elem b
              ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
            GROUP BY a.vec_id, b.vec_id, a.label
        )
        SELECT d.vec_a, d.vec_b, d.label,
               round(d.d / (na.n * nb.n), 6) AS cos
        FROM dots d
        JOIN nrm na ON na.vec_id = d.vec_a
        JOIN nrm nb ON nb.vec_id = d.vec_b
        WHERE d.d / (na.n * nb.n) >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-duplicates: label-blocked pairs with cosine
    ≥ 0.9. Spark computes the dot product as a per-pair higher-order
    fold (no element explosion); the oracle unnests — both accumulate
    in double and agree after 6dp rounding."""
    from ..functions.vectors import as_double, cosine

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    a, b = e.alias("a"), e.alias("b")
    cos = cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= 0.4)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round(cos, 6).alias("cos"),
        )
    )
