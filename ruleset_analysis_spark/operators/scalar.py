"""§2.B — projections, filters, scalar functions.

Reference analog: per-line Python lambdas + regex over syslog text
([R-mem] ``analyze_ruleset.py``: ``filter(lambda line: '106100' in
line)`` then ``re.search`` group extraction). Every op here is a JVM
built-in inside whole-stage codegen — zero Python in the row path.

Float-stability rules (SURVEY §5.4): any computed double that feeds the
oracle hash is rounded identically on both sides (2dp money, 6dp
ratios/logs); pure per-row IEEE arithmetic is bit-identical between
Spark and DuckDB so rounding is only needed where libm or accumulation
order can drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..plans.registry import register
from ..sources.parquet import load
from ._util import cents


@register(
    "project_arithmetic",
    category="scalar",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS net_revenue
        FROM lineitem
    """,
)
def project_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounded to 6dp, not 2: the product of three 2dp values has ≤6 true
    decimals, so 6dp rounding is tie-free — at 2dp the abundant exact
    x.xx5 ties round differently in Spark (decimal-string HALF_UP) vs
    DuckDB (scaled-double)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6
        ).alias("net_revenue"),
    )


@register(
    "filter_equality",
    category="scalar",
    oracle="""
        SELECT event_id, user_id, value, date_trunc('second', ts) AS ts_sec
        FROM events WHERE event_type = 'error'
    """,
)
def filter_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference analog: keep only ASA message-ID 106100 lines [R-mem]."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "value", F.date_trunc("second", "ts").alias("ts_sec")
    )


@register(
    "filter_conjunction",
    category="scalar",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE (o_orderstatus IN ('F', 'P') AND o_totalprice > 150000)
           OR (NOT (o_orderpriority LIKE '1%') AND o_totalprice <= 5000)
    """,
)
def filter_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    pred = (F.col("o_orderstatus").isin("F", "P") & (F.col("o_totalprice") > 150000)) | (
        ~F.col("o_orderpriority").like("1%") & (F.col("o_totalprice") <= 5000)
    )
    return o.filter(pred).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


@register(
    "filter_range",
    category="scalar",
    oracle="""
        SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1996-12-31 00:00:00'
    """,
)
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-window slice — the reference's month-range log selection [R-mem]."""
    li = load(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-12-31 00:00:00").cast("timestamp_ntz")
    return li.filter(F.col("l_shipdate").between(lo, hi)).select(
        "l_orderkey", "l_linenumber", F.to_date("l_shipdate").alias("ship_date")
    )


@register(
    "filter_null_handling",
    category="scalar",
    oracle="""
        SELECT l_returnflag,
               count(*) AS n_total,
               count(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 END) AS n_zero_disc,
               CAST(sum(coalesce(nullif(TRY_CAST(round(l_discount * 100) AS BIGINT),
                                        0), 5)) AS BIGINT)
                   / 100.0 / count(*) AS avg_disc_subst
        FROM lineitem GROUP BY l_returnflag
    """,
)
def filter_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics (the corpus has no physical NULLs, so they are
    manufactured with nullif): IS NULL counting skips, coalesce defaults."""
    li = load(spark, sf_dir, "lineitem")
    d = F.nullif(F.col("l_discount"), F.lit(0.0))
    d_cents = F.coalesce(F.nullif(cents("l_discount"), F.lit(0)), F.lit(5))
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(d.isNull(), 1)).alias("n_zero_disc"),
        # tie-free avg: sum exact BIGINT cents (order-independent), then
        # divide — both engines divide identical values by identical counts
        (F.sum(d_cents) / F.lit(100.0) / F.count(F.lit(1))).alias(
            "avg_disc_subst"
        ),
    )


@register(
    "string_regex_extract",
    category="scalar",
    oracle=r"""
        SELECT event_id,
               CAST(nullif(regexp_extract(props, '"k":\s*(\d+)', 1), '')
                    AS BIGINT) AS k
        FROM events
    """,
)
def string_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE core reference op: regex group extraction from a log payload
    ([R-mem] ``analyze_ruleset.py`` pulls ACL name + rule id from each
    syslog line). JVM regex, not a Python UDF.

    ``regexp_extract`` returns '' on no-match, and ``CAST('' AS
    BIGINT)`` ABORTS under ANSI mode (both engines) — nullif on both
    sides so a payload without ``k`` degrades to NULL."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.nullif(F.regexp_extract("props", r'"k":\s*(\d+)', 1), F.lit(""))
        .cast("bigint")
        .alias("k"),
    )


@register(
    "string_funcs",
    category="scalar",
    oracle="""
        SELECT c_custkey,
               upper(c_name) AS uname,
               lower(c_mktsegment) AS lseg,
               substring(c_name, 1, 5) AS name_pre,
               length(c_name) AS name_len,
               concat_ws('-', c_mktsegment, c_name) AS tag
        FROM customer
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 1, 5).alias("name_pre"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("tag"),
    )


@register(
    "string_like",
    category="scalar",
    oracle="""
        SELECT p_partkey, p_name
        FROM part
        WHERE p_name LIKE '%ar%' AND p_name NOT LIKE 'z%'
    """,
)
def string_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring matching — reference analog: ``'%ASA-6-106100%' in line``
    pre-filter before the expensive regex [R-mem]."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%ar%") & ~F.col("p_name").like("z%")
    ).select("p_partkey", "p_name")


@register(
    "date_funcs",
    category="scalar",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mo,
               CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
                   AS days_since
        FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing — reference analog: hits-per-day time series
    [R-mem]. Note DuckDB dayofweek is 0=Sunday vs Spark 1=Sunday; the
    oracle shifts by +1."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
    )


@register(
    "math_funcs",
    category="scalar",
    oracle="""
        SELECT o_orderkey,
               round(o_totalprice / 7, 2) AS sev,
               round(abs(o_totalprice - 100000), 2) AS dist,
               CAST(floor(o_totalprice) AS BIGINT) AS fl,
               CAST(ceil(o_totalprice) AS BIGINT) AS ce,
               round(sqrt(o_totalprice), 6) AS sq,
               round(ln(o_totalprice), 6) AS lg,
               round(pow(o_totalprice / 1000, 2), 6) AS pw
        FROM orders
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(p / 7, 2).alias("sev"),
        F.round(F.abs(p - 100000), 2).alias("dist"),
        F.floor(p).alias("fl"),
        F.ceil(p).alias("ce"),
        F.round(F.sqrt(p), 6).alias("sq"),
        F.round(F.log(p), 6).alias("lg"),
        F.round(F.pow(p / 1000, 2), 6).alias("pw"),
    )


@register(
    "conditional_case",
    category="scalar",
    oracle="""
        SELECT CASE WHEN o_totalprice > 200000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END AS tier,
               count(*) AS n_orders,
               CAST(sum(TRY_CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   / 100.0 AS total
        FROM orders GROUP BY 1
    """,
)
def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("tier")
    )
    return o.groupBy(tier).agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(cents("o_totalprice")) / F.lit(100.0)).alias("total"),
    )


@register(
    "json_extract",
    category="scalar",
    oracle="""
        SELECT event_id,
               CASE WHEN regexp_matches(json_extract_string(props, '$.k'),
                                        '^-?[0-9]+$')
                    THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
               END AS k
        FROM events
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload access (``events.props`` is a JSON string).

    Typed extraction carries a STRICT integer contract, enforced with a
    regex guard on the extracted string on BOTH engines: a ``k`` that is
    not an integral JSON literal (``28.0``, ``true``, ``"txt"``) is NULL,
    never a coercion. Neither engine's native string→BIGINT cast is a
    safe meeting point — Spark's ``try_cast('28.0')`` is NULL while
    DuckDB's ``TRY_CAST('28.5')`` *rounds to 29* (measured) — so the
    regex is the only semantics both engines express identically; the
    regeneration-fuzz sweep (scripts/fuzz_sweep.py) caught exactly this
    on a corpus with float-valued ``k``. A non-integral payload degrades
    to NULL instead of an ANSI CAST abort either way."""
    ev = load(spark, sf_dir, "events")
    s = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        # try_cast, not cast: an integral literal past the BIGINT range
        # passes the regex but must degrade to NULL (both engines' TRY
        # forms do), not raise under ANSI mode
        F.when(s.rlike("^-?[0-9]+$"), s.try_cast("bigint")).alias("k"),
    )


@register(
    "json_variant_extract",
    category="scalar",
    oracle="""
        SELECT event_id,
               CASE WHEN regexp_matches(json_extract_string(props, '$.k'),
                                        '^-?[0-9]+$')
                    THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
               END AS k,
               json_extract_string(props, '$.absent') AS missing,
               (TRY_CAST(props AS JSON) IS NOT NULL) AS valid
        FROM events
    """,
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4's VARIANT type: ``props`` is
    parsed ONCE into the binary variant encoding and every field access
    is an O(1) lookup into that encoding — versus ``json_extract``
    (sibling query), whose ``get_json_object`` re-parses the JSON text
    on every extraction. At 100 TB with wide payloads and many
    extracted fields, parse-once-extract-many is the difference between
    one scan-time parse and k of them; VARIANT also pushes into shreds
    on parquet write (Spark 4 variant shredding).

    ``try_parse_json`` degrades malformed payloads to NULL and
    ``try_variant_get`` degrades type-mismatched values (``"k": "abc"``
    where a BIGINT is asked) the same way — the dirty-corpus contract:
    one bad row must never abort a job; the plain ``variant_get`` form
    raises INVALID_VARIANT_CAST on exactly that row. The
    oracle reproduces the same semantics with DuckDB's JSON functions
    (TRY_CAST to JSON for validity, json_extract_string for access).

    ``k`` carries the same strict integral-literal contract as
    ``json_extract``, expressed in each engine's own type system: the
    oracle regex-guards the extracted JSON string (``'17'`` passes,
    ``'17.0'``/``'true'`` don't), while the Spark side gates on
    ``schema_of_variant(...) = 'BIGINT'`` — the VARIANT encoder types a
    JSON integer literal as BIGINT and canonicalizes ``17.0`` to
    DECIMAL(2,0) (measured; its *string* form is ``'17'``, so a
    string-side regex can NOT distinguish them — the regeneration-fuzz
    sweep caught exactly that). A direct untyped
    ``try_variant_get(..., 'bigint')`` is wrong the other way,
    coercing doubles/bools 5.0→5, true→1. An integral literal past the
    BIGINT range types as DECIMAL(20,0) (Spark → NULL) and TRY_CASTs
    to NULL in DuckDB — agreeing there too."""
    ev = load(spark, sf_dir, "events")
    v = F.expr("try_parse_json(props)")
    return ev.select(
        "event_id",
        F.when(
            F.expr(
                "schema_of_variant(try_variant_get(try_parse_json(props), '$.k'))"
            )
            == "BIGINT",
            F.expr(
                "try_variant_get(try_parse_json(props), '$.k', 'bigint')"
            ),
        ).alias("k"),
        F.expr(
            "try_variant_get(try_parse_json(props), '$.absent', 'string')"
        ).alias("missing"),
        v.isNotNull().alias("valid"),
    )


@register(
    "array_funcs",
    category="scalar",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INTEGER) AS dim,
               round(CAST(embedding[1] AS DOUBLE), 6) AS e1,
               round(CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
                     + CAST(embedding[3] AS DOUBLE), 6) AS s3
        FROM embeddings
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")

    def el(i: int):
        # try_element_at: NULL past the end (matching DuckDB's
        # embedding[i]) instead of an ANSI INVALID_ARRAY_INDEX abort on
        # a short/malformed vector
        return F.try_element_at("embedding", F.lit(i)).cast("double")

    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(el(1), 6).alias("e1"),
        F.round(el(1) + el(2) + el(3), 6).alias("s3"),
    )


@register(
    "array_explode",
    category="scalar",
    oracle="""
        SELECT doc_id, token FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        ) WHERE token <> ''
    """,
)
def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-shaped lateral expansion: one row per token. Basis of all
    §2.G text analysis."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")


@register(
    "map_funcs",
    category="scalar",
    oracle="""
        SELECT event_id,
               array_to_string(json_keys(props), ',') AS keys,
               CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
               CASE WHEN regexp_matches(json_extract_string(props, '$.k'),
                                        '^-?[0-9]+$')
                    THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
               END AS k_val
        FROM events
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props JSON → MapType, then map_keys/map_values/size. Keys keep
    document order in both engines.

    The map parses values as STRING, not LONG: with a typed value
    ``from_json`` nulls the whole map whenever ANY value fails coercion
    (``{"k": 3.5}``, ``{"k": "txt"}``), so key listing would depend on
    value types — DuckDB's ``json_keys`` has no such coupling (fuzz-
    sweep finding). ``keys`` is guarded to stay NULL for a NULL map
    (``concat_ws`` otherwise collapses NULL input to ''); ``k_val``
    carries the ``json_extract`` integral-literal contract. ``keys`` is
    NULL for both a NULL map AND a zero-key map — DuckDB's
    ``array_to_string([])`` is NULL (measured), so '' for ``{}`` has no
    portable SQL spelling and NULL is the common ground."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.StringType()))
    kv = F.element_at(m, "k")
    return ev.select(
        "event_id",
        F.when(
            F.size(F.map_keys(m)) > 0, F.concat_ws(",", F.map_keys(m))
        ).alias("keys"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.when(kv.rlike("^-?[0-9]+$"), kv.try_cast("bigint")).alias("k_val"),
    )


@register(
    "string_distance",
    category="scalar",
    oracle="""
        SELECT n_name,
               levenshtein(n_name, 'GERMANY') AS lev_germany,
               CAST(hamming('ABCD', substring(n_name || 'XXXX', 1, 4)) AS INTEGER)
                   AS ham4
        FROM nation
    """,
)
def string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance functions (fuzzy matching / data cleaning):
    Levenshtein against a fixed probe and a fixed-width Hamming
    distance — both JVM built-ins with DuckDB twins."""
    n = load(spark, sf_dir, "nation")
    padded = F.substring(F.concat("n_name", F.lit("XXXX")), 1, 4)
    ham = (
        F.aggregate(
            F.zip_with(
                F.split(F.lit("ABCD"), ""),
                F.split(padded, ""),
                lambda a, b: F.when(a != b, 1).otherwise(0),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
    )
    return n.select(
        "n_name",
        F.levenshtein("n_name", F.lit("GERMANY")).alias("lev_germany"),
        ham.cast("int").alias("ham4"),
    )
