"""§2 addendum — TPC-H composite analytics (Q3/Q5/Q6/Q10 shapes).

The single-operator queries in §2.B-§2.F grade each relational
primitive in isolation; these four grade their *composition* — the
multi-join, filter-heavy, top-k-reporting shapes every warehouse
workload reduces to, adapted to this corpus's column subset (no
partsupp table; no o_shippriority / l_shipmode / l_commitdate
columns — predicates substitute date/priority columns that exist).

Plan discipline, asserted by tests/test_plan_shape.py:

* dimension joins (region, nation, customer-side of Q5) are explicit
  ``F.broadcast`` — at 100 TB the fact table never shuffles for a
  dimension;
* filters sit on the base relations BEFORE joins so Catalyst pushes
  them into the parquet scans (PushedFilters) and prunes columns;
* top-k reporting plans as TakeOrderedAndProject (per-partition
  heaps + tiny driver merge), never a global sort.

Reference provenance: the public reference [R-mem, SURVEY.md §0] has
no multi-join surface; extension per the §2.G charter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from ..sources.parquet import load
from ._util import cents

def _revenue_cents():
    # Exact-cents discipline: per-line revenue is floored to integer
    # cents BEFORE summing, so the aggregate is an order-independent
    # BIGINT sum — a double sum's value depends on partial-aggregation
    # order, and at a round(,2) boundary Spark and the oracle (or two
    # cluster runs!) can disagree by one ULP. floor of the identical
    # per-line double is bit-deterministic on both engines. Built
    # lazily: Column construction needs an active SparkContext in
    # PySpark 4, and operator modules import before the session exists.
    return F.floor(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        * F.lit(100.0)
    ).cast("long")


@register(
    "tpch_q3_shipping_priority",
    category="composite",
    oracle="""
        SELECT l_orderkey,
               CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100.0)
                             AS BIGINT)) AS BIGINT) AS revenue_cents,
               o_orderdate
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < DATE '1996-01-01'
          AND l_shipdate  > DATE '1996-01-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue_cents DESC, l_orderkey
        LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped-revenue orders for one market
    segment. Segment and date predicates are applied to the base
    relations (pushed into all three scans); the filtered customer
    side is a key-list broadcast into orders; top-10 is
    TakeOrderedAndProject."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1996-01-01"
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1996-01-01"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_revenue_cents()).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue_cents", "o_orderdate")
    )


@register(
    "tpch_q5_local_supplier",
    category="composite",
    oracle="""
        SELECT n_name,
               CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100.0)
                             AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= DATE '1996-01-01'
          AND o_orderdate <  DATE '1997-01-01'
        GROUP BY n_name
    """,
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the supplier is LOCAL to
    the customer (c_nationkey = s_nationkey — the join that makes Q5
    interesting: it correlates two different dimension paths of the
    same fact row). region→nation→supplier collapses to one broadcast
    before touching lineitem; customer broadcasts into orders. The
    only fact-table exchange is the final groupBy on nation."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    # dimension path: suppliers in ASIA nations, with nation name
    sn = s.join(
        F.broadcast(
            n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
                "n_nationkey", "n_name"
            )
        ),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(sn),
            (li.l_suppkey == sn.s_suppkey)
            & (c.c_nationkey == sn.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(_revenue_cents()).alias("revenue_cents"))
    )


@register(
    "tpch_q6_forecast_revenue",
    category="composite",
    oracle="""
        SELECT CAST(sum(CAST(floor((l_extendedprice * l_discount) * 100.0)
                             AS BIGINT)) AS BIGINT) AS revenue_cents,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate <  DATE '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, the query that
    benchmarks predicate pushdown + whole-stage codegen with zero
    joins and zero shuffles (single global agg over partials). All
    three predicates reach the parquet reader as PushedFilters."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.floor(
                    (F.col("l_extendedprice") * F.col("l_discount"))
                    * F.lit(100.0)
                ).cast("long")
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q10_returned_items",
    category="composite",
    oracle="""
        SELECT c_custkey, c_name, n_name,
               CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100.0)
                             AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= DATE '1996-01-01'
          AND o_orderdate <  DATE '1996-04-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue_cents DESC, c_custkey
        LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-merchandise
    revenue in one quarter. Returnflag filter pushes into the lineitem
    scan; customer⋈nation is a broadcast dimension; top-20 is
    TakeOrderedAndProject on the aggregated (small) relation."""
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", "n_name"
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1996-04-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cn), o.o_custkey == cn.c_custkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue_cents()).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue_cents")
    )


@register(
    "tpch_q7_volume_shipping",
    category="composite",
    oracle="""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100.0)
                             AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
        GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year — the query that correlates BOTH dimension paths of the
    same fact row (supplier nation × customer nation) under a
    disjunctive pair predicate.

    Scale shape: each nation dimension is pre-filtered to the two
    nations of interest BEFORE broadcasting, so the supplier and
    customer build sides shrink to ~2/25 of their size and most fact
    rows die in the two broadcast joins; the OR-pair residual runs on
    the survivors only. The fact table shuffles once, for the final
    groupBy."""
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").between("1995-01-01", "1996-12-31"))
        .select(
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
            "l_shipdate",
        )
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_revenue_cents()).alias("revenue_cents"))
    )


@register(
    "tpch_q9_product_profit",
    category="composite",
    oracle="""
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100.0)
                             AS BIGINT)
                        - CAST(round(p_retailprice * 100) AS BIGINT)
                          * CAST(l_quantity AS BIGINT) / 2)
                    AS BIGINT) AS profit_cents
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, o_year
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for one
    product family. The corpus has no partsupp, so unit cost is proxied
    as half the part's retail price (documented adaptation) — the join
    topology (fact ⋈ part ⋈ supplier ⋈ orders ⋈ nation, LIKE filter on
    the part dimension) is the point.

    Exactness: profit = revenue_cents − cost_cents·quantity/2, all
    BIGINT (quantity is integer-valued; integer division by 2 is
    identical both engines), so the per-nation-year sum is
    order-independent. part is filtered by the LIKE before its
    broadcast; only the order-date year survives the orders join."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    profit = (
        _revenue_cents()
        - F.round(F.col("p_retailprice") * 100).cast("long")
        * F.col("l_quantity").cast("long")
        / F.lit(2)
    ).cast("long")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).alias("profit_cents"))
    )


@register(
    "tpch_q13_order_distribution",
    category="composite",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority NOT LIKE '4%'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    including the zero bucket — the left-outer + conditional join
    predicate + double aggregation idiom (o_comment NOT LIKE adapted to
    the priority column this corpus has).

    Scale shape: the join predicate filters orders BEFORE the join (so
    the filter pushes into the scan), the left join preserves
    order-less customers, count(o_orderkey) skips the NULLs a bare
    count(*) would miscount, and the second aggregate runs on an
    already customer-sized relation."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(~F.col("o_orderpriority").like("4%"))
        .select("o_orderkey", "o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "tpch_q14_promo_revenue",
    category="composite",
    oracle="""
        SELECT round(
                   100.0 * sum(CASE WHEN p_type = 'PROMO'
                                    THEN CAST(floor((l_extendedprice
                                                     * (1 - l_discount)) * 100.0)
                                             AS BIGINT)
                                    ELSE 0 END)
                   / sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100.0)
                              AS BIGINT)),
                   6) AS promo_revenue_pct
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= DATE '1996-09-01'
          AND l_shipdate <  DATE '1996-10-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from promotional
    parts — conditional aggregation over a broadcast dimension join,
    emitting one ratio row.

    Exactness: both numerator and denominator are BIGINT cent sums
    (order-independent); the output is a single double division of two
    exact integers, rounded 6dp — bit-identical both engines."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-09-01")
            & (F.col("l_shipdate") < "1996-10-01")
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    rev = _revenue_cents()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q15_top_supplier",
    category="composite",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount))
                                       * 100.0) AS BIGINT)) AS BIGINT)
                       AS total_revenue_cents
            FROM lineitem
            WHERE l_shipdate >= DATE '1996-01-01'
              AND l_shipdate <  DATE '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue_cents
        FROM supplier
        JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue_cents = (
            SELECT max(total_revenue_cents) FROM revenue
        )
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue
    — an aggregate-then-argmax-over-the-aggregate composite (the
    reference view + scalar subquery formulation).

    Scale shape: revenue is one fact-table aggregate keyed by supplier
    (supplier-cardinality output); the scalar max is computed on that
    SMALL relation and broadcast back as a literal-sized join (never a
    window over an unpartitioned fact), so ties are kept exactly as
    Q15 demands. Integer cents make 'equals max' an exact predicate —
    no float-equality trap."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue_cents()).alias("total_revenue_cents")
    )
    mx = rev.agg(F.max("total_revenue_cents").alias("_mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue_cents == mx._mx)
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue_cents")
    )


@register(
    "tpch_q16_supplier_variety",
    category="composite",
    oracle="""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#5'
          AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_name LIKE '%77%'
          )
        GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can deliver each
    (brand, type, size) — distinct-count over a filtered dimension
    join, minus a complained-about supplier exclusion list (partsupp
    adapted to lineitem as the part↔supplier bridge).

    Scale shape: both dimension predicates are pushed into the part
    scan before its broadcast; the exclusion list is a broadcast
    left-anti join (s_suppkey is never NULL here, so anti ≡ NOT IN);
    count(DISTINCT) expands to Catalyst's two-phase exact distinct."""
    p = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%77%"))
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q18_large_orders",
    category="composite",
    oracle="""
        WITH big AS (
            SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(CAST(l_quantity AS BIGINT)) > 250
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, total_qty
        FROM big
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY total_qty DESC, o_orderkey
        LIMIT 100
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: top-100 largest orders by total quantity with
    their customers — the aggregate-HAVING-then-rejoin composite.

    Scale shape: the quantity rollup keys on l_orderkey (the fact
    table's natural clustering), the HAVING prunes to ~1% of orders
    BEFORE any join, and the pruned aggregate — not the fact table —
    drives the joins to orders and customer. Quantities are
    integer-valued doubles summed as BIGINT; top-100 is
    TakeOrderedAndProject with o_orderkey as the deterministic
    tie-break."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "total_qty")
    )


@register(
    "tpch_q19_bracket_revenue",
    category="composite",
    oracle="""
        SELECT CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100.0)
                             AS BIGINT)) AS BIGINT) AS revenue_cents,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of three brand/size/quantity
    brackets across the part join — the OR-of-ANDs residual-predicate
    join that defeats naive pushdown.

    Scale shape: the part side is pre-filtered to the UNION of the
    three brackets (brand ∈ {...} AND size ≤ 15 — a superset bound
    that IS pushable) before broadcasting, so the equi-join stays a
    broadcast hash join and only the residual OR runs post-match;
    the quantity superset bound (1-30) pushes into the fact scan."""
    p = (
        load(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin("Brand#11", "Brand#14", "Brand#19")
            & F.col("p_size").between(1, 15)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").between(1, 30))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    )
    bracket = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(
            F.sum(_revenue_cents()).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q22_dormant_accounts",
    category="composite",
    oracle="""
        WITH pos AS (
            SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                       AS total_cents,
                   count(*) AS n_pos
            FROM customer WHERE c_acctbal > 0
        )
        SELECT c_nationkey AS nation, count(*) AS numcust,
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   / 100.0 AS totacctbal
        FROM customer, pos
        WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n_pos > total_cents
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= DATE '2000-01-01'
          )
        GROUP BY c_nationkey
    """,
)
def tpch_q22_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers gone dormant — balance
    above the positive-balance average AND no recent orders, counted
    per nation (phone-prefix adapted to nationkey; 'no orders ever'
    adapted to 'none since 2000' so the result is non-vacuous on this
    corpus).

    Exactness: 'above average' is evaluated without ever computing a
    float average — cents·n_pos > total_cents compares exact BIGINTs
    (cross-multiplied inequality), so no engine pair can disagree at
    the threshold. Scale shape: the (total, count) scalar is a
    1-row broadcast; the recency filter pushes into the orders scan
    and feeds a broadcast anti-join keyed on custkey."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents("c_acctbal")).alias("total_cents"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        c.join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .crossJoin(F.broadcast(pos))
        .filter(cents("c_acctbal") * F.col("n_pos") > F.col("total_cents"))
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(cents("c_acctbal")) / F.lit(100.0)).alias("totacctbal"),
        )
    )
