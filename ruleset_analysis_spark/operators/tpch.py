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
