"""§2.F — sorts, limits, top-k, set operations.

Reference analogs: ``sortBy(count, ascending=False)`` for the hit-count
report and ``subtractByKey`` for set difference [R-mem
``analyze_ruleset.py``]. Spark's TakeOrderedAndProject turns global
top-k into a per-partition heap + tiny merge — no full sort at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from ..sources.parquet import load
from ._util import cents


@register(
    "sort_multi_key",
    category="sort",
    oracle="""
        SELECT o_custkey,
               CAST(sum(TRY_CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   / 100.0 AS revenue
        FROM orders GROUP BY o_custkey
        ORDER BY revenue DESC, o_custkey ASC
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort (range-partitioned exchange at scale)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg((F.sum(cents("o_totalprice")) / F.lit(100.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_custkey"))
    )


@register(
    "limit_topk",
    category="sort",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — planned as TakeOrderedAndProject (per-partition
    heaps, no global sort), the scale-correct top-k."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "setop_union_all",
    category="setop",
    oracle="""
        SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS yr
        FROM orders WHERE year(o_orderdate) = 1996
        UNION ALL
        SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS yr
        FROM orders WHERE year(o_orderdate) = 1998
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")

    def year_slice(yr: int) -> DataFrame:
        return o.filter(F.year("o_orderdate") == yr).select(
            "o_orderkey", F.year("o_orderdate").alias("yr")
        )

    return year_slice(1996).unionByName(year_slice(1998))


@register(
    "setop_union_distinct",
    category="setop",
    oracle="""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        UNION
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return a.union(b).distinct()


@register(
    "setop_intersect",
    category="setop",
    oracle="""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return a.intersect(b)


@register(
    "setop_except",
    category="setop",
    oracle="""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference — the reference's ``subtractByKey`` analog [R-mem]."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return a.subtract(b)


@register(
    "setop_intersect_all",
    category="setop",
    oracle="""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL: a customer with 3 orders in 1996 and 2 in
    1997 appears twice (min of the multiplicities) — the
    bag-semantics sibling of ``setop_intersect``. Spark plans it as a
    single hash aggregate carrying both counts; no row explosion."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return a.intersectAll(b)


@register(
    "setop_except_all",
    category="setop",
    oracle="""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL: multiplicities subtract instead of the row
    vanishing entirely — the shape used to remove *one* occurrence per
    matched duplicate (e.g. subtracting a consumed quota)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return a.exceptAll(b)
