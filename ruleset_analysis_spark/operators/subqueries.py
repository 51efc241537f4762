"""§2 addendum — correlated / scalar subquery shapes.

The reference never had subqueries (its pipeline was a fixed
regex → reduceByKey script [R-mem]), but any engine claiming its
*query* surface at warehouse scale needs them: "compare each row to an
aggregate of its own group" is the TPC-H Q17 shape, and EXISTS/IN
predicates are the relational idiom for hit-testing one table against
another (the reference's rule-vs-traffic question in SQL clothing).

These are deliberately written as ``spark.sql`` with the *correlated*
form: Catalyst decorrelates scalar-aggregate subqueries into an
aggregate + join and EXISTS into a left-semi join, so the executed
plan is the same keyed shuffle a hand-rolled groupBy+join would give —
tests/test_plan_shape.py pins that no per-row re-execution (nested
loop over a subquery) appears. At 100 TB that decorrelation is the
difference between one shuffle and a scan per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.registry import register
from ._util import _view


@register(
    "subquery_scalar_agg",
    category="subquery",
    oracle="""
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
)
def subquery_scalar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: customers above the global average
    balance. Catalyst evaluates the subquery once (ScalarSubquery →
    ReusedSubquery) and pushes the resulting literal comparison into
    the scan — one aggregation + one filtered scan, not a join."""
    c = _view(spark, sf_dir, "customer")
    return spark.sql(
        f"""
        SELECT c_custkey, c_acctbal
        FROM {c}
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM {c})
        """
    )


@register(
    "subquery_correlated_avg",
    category="subquery",
    oracle="""
        SELECT p.p_brand,
               CAST(sum(TRY_CAST(round(l.l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total_below,
               count(*) AS n_items
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity < (
            SELECT 0.2 * avg(l2.l_quantity)
            FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY p.p_brand
    """,
)
def subquery_correlated_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems whose quantity is below 20% of their
    part's average quantity, summed per brand.

    Written as the literal correlated scalar-aggregate subquery;
    Catalyst decorrelates it into ``lineitem ⋈ (lineitem groupBy
    l_partkey avg)`` — the per-part aggregate is computed ONCE in a
    keyed shuffle and joined back, never re-executed per outer row."""
    li = _view(spark, sf_dir, "lineitem")
    p = _view(spark, sf_dir, "part")
    return spark.sql(
        f"""
        SELECT p.p_brand,
               CAST(sum(TRY_CAST(round(l.l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total_below,
               count(*) AS n_items
        FROM {li} l
        JOIN {p} p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity < (
            SELECT 0.2 * avg(l2.l_quantity)
            FROM {li} l2
            WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY p.p_brand
        """
    )


@register(
    "subquery_exists",
    category="subquery",
    oracle="""
        SELECT o.o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_extendedprice > 4000
        )
        GROUP BY o.o_orderpriority
    """,
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders having at least one qualifying lineitem,
    counted per priority. EXISTS plans as a left-semi hash join (the
    probe side deduplicates during the join — no distinct needed), then
    a low-cardinality aggregate."""
    o = _view(spark, sf_dir, "orders")
    li = _view(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        SELECT o.o_orderpriority, count(*) AS n_orders
        FROM {o} o
        WHERE EXISTS (
            SELECT 1 FROM {li} l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_extendedprice > 4000
        )
        GROUP BY o.o_orderpriority
        """
    )


@register(
    "subquery_not_in_null_safe",
    category="subquery",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        )
    """,
)
def subquery_not_in_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a subquery — semantically a *null-aware* anti join
    (one NULL in the subquery result empties the output, unlike plain
    anti join). Spark plans NullAwareAntiJoin / broadcast anti; the
    oracle proves the tri-valued-logic semantics match DuckDB's."""
    c = _view(spark, sf_dir, "customer")
    o = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT c_custkey, c_name
        FROM {c}
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM {o} WHERE o_totalprice > 300000
        )
        """
    )


@register(
    "subquery_lateral_topn",
    category="subquery",
    oracle="""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) t
        WHERE c.c_acctbal > 9000
    """,
)
def subquery_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: each rich customer's top-2 orders
    by price — the per-row-subquery surface SQL users reach for before
    they learn window functions. Catalyst decorrelates the lateral
    LIMIT into a ranked join (DomainJoin → window/rank under the
    hood), so execution is keyed joins + per-group top-k, never a
    scan per outer row; the plan test asserts no nested-loop
    re-execution shape survives."""
    c = _view(spark, sf_dir, "customer")
    o = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM {c} c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM {o}
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) t
        WHERE c.c_acctbal > 9000
        """
    )


@register(
    "recursive_hierarchy_walk",
    category="subquery",
    oracle="""
        WITH RECURSIVE walk(part, cur, depth) AS (
            SELECT p_partkey, p_partkey, 0 FROM part
            UNION ALL
            SELECT part, cur // 10, depth + 1 FROM walk WHERE cur >= 10
        )
        SELECT part AS p_partkey,
               CAST(min(cur) AS BIGINT) AS root_digit,
               CAST(max(depth) AS INTEGER) AS depth
        FROM walk GROUP BY part
    """,
)
def recursive_hierarchy_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE in Spark SQL (Spark 4's ``WITH RECURSIVE``) — the
    classic hierarchy walk (BOM explosion / org chart): every part
    climbs the synthetic parent chain ``p → p div 10`` to its root
    digit, reporting root and depth. The identical UNION ALL recursion
    runs on both engines (dialect differs only in the floor-division
    operator).

    The walk is a strict DAG (the key strictly decreases), so UNION ALL
    recursion terminates without distinct-dedup — which Spark does not
    yet support in recursion (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE);
    for *cyclic* closure (near-dup clustering) the engine keeps the
    explicitly-checkpointed label-propagation operator
    (``dedup_cluster_components``), whose per-round dedup is exactly
    what bounds state on cycles — the two queries document that
    declarative/iterative boundary. Depth is bounded by the key's
    digit count (≤7 at any scale factor), so the recursion does ≤7
    joins, each pruned by ``cur >= 10``."""
    p = _view(spark, sf_dir, "part")
    return spark.sql(
        f"""
        WITH RECURSIVE walk(part, cur, depth) AS (
            SELECT p_partkey, p_partkey, 0 FROM {p}
            UNION ALL
            SELECT part, cur DIV 10, depth + 1 FROM walk WHERE cur >= 10
        )
        SELECT part AS p_partkey,
               CAST(min(cur) AS BIGINT) AS root_digit,
               CAST(max(depth) AS INT) AS depth
        FROM walk GROUP BY part
        """
    )
