"""Reference-parity pipeline: firewall-rule usage analytics.

This module re-creates the reference's *actual end-to-end job* — parse
ASA-style syslog lines, count hits per (acl, rule), and report rules
with zero hits ([R-mem] ``analyze_ruleset.py`` +
``convert_ruleset_to_flows.py``) — as a pure DataFrame pipeline.

The driver corpus has no raw log files, so the pipeline first
*synthesizes* deterministic syslog text from the ``events`` table
(format_string), then treats those strings as the untrusted input:
regex-extract ACL name / rule id / source user, aggregate, and
anti-join against a constructed rule dimension. The synthesize→parse
round-trip exercises exactly the reference's schema-on-read surface
while staying reproducible in both engines.

Scale notes: parsing is JVM regex inside codegen (the reference paid
per-record CPython + pickling here); the rule dimension is broadcast;
hit counting is a partial-aggregated groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.registry import register
from ..sources.parquet import load

_LINE_FMT = "%%ASA-6-106100: access-list acl_%s rule %d matched user %d"
_LINE_RE = r"access-list (\w+) rule (\d+) matched user (\d+)"
_N_RULES = 40


def _lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        F.format_string(
            _LINE_FMT, "event_type", (F.col("user_id") % _N_RULES), "user_id"
        ).alias("line")
    )


def _parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = _lines(spark, sf_dir)
    return lines.select(
        F.regexp_extract("line", _LINE_RE, 1).alias("acl"),
        F.regexp_extract("line", _LINE_RE, 2).cast("bigint").alias("rule_id"),
        F.regexp_extract("line", _LINE_RE, 3).cast("bigint").alias("src_user"),
    )


_ORACLE_PARSED = rf"""
    WITH lines AS (
        SELECT printf('%%ASA-6-106100: access-list acl_%s rule %d matched user %d',
                      event_type, user_id % {_N_RULES}, user_id) AS line
        FROM events
    ),
    parsed AS (
        SELECT regexp_extract(line, 'access-list (\w+) rule (\d+) matched user (\d+)', 1)
                   AS acl,
               CAST(regexp_extract(line, 'access-list (\w+) rule (\d+) matched user (\d+)', 2)
                    AS BIGINT) AS rule_id,
               CAST(regexp_extract(line, 'access-list (\w+) rule (\d+) matched user (\d+)', 3)
                    AS BIGINT) AS src_user
        FROM lines
    )
"""


@register(
    "firewall_rule_hits",
    category="firewall",
    oracle=_ORACLE_PARSED
    + """
        SELECT acl, rule_id, count(*) AS hits,
               count(DISTINCT src_user) AS n_users
        FROM parsed GROUP BY acl, rule_id
    """,
)
def firewall_rule_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hit count + distinct talkers per rule — the reference's headline
    report ([R-mem] ``reduceByKey(add)`` → ``join(rules)`` →
    ``sortBy``)."""
    return (
        _parsed(spark, sf_dir)
        .groupBy("acl", "rule_id")
        .agg(
            F.count(F.lit(1)).alias("hits"),
            F.countDistinct("src_user").alias("n_users"),
        )
    )


@register(
    "rule_usage_report",
    category="firewall",
    oracle=_ORACLE_PARSED
    + f"""
        , ruleset AS (
            SELECT 'acl_' || t.event_type AS acl, r.rule_id
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (SELECT unnest(range({_N_RULES})) AS rule_id) r
        ),
        hit_agg AS (
            SELECT acl, rule_id, count(*) AS hits, count(DISTINCT src_user) AS n_users
            FROM parsed GROUP BY acl, rule_id
        )
        SELECT rs.acl, rs.rule_id,
               coalesce(h.hits, 0) AS hits,
               coalesce(h.n_users, 0) AS n_users,
               CASE WHEN h.hits IS NULL THEN 'UNUSED' ELSE 'ACTIVE' END AS status
        FROM ruleset rs
        LEFT JOIN hit_agg h ON h.acl = rs.acl AND h.rule_id = rs.rule_id
    """,
)
def rule_usage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP (also the ``entry()`` smoke query): the reference's full
    deliverable in one result — every rule with its hit count, distinct
    talkers, and an ACTIVE/UNUSED verdict ([R-mem] README: per-rule hit
    report + the zero-hit removal candidates)."""
    rules = (
        spark.range(_N_RULES)
        .select(F.col("id").cast("bigint").alias("rule_id"))
        .crossJoin(
            F.broadcast(
                load(spark, sf_dir, "events")
                .select(F.concat(F.lit("acl_"), "event_type").alias("acl"))
                .distinct()
            )
        )
    )
    hits = (
        _parsed(spark, sf_dir)
        .groupBy("acl", "rule_id")
        .agg(
            F.count(F.lit(1)).alias("hits"),
            F.countDistinct("src_user").alias("n_users"),
        )
    )
    return rules.join(hits, on=["acl", "rule_id"], how="left").select(
        "acl",
        "rule_id",
        F.coalesce("hits", F.lit(0)).alias("hits"),
        F.coalesce("n_users", F.lit(0)).alias("n_users"),
        F.when(F.col("hits").isNull(), "UNUSED").otherwise("ACTIVE").alias("status"),
    )


@register(
    "firewall_unused_rules",
    category="firewall",
    oracle=_ORACLE_PARSED
    + f"""
        , ruleset AS (
            SELECT 'acl_' || t.event_type AS acl, r.rule_id
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (SELECT unnest(range({_N_RULES})) AS rule_id) r
        )
        SELECT rs.acl, rs.rule_id
        FROM ruleset rs
        WHERE NOT EXISTS (
            SELECT 1 FROM parsed p
            WHERE p.acl = rs.acl AND p.rule_id = rs.rule_id
        )
    """,
)
def firewall_unused_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rules with ZERO hits — the reference's raison d'être: the safe-to-
    remove list, via left-anti join of the rule dimension against
    observed hits."""
    rules = (
        spark.range(_N_RULES)
        .select(F.col("id").cast("bigint").alias("rule_id"))
        .crossJoin(
            load(spark, sf_dir, "events")
            .select(F.concat(F.lit("acl_"), "event_type").alias("acl"))
            .distinct()
        )
    )
    hits = _parsed(spark, sf_dir).select("acl", "rule_id").distinct()
    return rules.join(hits, on=["acl", "rule_id"], how="left_anti").select(
        "acl", "rule_id"
    )
