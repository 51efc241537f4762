"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``ruleset_analysis_spark``; this module is a
thin adapter over ``plans.registry`` (SURVEY.md §2 is the binding
query inventory; each registered QuerySpec carries its builder and
oracle SQL side-by-side).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Self-locating import: the driver may import this file from any cwd.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = ``rule_usage_report``: the reference's end-to-end
    deliverable (per-rule hit counts + distinct talkers + the
    ACTIVE/UNUSED verdict) as one DataFrame pipeline."""
    from ruleset_analysis_spark.operators.firewall import rule_usage_report

    return rule_usage_report(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed/aggregate column is aliased identically in the
    DataFrame code and the oracle SQL.
    """
    from ruleset_analysis_spark.plans.registry import queries_dict

    return queries_dict()


def oracle_sql() -> dict[str, str]:
    """For each key in ``queries()``, equivalent ANSI SQL runnable by
    DuckDB on the same parquet tables (pre-registered views: region
    nation customer supplier part orders lineitem events documents
    embeddings). Rows-only queries (hash-unstable or non-SQL-
    expressible semantics) are omitted here by design.
    """
    from ruleset_analysis_spark.plans.registry import oracle_dict

    return oracle_dict()
