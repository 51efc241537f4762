"""Parquet source: schema-declared loads of the driver tables.

The reference read gzipped syslog text with ``sc.textFile`` and gave
every record its schema at regex time ([R-mem] ``analyze_ruleset.py``);
this engine standardizes on columnar parquet with declared schemas so
Catalyst gets column pruning + predicate pushdown for free.

Scale notes (100 TB design): a production deployment would point these
loads at a partitioned table root (e.g. ``.../events/date=*/``) and the
same code would gain static + dynamic partition pruning with no query
changes — the test corpus is one file per table, so no partition
columns appear here. No ``collect`` happens in any loader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schemas
from ..session import ensure_session_defaults

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def path_for(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table with post-read normalization.

    ``events.ts`` arrives as int64 *nanoseconds* (Spark cannot read
    parquet TIMESTAMP(NANOS); ``nanosAsLong`` is set by
    ``ensure_session_defaults``) and is floor-divided to microseconds —
    exactly the truncation DuckDB's reader applies, keeping the oracle
    comparison bit-stable.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_session_defaults(spark)
    df = spark.read.parquet(path_for(sf_dir, name))
    if name == "events":
        # exact FLOOR division in long arithmetic: (ts - pmod(ts, 1000))
        # div 1000. Plain `div` truncates toward zero, which differs
        # from DuckDB's floor for pre-epoch (negative-ns) timestamps;
        # doubles can't be used (ns magnitudes exceed 2^53).
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000"))
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def validate(spark: SparkSession, sf_dir: str, name: str) -> list[str]:
    """Diff the declared StructType against the loaded schema."""
    df = load(spark, sf_dir, name)
    return schemas.schema_diff(schemas.EXPECTED[name], df.schema)
