"""§2.A — scans / sources.

Reference analog: ``sc.textFile`` over gzipped syslog + schema-on-read
regex ([R-mem] ``analyze_ruleset.py``). Here sources are declared-schema
parquet scans; projection and predicate reach the parquet reader via
Catalyst (verified in tests/test_plans.py by inspecting ``ReadSchema``
and ``PushedFilters`` in the formatted plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schemas
from ..plans.registry import register
from ..sources.parquet import load


@register(
    "scan_parquet",
    category="scan",
    oracle="SELECT count(*) AS n FROM lineitem",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-file scan + count. Catalyst answers this from parquet
    row-group metadata (no row materialization)."""
    return load(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@register(
    "scan_projection_pushdown",
    category="scan",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning: reads 2 of 11 columns; ReadSchema in the physical
    plan shows only these two (columnar win the row-oriented reference
    could not express)."""
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@register(
    "scan_predicate_pushdown",
    category="scan",
    oracle="""
        SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
)
def scan_predicate_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter pushed into the parquet reader (row-group / page skipping
    at scale). The reference filtered line-by-line in Python after full
    decompression [R-mem]."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")).select(
        "l_orderkey",
        "l_linenumber",
        F.to_date("l_shipdate").alias("ship_date"),
    )


def _schema_oracle() -> str:
    """DuckDB twin of the schema validation, generated from the SAME
    ``schemas.EXPECTED`` registry at import time (the declared side can
    never drift from the Spark side). DuckDB DESCRIBEs each registered
    view and a CASE maps its type names onto Spark ``simpleString``
    spellings; a FULL OUTER JOIN against the declared VALUES list
    reproduces the missing-column and undeclared-column rows. Timestamp
    flavors collapse on both sides (TIMESTAMP% → 'timestamp'), so the
    oracle agrees under either events.ts encoding the driver has
    shipped (us, or ns which ``load`` normalizes)."""
    actual_union = "\n            UNION ALL ".join(
        f"SELECT '{t}' AS table_name, column_name, column_type "
        f"FROM (DESCRIBE {t})"
        for t in schemas.EXPECTED
    )
    declared_rows = ",\n            ".join(
        f"('{t}', '{f.name}', '{schemas.normalize_type(f.dataType)}')"
        for t, st in schemas.EXPECTED.items()
        for f in st.fields
    )
    return f"""
        WITH actual_raw AS (
            {actual_union}
        ),
        actual AS (
            SELECT table_name, column_name,
                   CASE WHEN column_type = 'BIGINT' THEN 'bigint'
                        WHEN column_type = 'INTEGER' THEN 'int'
                        WHEN column_type = 'DOUBLE' THEN 'double'
                        WHEN column_type = 'FLOAT' THEN 'float'
                        WHEN column_type = 'VARCHAR' THEN 'string'
                        WHEN column_type = 'FLOAT[]' THEN 'array<float>'
                        WHEN column_type LIKE 'TIMESTAMP%' THEN 'timestamp'
                        ELSE lower(column_type)
                   END AS actual_type
            FROM actual_raw
        ),
        declared(table_name, column_name, declared) AS (VALUES
            {declared_rows}
        )
        SELECT COALESCE(d.table_name, a.table_name) AS table_name,
               COALESCE(d.column_name, a.column_name) AS column_name,
               COALESCE(d.declared, '<undeclared>') AS declared,
               COALESCE(a.actual_type, '<missing>') AS actual,
               COALESCE(a.actual_type = d.declared, FALSE) AS ok
        FROM declared d
        FULL OUTER JOIN actual a
          ON a.table_name = d.table_name AND a.column_name = d.column_name
    """


@register(
    "scan_schema_validate",
    category="scan",
    oracle=_schema_oracle(),
)
def scan_schema_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared StructType vs parquet footer for every table; one row per
    column with an ``ok`` verdict. Fails loudly (ok=false rows) instead
    of silently inferring — schema drift at 100 TB is an outage.

    Fully oracle-graded (upgraded from rows-only): ``_schema_oracle``
    regenerates the DuckDB twin from the same declared registry, so the
    hash match witnesses that both engines read identical types out of
    the same parquet footers."""
    from concurrent.futures import ThreadPoolExecutor

    # footer reads are driver-side metadata IO — overlap them (each
    # spark.read.parquet analysis costs ~0.3s of FS/footer latency)
    def actual_schema(name: str) -> dict[str, str]:
        return {
            f.name: schemas.normalize_type(f.dataType)
            for f in load(spark, sf_dir, name).schema.fields
        }

    names = list(schemas.EXPECTED)
    with ThreadPoolExecutor(max_workers=len(names)) as pool:
        actuals = dict(zip(names, pool.map(actual_schema, names)))

    rows = []
    for name in names:
        actual = actuals[name]
        declared = {
            f.name: schemas.normalize_type(f.dataType)
            for f in schemas.EXPECTED[name].fields
        }
        for col, dtype in declared.items():
            rows.append(
                (name, col, dtype, actual.get(col, "<missing>"), actual.get(col) == dtype)
            )
        # drift can ADD columns too — an undeclared column is just as
        # much an ok=false outage signal as a missing one
        for col in actual:
            if col not in declared:
                rows.append((name, col, "<undeclared>", actual[col], False))
    return spark.createDataFrame(
        rows, "table_name string, column_name string, declared string, actual string, ok boolean"
    )
