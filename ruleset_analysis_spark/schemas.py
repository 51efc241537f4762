"""Declared schemas for the ten driver tables.

Fixed, explicit ``StructType`` per table (SURVEY.md §1.2): the engine
validates the parquet footer against these on load instead of trusting
schema inference. The reference's schema existed only implicitly in
regex group names ([R-mem] ``analyze_ruleset.py``); here it is a
first-class declaration.

``EXPECTED`` describes the schema *after* ``sources.parquet.load``
normalization: ``events.ts`` has shipped physically as both int64
nanoseconds (round 1; Spark 4.x cannot read TIMESTAMP(NANOS) natively)
and plain ``timestamp[us]`` (round 2); ``normalize_event_ts`` converts
either encoding to a microsecond UTC TIMESTAMP on load. Date-valued
business columns (``o_orderdate``, ``l_shipdate``) surface as
TIMESTAMP_NTZ under Spark 4's parquet NTZ inference.
"""

from __future__ import annotations

from pyspark.sql import types as T

_ts_ntz = T.TimestampNTZType()

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", _ts_ntz),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", _ts_ntz),
    ]
)

# Post-load schema: raw parquet has ts as int64 nanoseconds (see module doc).
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

EXPECTED: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

EMBEDDING_DIM = 64


def normalize_type(dt: T.DataType) -> str:
    """Type name with timestamp flavors collapsed (NTZ vs LTZ vs precision
    is a storage detail, not a semantic difference for our queries)."""
    s = dt.simpleString()
    return "timestamp" if s.startswith("timestamp") else s


def schema_diff(declared: T.StructType, actual: T.StructType) -> list[str]:
    """Human-readable mismatches between a declared and observed schema."""
    problems: list[str] = []
    dec = {f.name: normalize_type(f.dataType) for f in declared.fields}
    act = {f.name: normalize_type(f.dataType) for f in actual.fields}
    for name, dtype in dec.items():
        if name not in act:
            problems.append(f"missing column {name}")
        elif act[name] != dtype:
            problems.append(f"{name}: declared {dtype}, file has {act[name]}")
    for name in act:
        if name not in dec:
            problems.append(f"unexpected column {name}")
    return problems
