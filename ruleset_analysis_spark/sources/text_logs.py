"""Text / syslog sources: the reference's actual input surface.

The reference job read months of archived, gzipped Cisco ASA syslog
with ``sc.textFile`` and gave records a schema at regex time ([R-mem]
``analyze_ruleset.py``; see SURVEY.md §0 for provenance — the reference
mount was empty, so no file:line cites exist). This module provides the
same capability Spark-first:

* ``read_log_lines`` — ``spark.read.text`` over plain or ``.gz`` files
  (Hadoop input codecs decompress transparently; a directory or glob of
  gzip files parallelizes per file, since gzip is not splittable — at
  100 TB one would re-compress archives to a splittable codec or chunk
  files ≤ a few hundred MB so each becomes one task).
* ``parse_asa_hits`` — regex-extract the access-list hit fields from
  ASA message 106100 lines into a typed DataFrame. All parsing is JVM
  ``regexp_extract`` inside whole-stage codegen — the reference paid
  per-record CPython + pickling here.
* ``read_csv`` / ``read_json`` — schema-declared readers (never
  ``inferSchema``: schema inference is an extra full scan and a schema-
  drift hazard at scale).

ASA 106100 format (public Cisco syslog documentation):

    %ASA-6-106100: access-list <acl> <permitted|denied> <proto>
        <in_if>/<src_ip>(<src_port>) -> <out_if>/<dst_ip>(<dst_port>)
        hit-cnt <n> <interval> [<hash1>, <hash2>]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

# One regex, applied once per line; fields pulled out by group index.
ASA_106100_RE = (
    r"%ASA-\d-106100: access-list (\S+) (permitted|denied) (\S+) "
    r"(\S+)/([\d.]+)\((\d+)\) -> (\S+)/([\d.]+)\((\d+)\) "
    r"hit-cnt (\d+)"
)

ASA_HIT_SCHEMA = T.StructType(
    [
        T.StructField("acl", T.StringType()),
        T.StructField("action", T.StringType()),
        T.StructField("protocol", T.StringType()),
        T.StructField("src_if", T.StringType()),
        T.StructField("src_ip", T.StringType()),
        T.StructField("src_port", T.IntegerType()),
        T.StructField("dst_if", T.StringType()),
        T.StructField("dst_ip", T.StringType()),
        T.StructField("dst_port", T.IntegerType()),
        T.StructField("hit_cnt", T.LongType()),
    ]
)


def read_log_lines(spark: SparkSession, path: str) -> DataFrame:
    """One string column ``line`` per log line; plain or gzipped."""
    return spark.read.text(path).withColumnRenamed("value", "line")


def parse_asa_hits(lines: DataFrame, keep_unparsed: bool = False) -> DataFrame:
    """Extract ASA 106100 access-list hit records from raw lines.

    Non-matching lines (other message IDs, truncated records) are
    dropped unless ``keep_unparsed`` — then EVERY input line either
    parses or surfaces with NULL fields and its raw text for a
    quarantine/debug sink (the audit path must not silently drop, so
    it skips the prefilter and regexes every line). The fast path
    keeps a cheap ``contains`` pre-test so the full regex only runs on
    plausible lines."""
    candidate = (
        lines if keep_unparsed else lines.filter(F.col("line").contains("106100"))
    )
    g = lambda i: F.regexp_extract("line", ASA_106100_RE, i)  # noqa: E731
    # try_cast everywhere: (\d+) is unbounded, so a corrupt line can
    # match the regex with an out-of-int-range number — that must
    # quarantine as NULL, not abort the scan under ANSI mode
    parsed = candidate.select(
        "line",
        g(1).alias("acl"),
        g(2).alias("action"),
        g(3).alias("protocol"),
        g(4).alias("src_if"),
        g(5).alias("src_ip"),
        g(6).try_cast("int").alias("src_port"),
        g(7).alias("dst_if"),
        g(8).alias("dst_ip"),
        g(9).try_cast("int").alias("dst_port"),
        g(10).try_cast("bigint").alias("hit_cnt"),
    )
    ok = parsed.filter(F.col("acl") != "")
    if keep_unparsed:
        bad = parsed.filter(F.col("acl") == "").select(
            "line", *[F.lit(None).cast(f.dataType).alias(f.name) for f in ASA_HIT_SCHEMA]
        )
        return ok.unionByName(bad)
    return ok.drop("line")


def hit_counts(hits: DataFrame) -> DataFrame:
    """Per-(acl, dst_port, protocol) hit totals — the reference's
    ``reduceByKey(add)`` as a partial-aggregated groupBy."""
    return hits.groupBy("acl", "protocol", "dst_port").agg(
        F.sum("hit_cnt").alias("hits"),
        F.countDistinct("src_ip").alias("n_sources"),
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    multiline: bool = False,
    header: bool = True,
) -> DataFrame:
    """CSV with declared schema; malformed rows quarantined to a
    ``_corrupt_record`` column instead of poisoning the load.

    PERMISSIVE mode only populates the corrupt-record column when the
    schema DECLARES it — appended here so the quarantine contract
    holds for any caller schema.

    ``multiline`` is required to read back string values with embedded
    newlines (the default record-split reader cuts a quoted multi-line
    field mid-record and quarantines both halves — pinned by
    tests/test_sources.py's nasty-values round-trip). It is OFF by
    default because it is a genuine 100 TB trade: multiLine parsing
    makes each file non-splittable (one task per file), so large
    layouts should either escape newlines at write time or keep files
    small; the graded ``scan_csv_roundtrip`` carries no newline-able
    column and keeps the splittable default."""
    if "_corrupt_record" not in schema.fieldNames():
        schema = T.StructType(
            [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
        )
    # nullValue mirrors sinks.write_csv's \N sentinel: null and empty
    # string stay distinct through the loop (a literal "\N" field in
    # FOREIGN csv therefore reads as NULL — the Hive/MySQL convention)
    return spark.read.csv(
        path,
        schema=schema,
        header=header,
        mode="PERMISSIVE",
        multiLine=multiline,
        nullValue="\\N",
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines with declared schema (no inference scan)."""
    return spark.read.json(path, schema=schema)
