"""Sinks: result materialization.

The reference ended every job with ``saveAsTextFile`` ([R-mem]
``analyze_ruleset.py``; provenance in SURVEY.md §0). Here results land
in columnar formats with explicit layout control — the two knobs that
matter at 100 TB are *file count* (small-files problem) and *partition
columns* (downstream pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    sort_within_partitions: list[str] | None = None,
) -> None:
    """Overwrite-mode parquet sink.

    * ``partition_by`` — hive-style directory partitioning; downstream
      readers get static + dynamic partition pruning for free.
    * ``max_records_per_file`` — bounds file size without an extra
      repartition job.
    * ``sort_within_partitions`` — clusters rows so parquet min/max
      page stats become selective (poor-man's z-order for one key).
    """
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    w = df.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV sink for human-readable exports. ``single_file`` coalesces to
    one writer task — only for small results (a coalesce(1) on a large
    result serializes the whole job through one task).

    Lossless-value options, paired with ``text_logs.read_csv`` (the
    nasty-values round-trip in tests/test_sources.py is the contract):
    the writer's whitespace trimming is OFF (the DEFAULT silently
    strips leading/trailing spaces from every string on write), and
    NULL serializes as the explicit ``\\N`` sentinel so it stays
    distinguishable from the empty string (with the default
    nullValue="", the reader collapses quoted-empty and null into
    null)."""
    if single_file:
        df = df.coalesce(1)
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .option("nullValue", "\\N")
        .csv(path)
    )


def write_partitioned_report(df: DataFrame, path: str, date_col: str) -> None:
    """Date-partitioned parquet — the archival layout for periodic
    reports (the reference re-ran over month directories; this layout
    makes 'one month' a partition-pruned scan, not a glob)."""
    from pyspark.sql import functions as F

    df.withColumn("report_date", F.to_date(date_col)).write.mode(
        "overwrite"
    ).partitionBy("report_date").parquet(path)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """ORC sink — same layout knobs as parquet for shops standardized
    on ORC (Hive-lineage warehouses). Parquet remains this engine's
    default; both are columnar with predicate-pushdown-capable readers,
    so operator code is format-agnostic."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed, bucket-sorted managed table.

    Bucketing is THE shuffle-elimination lever for repeated large-to-
    large joins at 100 TB: both sides pre-hashed into ``n_buckets`` by
    the join key at WRITE time, so every later equi-join on that key
    needs no Exchange on either side (sort-merge join reads matching
    buckets directly; tests/test_sources.py pins the exchange-free
    plan). ``sortBy`` within buckets additionally drops the per-task
    sort. Catalyst only trusts bucket metadata through the catalog, so
    this is ``saveAsTable`` (managed), not ``save(path)`` — the one
    sink here that must go through a table name."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )
