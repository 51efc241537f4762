"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
``spark.read.format("asa_syslog")`` over a directory of plain/gzipped
ASA syslog files, yielding the typed hit schema directly.

Positioning, honestly stated: the PRODUCTION hot path for this format
stays JVM-side (``text_logs.read_log_lines`` + ``parse_asa_hits`` —
codegen regexp over the built-in text source). A Python DataSource
executes its reader in Python workers, so it earns its keep only where
the format genuinely needs Python (proprietary decoders, exotic
codecs, REST-paginated sources) — this implementation exists to prove
the *pluggability surface*: schema declaration, file-granular
partition planning, per-partition iterator reads, and the same
dirty-line contract as the JVM path (unparsable lines drop; one bad
line never kills the job).

Scale notes: ``partitions()`` returns one InputPartition per file —
the correct granularity for gzip (non-splittable; same rule as the
JVM text source) — so a directory of N archives fans out to N
parallel Python readers; each reader streams line-by-line (no
whole-file buffering)."""

from __future__ import annotations

import glob
import gzip
import os
import re
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .text_logs import ASA_106100_RE

_DDL = (
    "acl string, action string, protocol string, "
    "src_if string, src_ip string, src_port int, "
    "dst_if string, dst_ip string, dst_port int, hit_cnt bigint"
)


class AsaSyslogReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("asa_syslog: .load(path) is required")
        self._path = path

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per file: gzip is not splittable, and file
        # granularity is what a syslog archive layout provides
        p = self._path
        if os.path.isdir(p):
            files = sorted(
                f
                for f in glob.glob(os.path.join(p, "*"))
                if os.path.isfile(f)
            )
        else:
            files = sorted(glob.glob(p))
        if not files:
            raise FileNotFoundError(f"asa_syslog: no input files under {p!r}")
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # executed on a Python worker; compile once per partition
        rx = re.compile(ASA_106100_RE)
        path = partition.value
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", errors="replace") as fh:
            for line in fh:
                m = rx.search(line)
                if not m:
                    continue  # dirty-line contract: drop, never abort
                g = m.groups()
                yield (
                    g[0],
                    g[1],
                    g[2],
                    g[3],
                    g[4],
                    int(g[5]),
                    g[6],
                    g[7],
                    int(g[8]),
                    int(g[9]),
                )


class AsaSyslogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "asa_syslog"

    def schema(self) -> str:
        return _DDL

    def reader(self, schema) -> AsaSyslogReader:
        return AsaSyslogReader(self.options)


def register_asa_syslog(spark) -> None:
    """Idempotently register the datasource on a session."""
    spark.dataSource.register(AsaSyslogDataSource)
