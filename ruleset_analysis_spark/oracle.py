"""Differential-testing harness: Spark result vs DuckDB oracle.

Mirrors the driver's t2 gate (``__spark_entry__`` doc): run the
DataFrame query and the oracle SQL over the same parquet, compare
row count + column names + order-insensitive normalized values. Used
by ``tests/test_differential.py`` and ``scripts/check.py``.

Normalization is deliberately STRICT (string-exact after float repr):
if this harness passes, any reasonable value-hash the driver computes
passes too. Queries are responsible for rounding floats identically on
both sides — the harness does not approximate.
"""

from __future__ import annotations

import datetime
import math
from dataclasses import dataclass, field

import duckdb

from .sources.parquet import TABLE_NAMES, path_for

NULL = "∅"


def duck_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    """In-memory DuckDB with the ten tables registered as views —
    the same pre-registration the driver performs."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path_for(sf_dir, t)}')"
        )
    return con


def norm_val(v) -> str:
    import numpy as np

    if v is None:
        return NULL
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            # distinct from NULL: a NULL-vs-NaN divergence between
            # engines is a real mismatch and must not compare equal
            return "NaN#"
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return repr(v)
    if isinstance(v, str):
        # tag strings so a literal '∅'/'NaN#'/numeric-looking string
        # can never collide with the NULL/NaN sentinels or numerics
        return "s:" + v
    if isinstance(v, int):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or (
        hasattr(v, "__iter__") and not isinstance(v, (str, bytes, dict))
    ):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_val(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def normalize(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple[str, ...]]]:
    """Sort columns by name (driver behavior), normalize every value to a
    string, sort rows — order-insensitive canonical form."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = sorted(tuple(norm_val(r[i]) for i in order) for r in rows)
    return cols, out


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int | None
    problems: list[str] = field(default_factory=list)

    def __str__(self) -> str:  # pragma: no cover
        status = "OK " if self.ok else "FAIL"
        extra = "" if not self.problems else " | " + "; ".join(self.problems[:5])
        return f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}{extra}"


def compare(name, spark_df, con, oracle_sql: str | None) -> CompareResult:
    srows = [tuple(r) for r in spark_df.collect()]
    scols = list(spark_df.columns)
    if oracle_sql is None:
        # rows-only: schema must be stable and the query must execute
        return CompareResult(name, True, len(srows), None, [])
    rel = con.sql(oracle_sql)
    ocols = list(rel.columns)
    otypes = [str(t) for t in rel.types]
    orows = rel.fetchall()
    problems: list[str] = []
    # HUGEINT guard: DuckDB silently widens sum(INTEGER) to int128.
    # Our normalizer stringifies Python ints so the value would compare
    # equal HERE, but the driver's value-hash treats int128 columns as a
    # distinct type and records a hash mismatch (proven twice:
    # stream_rollup_multires r3, tpch_q12_late_shipments r4). Fail
    # loudly at the local gate so the class can't ship again; fix is
    # CAST(sum(...) AS BIGINT) in the oracle.
    for c, t in zip(ocols, otypes):
        if "HUGEINT" in t:
            problems.append(
                f"oracle column {c!r} is {t}: wrap in CAST(... AS BIGINT) "
                "(driver hashes int128 differently — see SCALE.md)"
            )
    ncols_s, vs = normalize(scols, srows)
    ncols_o, vo = normalize(ocols, orows)
    if ncols_s != ncols_o:
        problems.append(f"columns differ: spark={ncols_s} oracle={ncols_o}")
    if len(vs) != len(vo):
        problems.append(f"row count: spark={len(vs)} oracle={len(vo)}")
    if not problems and vs != vo:
        shown = 0
        for i, (a, b) in enumerate(zip(vs, vo)):
            if a != b:
                problems.append(f"row {i}: spark={a} oracle={b}")
                shown += 1
                if shown >= 3:
                    break
        if not problems:
            problems.append("value mismatch in tail rows")
    return CompareResult(name, not problems, len(vs), len(vo), problems)
