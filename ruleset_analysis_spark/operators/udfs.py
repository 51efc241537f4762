"""§2.H — the declared (and deliberately small) Python UDF surface.

The reference ran 100% of its logic as per-record Python lambdas over
RDDs, paying Py4J/pickle serde per record [R-mem]. This engine inverts
that: Catalyst built-ins everywhere, and the only Python in any row
path is below — Arrow-vectorized pandas UDFs, each with a pure-SQL
oracle proving the semantics.

``tests/test_plan_shape.py`` asserts no other graded query contains a
Python eval node (ArrowEvalPython/BatchEvalPython/FlatMapGroupsInPandas).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf

from ..plans.registry import register
from ..sources.parquet import load
from ._util import _view


def _price_tier_fn(total: pd.Series) -> pd.Series:
    """Series→series scalar pandas UDF kernel (Arrow batches, ~10-100×
    the row-at-a-time Python UDF). Wrapped lazily — ``pandas_udf`` with
    a DDL-string return type needs an active session."""
    return pd.cut(
        total,
        bins=[float("-inf"), 50_000.0, 150_000.0, float("inf")],
        labels=["S", "M", "L"],
    ).astype(str)


@register(
    "udf_scalar_pandas",
    category="udf",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice <= 50000 THEN 'S'
                    WHEN o_totalprice <= 150000 THEN 'M'
                    ELSE 'L' END AS tier
        FROM orders
    """,
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    tier_udf = pandas_udf(_price_tier_fn, "string")
    return o.select("o_orderkey", tier_udf("o_totalprice").alias("tier"))


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    # Exact-cents sufficient statistics: pandas mean/std accumulate in
    # the (arbitrary) Spark partition-arrival order, so their last ULPs
    # vary run to run. Integer cents give order-independent Σc and Σc²,
    # and the z-score finish below is the *same* IEEE expression tree
    # the DuckDB oracle evaluates — bit-identical at any row order.
    # (z is scale-invariant, so cents vs dollars is algebraically moot.)
    #
    # r9 optimization (guide §4.2): the body runs once per GROUP
    # (~15k tiny frames at sf0.1) and the original pandas formulation
    # cost ~430 µs/group, almost all of it Series/index construction
    # and the object-dtype `.where` — not arithmetic. This form stays
    # in numpy until the final frame: same ops, same IEEE expression
    # tree (np.round IS what Series.round delegates to), and the
    # non-finite→None mapping short-circuits on the group-level denom
    # (z is finite iff denom is finite and nonzero — the per-element
    # `.where` re-derived the same fact elementwise). Bit-identical by
    # the kernel twin test below and the oracle differential.
    c = np.rint(pdf["value"].to_numpy() * 100.0).astype(np.int64)
    n = len(c)
    s1 = int(c.sum())
    s2 = int((c * c).sum())
    if n >= 2:
        var_c = (float(s2) - float(s1) * float(s1) / n) / (n - 1)
        denom = float(np.sqrt(var_c))
    else:
        denom = float("nan")
    if denom > 0.0 and np.isfinite(denom):
        zcol = np.round((c - float(s1) / n) / denom, 6)
    else:  # singleton / zero-variance: NaN where SQL yields NULL
        zcol = np.full(n, None, dtype=object)
    # plain-ndarray columns: building the frame from the group's
    # indexed Series pays index alignment per group (~3× the cost)
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"].to_numpy(),
            "user_id": pdf["user_id"].to_numpy(),
            "zscore": zcol,
        }
    )


@register(
    "udaf_grouped_pandas",
    category="udf",
    oracle="""
        WITH b AS (
            SELECT event_id, user_id,
                   TRY_CAST(round(value * 100) AS BIGINT) AS c
            FROM events
        ),
        g AS (
            SELECT event_id, user_id, c,
                   count(*) OVER w AS n,
                   CAST(sum(c) OVER w AS BIGINT) AS s1,
                   CAST(sum(c * c) OVER w AS BIGINT) AS s2
            FROM b
            WINDOW w AS (PARTITION BY user_id)
        )
        SELECT event_id, user_id,
               CASE WHEN n >= 2 THEN
                   round((c - CAST(s1 AS DOUBLE) / n)
                         / sqrt((CAST(s2 AS DOUBLE)
                                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                                / (n - 1)), 6)
               END AS zscore
        FROM g
    """,
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas): per-user z-score — a whole
    pandas frame per group in, a frame out. The oracle proves it equals
    the window-function formulation. Both sides compute the z from
    integer-cents sufficient statistics (n, Σc, Σc²) with the same IEEE
    finish, so the 6dp rounding is immune to accumulation-order drift
    (pandas mean/std accumulate in partition-arrival order; a windowed
    stddev_samp in segment-tree order).

    r9 optimization (guide §2.2 caveat + §4): AQE's byte-sized
    partition coalescing priced the ~2 MB post-shuffle relation at ONE
    partition, so every group ran through a single Python worker
    sequentially (measured 2.2 s steady-state — identical with a
    trivial kernel, i.e. pure serialization/dispatch wall). Bytes
    misprice Python-bound stages; the explicit group-key repartition
    pins the exchange at the session's configured shuffle parallelism
    (not a local constant — the same conf a cluster deployment sizes),
    which AQE respects instead of coalescing. groupBy reuses that
    exchange, so the plan still carries exactly one shuffle. Values
    are partitioning-invariant (per-group kernel)."""
    from ..session import shuffle_partitions

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ev = ev.repartition(shuffle_partitions(spark), "user_id")
    return ev.groupBy("user_id").applyInPandas(
        _zscore, "event_id long, user_id long, zscore double"
    )


@register(
    "udtf_split_props",
    category="udf",
    oracle="""
        SELECT event_id, k AS key,
               CASE WHEN regexp_matches(json_extract_string(props, '$.' || k),
                                        '^-?[0-9]+$')
                    THEN TRY_CAST(json_extract_string(props, '$.' || k)
                                  AS BIGINT)
               END AS val
        FROM (
            SELECT event_id, props, unnest(json_keys(props)) AS k FROM events
        )
    """,
)
def udtf_split_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-shaped expansion: JSON props → one row per key/value. Plain
    ``explode(from_json(...))`` — no Python needed for the table
    function (Spark 3.5 Python UDTFs exist, but the built-in lateral
    explode is the fast path).

    Values parse as STRING then cast under the integral-literal
    contract (see ``json_extract``): a map typed ``<string,bigint>``
    nulls the WHOLE map when any one value fails coercion, so a single
    ``{"k": 3.5}`` row would emit zero rows while the oracle emits one
    with a NULL val (fuzz-sweep finding); the oracle's bare
    ``CAST(json_extract(...))`` was equally wrong — it ABORTED the
    whole query on the first string-valued key."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    kv = F.col("raw_val")
    return (
        ev.select("event_id", F.explode(m).alias("key", "raw_val"))
        .select(
            "event_id",
            "key",
            F.when(kv.rlike("^-?[0-9]+$"), kv.try_cast("bigint")).alias("val"),
        )
    )


class _PropsExploder:
    """Python UDTF (Spark 3.5+ native table function): JSON props in,
    one (key, val, n_keys) row out per key — the genuinely-Python
    counterpart of the explode-based ``udtf_split_props``, for the
    cases where per-row fan-out needs imperative logic (here: emitting
    the per-record key count alongside each row, which pure explode
    would need a second pass or a size() column for)."""

    def eval(self, event_id: int, props: str):
        import json

        # tolerant of dirty rows: non-JSON / 'null' / non-object props
        # yield nothing; values that are not JSON integer literals yield
        # NULL — the same strict contract as json_extract (Python's
        # int() would coerce 28.0→28 and True→1, diverging from the
        # oracle's regex-guarded cast; json.loads already types an
        # integral literal as int and everything else as float/bool/str)
        try:
            kv = json.loads(props) if props else None
        except (ValueError, TypeError):
            return
        if not isinstance(kv, dict):
            return
        for k in kv:
            v = kv[k]
            val = (
                v
                if isinstance(v, int)
                and not isinstance(v, bool)
                and -(2**63) <= v < 2**63  # past BIGINT → NULL, like TRY_CAST
                else None
            )
            yield event_id, k, val, len(kv)


@register(
    "udtf_python_native",
    category="udf",
    oracle="""
        SELECT event_id, k AS key,
               CASE WHEN regexp_matches(json_extract_string(props, '$.' || k),
                                        '^-?[0-9]+$')
                    THEN TRY_CAST(json_extract_string(props, '$.' || k)
                                  AS BIGINT)
               END AS val,
               CAST(len(json_keys(props)) AS INTEGER) AS n_keys
        FROM (
            SELECT event_id, props, unnest(json_keys(props)) AS k FROM events
        )
    """,
)
def udtf_python_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Python UDTF over Arrow: lateral-joined against events.
    Declared Python surface (see tests/test_plan_shape.py allowlist);
    the oracle proves row-fan-out semantics against DuckDB."""
    from pyspark.sql.functions import udtf

    # load() FIRST: it runs ensure_session_defaults -> addPyFile, and
    # PySpark snapshots the python-includes list when the function is
    # wrapped — a UDTF created before the package ships can't be
    # unpickled on workers (ModuleNotFoundError; see _ship_package).
    # Repartition before the lateral join: a single-file scan is one
    # partition, which would funnel ALL per-row Python through one
    # task (measured 16s -> ~2s at sf0.1). Python stages must inherit
    # real parallelism explicitly when the upstream scan has none.
    from ..session import shuffle_partitions

    ev = (
        load(spark, sf_dir, "events")  # load first: normalizes confs
        .select("event_id", "props")
        .repartition(shuffle_partitions(spark))
    )
    exploder = udtf(
        _PropsExploder,
        returnType="event_id bigint, key string, val bigint, n_keys int",
    )
    spark.udtf.register("props_exploder", exploder)
    ev.createOrReplaceTempView("_udtf_events_in")
    return spark.sql(
        """
        SELECT t.event_id, t.key, t.val, t.n_keys
        FROM _udtf_events_in v,
             LATERAL props_exploder(v.event_id, v.props) t
        """
    )


@register(
    "udf_sql_scalar",
    category="udf",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                          * 100) AS BIGINT) AS charged_cents
        FROM lineitem WHERE l_quantity > 45
    """,
)
def udf_sql_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UDF (Spark 4 ``CREATE FUNCTION ... RETURNS``): the charged-
    price formula lives in the catalog as a named scalar function and
    is INLINED by Catalyst at analysis time — unlike any Python UDF,
    a SQL UDF is pure expression substitution: full codegen, pushdown
    through it, zero serialization boundary. This is the right tool
    for shared business formulas at 100 TB; the Python surface
    (``udf_scalar_pandas`` etc.) stays for logic SQL can't express.
    The oracle inlines the same formula by hand; the result is kept in
    exact integer cents via floor (the repo-wide money discipline —
    round() half-ties diverge between Spark and DuckDB at the last
    cent). Registration is idempotent (CREATE OR REPLACE, fixed name)
    — safe to re-run in one session."""
    lv = _view(spark, sf_dir, "lineitem")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION charged_cents(
            price DOUBLE, disc DOUBLE, tax DOUBLE)
        RETURNS BIGINT
        RETURN CAST(floor(price * (1 - disc) * (1 + tax) * 100) AS BIGINT)
        """
    )
    return spark.sql(
        f"""
        SELECT l_orderkey, l_linenumber,
               charged_cents(l_extendedprice, l_discount, l_tax)
                   AS charged_cents
        FROM {lv} WHERE l_quantity > 45
        """
    )


class _TypeSummary:
    """Python UDTF consuming a TABLE argument partitioned by
    event_type: eval() is fed every row of one partition, terminate()
    emits that partition's summary row — the grouped-custom-aggregation
    shape for logic a SQL aggregate can't express. The rows it
    receives are PER-USER-BUCKET PARTIALS pre-combined in the JVM
    (see the builder): n_users per bucket is exact because the md5
    buckets PARTITION the user space (each user contributes one
    level-1 partial per type, counted in exactly one bucket; NULL
    users contribute events but no user on both engines)."""

    def __init__(self):
        self._type = None
        self._n_events = 0
        self._n_users = 0
        self._sum_c = 0

    def eval(self, row):
        self._type = row["event_type"]
        self._n_events += row["n_events"]
        self._n_users += row["n_users"]
        if row["sum_c"] is not None:
            self._sum_c += row["sum_c"]

    def terminate(self):
        if self._n_events:
            yield self._type, self._n_events, self._n_users, self._sum_c


@register(
    "udtf_table_arg_grouped",
    category="udf",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(coalesce(sum(TRY_CAST(round(value * 100) AS BIGINT)), 0)
                    AS BIGINT) AS sum_value_cents
        FROM events
        WHERE event_type IS NOT NULL
        GROUP BY event_type
    """,
)
def udtf_table_arg_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 TABLE-argument UDTF with ``PARTITION BY`` — the third
    and last Python table-function surface after the lateral per-row
    UDTF (``udtf_python_native``) and Arrow ``applyInPandas``
    (``udaf_grouped_pandas``): the UDTF receives an entire partition
    of a TABLE argument row-by-row and emits its summary from
    ``terminate()``. This is the API for grouped custom logic that is
    neither per-row (lateral) nor naturally vectorizable (pandas) —
    sequential state machines, set trackers, protocol validators.

    Graded on values against the plain SQL rollup, so the partition
    routing (every row of a type reaches exactly one UDTF instance)
    and the terminate() emission contract are both witnessed. Python
    cents mirror the TRY_CAST NULL-degrade (dirty rows sum as 0,
    never raise); NULL event_type rows are excluded on both sides
    (a NULL partition key's routing is engine-specific).

    Scale: the Python boundary is fed PER-USER-BUCKET PARTIALS
    pre-combined by TWO JVM aggregation levels, not raw events —
    shipping raw rows into a row-at-a-time eval() measured 9-10 s at
    sf0.1 (and salting the partition key for parallelism did NOT
    help: the cost is per-row Python itself, ~10k rows/s). The r9
    second level closes the hole the 100x events tier exposed: the
    per-USER partial relation grows with the user domain (measured
    37.9 s at x100 / exponent 0.74 — row-at-a-time eval over the
    grown |users|·|types| rows), so user partials now reduce again
    into 1024 fixed md5 buckets per type. The buckets PARTITION the
    user space, so summing per-bucket exact distinct counts IS the
    per-type distinct count, and Python sees ≤ |types|·1024 rows at
    ANY corpus size (after: 2.4 s / exponent 0.13 at x100). This is the
    standing rule at the Python boundary: reduce in the JVM first,
    cross with partials — the UDTF still witnesses partition routing
    and terminate() emission on multi-row partitions. Declared
    Python surface (tests/test_plan_shape.py allowlist)."""
    from pyspark.sql.functions import udtf

    from ..session import shuffle_partitions  # noqa: F401  (parity import)

    from ._util import cents

    per_user = (
        load(spark, sf_dir, "events")  # load first: ships the package
        .filter(F.col("event_type").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(cents("value")).alias("sum_c"),
        )
    )
    ev = (
        per_user.withColumn(
            "ubkt",
            F.expr(
                "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15),"
                " 16, 10) AS BIGINT) % 1024"
            ),
        )
        .groupBy("event_type", "ubkt")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.count("user_id").alias("n_users"),
            F.sum("sum_c").alias("sum_c"),
        )
    )
    summarizer = udtf(
        _TypeSummary,
        returnType=(
            "event_type string, n_events bigint, n_users bigint,"
            " sum_value_cents bigint"
        ),
    )
    spark.udtf.register("type_summary", summarizer)
    ev.createOrReplaceTempView("_udtf_table_arg_in")
    return spark.sql(
        """
        SELECT t.event_type, t.n_events, t.n_users, t.sum_value_cents
        FROM type_summary(TABLE(_udtf_table_arg_in)
                          PARTITION BY event_type) t
        """
    )


def _charge_iter_fn(batches):
    """Iterator-of-series pandas UDF kernel: the per-TASK setup (here:
    the cents scale; stands in for heavy init like a model load or
    tokenizer build) runs ONCE, then every Arrow batch streams
    through — the API shape whose point is amortizing expensive init
    that a scalar pandas_udf would re-pay per batch. Arithmetic
    mirrors the cents()/TRY_CAST contract: round-half-away-from-zero
    to integer cents, NULL-degrade non-finite/overflow — emitted as a
    nullable Int64 series so the BIGINT gate stays exact."""
    import numpy as np

    scale = 100.0  # one-time per-task setup
    for total in batches:
        v = total.to_numpy(dtype="float64") * scale
        with np.errstate(invalid="ignore"):
            c = np.sign(v) * np.floor(np.abs(v) + 0.5)
        ok = np.isfinite(c) & (np.abs(c) < 2**63)
        out = pd.Series(np.where(ok, c, 0.0)).astype("int64").astype("Int64")
        out[~pd.Series(ok)] = pd.NA
        yield out


@register(
    "udf_iter_pandas",
    category="udf",
    oracle="""
        SELECT o_orderkey,
               TRY_CAST(round(o_totalprice * 100) AS BIGINT)
                   AS total_cents
        FROM orders
    """,
)
def udf_iter_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATOR-form pandas UDF (``Iterator[pd.Series] →
    Iterator[pd.Series]``) — the third and last scalar-Python API
    shape after series→series (``udf_scalar_pandas``) and grouped-map
    (``udaf_grouped_pandas``): the iterator form exists to amortize
    expensive per-task initialization (model/tokenizer load) across
    all of a task's Arrow batches instead of re-paying it per batch.
    Graded on exact integer cents against the TRY_CAST oracle, so the
    batch streaming, the nullable-Int64 Arrow return path, and the
    NULL-degrade contract are all under the value hash.

    Scale: identical topology to the scalar pandas UDF (ArrowEvalPython
    over the scan, no shuffle); the init-amortization is the reason
    this form is the production default for heavy kernels."""
    from typing import Iterator

    o = load(spark, sf_dir, "orders")  # load first: ships the package

    def _wrapped(batches):
        return _charge_iter_fn(batches)

    # this module uses `from __future__ import annotations`, which
    # stringifies inline hints — pandas_udf dispatches the ITERATOR
    # form off the actual typing objects, so attach them explicitly
    _wrapped.__annotations__ = {
        "batches": Iterator[pd.Series],
        "return": Iterator[pd.Series],
    }
    iter_udf = pandas_udf(_wrapped, "long")
    return o.select(
        "o_orderkey", iter_udf("o_totalprice").alias("total_cents")
    )
