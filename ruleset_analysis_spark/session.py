"""SparkSession construction and session-level defaults.

Two entry paths:

* ``get_spark()`` — build our own tuned local-mode session (tests,
  ``bench.py``, ad-hoc use).
* ``ensure_session_defaults(spark)`` — make an *externally provided*
  session (the grading driver's) safe for our queries. Only touches
  runtime-settable SQL confs, never restarts the JVM.

Why each conf matters:

* ``spark.sql.session.timeZone=UTC`` — DuckDB (the correctness oracle)
  uses naive/UTC timestamps; Spark TIMESTAMP is session-TZ-relative.
  Pinning UTC makes collected datetimes bit-identical between engines.
* ``spark.sql.legacy.parquet.nanosAsLong=true`` — an ``events`` table
  stored as ``timestamp[ns]`` (round 1's encoding) is otherwise
  unreadable by Spark 4.x (PARQUET_TYPE_ILLEGAL). With this conf the
  column arrives as int64 nanoseconds and ``normalize_event_ts``
  floor-divides it to microseconds — the same truncation DuckDB
  applies. Harmless when the data is already ``timestamp[us]``
  (round 2's encoding): the loader dispatches on the actual read type.
* ``spark.sql.shuffle.partitions`` — 200 (default) over-parallelizes
  local-mode work; we size to ~cores. At cluster scale this would be
  set per-job from input statistics (or left to AQE coalescing, which
  we also enable).
* Arrow execution — vectorized Python<->JVM transfer for the declared
  pandas-UDF surface and fast ``collect``.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32

_SHIPPED_APPS: set[str] = set()
_DEFAULTED_APPS: set[str] = set()


def shuffle_partitions(spark: SparkSession) -> int:
    """Current shuffle partition count, tolerating non-integer conf
    values some platforms report (e.g. 'auto')."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        return DEFAULT_SHUFFLE_PARTITIONS


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on Spark's Python workers.

    The grading driver may import ``__spark_entry__`` from any cwd; the
    executors' Python workers then cannot resolve
    ``ruleset_analysis_spark`` for the pandas-UDF kernels (functions
    pickle by reference). Shipping the package once per SparkContext
    with ``addPyFile`` (the standard dependency-distribution API — on a
    real cluster this would be the job's wheel/zip artifact) fixes the
    worker import path in every launch mode."""
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _SHIPPED_APPS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.mkdtemp(prefix="ruleset_analysis_spark_"),
        "ruleset_analysis_spark.zip",
    )
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                zf.write(full, rel)
    sc.addPyFile(zip_path)
    # NOTE: the staging zip must OUTLIVE this call — executors fetch
    # addPyFile artifacts lazily from the registered path at their
    # first task (verified: deleting it here fails every job with
    # Utils.fetchFile). One small tempdir per SparkContext is the cost.
    _SHIPPED_APPS.add(app_id)


def ensure_session_defaults(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable defaults to any session. Memoized per
    application — load() calls this on every table load, and the py4j
    conf round-trips are pure overhead after the first call."""
    app_id = spark.sparkContext.applicationId
    if app_id in _DEFAULTED_APPS:
        return spark
    _DEFAULTED_APPS.add(app_id)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Python UDTFs ride Arrow batches instead of pickled rows
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    try:
        if int(spark.conf.get("spark.sql.shuffle.partitions")) > 64:
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS)
            )
    except Exception:  # conf unreadable — leave as-is
        pass
    _ship_package(spark)
    return spark


def get_spark(
    app_name: str = "ruleset-analysis-spark",
    cpus: int | None = None,
    driver_memory: str = "16g",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a tuned local-mode session.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` then ``os.cpu_count()``.
    Local mode is one JVM; ``spark.driver.memory`` is the only memory
    knob that matters there.
    """
    try:
        env_cpus = int((os.environ.get("SPARK_GRAFT_CPUS") or "0").strip())
    except ValueError:  # non-numeric env value — fall back, don't die
        env_cpus = 0
    cpus = cpus or env_cpus or os.cpu_count() or 4
    shuffle = shuffle_partitions or min(DEFAULT_SHUFFLE_PARTITIONS, max(8, cpus))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return ensure_session_defaults(spark)
