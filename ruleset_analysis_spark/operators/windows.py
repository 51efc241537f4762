"""§2.E — window functions.

Not expressible in the reference's RDD surface (it sorted whole result
sets instead, [R-mem] ``sortBy``); required for its "top talkers per
rule" reporting style and for modern analytics parity.

Determinism: every ORDER BY carries a unique tiebreak column so frame
contents are identical between Spark and DuckDB. Frames are spelled
explicitly on both sides — the engines' default frames differ for
RANGE. Running/moving accumulations happen in identical frame order, so
doubles match bit-for-bit; rounding is belt-and-braces.

Scale notes: windows partition by a key (user, segment, customer)
except two deliberate globals — ``window_ntile_cume`` (reporting-size
ranking; use approx quantiles at cluster scale) and
``window_moving_avg_range``, whose input is already aggregated to one
row per day before the window, so the single partition is bounded by
distinct days, not raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..plans.registry import register
from ..sources.parquet import load
from ._util import cents


@register(
    "window_rank_topk_per_group",
    category="window",
    oracle="""
        SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
            SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                   row_number() OVER (PARTITION BY c.c_mktsegment
                                      ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ) WHERE rn <= 3
    """,
)
def window_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by value per market segment ("top talkers per rule").

    Scale shape — deliberately the plain one-window form: the
    rank-≤-k-with-filter pattern plans as **WindowGroupLimit** in
    Spark 4, with a PARTIAL group-limit below the exchange — each
    input partition ships at most k=3 candidates per segment, and the
    final per-segment window sees ≤ 3·|input partitions| rows at any
    corpus size, never the fact table. Verified in the executed plan
    (two WindowGroupLimit nodes: partial below the Exchange, final
    above — pinned by the plan-shape test) and the mechanism
    `sample_topk_reservoir` documents. A round-8 session briefly
    replaced this with a hand-salted two-level top-k before the plan
    audit showed the optimizer already provides exactly that bound;
    hand-salting would only re-implement WindowGroupLimit with an
    extra exchange and a count job."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_sum",
    category="window",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(sum(TRY_CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) / 100.0 AS running_total
        FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals sum BIGINT cents: windowed double sums are
    association-order-dependent (segment-tree evaluation differs per
    engine); integer sums are exact whatever the tree shape."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents("o_totalprice")).over(w) / F.lit(100.0)).alias(
            "running_total"
        ),
    )


@register(
    "window_lag_lead",
    category="window",
    oracle="""
        SELECT event_id, user_id,
               round(value - lag(value) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id), 6) AS delta_prev,
               round(lead(value) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) - value, 6) AS delta_next
        FROM events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 6).alias("delta_next"),
    )


@register(
    "window_moving_avg_range",
    category="window",
    oracle="""
        WITH daily AS (
            SELECT CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
                        AS BIGINT) AS d,
                   CAST(o_orderdate AS DATE) AS order_date,
                   CAST(sum(TRY_CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS dc
            FROM orders GROUP BY 1, 2
        )
        SELECT order_date, dc / 100.0 AS day_total,
               round(CAST(sum(dc) OVER w AS BIGINT)
                     / (count(*) OVER w * 100.0), 4) AS ma7
        FROM daily
        WINDOW w AS (ORDER BY d RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average over a RANGE frame keyed on an integer
    day-index (Spark rangeBetween needs a numeric ORDER BY; keeping the
    same integer key in the oracle makes the frames provably identical).
    Daily totals and the windowed average both run on BIGINT cents —
    order-independent sums, one shared IEEE division at the edge."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01").cast("date"))
        .cast("bigint")
        .alias("d"),
        F.to_date("o_orderdate").alias("order_date"),
    ).agg(F.sum(cents("o_totalprice")).alias("dc"))
    w = Window.orderBy("d").rangeBetween(-6, Window.currentRow)
    return daily.select(
        "order_date",
        (F.col("dc") / F.lit(100.0)).alias("day_total"),
        F.round(
            F.sum("dc").over(w) / (F.count(F.lit(1)).over(w) * F.lit(100.0)), 4
        ).alias("ma7"),
    )


@register(
    "window_ntile_cume",
    category="window",
    oracle="""
        SELECT c_custkey,
               CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS quartile,
               round(cume_dist() OVER (ORDER BY c_acctbal, c_custkey), 6) AS cd,
               round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pr
        FROM customer
    """,
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ranking — reporting-size data only; the graded scale
    sibling is ``agg_quantiles_approx`` (mergeable GK sketch, no sort),
    with a rank-tolerance test pinning its accuracy."""
    c = load(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


@register(
    "window_first_last",
    category="window",
    oracle="""
        SELECT o_orderkey, o_custkey,
               first_value(o_totalprice) OVER w AS first_price,
               last_value(o_totalprice) OVER w AS last_price,
               nth_value(o_totalprice, 2) OVER w AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value with an EXPLICIT full-partition
    frame — the default frame (unbounded preceding → current row) makes
    last_value equal the current row, the classic window-function trap;
    spelling the frame identically on both engines is the fix and the
    differential proves it."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "window_percent_dense",
    category="window",
    oracle="""
        SELECT c_mktsegment, c_custkey, c_acctbal, drank, pr FROM (
            SELECT c_mktsegment, c_custkey, c_acctbal,
                   dense_rank() OVER w AS drank,
                   round(percent_rank() OVER w, 6) AS pr
            FROM customer
            WINDOW w AS (PARTITION BY c_mktsegment
                         ORDER BY c_acctbal DESC, c_custkey)
        ) WHERE pr <= 0.01
    """,
)
def window_percent_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-percentile-per-group via percent_rank + dense_rank: keep
    customers in the top 1% of account balance within their market
    segment. percent_rank is (rank-1)/(n-1) — an exact integer
    rational, hash-stable cross-engine. Partitioned window (shuffle on
    segment only); the post-filter prunes 99% of rows before any
    downstream join — the percentile-gate curation shape."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.dense_rank().over(w).alias("drank"),
            F.round(F.percent_rank().over(w), 6).alias("pr"),
        )
        .filter(F.col("pr") <= 0.01)
    )


@register(
    "window_cumulative_reach",
    category="window",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, min(CAST(ts AS DATE)) AS d
            FROM events GROUP BY user_id
        ),
        new_per_day AS (
            SELECT d, count(*) AS n_new FROM first_seen GROUP BY d
        )
        SELECT d, n_new,
               CAST(sum(n_new) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cumulative_users
        FROM new_per_day
    """,
)
def window_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day ("reach") via the first-seen
    rewrite: COUNT(DISTINCT user) OVER (ORDER BY day) is either
    unsupported or quadratic on most engines — the scalable identity
    is `distinct-so-far(d) = Σ_{d'≤d} users first seen on d'`. Two
    keyed aggregations (per-user min, per-day count) and a running sum
    over ~|days| rows: the global window is bounded by the calendar,
    not the corpus, same justification as window_moving_avg_range."""
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d")
    )
    new_per_day = first_seen.groupBy("d").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return new_per_day.select(
        "d", "n_new", F.sum("n_new").over(w).alias("cumulative_users")
    )


@register(
    "window_gaps_islands",
    category="window",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ),
        grp AS (
            SELECT user_id, d,
                   d - CAST(row_number() OVER (PARTITION BY user_id
                                               ORDER BY d) AS INTEGER)
                       AS anchor
            FROM days
        )
        SELECT user_id, min(d) AS streak_start, max(d) AS streak_end,
               count(*) AS streak_days
        FROM grp GROUP BY user_id, anchor
    """,
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's runs of CONSECUTIVE active days
    (streaks) — engagement's favorite metric, and the canonical
    date-minus-row_number grouping trick: within a user, consecutive
    days share the constant ``d - row_number()`` anchor, so one window
    plus one groupBy finds every island without any self-join or
    iteration. The plan carries TWO exchanges by design: the
    (user_id, d) dedup aggregates map-side FIRST (at 100 TB a user-day
    can hold hundreds of events — partial dedup cuts shuffle volume by
    that factor), then only distinct day pairs re-shuffle to user_id
    for the window; the island groupBy reuses the window's
    partitioning (HashPartitioning(user_id) clusters
    (user_id, anchor))."""
    ev = load(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.select(
        "user_id",
        "d",
        F.date_sub("d", F.row_number().over(w)).alias("anchor"),
    )
    return (
        grp.groupBy("user_id", "anchor")
        .agg(
            F.min("d").alias("streak_start"),
            F.max("d").alias("streak_end"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .drop("anchor")
    )


@register(
    "window_rate_limit_quota",
    category="window",
    oracle="""
        SELECT event_id, user_id, d, rn FROM (
            SELECT event_id, user_id, CAST(ts AS DATE) AS d,
                   row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn <= 3
    """,
)
def window_rate_limit_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quota enforcement: keep each user's FIRST 3 events
    per day (arrival order, event_id tiebreak) — the batch form of
    rate limiting / per-key sampling that, unlike random sampling,
    survives reruns and backfills bit-identically.

    One window exchange on (user, day); the rank predicate prunes
    everything else before any downstream join. At 100 TB the same
    shape caps any per-entity explosion (posts per author, hits per
    rule) ahead of a skew-prone join — quota-before-join is the
    cheap alternative to salting when business semantics allow it."""
    ev = load(spark, sf_dir, "events")
    d = F.to_date("ts").alias("d")
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy(
        "ts", "event_id"
    )
    return (
        ev.select("event_id", "user_id", d, F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_median_moving",
    category="window",
    oracle="""
        WITH b AS (
            SELECT user_id, event_id, ts,
                   TRY_CAST(round(value * 100) AS BIGINT) AS c
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
              AND TRY_CAST(round(value * 100) AS BIGINT) IS NOT NULL
        ),
        w AS (
            SELECT user_id, event_id,
                   list_sort(list(c) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
                   )) AS arr
            FROM b
        )
        SELECT user_id, event_id,
               CAST(len(arr) AS BIGINT) AS n_win,
               CAST(arr[CAST((len(arr) - 1) // 2 AS INTEGER) + 1]
                    + arr[CAST(len(arr) // 2 AS INTEGER) + 1]
                    AS BIGINT) AS median2_cents
        FROM w
    """,
)
def window_median_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling median of the money column over each user's last
    5 events — the order-statistic-over-a-moving-frame operator Spark
    has no native window function for (rank functions can't see a
    frame; ``percentile`` isn't a window function): composed as
    collect-the-bounded-frame → ``array_sort`` → middle elements, all
    inside codegen. The robust-baseline primitive behind per-entity
    anomaly thresholds (median-of-recent beats mean-of-recent under
    the exact spikes being hunted).

    Integer-exact gate: emits 2× the median (lower middle + upper
    middle of the sorted frame — equal for odd frames), so the even-
    frame average never becomes a float; the consumer divides. Frame
    is ROWS-bounded (≤ 5 elements), so per-row state is O(frame), the
    sort is a 5-element insertion inside the projection, and the only
    exchange is the user-keyed window shuffle — the same partitioning
    every other per-user window in the module rides. NULL user/ts/
    value rows are excluded identically on both sides."""
    from ._util import cents

    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", cents("value").alias("c"))
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("c").isNotNull()
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("c").over(w))
    return ev.select(
        "user_id",
        "event_id",
        arr.alias("arr"),
    ).select(
        "user_id",
        "event_id",
        F.size("arr").cast("long").alias("n_win"),
        (
            F.element_at("arr", ((F.size("arr") - 1) / 2).cast("int") + 1)
            + F.element_at("arr", (F.size("arr") / 2).cast("int") + 1)
        ).cast("long").alias("median2_cents"),
    )
