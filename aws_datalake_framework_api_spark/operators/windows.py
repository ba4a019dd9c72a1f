"""Window functions (SURVEY.md §2 B5).

One shuffle on the partition key + one per-partition sort buys every
function in the family — rank, analytic, and frames alike.  All
orderings carry a unique tiebreak column so results are deterministic
(required by the value-hash oracle, and good hygiene generally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table

# ---------------------------------------------------------------- ranking


@query(
    "b_win_rank",
    """
    SELECT c_custkey, c_nationkey,
           round(c_acctbal, 2) AS bal,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per nation by balance."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.col("c_custkey"))
    return customer.select(
        "c_custkey",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("bal"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ---------------------------------------------------------------- analytic


@query(
    "b_win_lag",
    """
    SELECT event_id, user_id, ts,
           round(value, 2) AS value,
           round(lag(value) OVER w, 2) AS prev_value,
           round(lead(value) OVER w, 2) AS next_value,
           round(first_value(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS first_value,
           CAST(lag(ts, 1) OVER w AS TIMESTAMP) AS prev_ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first_value over each user's event timeline."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 2).alias("value"),
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
        F.round(F.first("value").over(wf), 2).alias("first_value"),
        F.lag("ts", 1).over(w).alias("prev_ts"),
    )


# ---------------------------------------------------------------- frames


@query(
    "b_win_frame",
    """
    SELECT o_orderkey, o_custkey, o_orderdate,
           round(o_totalprice, 2) AS price,
           round(sum(round(o_totalprice, 2)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           round(sum(round(o_totalprice, 2)) OVER w3 / count(*) OVER w3, 4) AS moving_avg3,
           round(sum(round(o_totalprice, 2)) OVER (
             PARTITION BY o_custkey ORDER BY CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS sum_30d
    FROM orders
    WINDOW w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frames (running total, moving avg) + a RANGE frame over a
    day-number axis (trailing-30-day spend).  Frame sums use
    cent-rounded addends: sliding-window aggregation (segment trees /
    removable accumulators) re-associates float adds differently per
    engine, so only grid-exact addends give stable cents (see
    functions/numeric.py)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice"), 2)
    w_rows = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w3 = w_rows.rowsBetween(-2, 0)
    day_no = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("long")
    w_range = Window.partitionBy("o_custkey").orderBy(day_no).rangeBetween(-30, 0)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        cents.alias("price"),
        F.round(
            F.sum(cents).over(
                w_rows.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("running_total"),
        F.round(F.sum(cents).over(w3) / F.count(F.lit(1)).over(w3), 4).alias(
            "moving_avg3"
        ),
        F.round(F.sum(cents).over(w_range), 2).alias("sum_30d"),
    )


# ---------------------------------------------------------------- top-k per group


@query(
    "b_win_topk",
    """
    SELECT n_name, rnk, c_custkey, round(c_acctbal, 2) AS bal
    FROM (
      SELECT n_name, c_custkey, c_acctbal,
             CAST(row_number() OVER (
               PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey
             ) AS BIGINT) AS rnk
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    )
    WHERE rnk <= 5
    """,
)
def win_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 customers by balance per nation — the scalable top-k-per-
    group (rank + filter pushes the limit inside each partition; AQE
    never materializes the full sorted table)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.col("c_custkey"))
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.row_number().over(w).cast("long").alias("rnk"),
            "c_custkey",
            F.round("c_acctbal", 2).alias("bal"),
        )
        .filter(F.col("rnk") <= 5)
        .select("n_name", "rnk", "c_custkey", "bal")
    )


# ------------------------------------------------- rolling anomaly (z-score)

#: Trailing-window length (events) for the rolling baseline.
ZSCORE_LOOKBACK = 20
#: Minimum baseline size before an anomaly verdict is attempted.
ZSCORE_MIN_N = 5
#: |z| threshold, applied squared (z² > 9 ⟺ |z| > 3).
ZSCORE_THRESH_SQ = 9


@query(
    "b_win_zscore",
    f"""
    WITH c AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS x_c
      FROM events
    ),
    r AS (
      SELECT event_id, user_id, x_c,
             CAST(count(*) OVER w AS BIGINT)   AS n_prev,
             CAST(coalesce(sum(x_c) OVER w, 0) AS BIGINT)         AS s1,
             CAST(coalesce(sum(x_c * x_c) OVER w, 0) AS BIGINT)   AS s2
      FROM c
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {ZSCORE_LOOKBACK} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, x_c, n_prev, s1,
           CASE WHEN n_prev >= {ZSCORE_MIN_N}
                 AND (n_prev * x_c - s1) * (n_prev * x_c - s1)
                     > {ZSCORE_THRESH_SQ} * (n_prev * s2 - s1 * s1)
                THEN 1 ELSE 0 END AS anomaly
    FROM r
    """,
)
def win_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flag over each user's event values —
    the streaming-metrics primitive (flag a value > 3σ from its own
    trailing baseline) expressed as a windowed aggregate.

    EXACT INTEGER arithmetic end-to-end: values are cent-quantized
    BIGINTs, the baseline's Σx and Σx² are integer window sums over a
    trailing ROWS frame that EXCLUDES the current row, and the z²>9
    test is cross-multiplied —
    ``(n·x − S₁)² > 9·(n·S₂ − S₁²)`` ⟺ ``(x−μ)² > 9σ²`` (population
    σ², both sides scaled by n²) — so no float sqrt/stddev ever runs
    and the verdict is bit-identical across engines (a float
    ``stddev`` window differs in last-ulp between Spark's removable
    accumulator and DuckDB's segment tree).

    Scale shape: one shuffle on user_id + per-user sort, the same
    single-pass frame evaluation as `b_win_frame`; the frame is O(1)
    state per row (running removable integer sums).  Magnitudes are
    safe: |x_c| ≤ ~10⁶ cents ⇒ n·S₂ ≤ 20·20·10¹² ≪ 2⁶³."""
    ev = load_table(spark, sf_dir, "events")
    x_c = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZSCORE_LOOKBACK, -1)
    )
    base = ev.select(
        "event_id", "user_id", "ts", x_c.alias("x_c")
    ).select(
        "event_id",
        "user_id",
        "x_c",
        F.count("*").over(w).cast("long").alias("n_prev"),
        F.coalesce(F.sum("x_c").over(w), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum(F.col("x_c") * F.col("x_c")).over(w), F.lit(0))
        .cast("long")
        .alias("s2"),
    )
    n, x, s1, s2 = (F.col(c) for c in ("n_prev", "x_c", "s1", "s2"))
    dev = n * x - s1
    return base.select(
        "event_id",
        "user_id",
        "x_c",
        "n_prev",
        "s1",
        F.when(
            (n >= ZSCORE_MIN_N)
            & (dev * dev > ZSCORE_THRESH_SQ * (n * s2 - s1 * s1)),
            1,
        )
        .otherwise(0)
        .alias("anomaly"),
    )


# ---------------------------------------------------------- winsorization


@query(
    "b_fn_winsorize",
    """
    WITH bounds AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round(e.value, 2) AS value,
           round(least(greatest(e.value, b.lo), b.hi), 2) AS w_value,
           CASE WHEN e.value < b.lo OR e.value > b.hi THEN 1 ELSE 0 END
             AS clipped
    FROM events e JOIN bounds b ON e.event_type = b.event_type
    """,
)
def fn_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — per-group outlier clipping at the exact
    [p05, p95] band, the robust-statistics pre-step for metrics and
    model features (a heavy-tail event corrupts any mean/σ the
    dashboards downstream compute; clipping at exact percentiles is
    the auditable fix, and the ``clipped`` marker keeps it auditable
    row by row).

    Plan: the bounds table is one partial-agg groupBy producing one
    row per group (exact ``percentile`` — lerp-identical to DuckDB's
    ``quantile_cont``, the `b_agg_quantiles` precedent), broadcast
    back onto the fact; clamp + flag are pure map arithmetic.  Two
    passes over the fact is the exact-percentile price; at unbounded
    cardinality swap in ``approx_percentile`` with the
    `b_agg_approx`-style band scorecard."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    return ev.join(F.broadcast(bounds), "event_type").select(
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
        F.round(F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")), 2).alias(
            "w_value"
        ),
        F.when(
            (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1
        )
        .otherwise(0)
        .alias("clipped"),
    )


# ------------------------------------------------------ transition matrix


@query(
    "b_win_transitions",
    """
    WITH nxt AS (
      SELECT event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type, next_type, count(*) AS n
      FROM nxt WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ),
    t AS (
      SELECT event_type, CAST(sum(n) AS BIGINT) AS row_total FROM c
      GROUP BY event_type
    )
    SELECT c.event_type, c.next_type, c.n,
           CAST(c.n * 1000000 // t.row_total AS BIGINT) AS p_x1e6
    FROM c JOIN t ON c.event_type = t.event_type
    """,
)
def win_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: how
    often each event type is followed by each other type within a
    user's timeline — the path-analysis primitive behind funnels,
    next-action prediction features, and bot detection (a user whose
    transitions concentrate on one edge is a loop).

    Transition probabilities are emitted as exact integer-μ
    (``n·10⁶ DIV row_total`` — floor-divided BIGINTs, no float
    division to drift).  One shuffle on user_id for the lead, then a
    types²-sized groupBy — the output is |event types|² rows no
    matter the corpus size."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    c = nxt.groupBy("event_type", "next_type").agg(F.count("*").alias("n"))
    t = c.groupBy("event_type").agg(F.sum("n").cast("long").alias("row_total"))
    return c.join(t, "event_type").select(
        "event_type",
        "next_type",
        "n",
        F.expr("CAST(n * 1000000 DIV row_total AS BIGINT)").alias("p_x1e6"),
    )


# ------------------------------------------------- distribution windows


@query(
    "b_win_dist",
    """
    SELECT o_orderkey,
           o_orderstatus,
           ntile(10) OVER w AS decile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WHERE o_orderkey % 11 = 0
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey)
    """,
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution-window family (ntile / percent_rank /
    cume_dist) completing the window surface next to rank/lag/frames/
    top-k.  Determinism is the whole trick: the ORDER BY carries the
    unique orderkey as tie-break, so the bucket boundaries and both
    rank ratios are the same on any engine and partition order;
    percent_rank = (rank-1)/(n-1) and cume_dist = rank/n are single
    IEEE divisions of exact ints — identical bits on Spark and DuckDB.
    One shuffle on the partition key, as for every window op."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.round(F.col("o_totalprice") * 100).cast("long"), "o_orderkey")
    )
    return orders.filter(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# ---------------------------------------------------------- gaps-and-islands


@query(
    "b_win_streak",
    """
    WITH du AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ),
    isl AS (
        SELECT user_id,
               day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                          AS INTEGER) AS grp
        FROM du
    ),
    streaks AS (
        SELECT user_id, grp, count(*) AS len
        FROM isl
        GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS active_days,
           CAST(count(*) AS BIGINT) AS n_streaks
    FROM streaks
    GROUP BY user_id
    """,
)
def win_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-day activity streak per
    user — THE classic window-function interview shape, and a real
    retention metric.  The trick: ``day − row_number(day)`` is
    constant exactly within a consecutive run, so islands fall out of
    one window + one groupBy with NO self-join or iteration.

    Scale shape: distinct the fact to (user, day) once (the only
    fact-sized step, map-combinable), then ONE user_id shuffle shared
    by the row_number window, the island groupBy, and the final
    per-user rollup — Spark plans a single Exchange because every
    stage keys on user_id.  All integers; date−int arithmetic is
    exact on both engines."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = du.select(
        "user_id",
        F.date_sub(F.col("day"), F.row_number().over(w).cast("int")).alias("grp"),
    )
    streaks = isl.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.sum("len").cast("long").alias("active_days"),
        F.count("*").cast("long").alias("n_streaks"),
    )
