"""Time-series operators over the events feed (SURVEY.md §2 B5/B9
adjacents): dense-grid gap filling and last-observation-carried-
forward — the hypertable/rollup query family (TimescaleDB
``time_bucket_gapfill`` / ``locf``) expressed as plain DataFrame ops.

Both are exact-integer plans: day grids are DATE arithmetic, carried
values ride the cent-quantized BIGINT scheme, and orderings carry the
unique (ts, event_id) tiebreak — nothing floats between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table

# ---------------------------------------------------------------- gap fill


@query(
    "b_ts_gapfill",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS lo,
             CAST(max(date_trunc('day', ts)) AS DATE) AS hi
      FROM events
    ),
    grid AS (
      SELECT t.event_type, CAST(g.day AS DATE) AS day
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
        FROM bounds
      ) g
    )
    SELECT g.event_type, g.day,
           CAST(coalesce(d.n, 0) AS BIGINT) AS n,
           CASE WHEN d.n IS NULL THEN 1 ELSE 0 END AS filled
    FROM grid g LEFT JOIN daily d
      ON g.event_type = d.event_type AND g.day = d.day
    """,
)
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily rollup with zero-filled gaps — the dashboard/ML
    contract that every (type, day) cell EXISTS, observed or not
    (TimescaleDB ``time_bucket_gapfill``; missing days silently vanish
    from a plain groupBy and break windowed models downstream).

    Scale shape: the heavy aggregate (events → per-(type,day) counts)
    is ONE partial-then-final groupBy of the fact table; everything
    after runs on rollup-sized data — the day spine is
    days × types rows built from a 1-row bounds aggregate via
    sequence+explode (broadcast by construction), and the left join
    fills against the (tiny) rollup, never re-touching raw events.
    Emitting a `filled` marker keeps imputation auditable."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    bounds = ev.agg(
        F.min(F.date_trunc("day", "ts")).cast("date").alias("lo"),
        F.max(F.date_trunc("day", "ts")).cast("date").alias("hi"),
    )
    days = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    grid = ev.select("event_type").distinct().crossJoin(F.broadcast(days))
    return grid.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        F.when(F.col("n").isNull(), 1).otherwise(0).alias("filled"),
    )


# ---------------------------------------------------------------- LOCF


@query(
    "b_ts_locf",
    """
    WITH marked AS (
      SELECT event_id, user_id, ts, event_type,
             CASE WHEN event_type = 'view' THEN NULL
                  ELSE CAST(round(value * 100) AS BIGINT) END AS x_c
      FROM events
    )
    SELECT event_id, user_id, event_type, x_c,
           last_value(x_c IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x_filled
    FROM marked
    """,
)
def ts_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward imputation: sparse readings
    (here: 'view' events carry no value — a deterministic null
    pattern both engines share) inherit the user's most recent
    observed value; leading nulls stay null.

    One shuffle on user_id + per-user sort buys the whole fill
    (`F.last(ignorenulls=True)` over a trailing frame — Spark
    evaluates it as O(1) running state per row, not a frame re-scan).
    Values are cent-quantized BIGINTs, so the carried value is
    bit-identical across engines."""
    ev = load_table(spark, sf_dir, "events")
    x_c = F.when(
        F.col("event_type") == "view", F.lit(None).cast("long")
    ).otherwise(F.round(F.col("value") * 100).cast("long"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", "event_type", "ts", x_c.alias("x_c")
    ).select(
        "event_id",
        "user_id",
        "event_type",
        "x_c",
        F.last("x_c", ignorenulls=True).over(w).alias("x_filled"),
    )


# ---------------------------------------------------------------- EWMA

# Bounded-lag exponentially-weighted moving average, alpha = 1/2.
# The textbook recurrence y_n = a*y_{n-1} + (1-a)*x_n is sequential —
# it cannot shuffle-parallelize and its unbounded weight product
# drifts between engines.  The scale-safe form truncates the kernel
# at K=8 lags (weights 2^-j are EXACT binary doubles; the j>=8 tail
# contributes < 2^-7 of the mass) and renormalizes over the lags that
# exist, so the whole operator is one window over (user, time) — a
# single shuffle on user_id, embarrassingly parallel across users,
# and bit-identical on any engine because every product and the
# left-to-right addition chain is written out explicitly in the
# shared text.
_EWMA_LAGS = 8
_EWMA_TERMS = " + ".join(
    f"(CASE WHEN lag(value, {j}) OVER w IS NULL THEN 0.0 "
    f"ELSE {0.5 ** j!r} * lag(value, {j}) OVER w END)"
    for j in range(_EWMA_LAGS)
)
_EWMA_MASS = " + ".join(
    f"(CASE WHEN lag(value, {j}) OVER w IS NULL THEN 0.0 "
    f"ELSE {0.5 ** j!r} END)"
    for j in range(_EWMA_LAGS)
)
_EWMA_SQL = f"""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(CASE WHEN rn_last = 1 THEN ewma END) AS DOUBLE) AS ewma_now
FROM (SELECT user_id,
             ({_EWMA_TERMS}) / ({_EWMA_MASS}) AS ewma,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) AS smoothed
GROUP BY user_id
"""


@query("b_ts_ewma", _EWMA_SQL)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of the event value stream, reported as the
    latest smoothed level per user (the anomaly-detection / trend
    primitive).  Shared-text SQL on both engines — see the kernel
    notes above: one user_id shuffle, eight register-local lags, no
    sequential recurrence, no float divergence.  The final
    latest-row pick rides the SAME window partitioning (row_number
    DESC on the (ts, event_id) unique key), so Spark plans a single
    Exchange for both window functions."""
    from ..sources.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EWMA_SQL)


# ---------------------------------------------------------------- OHLC bars

# Daily open-high-low-close resampling — the downsampling contract
# every metrics store ships (TimescaleDB time_bucket + first/last,
# kdb+ xbar).  open/close are SELECTIONS (first/last row by the
# unique (ts, event_id) order), not sums — exact under any execution
# order; high/low are min/max.  Nothing needs the cent grid.
_OHLC_SQL = """
SELECT event_type,
       bar_day,
       CAST(max(CASE WHEN rn_open  = 1 THEN value END) AS DOUBLE) AS open,
       CAST(max(value) AS DOUBLE) AS high,
       CAST(min(value) AS DOUBLE) AS low,
       CAST(max(CASE WHEN rn_close = 1 THEN value END) AS DOUBLE) AS close,
       CAST(count(*) AS BIGINT) AS n
FROM (SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS bar_day,
             value,
             row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn_open,
             row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events) AS ticks
GROUP BY event_type, bar_day
"""


@query("b_ts_resample", _OHLC_SQL)
def ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC downsampling of the events feed per type — raw
    ticks in, one bar row per (type, day) out.  Plan shape: both
    row_numbers and the final groupBy share the (event_type, day)
    key, so Spark plans ONE exchange on the bucket key, sorts once
    per direction, and the aggregate is map-side-combinable; output
    is rollup-sized (types × days), which is what makes resampling
    the standard first move against a 100 TB tick table."""
    from ..sources.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_OHLC_SQL)


# ------------------------------------------------------------- rolling DAU

# Rolling 7-day distinct users per day — the engagement metric whose
# naive form (per-day COUNT(DISTINCT) over a 7-day self-join of raw
# events) rescans the fact once per window day.  The scale-safe plan:
# dedupe the fact ONCE to (day, user) pairs (a map-combinable
# distinct, the only fact-sized step), then explode each pair into
# the ≤7 window days it covers — a bounded ×7 fan-out of the
# rollup — and count distinct per cover day.  COUNT(DISTINCT) over
# the exploded rollup is Spark's standard two-phase expand, keyed on
# (day, user): no single hot reducer.
@query(
    "b_ts_rolling_dau",
    """
    WITH du AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        FROM events
    )
    SELECT g.day,
           CAST(count(DISTINCT u.user_id) AS BIGINT) AS dau7
    FROM (SELECT DISTINCT day FROM du) g
    JOIN du u ON u.day <= g.day AND u.day >= g.day - 6
    GROUP BY g.day
    """,
)
def ts_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per observed day.

    The Spark side materializes the window membership by exploding
    each (day, user) pair into cover days ``day .. day+6`` (sequence
    + explode, integer date arithmetic) and counting distinct users
    per cover day, restricted to days that actually appear in the
    data — exactly the inner-join semantics of the oracle's
    range-join formulation (DuckDB's DATE-int arithmetic isn't
    portable SQL, so the two sides share semantics, not text).
    Cost at 100 TB: one distinct of the fact + a ×7 rollup fan-out;
    the naive 7-way self-join of raw events never happens."""
    from ..sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    ).distinct()
    observed = du.select("day").distinct()
    covered = du.select(
        F.explode(
            F.expr("sequence(day, date_add(day, 6), interval 1 day)")
        ).alias("day"),
        "user_id",
    )
    return (
        covered.join(observed, "day")
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("dau7"))
    )


# ------------------------------------------------------- cumulative users

# Cumulative distinct users by day — the growth curve.  The exact
# windowed COUNT(DISTINCT) Spark refuses (distinct over a running
# frame) is unnecessary: a user contributes from their FIRST active
# day forever, so cumulative distinct = running sum of first-
# appearance counts.  One fact-sized groupBy (min day per user), one
# tiny rollup, one running sum over days.
@query(
    "b_ts_cumulative_users",
    """
    WITH first_day AS (
        SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS day
        FROM events
        GROUP BY user_id
    ),
    new_users AS (
        SELECT day, count(*) AS n_new
        FROM first_day
        GROUP BY day
    )
    SELECT day,
           CAST(n_new AS BIGINT) AS n_new,
           CAST(sum(n_new) OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT)
               AS cumulative_users
    FROM new_users
    """,
)
def ts_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day via the first-appearance
    decomposition (see the kernel note above).  Scale shape: min-day
    per user is ONE map-combinable aggregate of the fact; everything
    downstream (per-day new-user counts, the running sum) operates on
    day-cardinality data, where the single-partition window over ~10³
    day rows is free — compare the naive per-day `COUNT(DISTINCT ...
    WHERE ts <= day)` rescan, which is quadratic in days.  All
    integers."""
    ev = load_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts").cast("date")).alias("day")
    )
    new_users = first_day.groupBy("day").agg(F.count("*").alias("n_new"))
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return new_users.select(
        "day",
        F.col("n_new").cast("long").alias("n_new"),
        F.sum("n_new").over(w).cast("long").alias("cumulative_users"),
    )


# ------------------------------------------------------- forecast error


@query(
    "b_ts_forecast_naive",
    """
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               sum(CAST(round(value * 100.0) AS BIGINT)) AS cents
        FROM events
        GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
    ),
    scored AS (
        SELECT event_type, day, cents,
               lag(cents, 7) OVER (PARTITION BY event_type ORDER BY day)
                   AS forecast
        FROM daily
    )
    SELECT event_type,
           CAST(count(forecast) AS BIGINT) AS n_scored_days,
           CAST(sum(abs(cents - forecast)) AS BIGINT) AS mae_cents_total,
           CAST(max(abs(cents - forecast)) AS BIGINT) AS worst_day_cents
    FROM scored
    GROUP BY event_type
    """,
)
def ts_forecast_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast scorecard: predict each day's metric
    with its value 7 days earlier and report the absolute-error
    totals — the baseline every real forecaster must beat (and the
    drift alarm when a live pipeline's error jumps).  Errors are
    |cents − cents| BIGINTs, so the scorecard is exact under any
    aggregation order.

    Scale shape: the fact collapses to the (type, day) rollup in one
    map-combinable pass; the lag-7 window and the error rollup both
    ride a single event_type-keyed partition of day-cardinality
    data."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100.0).cast("long")).alias("cents"))
    w = Window.partitionBy("event_type").orderBy("day")
    scored = daily.select(
        "event_type", "cents", F.lag("cents", 7).over(w).alias("forecast")
    )
    err = F.abs(F.col("cents") - F.col("forecast"))
    return scored.groupBy("event_type").agg(
        F.count("forecast").cast("long").alias("n_scored_days"),
        F.sum(err).cast("long").alias("mae_cents_total"),
        F.max(err).cast("long").alias("worst_day_cents"),
    )


# ------------------------------------------------------- concurrency sweep


@query(
    "b_ts_concurrency",
    """
    WITH marks AS (
        SELECT ts, 1 AS delta
        FROM events WHERE event_type IN ('view', 'click')
        UNION ALL
        SELECT ts + INTERVAL '30 minutes', -1
        FROM events WHERE event_type IN ('view', 'click')
    ),
    swept AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               sum(delta) OVER (ORDER BY ts, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS live
        FROM marks
    )
    SELECT day,
           CAST(max(live) AS BIGINT) AS peak_concurrency
    FROM swept
    GROUP BY day
    """,
)
def ts_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency via the interval-sweep prefix sum — the
    classic 'how many sessions were live at once' question answered
    WITHOUT interval self-joins: each activity window (here a fixed
    30-minute lease per view/click) emits +1 at start and −1 at
    expiry; a running sum over the merged timeline IS the live count,
    and the per-day max is the capacity-planning number.

    Ordering note: the window orders by (ts, delta) so an expiry and
    a start at the SAME microsecond process the −1 first —
    deterministic and conservative on both engines.

    Scale shape — DAY-SHARDED prefix sum, exact: a global running sum
    at mark m equals (sum of ALL deltas on days before m's day) +
    (running sum within m's day), so the sweep decomposes into a
    per-day partitioned window over the marks plus a day-cardinality
    carry-in rollup that broadcasts.  No single-partition fact-sized
    sort anywhere (the naive ``Window.orderBy(ts)`` with no partition
    key funnels every mark through ONE task — the exact WindowExec
    warning Spark prints for it); the only unpartitioned window left
    runs over ~10³ day rows.  The decomposition is an identity, not
    an approximation — the oracle keeps the single global-window SQL
    and the hashes must still match."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    starts = ev.select(F.col("ts"), F.lit(1).alias("delta"))
    ends = ev.select(
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("ts"),
        F.lit(-1).alias("delta"),
    )
    marks = starts.unionByName(ends).withColumn(
        "day", F.date_trunc("day", "ts").cast("date")
    )
    # carry-in per day = cumulative sum of full-day totals up to the
    # PREVIOUS day — day-cardinality data, so the unpartitioned
    # running-sum window here is bounded by construction.
    day_w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        marks.groupBy("day")
        .agg(F.sum("delta").alias("day_total"))
        .select(
            "day",
            (F.sum("day_total").over(day_w) - F.col("day_total")).alias(
                "carry_in"
            ),
        )
    )
    in_day_w = (
        Window.partitionBy("day")
        .orderBy("ts", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = marks.join(F.broadcast(carry), "day").select(
        "day",
        (F.col("carry_in") + F.sum("delta").over(in_day_w)).alias("live"),
    )
    return swept.groupBy("day").agg(
        F.max("live").cast("long").alias("peak_concurrency")
    )


# ------------------------------------------------------------ anomaly flags

# Rolling z-score anomaly detection on the daily value totals per
# event type — the ops-monitoring primitive (did today's volume leave
# the trailing-28-day band?).  Everything decision-bearing is exact
# integer arithmetic on a DOLLAR grid: daily totals sum on the cent
# grid then round to whole dollars (dollars/day ≲ 1e7 at any
# plausible SF), so the trailing-window moments obey
# n·S2 ≤ 28·(1e7)²·28 ≈ 8e16 and S1² ≤ (2.8e8)² ≈ 8e16 — both inside
# BIGINT — and the 3σ test cross-multiplies to
# (x·n − S1)² > 9·(n·S2 − S1²) with zero float ops (population σ; the
# statistic is *defined* on the dollar grid, the b_stat_* treatment).
# The current day is EXCLUDED from its own baseline (1 PRECEDING), so
# a spike can't suppress itself; short histories (n < 14) never flag.
# Plan shape: one fact-sized map-combinable groupBy to (type, day),
# then ONE exchange on event_type for the window — rollup-sized work.
_ANOMALY_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(sum(CAST(round(value * 100.0) AS BIGINT)) / 100.0)
              AS BIGINT) AS dollars
  FROM events
  GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
),
win AS (
  SELECT event_type, day, dollars,
         count(*)              OVER w AS n,
         sum(dollars)          OVER w AS s1,
         sum(dollars * dollars) OVER w AS s2
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, dollars,
       CAST(coalesce(n, 0) AS BIGINT) AS base_n,
       CASE WHEN n >= 14
             AND (dollars * n - s1) * (dollars * n - s1)
                 > 9 * (n * s2 - s1 * s1)
            THEN 1 ELSE 0 END AS anomaly
FROM win
"""


@query("b_ts_anomaly", _ANOMALY_SQL)
def ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window 3σ anomaly flags on per-type daily totals —
    shared-text SQL on both engines; see the kernel notes above for
    the dollar-grid overflow budget and the self-exclusion frame."""
    from ..sources.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_ANOMALY_SQL)
