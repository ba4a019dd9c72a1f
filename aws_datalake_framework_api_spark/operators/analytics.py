"""Product-analytics compositions over the events feed: ordered-step
funnels and cohort retention — the query family a data-lake analytics
engine serves daily (SURVEY.md §2 B4/B5 compositions; no single Spark
primitive, all built-in operators).

Both are shuffle-frugal by construction: every aggregate keys on
user_id (one shuffle reused by cascade joins in the funnel; one
shuffle + a broadcastable per-user dim in retention), and every output
is exact ints — no float drift between engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table


@query(
    "b_funnel",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click_after_view,
           (SELECT count(*) FROM p) AS n_purchase_after_click
    """,
)
def funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (view → click → purchase): users counted
    at each stage only if the stage's FIRST event strictly follows
    their first prior-stage event.  Cascaded per-user min aggregates +
    equi-joins — each stage's frame shrinks, every join keys on
    user_id, so the whole funnel reuses one hash partitioning; no
    window over raw events, no per-user event-list materialization
    (the collect_list formulation dies on power-law users at scale)."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_click")))
    )


@query(
    "b_retention",
    """
    WITH cohort AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             date_diff('day', c.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN cohort c ON e.user_id = c.user_id
      WHERE CAST(e.ts AS DATE) >= c.cohort_day
    )
    SELECT c.cohort_day,
           a.day_offset,
           count(*) AS active_users
    FROM activity a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY c.cohort_day, a.day_offset
    """,
)
def retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by signup day, counted once per
    (cohort, days-since-signup) they were active.  Day granularity
    sidesteps sub-second precision entirely; the cohort dim is one row
    per user (broadcastable against the event fact at any corpus
    size), and the distinct collapses to (user, offset) BEFORE the
    final count, so the heavy shuffle carries at most users × active
    days rows."""
    ev = load_table(spark, sf_dir, "events")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").cast("date").alias("cohort_day"))
    )
    activity = (
        ev.join(cohort, "user_id")
        .filter(F.col("ts").cast("date") >= F.col("cohort_day"))
        .select(
            "user_id",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    return (
        activity.join(cohort, "user_id")
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("active_users"))
    )


# ---------------------------------------------------------------- sessionize

#: Gap (seconds) that closes a session — the classic 30-minute rule.
SESSION_GAP_S = 1800


@query(
    "b_sessionize",
    f"""
    WITH o AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ),
    m AS (
      SELECT user_id, event_id, ts_us,
             CASE WHEN prev_us IS NULL
                    OR ts_us - prev_us > {SESSION_GAP_S} * 1000000
                  THEN 1 ELSE 0 END AS new_s
      FROM o
    ),
    s AS (
      SELECT user_id, ts_us,
             CAST(sum(new_s) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM m
    )
    SELECT user_id, session_seq,
           count(*) AS n_events,
           CAST(min(ts_us) AS BIGINT) AS start_us,
           CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us
    FROM s GROUP BY user_id, session_seq
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH sessionization — the gap-based session id every product
    analytics stack derives (the batch twin of `b_stream_session`'s
    streaming session window, same 30-minute gap rule): a new session
    starts when a user's inter-event gap exceeds ``SESSION_GAP_S``;
    the session id is the running count of session-starts.

    Time arithmetic runs in integer MICROSECONDS (``unix_micros`` ↔
    DuckDB ``epoch_us``) — no float seconds, no sub-second precision
    loss, and the (ts, event_id) ordering key is unique so the lag and
    the running sum are deterministic on both engines.

    Scale shape: ONE shuffle on user_id buys the lag, the running sum,
    and the final session rollup (all three are per-user ordered
    computations over the same partitioning — Spark reuses the single
    sort).  Per-user state is a sort of that user's events, the same
    cost the streaming session-window operator pays; no global sort,
    no self-join formulations (the ``ts BETWEEN``-join sessionizer is
    quadratic per user and never acceptable at 100 TB)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Running sum runs over the MARKED frame, which carries ts_us (not
    # ts) — same total order since epoch micros are monotone in ts.
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        ts_us.alias("ts_us"),
    ).select(
        "user_id",
        "event_id",
        "ts_us",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_S * 1_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = marked.select(
        "user_id",
        "ts_us",
        "event_id",
        F.sum("new_s").over(wrun).cast("long").alias("session_seq"),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").cast("long").alias("start_us"),
        (F.max("ts_us") - F.min("ts_us")).cast("long").alias("duration_us"),
    )
