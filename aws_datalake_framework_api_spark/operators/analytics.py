"""Product-analytics compositions over the events feed: ordered-step
funnels and cohort retention — the query family a data-lake analytics
engine serves daily (SURVEY.md §2 B4/B5 compositions; no single Spark
primitive, all built-in operators).

Both are shuffle-frugal by construction: every aggregate keys on
user_id (one shuffle reused by cascade joins in the funnel; one
shuffle + a broadcastable per-user dim in retention), and every output
is exact ints — no float drift between engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
