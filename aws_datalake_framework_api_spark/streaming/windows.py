"""Event-time windowing (SURVEY.md §2 B9) — realizes the reference's
event-driven ingestion topology (S3→SNS→Lambda per
``cft/sourceSystem.yaml:29-63``) as Structured Streaming semantics.

``F.window`` / ``F.session_window`` compute IDENTICALLY on batch and
streaming DataFrames — Spark's unified model — so the oracle checks
the window semantics in batch mode here, and tests/test_streaming.py
re-runs the same transformations through a real ``readStream`` →
``writeStream`` pipeline (file source, availableNow trigger) to prove
the streaming path end-to-end.

Scale notes: windowed aggregation shuffles on (window, keys) — at
1000 executors the window column's time-locality also gives state-store
pruning; watermarks bound state size (without one, streaming state
grows forever — the no-watermark variants here are batch-only
analytics shapes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import money_sum, sql_money_sum
from ..registry import query
from ..sources.readers import load_table

# ---------------------------------------------------------------- tumbling


@query(
    "b_stream_tumble",
    f"""
    SELECT time_bucket(INTERVAL '1 day', ts) AS w_start,
           time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS w_end,
           event_type,
           count(*) AS n,
           {sql_money_sum('value')} AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time windows: count + value sum per
    (window, event_type).  Spark's window origin and DuckDB's
    time_bucket are both epoch-aligned, so the buckets coincide."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 day")
    return (
        ev.groupBy(w, "event_type")
        .agg(F.count("*").alias("n"), money_sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("w_start"),
            F.col("window.end").alias("w_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


# ---------------------------------------------------------------- sliding


@query(
    "b_stream_slide",
    f"""
    SELECT time_bucket(INTERVAL '6 hours', ts) - i.i * INTERVAL '6 hours' AS w_start,
           time_bucket(INTERVAL '6 hours', ts) - i.i * INTERVAL '6 hours'
             + INTERVAL '1 day' AS w_end,
           count(*) AS n,
           {sql_money_sum('value')} AS total_value
    FROM events, generate_series(0, 3) AS i(i)
    GROUP BY 1, 2
    """,
)
def stream_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 day length, 6 h slide): each event belongs to
    exactly 4 windows.  The oracle materializes the same 4 memberships
    with a generate_series cross join — the relational definition of a
    sliding window."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 day", "6 hours")
    return (
        ev.groupBy(w)
        .agg(F.count("*").alias("n"), money_sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("w_start"),
            F.col("window.end").alias("w_end"),
            "n",
            "total_value",
        )
    )


# ---------------------------------------------------------------- session


@query(
    "b_stream_session",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id,
           min(ts) AS s_start,
           max(ts) + INTERVAL '30 minutes' AS s_end,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user.  Spark's
    ``session_window`` ends sessions at last-event + gap; the oracle
    reproduces that with the classic gaps-and-islands construction
    (lag → new-session flag → running sum → group), which is also
    exactly how the session state machine behaves incrementally."""
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy(sw, "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("s_start"),
            F.col("session_window.end").alias("s_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------- watermark


@query(
    "b_stream_watermark",
    f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
           event_type,
           count(*) AS n,
           {sql_money_sum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked hourly aggregation.  ``withWatermark`` bounds
    streaming state (late data beyond 1 h is dropped and windows
    finalize); on a batch frame it is semantically a no-op, so the
    oracle sees the plain hourly rollup — which is precisely the
    unified-model contract this query pins down.  The true streaming
    behavior (state cleanup, late-row drop) is exercised in
    tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), money_sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("w_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# ---------------------------------------------------------------- dedup


@query(
    "b_stream_dedup",
    """
    SELECT event_id, ts, user_id, event_type, round(value, 2) AS value
    FROM events
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup semantics: duplicate delivery (union of the
    feed with itself = at-least-once redelivery) collapsed back to
    exactly-once by key.  In streaming this is
    ``withWatermark + dropDuplicates([key])`` with state expiry; the
    batch twin proves the collapse is exact (result == the original
    feed)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", F.round("value", 2).alias("value")
    )
    redelivered = ev.unionByName(ev)
    return redelivered.dropDuplicates(["event_id"])


# ---------------------------------------------------------------- stream-static join


@query(
    "b_stream_join",
    f"""
    SELECT c.c_mktsegment, e.event_type,
           count(*) AS n,
           {sql_money_sum('e.value')} AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event feed joins the
    customer dimension (static side broadcast — in streaming, Spark
    re-reads the static side per micro-batch, so a broadcast dim is
    the difference between a per-batch shuffle and none)."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").alias("n"), money_sum("value").alias("total_value"))
    )


# ------------------------------------------------------- stream-stream join


ATTRIB_WINDOW = "1 hour"  # purchase attributed to a view within this horizon


@query(
    "b_stream_sjoin",
    """
    SELECT v.user_id,
           count(*) AS n_attributed,
           CAST(min(epoch_us(p.ts) - epoch_us(v.ts)) AS BIGINT) AS min_lag_us
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL '1 hour'
    GROUP BY v.user_id
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join semantics — purchase attribution:
    every (view, purchase) pair for the same user with the purchase at
    most ``ATTRIB_WINDOW`` after the view, rolled up per user.

    This is the hardest streaming operator class: BOTH sides buffer
    state, and only the event-time bound (``p.ts`` within
    ``[v.ts, v.ts + 1h]``) plus per-side watermarks let Spark evict it
    — an unbounded-condition stream-stream join grows state forever.
    Spark's unified model computes the identical join in batch, which
    is what the oracle checks here; tests/test_streaming.py runs the
    SAME join as a real two-file-source streaming query (watermarks on
    both sides, availableNow) and proves result parity with this
    batch plan.

    Scale shape: an equi-join on user_id with a range residual — the
    shuffle keys are the user ids (uniform), per-key state is bounded
    by the time horizon, and in batch mode Catalyst runs it as a
    plain SMJ/shuffled hash join with the range as a post-filter."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("ts").alias("v_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("ts").alias("p_ts")
    )
    pairs = views.join(purchases, "user_id").filter(
        (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {ATTRIB_WINDOW}"))
    )
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_attributed"),
        F.min(
            F.unix_micros(F.col("p_ts").cast("timestamp"))
            - F.unix_micros(F.col("v_ts").cast("timestamp"))
        )
        .cast("bigint")
        .alias("min_lag_us"),
    )


# ----------------------------------------- stream-stream OUTER join

#: Views older than window(1h) + watermark delay(2h) are DECIDED:
#: stream and batch provably agree on them (younger views' no-match
#: verdicts are still withheld by the watermark — excluded on BOTH
#: sides rather than compared while undecided).
_OUTER_CLOSED = "INTERVAL 3 HOUR"


@query(
    "b_stream_sjoin_outer",
    f"""
    WITH mx AS (SELECT max(ts) AS m FROM events),
    v AS (SELECT user_id, ts FROM events, mx
          WHERE event_type = 'view' AND ts < m - {_OUTER_CLOSED}),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT v.user_id,
           CAST(count(p.ts) AS BIGINT) AS n_attributed,
           CAST(count(CASE WHEN p.ts IS NULL THEN 1 END) AS BIGINT)
               AS n_unmatched_views,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM v
    LEFT JOIN p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL '1 hour'
    GROUP BY v.user_id
    """,
)
def stream_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM **LEFT OUTER** interval join semantics — the
    attribution report that also counts the views that converted to
    NOTHING.  Outer is the semantically hard half: an unmatched view
    can only be declared once the purchase-side watermark has passed
    its whole attribution window (Spark emits the NULL row via the
    no-data-batch mechanism when the watermark crosses), so the
    comparable region is the DECIDED prefix — views older than
    window + watermark delay, the same truncation any downstream
    consumer of an outer-join stream must apply.  The registered
    plan computes those decided verdicts in batch (Spark's unified
    model); tests/test_streaming.py runs the real two-stream
    leftOuter query (watermarks both sides, availableNow) and proves
    pair-level parity on the decided region, NULLs included.

    Scale shape: identical to the inner exhibit (user_id equi-join,
    range residual, horizon-bounded state) plus the null-emission
    state timer — per-key state stays bounded by the horizon either
    way."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.agg(F.max("ts")).first()[0]
    boundary = F.lit(m) - F.expr(_OUTER_CLOSED)
    views = (
        ev.filter(F.col("event_type") == "view")
        .filter(F.col("ts") < boundary)
        .select("user_id", F.col("ts").alias("v_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    pairs = views.join(
        purchases,
        (views.user_id == purchases.p_user)
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return pairs.groupBy("user_id").agg(
        F.count("p_ts").alias("n_attributed"),
        F.count(F.when(F.col("p_ts").isNull(), 1)).alias("n_unmatched_views"),
        F.count("*").alias("n_rows"),
    )
