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


# ------------------------------------------------------------ market basket


@query(
    "b_basket_pairs",
    """
    SELECT p_a, p_b,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM (SELECT a.l_orderkey,
                 a.l_partkey AS p_a,
                 b.l_partkey AS p_b
          FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
          JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey) AS pairs
    GROUP BY p_a, p_b
    ORDER BY n_orders DESC, p_a, p_b
    LIMIT 25
    """,
)
def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top co-purchased part pairs —
    the support-counting core of frequent-itemset mining (the FP-
    growth/Apriori first pass).  The within-order self-join is the
    operation that looks quadratic but ISN'T: fan-out per order is
    C(k,2) with k = DISTINCT parts per order, bounded by the order
    schema (≤7 lineitems in TPC-H-shaped data) — so total pairs are
    linear in orders, and the join shuffles both sides on the SAME
    orderkey partitioning.  At 100 TB with unbounded baskets, the
    standard discipline applies: cap k per basket (top-k items by
    weight) before pairing, exactly as the dedup family caps shingle
    df.  `a.l_partkey < b.l_partkey` emits each unordered pair once.
    Top-25 rides TakeOrderedAndProject with a full tiebreak."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("p_a"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("p_b"))
    pairs = a.join(b, "l_orderkey").filter(F.col("p_a") < F.col("p_b"))
    return (
        pairs.groupBy("p_a", "p_b")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "p_a", "p_b")
        .limit(25)
    )


# ---------------------------------------------------------------- RFM


#: Scale switch for b_rfm (VERDICT r9 item #6, the SUBSTR_HASH_SHUFFLE
#: pattern): False keeps the three exact global ntile(4) windows (one
#: WindowExec partition each — fine to ~10⁸ customers since they run
#: over the per-customer rollup); True swaps them for rank-banded
#: quartiles computed with range repartitioning + per-partition
#: row_number + a broadcast offset map — zero single-partition
#: operators, ntile-EQUIVALENT output (equivalence pinned in
#: tests/test_analytics_scale.py; the oracle keeps passing with the
#: flag on because the outputs are identical, not merely close).
RFM_CUTOFF_BANDING = False


@query(
    "b_rfm",
    """
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(max(o_orderdate) AS DATE) AS last_order,
               count(*) AS freq,
               sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS cents
        FROM orders
        GROUP BY o_custkey
    ),
    scored AS (
        SELECT o_custkey,
               ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r,
               ntile(4) OVER (ORDER BY freq DESC, o_custkey)       AS f,
               ntile(4) OVER (ORDER BY cents DESC, o_custkey)      AS m
        FROM per_cust
    )
    SELECT CAST(r AS INT) AS r,
           CAST(f AS INT) AS f,
           CAST(m AS INT) AS m,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM scored
    GROUP BY r, f, m
    """,
)
def rfm(
    spark: SparkSession, sf_dir: str, cutoff_banding: bool | None = None
) -> DataFrame:
    """RFM segmentation — THE classic CRM rollup: quartile-score each
    customer on Recency (latest order), Frequency (order count), and
    Monetary (cent-grid lifetime value), then census the 4×4×4
    segment cube.  Every ntile ORDER BY carries the custkey tiebreak,
    so quartile boundaries are deterministic under ties on both
    engines — without it, equal-frequency customers straddle a
    boundary arbitrarily and the segment counts drift.

    Scale switch (r10, VERDICT r9 item #6 — same pattern as
    SUBSTR_HASH_SHUFFLE): the three global ntiles are single-partition
    windows over the PER-CUSTOMER rollup (not the fact) — fine into
    the hundreds of millions of customers; ``cutoff_banding`` (default:
    module constant RFM_CUTOFF_BANDING, off) replaces them with EXACT
    rank-percentile cutoffs computed by one aggregate and banded with
    a broadcast CASE — a map-side pass with zero WindowExec, the full-
    parallelism 10⁸+-customer plan.  Banding assigns quartiles by RANK
    THRESHOLD (count ≤ ceil(n·q/4)) on the same (value, custkey)
    tiebroken order, so it is EQUIVALENT to ntile on any input
    (pinned in tests/test_analytics_scale.py)."""
    if cutoff_banding is None:
        cutoff_banding = RFM_CUTOFF_BANDING
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count("*").alias("freq"),
        F.sum(F.round(F.col("o_totalprice") * 100.0).cast("long")).alias("cents"),
    )
    if not cutoff_banding:
        scored = per_cust.select(
            "o_custkey",
            F.ntile(4).over(Window.orderBy(F.desc("last_order"), "o_custkey")).alias("r"),
            F.ntile(4).over(Window.orderBy(F.desc("freq"), "o_custkey")).alias("f"),
            F.ntile(4).over(Window.orderBy(F.desc("cents"), "o_custkey")).alias("m"),
        )
        return scored.groupBy("r", "f", "m").agg(
            F.count("*").cast("long").alias("n_customers")
        )
    # ---- cutoff banding.  ntile(4)'s contract: bucket sizes differ
    # by at most one, larger buckets FIRST (the first n%4 buckets get
    # ceil(n/4) rows) — so bucket membership is a pure function of a
    # row's GLOBAL 1-based rank under (value DESC, custkey ASC).
    # Global rank without a single-partition window:
    # repartitionByRange totally orders rows ACROSS partitions,
    # row_number ranks WITHIN each (parallel, one group per range),
    # and a broadcast per-partition offset map (planning-sized: one
    # count per range) converts local ranks to global.
    import pandas as pd

    # one materialized per-customer rollup feeds the count, the three
    # rank passes, AND their three partition-size jobs — without it
    # the full fact-table aggregation re-executes ~7 times (review
    # finding), on the exact scale path this switch exists for.
    # localCheckpoint instead of persist (ADVICE r10): a persist here
    # leaked the cached rollup for the session (nothing ever
    # unpersisted it, and the RETURNED plan still references it, so
    # there is no safe in-function unpersist point); checkpoint
    # blocks are scope-tied — the ContextCleaner frees them when the
    # caller drops the returned DataFrame, on the very 10^8-customer
    # path the flag exists for.
    per_cust = per_cust.localCheckpoint(eager=True)
    n = per_cust.count()
    base = n // 4  # review finding: max(1, ...) diverged from
    # ntile below n=4 rows (Spark gives each row its own bucket)
    extra = n % 4  # ntile: first `extra` buckets hold base+1 rows
    bounds = []
    acc = 0
    for q in range(1, 4):
        acc += base + (1 if q <= extra else 0)
        bounds.append(acc)  # last 1-based rank inside bucket q

    def band(col_rank):
        return (
            F.when(col_rank <= bounds[0], F.lit(1))
            .when(col_rank <= bounds[1], F.lit(2))
            .when(col_rank <= bounds[2], F.lit(3))
            .otherwise(F.lit(4))
        )

    def ranked(dim: str) -> DataFrame:
        # total-order rank with NO single-partition window:
        # repartitionByRange gives globally ordered partitions,
        # row_number runs WITHIN each partition (parallel), and the
        # per-partition row counts (planning-sized) convert local
        # ranks to global ones via a broadcast offset map.
        parts = per_cust.select("o_custkey", dim).repartitionByRange(
            32, F.desc(dim), F.asc("o_custkey")
        ).sortWithinPartitions(F.desc(dim), F.asc("o_custkey"))
        tagged = parts.withColumn("_pid", F.spark_partition_id()).withColumn(
            "_local",
            F.row_number().over(
                Window.partitionBy("_pid").orderBy(
                    F.desc(dim), F.asc("o_custkey")
                )
            ),
        )
        sizes = {
            int(r["_pid"]): int(r["cnt"])
            for r in tagged.groupBy("_pid").agg(
                F.count("*").alias("cnt")
            ).collect()
        }
        offsets, run = {}, 0
        for pid in sorted(sizes):
            offsets[pid] = run
            run += sizes[pid]
        omap = spark.createDataFrame(
            pd.DataFrame(
                sorted(offsets.items()), columns=["_pid", "_off"]
            ),
            "_pid int, _off long",
        )
        return (
            tagged.join(F.broadcast(omap), "_pid")
            .select(
                "o_custkey",
                band(F.col("_local") + F.col("_off")).alias(
                    {"last_order": "r", "freq": "f", "cents": "m"}[dim]
                ),
            )
        )

    scored = (
        ranked("last_order")
        .join(ranked("freq"), "o_custkey")
        .join(ranked("cents"), "o_custkey")
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count("*").cast("long").alias("n_customers")
    )


# ------------------------------------------------------------- path analysis


@query(
    "b_path_top",
    """
    WITH ordered AS (
        SELECT user_id,
               list_transform(
                   list_sort(list({'ts': ts, 'event_id': event_id,
                                   'et': event_type})),
                   r -> r.et) AS seq
        FROM events
        GROUP BY user_id
    )
    SELECT path,
           CAST(count(*) AS BIGINT) AS n_users
    FROM (SELECT array_to_string(seq[1:3], '>') AS path FROM ordered)
    GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 10
    """,
)
def path_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top entry paths: each user's first three events in time order,
    joined into a path string, censused — the product-analytics
    'how do journeys start' report (Sankey front end).

    Ordering discipline: the sequence sorts by the struct
    (ts, event_id, type) — the unique (ts, event_id) prefix makes the
    sort total, so ties cannot reorder between engines or runs
    (list_sort of ROWs in DuckDB and array_sort of structs in Spark
    both compare field-lexicographically).  Scale shape: one
    user-keyed groupBy with collect_list bounded by per-user activity
    (cap with a window top-k upstream for power users — the same
    mega-key discipline as `b_udf_grouped`), then a tiny path census
    + TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    seq = F.transform(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ),
        lambda r: r["event_type"],
    )
    per_user = ev.groupBy("user_id").agg(seq.alias("seq"))
    paths = per_user.select(
        F.concat_ws(">", F.slice("seq", 1, 3)).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(10)
    )


# ------------------------------------------------------------- attribution

#: Attribution lookback horizon (µs) — a purchase credits a view at
#: most this far back.
ATTRIB_HORIZON_US = 3_600_000_000


@query(
    "b_attribution",
    f"""
    WITH timeline AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    credited AS (
        SELECT user_id, event_id, event_type, ts_us,
               min(CASE WHEN event_type = 'view' THEN ts_us END)
                   OVER (PARTITION BY user_id ORDER BY ts_us
                         RANGE BETWEEN {ATTRIB_HORIZON_US} PRECEDING
                         AND CURRENT ROW) AS first_touch_us,
               max(CASE WHEN event_type = 'view' THEN ts_us END)
                   OVER (PARTITION BY user_id ORDER BY ts_us
                         RANGE BETWEEN {ATTRIB_HORIZON_US} PRECEDING
                         AND CURRENT ROW) AS last_touch_us
        FROM timeline
    )
    SELECT CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(first_touch_us) AS BIGINT) AS n_attributed,
           CAST(count(CASE WHEN first_touch_us <> last_touch_us THEN 1 END)
                AS BIGINT) AS n_model_disagreements,
           CAST(sum(CASE WHEN last_touch_us IS NOT NULL
                         THEN ts_us - last_touch_us END) AS BIGINT)
               AS total_last_touch_lag_us
    FROM credited
    WHERE event_type = 'purchase'
    """,
)
def attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch conversion attribution — the
    marketing-analytics question as ONE window pass: for every
    purchase, the earliest and latest view within the 1-hour
    lookback come from min/max RANGE frames over the user's merged
    timeline (integer-µs ordering, `b_sessionize`'s discipline), so
    no view⋈purchase join materializes at all — compare
    `b_stream_sjoin`, which builds the full pair set; attribution
    only needs the frame extremes.

    The report censuses both models and their disagreement count
    (multi-view conversions credit differently under first- vs
    last-touch — THE reason attribution model choice matters), plus
    the exact integer lag mass.  One user_id shuffle, frame state
    O(horizon); all outputs exact BIGINTs."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tl = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts_us"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-ATTRIB_HORIZON_US, 0)
    )
    credited = tl.select(
        "event_type",
        "ts_us",
        F.min(view_ts).over(w).alias("first_touch_us"),
        F.max(view_ts).over(w).alias("last_touch_us"),
    ).filter(F.col("event_type") == "purchase")
    return credited.agg(
        F.count("*").alias("n_purchases"),
        F.count("first_touch_us").cast("long").alias("n_attributed"),
        F.count(
            F.when(F.col("first_touch_us") != F.col("last_touch_us"), 1)
        ).cast("long").alias("n_model_disagreements"),
        F.sum(
            F.when(
                F.col("last_touch_us").isNotNull(),
                F.col("ts_us") - F.col("last_touch_us"),
            )
        ).cast("long").alias("total_last_touch_lag_us"),
    )


# --------------------------------------------- linear multi-touch credit


@query(
    "b_attribution_linear",
    f"""
    WITH timeline AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    assigned AS (
        SELECT user_id, event_type AS channel, ts_us,
               min(CASE WHEN event_type = 'purchase' THEN ts_us END)
                   OVER (PARTITION BY user_id ORDER BY ts_us
                         RANGE BETWEEN CURRENT ROW
                         AND {ATTRIB_HORIZON_US} FOLLOWING) AS conv_ts
        FROM timeline
    ),
    touches AS (
        SELECT user_id, channel, conv_ts
        FROM assigned
        WHERE channel <> 'purchase' AND conv_ts IS NOT NULL
    ),
    conv_n AS (
        SELECT user_id, conv_ts, CAST(count(*) AS BIGINT) AS n_total
        FROM touches GROUP BY user_id, conv_ts
    ),
    per_channel AS (
        SELECT t.channel, t.user_id, t.conv_ts, c.n_total,
               CAST(count(*) AS BIGINT) AS n_ch
        FROM touches t
        JOIN conv_n c ON c.user_id = t.user_id AND c.conv_ts = t.conv_ts
        GROUP BY t.channel, t.user_id, t.conv_ts, c.n_total
    )
    SELECT channel,
           CAST(sum(n_ch) AS BIGINT) AS touches_credited,
           CAST(count(*) AS BIGINT) AS conversions_touched,
           CAST(sum(n_ch * CAST(floor(1000000.0 / n_total + 0.5) AS BIGINT))
                AS BIGINT) AS credit_e6
    FROM per_channel
    GROUP BY channel
    ORDER BY channel
    """,
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution — each conversion's credit is
    split equally across every touch (view or click) whose FIRST
    subsequent purchase within the 1-hour horizon is that conversion.
    This completes the attribution-model family next to
    `b_attribution`'s first/last-touch extremes, and fixes the
    double-counting trap the naive formulation has: assigning each
    touch to its first following conversion (a min over a FOLLOWING
    range frame) guarantees a touch funds exactly one conversion,
    where counting "touches in the preceding hour" per purchase
    would credit a touch to every purchase in its horizon.

    Credit rides the exact integer grid: each touch's share is
    floor(1e6/n + 0.5) micro-credits (per-conversion drift from
    exactly 1e6 is bounded by n/2 units and identical on both
    engines), so channel totals hash-check.

    Scale shape: ONE user_id window pass assigns conversions (frame
    state O(horizon)); both groupBys key on (user, conv_ts) —
    conversion-grained, uniform; the n_total join reuses the same
    key.  No touch⋈purchase pair join ever materializes."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    tl = ev.select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(0, ATTRIB_HORIZON_US)
    )
    assigned = tl.select(
        "user_id",
        "channel",
        F.min(
            F.when(F.col("channel") == "purchase", F.col("ts_us"))
        )
        .over(w)
        .alias("conv_ts"),
    )
    touches = assigned.filter(
        (F.col("channel") != "purchase") & F.col("conv_ts").isNotNull()
    )
    conv_n = touches.groupBy("user_id", "conv_ts").agg(
        F.count("*").alias("n_total")
    )
    per_channel = (
        touches.groupBy("channel", "user_id", "conv_ts")
        .agg(F.count("*").alias("n_ch"))
        .join(conv_n, ["user_id", "conv_ts"])
    )
    share = F.floor(F.lit(1000000.0) / F.col("n_total") + F.lit(0.5)).cast(
        "long"
    )
    return per_channel.groupBy("channel").agg(
        F.sum("n_ch").cast("long").alias("touches_credited"),
        F.count("*").cast("long").alias("conversions_touched"),
        F.sum(F.col("n_ch") * share).cast("long").alias("credit_e6"),
    )
