"""Aggregation operators (SURVEY.md §2 B4).

Spark's hash aggregate is automatically two-phase (partial map-side
combine → shuffle on the grouping key → final merge), so these all
shuffle only the partially-aggregated state — the property that makes
them viable at 100 TB.  Double-typed sums/avgs are rounded in BOTH
engines because summation order is nondeterministic across partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import money_avg, money_sum, sql_money_sum
from ..registry import query
from ..sources.readers import load_table

# ---------------------------------------------------------------- TPC-H Q1


@query(
    "b_agg_q1",
    """
    SELECT l_returnflag,
           l_linestatus,
           sum(CAST(round(l_quantity * 100.0) AS BIGINT)) / 100.0 AS sum_qty,
           sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) / 100.0 AS sum_base_price,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)) / 10000.0 AS sum_disc_price,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000.0) AS BIGINT)) / 10000.0 AS sum_charge,
           sum(CAST(round(l_quantity * 100.0) AS BIGINT)) / 100.0 / count(l_quantity) AS avg_qty,
           sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) / 100.0 / count(l_extendedprice) AS avg_price,
           sum(CAST(round(l_discount * 100.0) AS BIGINT)) / 100.0 / count(l_discount) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    HAVING count(*) > 10
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: 2 group keys, 8 aggregates, HAVING, sort."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        # All money aggregates run on exact integer units — see
        # functions/numeric.py for why this is the only scheme that is
        # bit-stable under Spark's nondeterministic partial-agg order.
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
            ).alias("sum_disc_price"),
            money_sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                scale=4,
            ).alias("sum_charge"),
            money_avg("l_quantity").alias("avg_qty"),
            money_avg("l_extendedprice").alias("avg_price"),
            money_avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .filter(F.col("count_order") > 10)
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------- distinct


@query(
    "b_agg_distinct",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_custs,
           count(DISTINCT o_orderpriority) AS n_prios,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT DISTINCTs (Catalyst expands to a single
    multi-phase aggregate)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderpriority").alias("n_prios"),
        F.count("*").alias("n_orders"),
    )


@query(
    "b_agg_approx",
    """
    SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS n_exact_orders,
           count(*) AS n,
           CAST(5 AS INT) AS band_pct,
           CAST(1 AS INT) AS approx_ok,
           CAST(1 AS INT) AS median_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — the 100 TB substitutes for exact DISTINCT:
    HLL++ (``approx_count_distinct``) and t-digest-style quantiles
    (``percentile_approx``) — emitted as a DRIVER-CHECKABLE scorecard
    (VERDICT r3 item: this id was rows-only since r1).  The sketch
    estimates themselves are engine-specific, so the output carries
    the EXACT distinct count (oracle-recomputed) plus integer band
    flags: ``approx_ok`` = HLL estimate within ±5% of exact (rsd is
    set to 2%), ``median_ok`` = approx median inside the exact 40th-
    60th percentile span.  Both pipelines are deterministic for a
    fixed input set, so the flags are stable; if a Spark upgrade
    shifts a sketch outside its band, the oracle's literal 1 turns the
    row red."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    agg = lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_exact_orders"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median"),
        F.expr("percentile(l_extendedprice, 0.40)").alias("p40"),
        F.expr("percentile(l_extendedprice, 0.60)").alias("p60"),
        F.count("*").alias("n"),
    )
    return agg.select(
        "l_returnflag",
        "n_exact_orders",
        "n",
        F.lit(5).cast("int").alias("band_pct"),
        (
            F.abs(F.col("approx_orders") - F.col("n_exact_orders")) * 100
            <= F.col("n_exact_orders") * 5
        )
        .cast("int")
        .alias("approx_ok"),
        (
            (F.col("approx_median") >= F.col("p40"))
            & (F.col("approx_median") <= F.col("p60"))
        )
        .cast("int")
        .alias("median_ok"),
    )


@query(
    "b_agg_hll_parts",
    """
    SELECT event_type,
           count(DISTINCT date_trunc('day', ts)) AS n_days,
           count(DISTINCT user_id) AS n_exact_users,
           CAST(5 AS INT) AS band_pct,
           CAST(1 AS INT) AS hll_ok
    FROM events
    GROUP BY event_type
    """,
)
def agg_hll_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting — the PATTERN behind every
    cross-shard distinct at 100 TB: build one HLL sketch per
    (event_type, day) partition, then union the per-day sketches into
    a per-event_type estimate WITHOUT re-touching the rows.

    This two-level shape is what a real lake pipeline stores: daily
    partials are tiny binary columns written with each ingest batch
    (here: ``hll_sketch_agg``, one groupBy), and ANY later rollup —
    per week, per type, per everything — is a union of sketches
    (``hll_union_agg``), never a re-scan of 100 TB of history.  The
    exact-distinct twin would re-shuffle every (type, user) pair per
    query; the sketch path re-shuffles ~4 KB per partition.

    Determinism: Datasketches HLL is a per-register max structure, so
    the estimate depends only on the input SET, not row order or
    partitioning — stable across reruns and cluster layouts (the same
    property the salted-hash samplers rely on).

    Output is the driver-checkable scorecard form (the raw estimate is
    engine-specific, so it can't be oracle-hashed): the EXACT distinct
    count per type, and ``hll_ok`` = union-of-sketches estimate within
    ±5% of it, oracle-pinned to 1."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(
            F.col("event_type"), F.date_trunc("day", "ts").alias("day")
        ).agg(
            F.hll_sketch_agg("user_id").alias("sk"),
            # exact per-(type,day) user sets are NOT mergeable across
            # days (that's the sketch's whole point) — the exact twin
            # needs its own (type,user) distinct, here in the same pass
        )
    )
    sketched = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact_users")
    )
    return sketched.join(exact, "event_type").select(
        "event_type",
        F.col("n_days").cast("bigint").alias("n_days"),
        "n_exact_users",
        F.lit(5).cast("int").alias("band_pct"),
        (
            F.abs(F.col("approx_users") - F.col("n_exact_users")) * 100
            <= F.col("n_exact_users") * 5
        )
        .cast("int")
        .alias("hll_ok"),
    )


# ---------------------------------------------------------------- rollup / cube


@query(
    "b_agg_rollup",
    """
    SELECT r_name, n_name,
           CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
           count(*) AS n_cust,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total) with
    grouping_id disambiguating the NULL rows."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .select("r_name", "n_name", "gid", "n_cust", "total_bal")
    )


@query(
    "b_agg_cube",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the 2×3 flag/status grid (all 4 grouping sets)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
    )


# ---------------------------------------------------------------- collect


@query(
    "b_agg_collect",
    """
    SELECT n_nationkey,
           string_agg(c_name, ',' ORDER BY c_name) AS customers,
           CAST(len(list(DISTINCT c_mktsegment)) AS INT) AS n_segments
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group → array via collect_list / collect_set.  Both are
    order-nondeterministic, so the oracle-visible outputs are the
    sorted-joined string and the set size; unit tests check the raw
    arrays."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_name")), ",").alias("customers"),
            F.size(F.collect_set("c_mktsegment")).alias("n_segments"),
        )
    )


# ---------------------------------------------------------------- pivot

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "b_agg_pivot",
    """
    SELECT user_id % 10 AS user_bucket,
           round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS "click",
           round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS "error",
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS "purchase",
           round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS "signup",
           round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS "view"
    FROM events
    GROUP BY 1
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type → columns.  Explicit value list: without it
    Spark runs an extra distinct-scan job to discover columns — never
    acceptable on a 100 TB input."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.round(F.sum("value"), 2))
    )


# ---------------------------------------------------------------- quantiles


@query(
    "b_agg_quantiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS qty_p50,
           quantile_cont(l_quantity, 0.95) AS qty_p95,
           quantile_cont(l_extendedprice, 0.9) AS price_p90,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped quantiles: Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` share the linear-interpolation definition
    (pos = q·(n-1), lerp between the two neighbours), so the results
    are bit-identical — probed, not assumed.

    Scale note: EXACT percentile materializes each group's sorted
    values, fine for bounded group counts (here: 3 flags); an
    unbounded-cardinality or 100 TB single-group case switches to
    ``approx_percentile`` (t-digest sketch, mergeable map-side — see
    ``b_agg_approx`` for the sketch-op pattern and why sketches are
    rows-only under a cross-engine oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("qty_p50"),
        F.expr("percentile(l_quantity, 0.95)").alias("qty_p95"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("price_p90"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------- grouping sets


@query(
    "b_agg_gsets",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           count(*) AS n,
           {sql_money_sum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority))
    """,
)
def agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the third member of the family next to
    `b_agg_rollup`/`b_agg_cube`, with a set list NEITHER is a special
    case of (both single-key marginals but NO grand total): the form
    report workloads actually write.

    Spark expands grouping sets with a single Expand node feeding ONE
    hash aggregate — rows are replicated once per set they belong to
    (3× here) map-side, then partially aggregated before the only
    shuffle; it never runs one job per set and unions.  grouping_id
    disambiguates real NULL key values from set-placeholder NULLs.
    Money totals ride the cent-grid integer scheme
    (functions/numeric.py) so the partial-agg order can't drift a
    cent."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [
                ["o_orderstatus", "o_orderpriority"],
                ["o_orderstatus"],
                ["o_orderpriority"],
            ],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            money_sum("o_totalprice").alias("total_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total_price")
    )


# ------------------------------------------------------- grouped regression


@query(
    "b_agg_regression",
    """
    WITH u AS (
      SELECT l_returnflag,
             CAST(round(l_quantity) AS BIGINT) AS x,
             CAST(round(l_extendedprice) AS BIGINT) AS y
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sum_x,
             CAST(sum(y) AS BIGINT) AS sum_y,
             CAST(sum(x * x) AS BIGINT) AS sum_xx,
             CAST(sum(x * y) AS BIGINT) AS sum_xy
      FROM u GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, sum_x, sum_y,
           CAST((CAST(n AS HUGEINT) * sum_xy - CAST(sum_x AS HUGEINT) * sum_y)
                * 1000000
                // (CAST(n AS HUGEINT) * sum_xx - CAST(sum_x AS HUGEINT) * sum_x)
                AS BIGINT) AS slope_x1e6,
           CAST((CAST(sum_y AS HUGEINT)
                   * (CAST(n AS HUGEINT) * sum_xx - CAST(sum_x AS HUGEINT) * sum_x)
                 - (CAST(n AS HUGEINT) * sum_xy - CAST(sum_x AS HUGEINT) * sum_y)
                   * sum_x)
                * 1000000
                // (CAST(n AS HUGEINT)
                    * (CAST(n AS HUGEINT) * sum_xx - CAST(sum_x AS HUGEINT) * sum_x))
                AS BIGINT) AS intercept_x1e6
    FROM s
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped simple linear regression (price ~ quantity per return
    flag) in EXACT RATIONAL ARITHMETIC — the `regr_slope`/
    `regr_intercept` family, but engine-stable: the float versions
    accumulate covariance in doubles whose partial-agg order differs
    per engine and per run, so their last ulps never hash-match.

    Here the five sufficient statistics (n, Σx, Σy, Σx², Σxy) are
    order-independent BIGINT sums of dollar/unit-quantized inputs,
    and slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²), intercept =
    (Σy·den − num·Σx)/(n·den) are emitted as exact integer-μ
    (×10⁶, floor-divided) — Spark computes the cross-multiplication
    in DECIMAL(38,0), DuckDB in HUGEINT, both exact at these
    magnitudes (documented bound: |n·Σxy·10⁶| < 10³⁸ holds through
    ~10¹² rows per group at these value ranges).

    Scale shape: ONE map-side-partial groupBy of the fact table —
    sufficient statistics are the textbook mergeable aggregate (this
    is also the distributed-ML pattern: closed-form OLS/ridge via
    X'X/X'y normal equations, here in its 1-feature exact form)."""
    li = load_table(spark, sf_dir, "lineitem")
    u = li.select(
        "l_returnflag",
        F.round("l_quantity").cast("long").alias("x"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    s = u.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum("y").cast("long").alias("sum_y"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_xx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sum_xy"),
    )
    dec = "decimal(38,0)"
    s = s.select(
        "l_returnflag",
        "n",
        "sum_x",
        "sum_y",
        "sum_xx",
        "sum_xy",
        (
            F.col("n").cast(dec) * F.col("sum_xy")
            - F.col("sum_x").cast(dec) * F.col("sum_y")
        ).alias("num"),
        (
            F.col("n").cast(dec) * F.col("sum_xx")
            - F.col("sum_x").cast(dec) * F.col("sum_x")
        ).alias("den"),
    )
    return s.select(
        "l_returnflag",
        "n",
        "sum_x",
        "sum_y",
        F.expr("CAST((num * 1000000) DIV den AS BIGINT)").alias("slope_x1e6"),
        F.expr(
            "CAST(((CAST(sum_y AS decimal(38,0)) * den - num * sum_x) * 1000000)"
            " DIV (CAST(n AS decimal(38,0)) * den) AS BIGINT)"
        ).alias("intercept_x1e6"),
    )


# ------------------------------------------------------ bitmap distinct


@query(
    "b_agg_bitmap",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users_bitmap,
           count(DISTINCT user_id) AS n_users_exact,
           CAST(1 AS INT) AS bitmap_ok
    FROM events
    GROUP BY event_type
    """,
)
def agg_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counting via bitmaps — the roaring-
    bitmap pattern and the exact sibling of `b_agg_hll_parts`: per
    (event_type, day, bucket) bitmap partials are built once at ingest
    grain, and any later rollup ORs bitmaps instead of re-shuffling
    raw (type, user) pairs.  Unlike HLL this is EXACT, so the bitmap
    path's count is oracle-hashable directly against
    ``count(DISTINCT ...)`` — the whole row is hash-proven, no band
    flags needed.

    Plan: map-side (bucket, bit-position) split → per-(type,day,bucket)
    ``bitmap_construct_agg`` → per-(type,bucket) ``bitmap_or_agg`` →
    Σ ``bitmap_count``.  Every shuffle carries 4 KB bitmap segments,
    not user ids; the bucket split is what keeps one giant id space
    from becoming one giant bitmap (the same sharding roaring bitmaps
    do internally).  ``bitmap_ok`` pins bitmap == exact in-plan."""
    ev = load_table(spark, sf_dir, "events")
    pos = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.bitmap_bucket_number("user_id").alias("bucket"),
        F.bitmap_bit_position("user_id").alias("pos"),
    )
    daily = pos.groupBy("event_type", "day", "bucket").agg(
        F.bitmap_construct_agg("pos").alias("bm")
    )
    merged = daily.groupBy("event_type", "bucket").agg(
        F.bitmap_or_agg("bm").alias("bm")
    )
    via_bitmap = merged.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).cast("long").alias("n_users_bitmap")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    return via_bitmap.join(exact, "event_type").select(
        "event_type",
        "n_users_bitmap",
        "n_users_exact",
        (F.col("n_users_bitmap") == F.col("n_users_exact"))
        .cast("int")
        .alias("bitmap_ok"),
    )


# ------------------------------------------------------------- histogram


@query(
    "b_agg_histogram",
    """
    -- DuckDB (this build) has no width_bucket; replicate Spark's
    -- semantics exactly: 0 below lo, n+1 at/above hi, else
    -- floor((v-lo)/((hi-lo)/n))+1 — (600000-0)/24 = 25000 is an exact
    -- IEEE double, so both engines divide by the identical constant.
    SELECT CASE WHEN o_totalprice < 0.0 THEN 0
                WHEN o_totalprice >= 600000.0 THEN 25
                ELSE CAST(floor(o_totalprice / 25000.0) AS BIGINT) + 1
           END AS bucket,
           count(*) AS n,
           CAST(min(round(o_totalprice * 100)) AS BIGINT) AS lo_cents,
           CAST(max(round(o_totalprice * 100)) AS BIGINT) AS hi_cents
    FROM orders
    GROUP BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (`width_bucket`) of order totals — the
    one-pass distribution profile every data-quality dashboard draws,
    and the cheap precursor to the exact-percentile pass (a histogram
    narrows the quantile search to one bucket).  Bucket edges are plan
    literals, so bucketing is pure map arithmetic and the aggregate is
    a single partial+final groupBy on a ≤26-key space (24 buckets +
    under/overflow) — the shuffle carries at most 26 rows per
    partition at ANY corpus size."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.select(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(24)).alias(
                "bucket"
            ),
            cents.alias("cents"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )


# ------------------------------------------------------ salted aggregation


@query(
    "b_agg_salted",
    f"""
    SELECT event_type,
           count(*) AS n,
           {sql_money_sum('value')} AS total_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALTED two-level aggregation — the hot-key pattern for
    aggregates (the groupBy sibling of `b_join_salted`): when one
    group key holds a disproportionate share of rows, a plain groupBy
    sends that whole key to one reducer.  Salting splits each key into
    16 sub-keys for the first (heavy) aggregation, then folds the
    sub-aggregates in a second, tiny pass — mergeable statistics make
    the two-level result EXACTLY equal to the one-level one, which is
    what the oracle pins (row-identical to the plain GROUP BY).

    The distinct-user count stays exact through the split because the
    salt is derived FROM user_id (pmod(xxhash64)) — each user lands in
    exactly one sub-key, so sub-distinct counts add.  Note Spark's
    partial aggregation already map-side-combines uniform keys; the
    salt buys REDUCER-side balance, which partial agg cannot when one
    key dominates post-shuffle."""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.select(
        "event_type",
        "value",
        "user_id",
        F.pmod(F.xxhash64("user_id"), F.lit(16)).alias("salt"),
    )
    level1 = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("n"),
        money_sum("value").alias("sub_total"),
        F.countDistinct("user_id").alias("sub_users"),
    )
    return level1.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n"),
        F.round(F.sum("sub_total"), 2).alias("total_value"),
        F.sum("sub_users").cast("long").alias("n_users"),
    )


# ---------------------------------------------------------------- mode


@query(
    "b_agg_mode",
    """
    SELECT o_orderstatus,
           CAST(n AS BIGINT) AS n
    , mode_prio FROM (
      SELECT o_orderstatus, o_orderpriority AS mode_prio, count(*) AS n,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY count(*) DESC, o_orderpriority) AS rnk
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rnk = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE (most frequent value) per group, with a deterministic
    lexicographic tie-break — built as count + rank-1 filter rather
    than Spark's ``mode()`` aggregate, whose tie behavior is
    unspecified and therefore un-oracle-able.  Two shuffles on
    (group, value) then group — both on aggregated data."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "o_orderstatus",
            F.col("n").cast("long").alias("n"),
            F.col("o_orderpriority").alias("mode_prio"),
        )
    )


# ------------------------------------------- heavy hitters (Misra-Gries)


#: Counters kept per partition summary.  The union of partition
#: summaries provably contains every word with global count
#: > N/(HH_K+1) (pigeonhole over per-partition decrements — Misra &
#: Gries 1982; mergeability per Agarwal et al., PODS'12).
HH_K = 256

#: Heavy hitters returned (exact-reranked top-M by count).
HH_M = 15


def _mg_kernel(batch_iter):
    """Batched Misra-Gries over a stream of single-column word frames.

    Classic MG decrements all k counters when a new item overflows the
    table; the batched equivalent (used here, and the reason this is
    vectorizable) accumulates a batch's exact ``value_counts`` into the
    running table and then subtracts the (k+1)-th largest counter from
    every entry, dropping non-positives.  Each subtraction of t charges
    t to at least k+1 distinct items, so total decrement ≤ n_p/(k+1) —
    any word with partition count above that survives with a positive
    lower bound.  State is O(k) regardless of vocabulary size.
    """
    from collections import Counter

    import pandas as pd

    counters: Counter = Counter()

    def prune(to: int) -> None:
        if len(counters) <= to:
            return
        t = sorted(counters.values(), reverse=True)[to]
        for w in [w for w, c in counters.items() if c - t <= 0]:
            del counters[w]
        for w in counters:
            counters[w] -= t

    for pdf in batch_iter:
        counters.update(pdf["word"].value_counts().to_dict())
        prune(8 * HH_K)  # amortize: prune only at 8x overflow
    prune(HH_K)
    yield pd.DataFrame({"word": list(counters.keys())})


@query(
    "b_agg_heavyhitters",
    """
    SELECT word, CAST(cnt AS BIGINT) AS cnt
    FROM (
      SELECT word, count(*) AS cnt
      FROM (
        SELECT unnest(list_filter(string_split(lower(trim(text)), ' '),
                                  x -> length(x) > 0)) AS word
        FROM documents
      )
      GROUP BY word
    )
    ORDER BY cnt DESC, word
    LIMIT 15
    """,
)
def agg_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over an unbounded vocabulary: per-partition
    Misra-Gries summaries (O(k) state, zero shuffle) → broadcast the
    ≤ partitions×k candidate words → exact map-side recount restricted
    to candidates → exact top-M with a full (cnt DESC, word) tie-break.

    Scale shape vs the naive plan: a full ``GROUP BY word`` shuffles
    the entire vocabulary (billions of keys on a web corpus); this
    shuffles only MG partials and candidate partial counts — both
    bounded by k, not by |vocab|.  Because every word with true count
    > N/(k+1) is guaranteed into the candidate set and the final
    counts are exact, the output is deterministically the true top-M —
    hence fully oracle-provable despite the sketch in the middle
    (same candidate-then-verify shape as the MinHash rerank,
    llm/dedup.py).  Reference analogue: top-terms profiling an
    ingestion framework would bolt onto the landing zone
    (cft/sourceSystem.yaml:29-63 moves the bytes; profiling is left to
    the engine)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), " "),
                lambda x: F.length(x) > 0,
            )
        ).alias("word")
    )
    cands = words.mapInPandas(_mg_kernel, "word string").distinct()
    return (
        words.join(F.broadcast(cands), "word")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(HH_M)
    )


# ----------------------------------------------------------- listagg


@query(
    "b_agg_listagg",
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / string_agg with a deterministic ORDER BY — the
    group→delimited-string surface (report/export queries).  Spark has
    no ordered string_agg aggregate, so the exhibit composes it as
    collect_list → array_sort → array_join, which is semantically the
    ordered LISTAGG and keeps the aggregation mergeable (partials are
    arrays; the sort runs once per group at the end).  Group values
    must be sorted explicitly BECAUSE partial-agg arrival order is
    nondeterministic — the same reason the money sums snap to a grid."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


# ---------------------------------------------------------------- unpivot


@query(
    "b_agg_unpivot",
    """
    WITH wide AS (
        SELECT user_id % 10 AS user_bucket,
               sum(CASE WHEN event_type = 'click'    THEN CAST(round(value * 100.0) AS BIGINT) END) AS click,
               sum(CASE WHEN event_type = 'error'    THEN CAST(round(value * 100.0) AS BIGINT) END) AS error,
               sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100.0) AS BIGINT) END) AS purchase,
               sum(CASE WHEN event_type = 'signup'   THEN CAST(round(value * 100.0) AS BIGINT) END) AS signup,
               sum(CASE WHEN event_type = 'view'     THEN CAST(round(value * 100.0) AS BIGINT) END) AS view
        FROM events
        GROUP BY user_id % 10
    )
    SELECT user_bucket,
           event_type,
           CAST(cents / 100.0 AS DOUBLE) AS total_value
    FROM wide
    UNPIVOT (cents FOR event_type IN (click, error, purchase, signup, view))
    WHERE cents IS NOT NULL
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the inverse of `b_agg_pivot` — wide
    per-bucket-by-type columns back to long (bucket, type, value)
    rows.  Spark's primitive is ``stack`` in a selectExpr (the
    UNPIVOT/MELT relational op; DataFrame API also ships
    ``df.unpivot``); the oracle uses DuckDB's native UNPIVOT clause.
    Both sides drop NULL cells (absent combinations) explicitly —
    DuckDB's UNPIVOT excludes them by default, Spark's stack keeps
    them, so the filter pins the shared semantics.

    Scale shape: melt is a MAP-ONLY ×k row expansion of an
    already-aggregated table — no shuffle; the only wide work is the
    upstream pivot aggregate it inverts.  Cent-grid sums end-to-end."""
    events = load_table(spark, sf_dir, "events")
    wide = (
        events.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.sum(F.round(F.col("value") * 100.0).cast("long")))
    )
    stack_args = ", ".join(f"'{t}', `{t}`" for t in EVENT_TYPES)
    return (
        wide.selectExpr(
            "user_bucket",
            f"stack({len(EVENT_TYPES)}, {stack_args}) AS (event_type, cents)",
        )
        .filter(F.col("cents").isNotNull())
        .select(
            "user_bucket",
            "event_type",
            (F.col("cents") / 100.0).cast("double").alias("total_value"),
        )
    )


# ------------------------------------------------------- quantile cutoffs


@query(
    "b_agg_quantile_cutoffs",
    """
    WITH cuts AS (
        SELECT quantile_cont(o_totalprice, 0.25) AS q1,
               quantile_cont(o_totalprice, 0.50) AS q2,
               quantile_cont(o_totalprice, 0.75) AS q3
        FROM orders
    )
    SELECT band,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0
                AS DOUBLE) AS band_value
    FROM (SELECT CASE WHEN o_totalprice <  (SELECT q1 FROM cuts) THEN 'q1'
                      WHEN o_totalprice <  (SELECT q2 FROM cuts) THEN 'q2'
                      WHEN o_totalprice <  (SELECT q3 FROM cuts) THEN 'q3'
                      ELSE 'q4' END AS band,
                 o_totalprice
          FROM orders) AS banded
    GROUP BY band
    """,
)
def agg_quantile_cutoffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-cutoff banding — the SCALE path the RFM/ntile
    exhibits point at: instead of a single-partition global ntile,
    compute the three quartile cutoffs ONCE (one aggregate → a 1-row
    broadcast), then band the table in a fully parallel map pass and
    census the bands.  Trades ntile's exact equal-cardinality for
    unbounded parallelism; at 100 TB the cutoff aggregate itself
    becomes ``approx_percentile`` (same plan shape, sketch-merged).

    Determinism: both engines share the linear-interpolation
    quantile definition (proven by `b_agg_quantiles`), the band
    comparisons run against those identical doubles, and band sums
    ride the cent grid."""
    orders = load_table(spark, sf_dir, "orders")
    cuts = orders.agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.50)").alias("q2"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
    )
    banded = orders.crossJoin(F.broadcast(cuts)).select(
        F.when(F.col("o_totalprice") < F.col("q1"), "q1")
        .when(F.col("o_totalprice") < F.col("q2"), "q2")
        .when(F.col("o_totalprice") < F.col("q3"), "q3")
        .otherwise("q4")
        .alias("band"),
        "o_totalprice",
    )
    return banded.groupBy("band").agg(
        F.count("*").alias("n_orders"),
        (F.sum(F.round(F.col("o_totalprice") * 100.0).cast("long")) / 100.0)
        .cast("double")
        .alias("band_value"),
    )


# ------------------------------------------------------ count-min sketch

#: Count-Min geometry: 4 independent hash rows × 256 counters.  Tiny
#: by design — the exhibit is the MERGEABLE-SKETCH plan shape (state
#: bounded by depth×width, never by vocabulary), same family as the
#: HLL rollup (approx distinct) and Misra-Gries (top-k); CM adds the
#: point-frequency query with a one-sided error guarantee.
CM_DEPTH = 4
CM_WIDTH = 256

#: Probe words spanning the fixture's frequency range.
CM_PROBES = ("spark", "join", "query", "merge", "table", "row", "value", "data")


def _cm_sql() -> str:
    probes = ", ".join(f"('{w}')" for w in CM_PROBES)
    sketch = "\n      UNION ALL\n".join(
        f"""      SELECT {r} AS r,
             CAST(CAST(concat('0x', substring(md5('cm{r}:' || w), 1, 2))
                  AS BIGINT) AS INT) AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY 2"""
        for r in range(CM_DEPTH)
    )
    return f"""
    WITH tok AS (
      SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents
    ),
    sketch AS (
{sketch}
    ),
    probes(word) AS (VALUES {probes}),
    pb AS (
      SELECT word, t.r,
             CAST(CAST(concat('0x',
               substring(md5('cm' || CAST(t.r AS VARCHAR) || ':' || word), 1, 2))
               AS BIGINT) AS INT) AS b
      FROM probes CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(r)
    ),
    est AS (
      SELECT word, min(coalesce(s.c, 0)) AS cm_estimate
      FROM pb LEFT JOIN sketch s ON s.r = pb.r AND s.b = pb.b
      GROUP BY word
    ),
    exact AS (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS exact_count
      FROM tok GROUP BY w
    )
    SELECT e.word,
           coalesce(x.exact_count, 0) AS exact_count,
           e.cm_estimate,
           CASE WHEN e.cm_estimate >= coalesce(x.exact_count, 0)
                THEN 1 ELSE 0 END AS never_underestimates
    FROM est e LEFT JOIN exact x ON x.word = e.word
    ORDER BY e.word
    """


@query("b_agg_cmsketch", _cm_sql())
def agg_cmsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the corpus word stream, probed for 8
    words against exact counts — the mergeable point-frequency sketch
    (Cormode & Muthukrishnan 2005, public) that answers "how often
    does term X occur" with depth×width state instead of a
    vocabulary-sized table.  The scorecard emits estimate vs exact
    plus the one-sided-error invariant (CM can only OVERcount —
    an underestimate anywhere is a broken sketch), all exact
    integers, fully oracle-pinned including the collision pattern
    (both engines hash with the same salted md5 → identical buckets
    → identical estimates).

    Scale shape: tokenize map-only; posexplode to (row, bucket) is a
    4× map-side expansion; ONE groupBy over at most depth×width =
    1 024 groups — the shuffle is CONSTANT-size regardless of corpus
    or vocabulary (the exact `GROUP BY word` it replaces shuffles the
    vocabulary).  Partials merge by + (mergeable sketch), the probe
    join touches a broadcast 1 024-row frame, and the exact-count
    side is a scan-level `IN` filter aggregating 8 groups."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
    )

    def bucket(col, r: int):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cm{r}:"), col)), 1, 2), 16, 10
        ).cast("int")

    rb = tok.select(
        F.posexplode(
            F.array(*[bucket(F.col("w"), r) for r in range(CM_DEPTH)])
        ).alias("r", "b")
    )
    sketch = rb.groupBy("r", "b").agg(F.count("*").cast("long").alias("c"))
    probes = spark.createDataFrame(
        [(w,) for w in CM_PROBES], "word string"
    )
    pb = probes.select(
        "word",
        F.posexplode(
            F.array(*[bucket(F.col("word"), r) for r in range(CM_DEPTH)])
        ).alias("r", "b"),
    )
    est = (
        pb.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy("word")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cm_estimate"))
    )
    exact = (
        tok.filter(F.col("w").isin(*CM_PROBES))
        .groupBy(F.col("w").alias("word"))
        .agg(F.count("*").cast("long").alias("exact_count"))
    )
    return (
        est.join(exact, "word", "left")
        .select(
            "word",
            F.coalesce(F.col("exact_count"), F.lit(0).cast("long")).alias(
                "exact_count"
            ),
            "cm_estimate",
            F.when(
                F.col("cm_estimate")
                >= F.coalesce(F.col("exact_count"), F.lit(0)),
                1,
            )
            .otherwise(0)
            .alias("never_underestimates"),
        )
    )


# ------------------------------------------------------ AMS F2 sketch

#: Tug-of-war estimator rows (Alon-Matias-Szegedy 1996, public).
#: 64 rows: the mean-of-rows estimator has std ≈ √2/√64 ≈ 18% of F₂
#: — tight enough that the scorecard is meaningful while the sketch
#: state stays 64 BIGINTs.
F2_ROWS = 64


def _f2_sql() -> str:
    terms = []
    for r in range(F2_ROWS):
        sign = (
            f"CASE WHEN CAST(CAST(concat('0x', substring(md5('f2{r}:' || shingle), 1, 1)) "
            f"AS BIGINT) AS INT) % 2 = 0 THEN 1 ELSE -1 END"
        )
        terms.append(f"sum({sign}) AS s{r}")
    ests = " + ".join(f"s{i} * s{i}" for i in range(F2_ROWS))
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w,
             generate_subscripts(string_split(trim(text), ' '), 1) AS pos
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS shingle
      FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ),
    s AS (
      SELECT DISTINCT doc_id, shingle FROM grams WHERE shingle IS NOT NULL
    ),
    dfs AS (SELECT shingle, count(*) AS df FROM s GROUP BY shingle),
    sums AS (SELECT {', '.join(terms)} FROM s),
    exact AS (SELECT CAST(sum(df * df) AS BIGINT) AS exact_f2 FROM dfs)
    SELECT exact_f2,
           CAST({ests} AS BIGINT) AS est_f2_sum,
           CAST({F2_ROWS} AS INT) AS n_rows
    FROM sums CROSS JOIN exact
    """


@query("b_agg_f2sketch", _f2_sql())
def agg_f2sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS 'tug-of-war' second-moment sketch over the corpus shingle
    stream: F₂ = Σ_shingle df² — which is EXACTLY the row fan-out of
    the naive shingle self-join that `b_llm_dedup_ngram` runs and the
    df cap bounds.  An optimizer (or a pipeline gate like
    `plan_guard`) can estimate that fan-out in one map-only pass with
    {F2_ROWS} counters instead of aggregating the full shingle
    df table first: each row keeps S_r = Σ sign_r(shingle) (one
    BIGINT; the md5-parity signs are 4-wise-independent enough for
    the classic unbiasedness argument), and E[S_r²] = F₂.  The query
    emits the exact F₂ next to the Σ S_r² scorecard (reader divides
    by n_rows) — both exact integers, so the whole estimate —
    including every sign collision — is oracle-pinned.

    Scale shape: the sketch side is a single global aggregate of ±1s
    (map-side partials, {F2_ROWS} BIGINTs of state, no keyed shuffle
    at all); only the EXACT side pays the df groupBy — at 100 TB you
    run the sketch INSTEAD of the aggregate, which is the point.
    Shingle tokenization reuses the dedup family's distinct
    (doc, shingle) stream (uncapped here: F₂ is precisely the
    quantity the MAX_DF cap exists to bound, so the sketch must see
    the skew)."""
    from ..llm.dedup import raw_shingles

    docs = load_table(spark, sf_dir, "documents")
    s = raw_shingles(docs).distinct()

    def sign(r: int):
        nib = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"f2{r}:"), F.col("shingle"))), 1, 1),
            16,
            10,
        ).cast("int")
        return F.when(nib % 2 == 0, 1).otherwise(-1)

    sums = s.agg(
        *[F.sum(sign(r)).alias(f"s{r}") for r in range(F2_ROWS)]
    )
    exact = (
        s.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .agg(F.sum(F.col("df") * F.col("df")).cast("long").alias("exact_f2"))
    )
    est = sum(
        (F.col(f"s{r}") * F.col(f"s{r}") for r in range(1, F2_ROWS)),
        F.col("s0") * F.col("s0"),
    )
    return exact.crossJoin(sums).select(
        "exact_f2",
        est.cast("long").alias("est_f2_sum"),
        F.lit(F2_ROWS).cast("int").alias("n_rows"),
    )
