"""Join operators (SURVEY.md §2 B3).

The fixtures form a TPC-H-ish star; the join inventory covers every
strategy a lake engine needs at 100 TB:

- **Broadcast hash join** for bounded dims (region=5, nation=25 rows —
  bounded by the real world, not data volume): explicit
  ``F.broadcast`` so the plan never degrades to a shuffle even if
  stats are stale.
- **Sort-merge join** for fact⋈fact (orders⋈lineitem): both sides
  shuffle on the key once; AQE handles skew splitting.
- Semi/anti joins express EXISTS/NOT EXISTS without materializing the
  right side.
- **Range join** via broadcast-nested-loop against a tiny bands table.
- **As-of join** (Spark has no native one): composed from an
  equi-join on the partition key + windowed latest-row filter.  At
  100 TB the window runs per-key after a single shuffle — no O(n²).

Reference parity: the reference itself has zero joins (SURVEY.md §0);
this tier realizes the declared lake-analytics surface
(``BASELINE.json:6``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import money_avg, money_sum
from ..registry import query
from ..sources.readers import load_table

# ---------------------------------------------------------------- flagship


def star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: revenue by nation/month over the full star
    (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region).

    Plan shape at scale: lineitem⋈orders is the only real shuffle
    (sort-merge on orderkey); customer is hash-joined after AQE sizes
    it; nation/region are broadcast.  Filters on region/mktsegment/
    date reach the parquet scans (predicate pushdown).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("c_mktsegment") == "BUILDING")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .groupBy("n_name", F.month("o_orderdate").alias("o_month"))
        # Addends are rounded to the cent grid BEFORE the sum so the
        # result is bit-identical under any partial-agg order (see
        # functions/numeric.py) — required by the hash oracle and by
        # run-to-run stability on a real cluster.
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name", "o_month")
    )


STAR_JOIN_SQL = """
SELECT n_name,
       CAST(month(o_orderdate) AS INT) AS o_month,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)) / 10000.0 AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_mktsegment = 'BUILDING'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY 1, 2
ORDER BY revenue DESC, n_name, o_month
"""

query("b_join_star", STAR_JOIN_SQL)(star_join)


# ---------------------------------------------------------------- broadcast


@query(
    "b_join_bcast",
    """
    SELECT r_name,
           count(*) AS n_cust,
           sum(CAST(round(c_acctbal * 100.0) AS BIGINT)) / 100.0 / count(c_acctbal) AS avg_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ broadcast(nation) ⋈ broadcast(region): zero shuffles
    on the dim side regardless of fact size."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_cust"),
            money_avg("c_acctbal").alias("avg_bal"),
        )
    )


# ---------------------------------------------------------------- sort-merge


@query(
    "b_join_smj",
    """
    SELECT o_orderpriority,
           count(*) AS n_items,
           round(sum(l_quantity), 2) AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact on the natural key — hinted to sort-merge, the only
    strategy that scales when both sides exceed memory."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        orders.hint("merge")
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------- outer


@query(
    "b_join_outer",
    """
    SELECT c_custkey,
           c_mktsegment,
           count(o_orderkey) AS n_orders,
           round(coalesce(sum(round(o_totalprice, 2)), 0.0), 2) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: customers keep a row (n_orders=0) with no orders."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.coalesce(F.sum(F.round(F.col("o_totalprice"), 2)), F.lit(0.0)), 2
            ).alias("total_spent"),
        )
    )


@query(
    "b_join_full",
    """
    WITH cust AS (
      SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1
    ), supp AS (
      SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1
    )
    SELECT coalesce(cust.nk, supp.nk) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer over two aggregates: nations having customers,
    suppliers, or either."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    cust = customer.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count("*").alias("n_cust")
    )
    supp = supplier.groupBy(F.col("s_nationkey").alias("snk")).agg(
        F.count("*").alias("n_supp")
    )
    return cust.join(supp, cust.nk == supp.snk, "full").select(
        F.coalesce("nk", "snk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


# ---------------------------------------------------------------- semi / anti


@query(
    "b_join_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi: never materializes order columns."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "b_join_anti",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-06-01')
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti: dormant customers — no order since
    the cutoff.  (Every fixture customer has SOME order, so the
    unconditioned anti-join returns the empty set at every SF — a
    broken anti-join would "pass" vacuously; the date residual keeps
    the result provably non-empty: 27/255/2517 rows at
    sf0.001/0.01/0.1.)  The filter pushes BELOW the anti-join, so
    only recent orders shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
    )
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------- range / theta

PRICE_BANDS = [
    ("low", 0.0, 20000.0),
    ("mid", 20000.0, 45000.0),
    ("high", 45000.0, 70000.0),
    ("lux", 70000.0, 1e12),
]


@query(
    "b_join_range",
    """
    SELECT band,
           count(*) AS n_items,
           round(sum(l_extendedprice), 2) AS band_total
    FROM lineitem
    JOIN (VALUES ('low', 0.0, 20000.0),
                 ('mid', 20000.0, 45000.0),
                 ('high', 45000.0, 70000.0),
                 ('lux', 70000.0, 1e12)) AS b(band, lo, hi)
      ON l_extendedprice >= lo AND l_extendedprice < hi
    GROUP BY band
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join against a tiny bands table → Spark picks
    BroadcastNestedLoopJoin; the bands side is O(1) so the 'nested
    loop' is really a per-row band lookup — scales linearly."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    # literal dim built JVM-side (LocalRelation): createDataFrame on a
    # Python list would pickle through an RDD and spin up a Python
    # worker per core just to materialize 4 rows (~9s of pure startup)
    values = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)
    bands = spark.sql(f"SELECT * FROM VALUES {values} AS b(band, lo, hi)")
    return (
        lineitem.join(
            F.broadcast(bands),
            (F.col("l_extendedprice") >= F.col("lo")) & (F.col("l_extendedprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("band_total"),
        )
    )


@query(
    "b_join_cross",
    """
    SELECT r_name, s AS o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus AS s FROM orders)
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two bounded inputs (5 × 3)."""
    region = load_table(spark, sf_dir, "region")
    statuses = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus")
    ).distinct()
    return region.select("r_name").crossJoin(statuses)


# ---------------------------------------------------------------- as-of

ASOF_SQL = """
WITH p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.event_id AS purchase_id,
         p.user_id AS user_id,
         p.ts AS purchase_ts,
         round(p.value, 2) AS purchase_value,
         c.ts AS click_ts,
         c.event_id AS click_id,
         row_number() OVER (
           PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC
         ) AS rn
  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
)
SELECT purchase_id, user_id, purchase_ts, purchase_value, click_ts, click_id
FROM j WHERE rn = 1
"""


@query("b_join_asof", ASOF_SQL)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the most recent click by the
    same user at-or-before the purchase time.

    Spark has no native as-of; composition = equi-join on the
    partition key (user) with the range predicate, then keep the
    latest match per left row via a window.  One shuffle on user_id;
    the per-key match count is bounded by per-user activity, so this
    survives 100 TB (skewed power-users are handled by AQE skew
    splitting).  ``join_asof_pandas`` is the merge_asof scale variant.
    """
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.round("value", 2).alias("purchase_value"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.desc("click_ts"), F.desc("click_id")
    )
    return (
        purchases.join(
            clicks,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("click_ts") <= F.col("purchase_ts")),
            "left",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id", "user_id", "purchase_ts", "purchase_value",
            "click_ts", "click_id",
        )
    )


@query(
    "b_join_bucketed",
    """
    SELECT o_orderkey, o_orderpriority,
           count(*) AS n_items,
           round(sum(l_quantity), 2) AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_orderpriority
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact⋈fact via bucketing: both sides written
    ``bucketBy(8, orderkey)`` + in-bucket sorted, so the join AND the
    follow-on per-order aggregation run with ZERO shuffle exchanges —
    bucket i joins bucket i in place (tests/test_plans.py asserts the
    exchange-free plan).

    This is THE strategy for repeated fact⋈fact joins at 100 TB: pay
    the shuffle once at write time, then every subsequent join/agg on
    the bucket key is map-side.  The bucketed copies here are written
    to a scratch warehouse per call so the query is self-contained;
    production buckets the curated tables at ingest."""
    import hashlib
    import tempfile

    suffix = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    scratch = tempfile.mkdtemp(prefix="spark_graft_bkt_")
    names = {}
    for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = f"bkt_{tbl}_{suffix}"
        (
            load_table(spark, sf_dir, tbl)
            .write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .option("path", f"{scratch}/{name}")
            .saveAsTable(name)
        )
        names[tbl] = name
    orders = spark.table(names["orders"])
    lineitem = spark.table(names["lineitem"])
    return (
        orders.hint("merge")  # keep SMJ even when a side fits broadcast
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@query("b_join_asof_pandas", ASOF_SQL)
def join_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of semantics via cogrouped ``applyInPandas`` +
    ``pd.merge_asof`` — the scale path when per-key match lists are
    huge (merge_asof is O(n+m) per key vs the window variant's
    O(matches))."""
    import pandas as pd

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.round("value", 2).alias("purchase_value"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.sort_values("purchase_ts", kind="mergesort")
        # merge_asof keeps the LAST right row with ts <= left ts; sort
        # clicks by (ts, id) so ties resolve to the max click_id,
        # matching the window variant's (ts DESC, id DESC) rank.
        right = right.sort_values(["click_ts", "click_id"], kind="mergesort")
        out = pd.merge_asof(
            left,
            right.drop(columns=["user_id"]),
            left_on="purchase_ts",
            right_on="click_ts",
            direction="backward",
        )
        return out[
            ["purchase_id", "user_id", "purchase_ts", "purchase_value",
             "click_ts", "click_id"]
        ]

    schema = (
        "purchase_id long, user_id long, purchase_ts timestamp, "
        "purchase_value double, click_ts timestamp, click_id long"
    )
    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(lambda left, right: merge(left, right), schema)
    )


# ---------------------------------------------------------------- salted join


SALT_BUCKETS = 8


@query(
    "b_join_salted",
    """
    SELECT c.c_mktsegment,
           count(*) AS n_events,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-defused fact⋈dim join via key salting: the fact side gets
    a deterministic salt in [0, SALT_BUCKETS); the build side is
    exploded ×SALT_BUCKETS so every (key, salt) pair exists; the join
    key becomes (user_id, salt), splitting any hot user across
    SALT_BUCKETS reducers.  Result is row-identical to the unsalted
    join — the oracle twin IS the plain join — because salting only
    re-partitions the pair space; it never changes it.

    100 TB notes: this is the manual form of what AQE's skew-join
    split does at runtime; you write it when the skew is KNOWN (one
    tenant = 30% of events) so the plan never builds the hot
    partition in the first place.  The explode multiplies only the
    BUILD side (dim ×8 — still broadcastable); the monetary sum uses
    exact integer cents, so the group totals are order-independent
    and identical on re-runs regardless of how salting moved rows."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    salted_fact = ev.select(
        "user_id",
        F.pmod(F.col("event_id"), F.lit(SALT_BUCKETS)).alias("salt"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents_row"),
    )
    salted_dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.explode(F.array(*[F.lit(s) for s in range(SALT_BUCKETS)])).alias("salt"),
    )
    joined = salted_fact.join(
        salted_dim,
        (salted_fact.user_id == salted_dim.c_custkey)
        & (salted_fact.salt == salted_dim.salt),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum("value_cents_row").alias("value_cents"),
    )


# ----------------------------------------------------- grid range join

GRID_CELL_US = 3_600_000_000  # 1-hour grid cell (µs) = the join horizon


@query(
    "b_join_range_grid",
    f"""
    WITH v AS (
      SELECT CAST(ts AS DATE) AS d, epoch_us(ts) AS vus
      FROM events WHERE event_type = 'view'
    ),
    p AS (SELECT epoch_us(ts) AS pus FROM events WHERE event_type = 'purchase'),
    pairs AS (
      SELECT d, vus, pus FROM v JOIN p
        ON pus >= vus AND pus <= vus + {GRID_CELL_US}
    )
    SELECT d, count(*) AS n_pairs,
           CAST(min(pus - vus) AS BIGINT) AS min_lag_us,
           CAST(max(pus - vus) AS BIGINT) AS max_lag_us
    FROM pairs GROUP BY d
    """,
)
def join_range_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIG-BIG interval join via GRID BUCKETING — the 100 TB form of a
    range join with no equi key on either side (contrast `b_join_range`,
    whose band side broadcasts, and `b_stream_sjoin`, whose user_id
    equi-key carries the shuffle): every (view, purchase) pair at most
    one horizon apart, rolled up per view-day.

    The nested-loop Spark would otherwise pick is replaced by an
    EQUI-join on a time-grid cell: with cell size = the join horizon,
    a purchase matching view v lies in v's cell or the next one, so
    the view side replicates ×2 across its two probe cells and the
    join is a plain shuffled equi-join on cell with the exact range
    as a residual filter — each true pair matches in EXACTLY one cell
    (the purchase's own), so no dedup pass is needed.  Cost: 2× one
    side + per-cell occupancy products, the standard interval-join
    bucketing (what Databricks' range-join hints do under the hood).
    Plan-shape test pins: no BroadcastNestedLoopJoin, no cartesian."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("ts").cast("date").alias("d"),
        us.alias("vus"),
        F.floor(us / GRID_CELL_US).cast("long").alias("home_cell"),
    )
    v2 = v.select(
        "d",
        "vus",
        F.explode(
            F.array(F.col("home_cell"), F.col("home_cell") + 1)
        ).alias("cell"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        us.alias("pus"),
        F.floor(us / GRID_CELL_US).cast("long").alias("cell"),
    )
    pairs = v2.join(p, "cell").filter(
        (F.col("pus") >= F.col("vus"))
        & (F.col("pus") <= F.col("vus") + GRID_CELL_US)
    )
    return pairs.groupBy("d").agg(
        F.count("*").alias("n_pairs"),
        F.min(F.col("pus") - F.col("vus")).cast("long").alias("min_lag_us"),
        F.max(F.col("pus") - F.col("vus")).cast("long").alias("max_lag_us"),
    )


# ------------------------------------------------------- shuffled-hash


@query(
    "b_join_shj",
    """
    SELECT o_orderstatus,
           count(*) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))
                / 100.0 AS DOUBLE) AS sum_price
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_shuffled_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third join strategy, completing the set next to
    `b_join_bcast` (broadcast) and `b_join_smj` (sort-merge):
    SHUFFLE_HASH-hinted fact⋈fact.  Both sides shuffle on the key but
    neither is sorted — the smaller post-shuffle side is hash-tabled
    per partition.  On a cluster this beats SMJ when one side is
    moderately smaller than the other (no sort, no spill-merge) yet
    too big to broadcast; it loses to SMJ when the build side
    overflows executor memory, which is why the choice is a hint, not
    a default.  Money sums snap to the cent grid as everywhere."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        orders.hint("SHUFFLE_HASH")  # build side: the smaller fact
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100.0).cast("long")
                )
                / 100.0
            )
            .cast("double")
            .alias("sum_price"),
        )
    )


# ------------------------------------------------------ edit-distance


@query(
    "b_join_editdist",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT least(a.p_name, b.p_name) AS name_a,
           greatest(a.p_name, b.p_name) AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def join_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string-similarity self-join (misspelling-cluster discovery
    over a name dimension) with LOSSLESS length-band blocking: edit
    distance ≥ |len(a) − len(b)|, so strings within distance d=2 land
    in the same or adjacent (d+1)-wide length bucket.  One side emits
    its bucket and bucket+1; the equi-join on the bucket key generates
    every qualifying unordered pair exactly once (same-bucket pairs
    both ways — canonicalized by least/greatest — cross-bucket pairs
    only from the lower bucket's explode), and ``F.levenshtein`` runs
    ONLY on candidates.  The oracle brute-forces the quadratic join;
    the engine never does — that is the scale claim.  At real-catalog
    cardinality length alone is a weak key; the n-gram/MinHash family
    (llm/dedup.py) provides the stronger blocking dimensions, and this
    exhibit is the equi-join skeleton they all share."""
    part = load_table(spark, sf_dir, "part")
    names = part.select("p_name").distinct()
    banded = names.withColumn("bkt", (F.length("p_name") / 3).cast("int"))
    left = banded.select(
        F.col("p_name").alias("name_l"),
        F.explode(F.array(F.col("bkt"), F.col("bkt") + 1)).alias("key"),
    )
    right = banded.select(F.col("p_name").alias("name_r"), F.col("bkt").alias("key"))
    cand = left.join(right, "key").filter(F.col("name_l") != F.col("name_r"))
    return (
        cand.withColumn("dist", F.levenshtein("name_l", "name_r"))
        .filter(F.col("dist") <= 2)
        .select(
            F.least("name_l", "name_r").alias("name_a"),
            F.greatest("name_l", "name_r").alias("name_b"),
            F.col("dist").cast("long").alias("dist"),
        )
        .distinct()
    )


# ---------------------------------------------------------------- SCD2 join


@query(
    "b_join_scd2",
    """
    WITH dim AS (
        SELECT user_id,
               CASE v WHEN 0 THEN TIMESTAMP '1970-01-01'
                      ELSE TIMESTAMP '2024-01-15' END AS valid_from,
               CASE v WHEN 0 THEN TIMESTAMP '2024-01-15'
                      ELSE TIMESTAMP '9999-12-31' END AS valid_to,
               CASE v WHEN 0 THEN 'tier_' || CAST(user_id % 3 AS VARCHAR)
                      ELSE 'tier_' || CAST((user_id + 1) % 3 AS VARCHAR)
               END AS segment
        FROM (SELECT DISTINCT user_id FROM events),
             (SELECT 0 AS v UNION ALL SELECT 1) versions
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100.0) AS BIGINT)) / 100.0 AS DOUBLE)
               AS total_value
    FROM events e
    JOIN dim d
      ON e.user_id = d.user_id
     AND e.ts >= d.valid_from
     AND e.ts <  d.valid_to
    GROUP BY segment
    """,
)
def join_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (Type 2) temporal join: each fact row
    joins the dimension VERSION whose validity interval
    [valid_from, valid_to) contains its timestamp — the standard
    warehouse pattern for 'what segment was this user in WHEN the
    event happened' (as-of semantics materialized as interval rows;
    `b_join_asof` is the two-sided-stream cousin).

    The SCD2 dim here derives deterministically from the fixture (two
    versions per user, flipping segment at 2024-01-15) so both
    engines build identical inputs.  Plan: equi-join on user_id with
    the interval bounds as join residuals — ONE hash join keyed on
    the user, never an interval cross-product; validity intervals per
    key are non-overlapping by construction, so each fact row matches
    exactly one version.  At 100 TB the dim (2 rows/user) broadcasts
    if it fits, else shuffles on the same user key as the fact —
    either way the interval check rides the join, costing zero extra
    passes."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    split = F.lit("2024-01-15").cast("timestamp")
    v0 = users.select(
        "user_id",
        F.lit("1970-01-01").cast("timestamp").alias("valid_from"),
        split.alias("valid_to"),
        F.concat(F.lit("tier_"), (F.col("user_id") % 3).cast("string")).alias(
            "segment"
        ),
    )
    v1 = users.select(
        "user_id",
        split.alias("valid_from"),
        F.lit("9999-12-31").cast("timestamp").alias("valid_to"),
        F.concat(
            F.lit("tier_"), ((F.col("user_id") + 1) % 3).cast("string")
        ).alias("segment"),
    )
    dim = v0.unionByName(v1)
    joined = ev.join(
        F.broadcast(dim),
        (ev.user_id == dim.user_id)
        & (ev.ts >= dim.valid_from)
        & (ev.ts < dim.valid_to),
    )
    return joined.groupBy("segment").agg(
        F.count("*").alias("n_events"),
        (F.sum(F.round(F.col("value") * 100.0).cast("long")) / 100.0)
        .cast("double")
        .alias("total_value"),
    )


# ---------------------------------------------------------- null-safe join


@query(
    "b_join_nullsafe",
    """
    WITH a AS (SELECT nullif(c_custkey % 10, 5) AS k, count(*) AS n_cust
               FROM customer GROUP BY nullif(c_custkey % 10, 5)),
    b AS (SELECT nullif(s_suppkey % 10, 5) AS k, count(*) AS n_supp
          FROM supplier GROUP BY nullif(s_suppkey % 10, 5))
    SELECT a.k,
           CAST(a.n_cust AS BIGINT) AS n_cust,
           CAST(b.n_supp AS BIGINT) AS n_supp
    FROM a
    JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equi-join (`<=>` / IS NOT DISTINCT FROM): the NULL
    bucket JOINS (one row here, since both sides collapse NULLs in
    their pre-aggregation) where ordinary `=` would silently drop it —
    the classic bug when joining on nullable dimension keys
    (NULLIF-derived buckets, optional foreign keys).

    Plan note: `<=>` is still a HASH-JOINABLE equality (Spark hashes
    NULL like any other value under null-safe semantics), so the plan
    is a plain broadcast/shuffled hash join — NOT the nested-loop
    fallback a `a.k = b.k OR (a.k IS NULL AND b.k IS NULL)` rewrite
    would produce.  Both sides pre-aggregate to ≤10 rows, so the
    exhibit's cost is nil at any scale."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.nullif(F.col("c_custkey") % 10, F.lit(5)).alias("k"))
        .agg(F.count("*").cast("long").alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.nullif(F.col("s_suppkey") % 10, F.lit(5)).alias("k"))
        .agg(F.count("*").cast("long").alias("n_supp"))
    )
    return cust.join(supp, cust.k.eqNullSafe(supp.k)).select(
        cust.k.alias("k"), "n_cust", "n_supp"
    )
