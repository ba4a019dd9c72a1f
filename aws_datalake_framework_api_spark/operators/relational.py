"""Projection / filter / case / sort / limit / set ops (SURVEY.md §2
B2, B6, B7).

All expressions are built-in ``pyspark.sql.functions`` — they stay
inside whole-stage codegen, and Catalyst pushes the filters and the
column pruning into the parquet scan (verify with
``df.explain("formatted")`` → ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table

# ---------------------------------------------------------------- projection


@query(
    "b_project",
    """
    SELECT l_orderkey,
           l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge,
           CAST(l_quantity AS INT) AS qty,
           l_returnflag AS flag
    FROM lineitem
    """,
)
def project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + rename + computed columns; scan reads only the 7
    referenced columns (column pruning).

    The computed prices are rounded at their EXACT decimal scale
    (2-dec price x 2-dec factor = 4-dec product; x another = 6-dec):
    rounding a product at a coarser scale lands exactly on half-cent
    boundaries for ~2% of rows, where engines legitimately disagree
    (see functions/numeric.py).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6
        ).alias("charge"),
        F.col("l_quantity").cast("int").alias("qty"),
        F.col("l_returnflag").alias("flag"),
    )


# ---------------------------------------------------------------- filter


@query(
    "b_filter_pred",
    """
    SELECT o_orderkey, o_orderstatus, o_orderpriority, round(o_totalprice, 2) AS price
    FROM orders
    WHERE o_totalprice BETWEEN 1000.0 AND 150000.0
      AND o_orderstatus IN ('F', 'O')
      AND (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%')
      AND o_orderdate IS NOT NULL
      AND NOT (o_orderstatus = 'O' AND o_totalprice < 5000.0)
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + BETWEEN + IN + LIKE + NULL test + boolean combos —
    all pushdown-eligible predicates."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_totalprice").between(1000.0, 150000.0)
        & F.col("o_orderstatus").isin("F", "O")
        & (F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%"))
        & F.col("o_orderdate").isNotNull()
        & ~((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") < 5000.0))
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("price"),
    )


@query(
    "b_case_when",
    """
    SELECT CASE WHEN o_orderstatus = 'F' THEN 'finished'
                WHEN o_orderstatus = 'O' THEN 'open'
                ELSE 'pending' END AS status_label,
           CASE WHEN o_totalprice >= 100000.0 THEN 'big'
                WHEN o_totalprice >= 30000.0 THEN 'medium'
                ELSE 'small' END AS size_band,
           count(*) AS n,
           round(sum(round(o_totalprice, 2)), 2) AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN branches (generalizes the reference's HTTP-status →
    success/failure branch, source-system ``lambda_function.py:46-53``)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.when(F.col("o_orderstatus") == "F", "finished")
            .when(F.col("o_orderstatus") == "O", "open")
            .otherwise("pending")
            .alias("status_label"),
            F.when(F.col("o_totalprice") >= 100000.0, "big")
            .when(F.col("o_totalprice") >= 30000.0, "medium")
            .otherwise("small")
            .alias("size_band"),
            "o_totalprice",
        )
        .groupBy("status_label", "size_band")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.round(F.col("o_totalprice"), 2)), 2).alias("total"),
        )
    )


# ---------------------------------------------------------------- sort / topk


@query(
    "b_sort",
    """
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price, o_orderdate
    FROM orders
    ORDER BY o_orderstatus DESC, price ASC, o_orderkey
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort (range-partitioned exchange + per-partition
    sort at scale)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price"), "o_orderdate"
    ).orderBy(F.col("o_orderstatus").desc(), F.col("price").asc(), F.col("o_orderkey"))


@query(
    "b_topk",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject: each partition keeps its
    local top-100, driver merges 100×partitions rows — never a full
    sort of 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------- set ops


@query(
    "b_set_union",
    """
    SELECT nk, side FROM (
      SELECT DISTINCT c_nationkey AS nk, 'customer' AS side FROM customer
      UNION ALL
      SELECT DISTINCT s_nationkey AS nk, 'supplier' AS side FROM supplier
    )
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two tagged distinct sets (unionByName)."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.select(F.col("c_nationkey").alias("nk")).distinct().withColumn(
        "side", F.lit("customer")
    )
    s = supplier.select(F.col("s_nationkey").alias("nk")).distinct().withColumn(
        "side", F.lit("supplier")
    )
    return c.unionByName(s)


@query(
    "b_set_intersect",
    """
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations having both customers and suppliers."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nk")).intersect(
        supplier.select(F.col("s_nationkey").alias("nk"))
    )


@query(
    "b_set_except",
    """
    SELECT o_custkey AS ck FROM orders WHERE o_orderdate < TIMESTAMP '2001-01-01'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churned customers: ordered before 2001 but never after —
    EXCEPT DISTINCT over two projections of the same fact.  (The
    previous nation-difference form was empty at every SF — each
    nation has both customers and suppliers — which would let a
    broken EXCEPT pass vacuously; this parametrization yields
    65/615/6155 rows at sf0.001/0.01/0.1.)"""
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("2001-01-01").cast("timestamp")
    early = orders.filter(F.col("o_orderdate") < cut)
    late = orders.filter(F.col("o_orderdate") >= cut)
    # subtract = EXCEPT DISTINCT (exceptAll would be bag-difference,
    # removing one left occurrence per right row — different op).
    return early.select(F.col("o_custkey").alias("ck")).subtract(
        late.select(F.col("o_custkey").alias("ck"))
    )


# ---------------------------------------------------------------- dedup


@query(
    "b_dedup_exact",
    """
    SELECT event_id, ts, user_id, event_type, round(value, 2) AS value
    FROM (
      SELECT event_id, ts, user_id, event_type, value,
             row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_exact_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup with deterministic survivor choice (latest ts wins)
    — the lake-compaction form of ``dropDuplicates``.  A bare
    ``dropDuplicates([keys])`` keeps an *arbitrary* row, which is a
    correctness landmine; the window form pins the survivor and costs
    the same single shuffle on the key."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "ts", "user_id", "event_type", F.round("value", 2).alias("value"))
    )


@query(
    "b_set_except_all",
    """
    SELECT ck, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT o_custkey AS ck FROM orders
          WHERE o_orderdate < TIMESTAMP '1998-01-01'
          EXCEPT ALL
          SELECT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '1998-01-01') AS bag
    GROUP BY ck
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT **ALL** — bag difference, the multiset sibling of
    `b_set_except`: each right-side occurrence cancels ONE left-side
    occurrence, so a customer with 5 early and 2 late orders
    survives with multiplicity 3 (EXCEPT DISTINCT would drop them
    entirely).  The rollup makes the multiplicities hash-checkable.
    Spark implements it as a counted anti-semantics hash aggregate —
    one shuffle on the key, no join explosion."""
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    early = orders.filter(F.col("o_orderdate") < cut).select(
        F.col("o_custkey").alias("ck")
    )
    late = orders.filter(F.col("o_orderdate") >= cut).select(
        F.col("o_custkey").alias("ck")
    )
    return early.exceptAll(late).groupBy("ck").agg(
        F.count("*").cast("long").alias("n")
    )


@query(
    "b_set_intersect_all",
    """
    SELECT ck, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT o_custkey AS ck FROM orders
          WHERE o_orderdate < TIMESTAMP '1998-01-01'
          INTERSECT ALL
          SELECT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '1998-01-01') AS bag
    GROUP BY ck
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT **ALL** — bag intersection: each key survives with
    min(left multiplicity, right multiplicity) copies, vs the 0/1 of
    `b_set_intersect`.  Same single-shuffle counted-aggregate plan
    class as EXCEPT ALL."""
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    early = orders.filter(F.col("o_orderdate") < cut).select(
        F.col("o_custkey").alias("ck")
    )
    late = orders.filter(F.col("o_orderdate") >= cut).select(
        F.col("o_custkey").alias("ck")
    )
    return early.intersectAll(late).groupBy("ck").agg(
        F.count("*").cast("long").alias("n")
    )
