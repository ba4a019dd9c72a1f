"""Raw-SQL query surface (SURVEY.md §2 Tier B; reference anchor: the
data-lake framework fronts an analytics layer its users drive with SQL
— `BASELINE.json:6` "Spark SQL … connectors").

The engine's tables are exposed as temp views
(``sources.readers.register_views``) and queried with ``spark.sql``
verbatim — proving a reference user can bring their SQL unchanged
instead of porting it to the DataFrame API.  The query string below is
dialect-shared: the SAME text runs on Spark and on the DuckDB oracle,
which is the strongest possible parity statement for the SQL surface
(no translation layer to hide a semantic gap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..sources.readers import register_views

# TPC-H Q3 shape (shipping-priority / unshipped-orders revenue),
# adapted to the fixture's columns.  Money addends snap to a 10^-4
# grid BEFORE the sum (bit-identical under any partial-agg order —
# the same cent-grid rule as the flagship star join); the ORDER BY
# carries the full key so the LIMIT is deterministic under ties.
# The outer CAST AS DOUBLE pins the revenue type: Spark parses the
# 10000.0 literal as DECIMAL (so the division would yield DECIMAL)
# while DuckDB parses it as DOUBLE — the explicit cast makes the
# shared text produce the identical type on both engines.
_Q3_SQL = """
SELECT o_orderkey,
       o_orderdate,
       o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT))
            / 10000.0 AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'MACHINERY'
  AND o_orderdate < TIMESTAMP '1997-06-01'
  AND l_shipdate  > TIMESTAMP '1997-06-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@query("b_sql_q3", _Q3_SQL)
def sql_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped pricing query executed as a raw SQL string over
    the registered lake views — byte-identical SQL on both engines.

    Plan: Catalyst gives the SQL text the same physical treatment as
    the DataFrame flagship (pushed filters on mktsegment/dates, one
    sort-merge shuffle for lineitem⋈orders, broadcast/hash for the
    customer dim, TakeOrderedAndProject for the top-10) — there is no
    separate "SQL engine" to audit, which is the point of the
    exhibit."""
    register_views(spark, sf_dir)
    return spark.sql(_Q3_SQL)


# TPC-H Q4 shape (late-shipment order priority census), adapted to the
# fixture's columns: the CORRELATED-SUBQUERY surface — EXISTS with an
# outer-reference predicate — again as dialect-shared text.
_Q4_SQL = """
SELECT o_orderpriority,
       count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("b_sql_q4", _Q4_SQL)
def sql_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped correlated EXISTS executed as raw SQL over the
    registered views — the subquery-decorrelation exhibit: Catalyst
    rewrites the correlated EXISTS into a LEFT SEMI join on
    l_orderkey with the ship-lag predicate as the join residual, so
    the 'per-order probe' the SQL spells never executes as a loop —
    it is one semi-join shuffle keyed on orderkey (the same physical
    class as `b_join_semi`), date filters pushed to the orders scan.
    Same byte-identical text runs on DuckDB."""
    register_views(spark, sf_dir)
    return spark.sql(_Q4_SQL)


# TPC-H Q17 shape (small-quantity revenue), adapted to the fixture:
# a CORRELATED SCALAR AGGREGATE subquery — the third classic
# decorrelation pattern after Q3's join-agg and Q4's EXISTS.  The
# threshold multiplier is 0.5 (a power of two, so the multiply is
# IEEE-exact) and l_quantity is integer-valued in the fixture, so
# avg() = exact-int-sum / count is bit-identical on both engines and
# the filter cannot flip rows between Spark and DuckDB; revenue snaps
# to the cent grid before summation as everywhere else.
_Q17_SQL = """
SELECT p_brand,
       CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))
            / 100.0 AS DOUBLE) AS small_qty_revenue,
       count(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_size < 15
  AND l_quantity < (
      SELECT 0.5 * avg(l2.l_quantity)
      FROM lineitem l2
      WHERE l2.l_partkey = p_partkey)
GROUP BY p_brand
ORDER BY p_brand
"""


@query("b_sql_q17", _Q17_SQL)
def sql_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped correlated SCALAR-aggregate subquery as raw
    SQL: Catalyst decorrelates the per-part average into a standalone
    aggregate on lineitem joined back on l_partkey — the 'probe per
    row' the SQL spells becomes one extra hash-aggregate + equi-join
    keyed on partkey, never a loop.  At 100 TB both the agg and the
    join shuffle on the same key, so AQE can pipeline them; the part
    dim is broadcast.  Same byte-identical text runs on DuckDB."""
    register_views(spark, sf_dir)
    return spark.sql(_Q17_SQL)
