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


# ----------------------------------------------------------------------
# Round-4 widening: the remaining classic TPC-H plan shapes, adapted to
# the fixture's columns (no partsupp / phone / commitdate columns — see
# TESTDATA.md), all as dialect-shared text.  Determinism rules as
# above: money snaps to a 10^-4 (or cent) grid BEFORE any sum, LIMITs
# carry a full tiebreak key, and aggregate output types are pinned with
# explicit CASTs so Spark and DuckDB agree bit-for-bit.

# TPC-H Q5 shape (local-supplier volume): the five-way snowflake join
# with the extra NON-hierarchical equality s_nationkey = c_nationkey —
# the constraint that makes Q5 famously join-order-sensitive.
_Q5_SQL = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT))
            / 10000.0 AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@query("b_sql_q5", _Q5_SQL)
def sql_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped snowflake join as raw SQL.  The plan to want
    at 100 TB: region/nation/supplier/customer are broadcast (all far
    under the 10 MB default threshold even at sf100k), so the only
    shuffle is lineitem⋈orders on orderkey; the s_nationkey =
    c_nationkey residual is evaluated inside the broadcast-hash probe,
    never as a separate exchange.  Catalyst's join reordering is what
    this exhibit trusts — the SQL lists joins in 'logical' order and
    the optimizer is free to pick the cheap one (CBO/AQE at scale)."""
    register_views(spark, sf_dir)
    return spark.sql(_Q5_SQL)


# TPC-H Q7 shape (volume shipping between two nations): dual aliases
# of the SAME dim table (nation n1/n2) + a symmetric OR pair filter +
# per-year rollup — the self-referential-dim pattern.
_Q7_SQL = """
SELECT supp_nation,
       cust_nation,
       l_year,
       CAST(sum(vol_e4) / 10000.0 AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM (SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
             CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT) AS vol_e4
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01') AS shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("b_sql_q7", _Q7_SQL)
def sql_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped dual-dim-alias query as raw SQL.  nation is
    joined TWICE under different aliases; both instances broadcast, so
    the nation-pair OR filter runs inside the probe side of the
    broadcast joins and prunes before the orderkey shuffle.  The year
    is pinned to INT via CAST in the shared text (Spark EXTRACT yields
    INT, DuckDB BIGINT — the cast removes the only schema divergence)."""
    register_views(spark, sf_dir)
    return spark.sql(_Q7_SQL)


# TPC-H Q13 shape (customer order-count distribution): LEFT OUTER join
# with an ON-clause-only predicate (NOT a WHERE — moving it would drop
# the zero-order customers Q13 exists to count) + double aggregation.
_Q13_SQL = """
SELECT c_count,
       count(*) AS custdist
FROM (SELECT c_custkey,
             count(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey
       AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) AS c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("b_sql_q13", _Q13_SQL)
def sql_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped outer-join histogram as raw SQL.  The
    ON-clause residual is the semantic exhibit: the priority filter
    must NOT eliminate customers, only their matches — a WHERE would
    change the answer.  Plan at scale: one shuffle on custkey for the
    outer join + first groupBy (same key, so AQE coalesces them), then
    the tiny c_count histogram re-aggregates near-free; count(col) vs
    count(*) null-skipping is the second semantic pin."""
    register_views(spark, sf_dir)
    return spark.sql(_Q13_SQL)


# TPC-H Q15 shape (top supplier): CTE reused twice — once as the join
# input, once inside a scalar MAX subquery.  Revenue stays ON the e4
# integer grid through the max-equality comparison (exact, no float
# ties), converting to DOUBLE only for display.
_Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT))
               AS total_rev_e4
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey)
SELECT s_suppkey,
       s_name,
       CAST(total_rev_e4 / 10000.0 AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM revenue)
ORDER BY s_suppkey
"""


@query("b_sql_q15", _Q15_SQL)
def sql_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped CTE + scalar-subquery query as raw SQL.  The
    `revenue` CTE appears twice; Spark plans it twice (cheap: one
    lineitem scan each with the same pushed date filter) and folds the
    scalar max into a single-row broadcast — at 100 TB you'd CACHE the
    CTE or let AQE reuse the exchange, both of which this plan shape
    permits because the two uses share partitioning on suppkey.  The
    argmax-by-equality keeps ALL tied suppliers (exact on the integer
    grid), which is Q15's documented tie rule."""
    register_views(spark, sf_dir)
    return spark.sql(_Q15_SQL)


# TPC-H Q18 shape (large-quantity orders): IN over a GROUP BY ...
# HAVING subquery on the fact table itself.  l_quantity is
# integer-valued in the fixture (Q17's note), so the per-order sums
# are exact BIGINTs and the >250 threshold cannot flip between
# engines.
_Q18_SQL = """
SELECT c_name,
       c_custkey,
       o_orderkey,
       o_orderdate,
       o_totalprice,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey
                     FROM lineitem
                     GROUP BY l_orderkey
                     HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 250)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@query("b_sql_q18", _Q18_SQL)
def sql_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped IN-subquery query as raw SQL.  Catalyst
    rewrites the IN over the HAVING aggregate into a LEFT SEMI join
    against the aggregated orderkey set — both sides shuffle on
    orderkey, the same key the outer join and final groupBy use, so
    the whole pipeline is ONE partitioning end-to-end (no re-shuffle
    between the semi-join, the 3-way join, and the rollup).  That
    key-reuse is exactly what survives a 100× scale-up.  LIMIT rides
    TakeOrderedAndProject with o_orderkey as the tiebreak."""
    register_views(spark, sf_dir)
    return spark.sql(_Q18_SQL)


# TPC-H Q19 shape (disjunctive predicate): three OR'd conjunct groups
# mixing dim (brand/size) and fact (quantity) columns — the exhibit
# for CNF extraction: the optimizer must still push the common
# l_quantity bounds and brand IN-list down through the OR.
_Q19_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT))
            / 10000.0 AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity >= 1  AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15 AND l_quantity >= 20 AND l_quantity <= 30)
"""


@query("b_sql_q19", _Q19_SQL)
def sql_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped disjunctive-pushdown query as raw SQL.  The
    scale question is whether the OR blocks the scan filters: Spark
    extracts the cross-branch implications (l_quantity BETWEEN 1 AND
    30 pushes to the lineitem scan; the brand IN-list and p_size <= 15
    push to the part scan) so the broadcast-hash join probes a
    pre-filtered fact, not the raw table.  One aggregate row out — the
    whole query is a map-side filter + broadcast probe + global agg,
    zero wide shuffles."""
    register_views(spark, sf_dir)
    return spark.sql(_Q19_SQL)


# TPC-H Q22 shape (dormant high-balance customers): NOT EXISTS
# anti-join + an uncorrelated scalar AVG subquery, adapted to the
# fixture (no c_phone → the 'country code' is the custkey's last
# digit; every customer has SOME order → dormancy is 'no order since
# 2000-06-01').  The balance/avg comparison runs on the exact cent
# grid on BOTH sides so no float rounding can flip a row.
_Q22_SQL = """
SELECT cntrycode,
       count(*) AS numcust,
       CAST(sum(bal_cents) / 100.0 AS DOUBLE) AS totacctbal
FROM (SELECT CAST(c_custkey % 10 AS INT) AS cntrycode,
             CAST(round(c_acctbal * 100.0) AS BIGINT) AS bal_cents,
             c_custkey
      FROM customer
      WHERE c_custkey % 10 IN (1, 2, 3, 4, 5)
        AND CAST(round(c_acctbal * 100.0) AS BIGINT) > (
            SELECT CAST(sum(CAST(round(c2.c_acctbal * 100.0) AS BIGINT)) AS DOUBLE)
                   / count(*)
            FROM customer c2
            WHERE c2.c_acctbal > 0.0
              AND c2.c_custkey % 10 IN (1, 2, 3, 4, 5))
        AND NOT EXISTS (SELECT 1
                        FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-06-01')) AS custsale
GROUP BY cntrycode
ORDER BY cntrycode
"""


@query("b_sql_q22", _Q22_SQL)
def sql_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped anti-join query as raw SQL.  Three decorrelation
    moves in one statement: the scalar AVG folds to a one-row broadcast,
    the NOT EXISTS becomes a LEFT ANTI join on custkey against the
    date-filtered orders (filter pushed BELOW the anti-join — only
    recent orders shuffle), and the final rollup groups the tiny
    survivor set.  At 100 TB the anti-join is the only wide edge and
    both sides are pre-filtered; cent-grid comparison keeps the
    avg-threshold semantics bit-stable across engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q22_SQL)


# TPC-H Q8 shape (national market share): the CASE-ratio aggregate —
# share = Σ(case'd volume)/Σ(volume) per year.  Both sums ride the
# e4 integer grid, so the only float op is ONE division per output
# row (deterministic — no reassociation freedom in a 2-term
# expression).
_Q8_SQL = """
SELECT o_year,
       CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN vol_e4 ELSE 0 END)
                 AS DOUBLE)
            / CAST(sum(vol_e4) AS DOUBLE) AS DOUBLE) AS mkt_share,
       CAST(count(*) AS BIGINT) AS n_items
FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             n2.n_name AS supp_nation,
             CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)
                 AS vol_e4
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE'
        AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01') AS all_nations
GROUP BY o_year
ORDER BY o_year
"""


@query("b_sql_q8", _Q8_SQL)
def sql_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped market-share query as raw SQL — the deepest
    join tree in the suite (8 tables, nation twice).  Every dim
    broadcasts; lineitem⋈orders is again the single wide edge, and
    the p_type filter prunes the fact through the broadcast part dim
    BEFORE that shuffle.  The share is a conditional-aggregate ratio
    computed per group from two exact BIGINTs."""
    register_views(spark, sf_dir)
    return spark.sql(_Q8_SQL)


# TPC-H Q10 shape (returned-item revenue): the customer-ranking
# report — join breadth plus a TOP-N on a grouped money sum.
_Q10_SQL = """
SELECT c_custkey,
       c_name,
       n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT))
            / 10000.0 AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("b_sql_q10", _Q10_SQL)
def sql_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped top-customer report as raw SQL.  The quarter
    date filter prunes orders at the scan; the returnflag filter
    prunes lineitem at the scan; customer/nation broadcast; the
    grouped revenue shuffles on the customer grain and
    TakeOrderedAndProject keeps only 20 rows per partition — the
    report never materializes the full customer ranking."""
    register_views(spark, sf_dir)
    return spark.sql(_Q10_SQL)


# TPC-H Q14 shape (promo revenue share): a GLOBAL CASE-ratio — one
# output row, two exact integer sums, one division.
_Q14_SQL = """
SELECT CAST(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END)
                         AS DOUBLE)
            / CAST(sum(rev_e4) AS DOUBLE) AS DOUBLE) AS promo_share_pct,
       CAST(count(*) AS BIGINT) AS n_items
FROM (SELECT p_type,
             CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)
                 AS rev_e4
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        AND l_shipdate <  TIMESTAMP '1996-10-01') AS priced
"""


@query("b_sql_q14", _Q14_SQL)
def sql_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promo-share query as raw SQL: month-scoped
    lineitem scan (date filter pushed), broadcast part probe, ONE
    global aggregate row — a map-side-combinable full reduction whose
    only float operation is the final percentage division of two
    exact BIGINT sums.  The '100.0 *' multiplier stays outside the
    sums so the grid arithmetic is untouched."""
    register_views(spark, sf_dir)
    return spark.sql(_Q14_SQL)


# TPC-H Q6 shape (forecast revenue change): the pure scan-filter-sum —
# no join at all.  The exhibit is the SIMPLEST plan in the suite and
# exists to pin the baseline: every predicate reaches the parquet
# scan, the sum is one map-side-combinable reduction, and the whole
# query is a single WholeStageCodegen span.
_Q6_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000.0) AS BIGINT))
            / 10000.0 AS DOUBLE) AS revenue_delta,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@query("b_sql_q6", _Q6_SQL)
def sql_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped scan-filter-sum as raw SQL — the no-join
    floor of the suite.  All four predicates push to the parquet scan
    (date + discount + quantity ranges become row-group min/max
    pruning at 100 TB), and the aggregate is one partial-then-final
    reduction with a single row out.  All remaining TPC-H classes are
    covered below as fixture adaptations: Q2/Q9/Q11/Q16/Q20 read
    their supply relation from lineitem's (partkey, suppkey) pairs in
    place of partsupp, and Q12/Q21 replace the missing
    commit/receipt-date lateness with shipping-lag predicates on
    l_shipdate — the PLAN class of each (correlated-min, profit
    rollup, HAVING-scalar-subquery, NOT-IN census, nested IN+HAVING,
    derived-dimension census, double EXISTS/NOT-EXISTS) is intact."""
    register_views(spark, sf_dir)
    return spark.sql(_Q6_SQL)


# TPC-H Q2 shape (minimum-cost supplier): the correlated-MIN pattern.
# The fixture has no partsupp, so the supply relation is DERIVED from
# lineitem — supplier s "offers" part p at the unit price of its
# cheapest shipped line (extendedprice/quantity, snapped to the e4
# grid AFTER the division so the min-equality comparison is exact
# integers on both engines).  The correlated subquery re-derives the
# region-restricted minimum per part — the decorrelation exhibit Q2
# exists for.
_Q2_SQL = """
WITH supply AS (
    SELECT l_partkey AS ps_partkey,
           l_suppkey AS ps_suppkey,
           min(CAST(round(l_extendedprice / l_quantity * 10000.0) AS BIGINT))
               AS ps_cost_e4
    FROM lineitem
    GROUP BY l_partkey, l_suppkey)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       CAST(ps_cost_e4 / 10000.0 AS DOUBLE) AS unit_cost
FROM part
JOIN supply   ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size = 10
  AND p_type = 'STANDARD'
  AND r_name = 'EUROPE'
  AND ps_cost_e4 = (SELECT min(s2.ps_cost_e4)
                    FROM supply s2
                    JOIN supplier sp ON sp.s_suppkey = s2.ps_suppkey
                    JOIN nation n2 ON sp.s_nationkey = n2.n_nationkey
                    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                    WHERE s2.ps_partkey = p_partkey
                      AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@query("b_sql_q2", _Q2_SQL)
def sql_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped minimum-cost-supplier query as raw SQL
    (reference anchor: the analytics surface of BASELINE.json:6; the
    supply relation derives from lineitem, see _Q2_SQL comment).

    Plan: Catalyst decorrelates the scalar-MIN subquery into an
    aggregate over the region-filtered supply CTE joined back on
    partkey — so the 'per-part minimum probe' the SQL spells runs as
    ONE extra aggregation + join keyed on partkey, not a loop.  Both
    uses of the supply CTE group/shuffle on (partkey, suppkey) ⊂
    partkey, so the min-join reuses the partitioning; dims broadcast.
    Ties (several suppliers at the exact grid minimum) are all kept,
    Q2's documented rule, exact because the comparison is BIGINT."""
    register_views(spark, sf_dir)
    return spark.sql(_Q2_SQL)


# TPC-H Q9 shape (product-type profit): profit = revenue − supply
# cost, rolled up by (supplier nation, order year).  Without
# partsupp's ps_supplycost the cost side is the part's retail price
# at half weight — both terms snap to the e4 grid BEFORE the
# subtraction and sum, so the aggregate is pure BIGINT.
_Q9_SQL = """
SELECT nation,
       o_year,
       CAST(sum(amount_e4) / 10000.0 AS DOUBLE) AS sum_profit,
       count(*) AS n_items
FROM (SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)
             - CAST(round(p_retailprice * l_quantity * 0.5 * 10000.0) AS BIGINT)
                 AS amount_e4
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%') AS profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("b_sql_q9", _Q9_SQL)
def sql_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped profit rollup as raw SQL — the classic
    'filter the fact through a broadcast dim by a LIKE on the part
    name' plan.  part/supplier/nation broadcast; lineitem⋈orders is
    the one wide shuffle; the LIKE prunes the fact through the
    broadcast probe BEFORE that shuffle, which is what keeps the plan
    viable when lineitem is 100 TB.  The profit expression subtracts
    two separately-rounded e4 BIGINTs (grid subtraction is exact;
    0.5 is a power of two so the cost multiply is IEEE-exact)."""
    register_views(spark, sf_dir)
    return spark.sql(_Q9_SQL)


# TPC-H Q11 shape (important stock): GROUP BY ... HAVING > scalar
# subquery over the SAME aggregate — the value-concentration report.
# Inventory value per part derives from lineitem (qty × retailprice,
# e4 grid), scoped to one nation's suppliers; the HAVING threshold is
# 'more than 0.1% of the total', expressed as an exact integer
# cross-multiplication (sum*1000 > total) so no float fraction can
# flip a row.  BIGINT headroom: e4 value sums reach ~1e13 at sf0.1,
# ×1000 = 1e16 ≪ 9.2e18.
_Q11_SQL = """
SELECT p_partkey,
       CAST(sum(CAST(round(p_retailprice * l_quantity * 10000.0) AS BIGINT))
            / 10000.0 AS DOUBLE) AS stock_value
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
GROUP BY p_partkey
HAVING sum(CAST(round(p_retailprice * l_quantity * 10000.0) AS BIGINT)) * 1000
       > (SELECT sum(CAST(round(p2.p_retailprice * l2.l_quantity * 10000.0) AS BIGINT))
          FROM lineitem l2
          JOIN part p2     ON p2.p_partkey = l2.l_partkey
          JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
          JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
          WHERE n2.n_name = 'NATION_3')
ORDER BY stock_value DESC, p_partkey
"""


@query("b_sql_q11", _Q11_SQL)
def sql_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped value-concentration query as raw SQL: the
    HAVING-against-scalar-subquery surface.  The uncorrelated total
    folds to a one-row broadcast computed by a second pass over the
    same nation-filtered join (at 100 TB you'd CACHE the filtered
    join or let AQE reuse the exchange — the plan shape permits both
    since the passes share the nation filter and join keys); the
    outer aggregation shuffles once on partkey.  The 0.1% threshold
    is an exact BIGINT cross-multiply — no float fraction."""
    register_views(spark, sf_dir)
    return spark.sql(_Q11_SQL)


# TPC-H Q12 shape (shipping-priority census): fact⋈fact join with a
# conditional two-column census over a DERIVED dimension.  The
# fixture has no l_shipmode, so the mode is the shipping-lag bucket
# (days between order and ship date) — Q12's actual exhibit (CASE
# sums split by order priority over a join) is unchanged.
_Q12_SQL = """
SELECT CASE WHEN l_shipdate >= o_orderdate + INTERVAL 90 DAY THEN 'SLOW'
            WHEN l_shipdate >= o_orderdate + INTERVAL 30 DAY THEN 'MEDIUM'
            ELSE 'FAST' END AS ship_bucket,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                       OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
                      AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY ship_bucket
ORDER BY ship_bucket
"""


@query("b_sql_q12", _Q12_SQL)
def sql_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped lateness census as raw SQL.  One orderkey
    shuffle for the fact⋈fact join, then a 3-group census whose CASE
    sums are map-side combinable — the aggregate carries three rows
    total regardless of scale.  The bucket expression references BOTH
    join sides, so it must (and does) evaluate post-join inside the
    same codegen span; the year filter pushes to the lineitem scan."""
    register_views(spark, sf_dir)
    return spark.sql(_Q12_SQL)


# TPC-H Q16 shape (supplier census by part attributes): NOT IN
# exclusion subquery + COUNT(DISTINCT) per attribute group.  The
# part↔supplier relation derives from lineitem; the excluded-supplier
# set ('complaints' in TPC-H) is the negative-balance suppliers.
_Q16_SQL = """
SELECT p_brand,
       p_type,
       p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 50
"""


@query("b_sql_q16", _Q16_SQL)
def sql_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped supplier census as raw SQL.  The NOT IN
    becomes a null-aware LEFT ANTI join against the tiny
    negative-balance supplier list (broadcast — s_suppkey is NOT NULL
    here so the null-aware single-join stays cheap); part broadcasts
    with brand/type/size pushed to its scan; COUNT(DISTINCT suppkey)
    expands to the standard two-phase distinct aggregate shuffled on
    the attribute group.  LIMIT carries the full ORDER BY key so the
    top-50 is deterministic under count ties."""
    register_views(spark, sf_dir)
    return spark.sql(_Q16_SQL)


# TPC-H Q20 shape (excess-supply candidates): the nested IN(IN,
# GROUP-HAVING) pattern — suppliers who shipped a large share of a
# name-filtered part family in a year.  availqty/supplycost don't
# exist; 'excess' is a per-(supplier, part) shipped-quantity
# threshold on the exact integer grid.
_Q20_SQL = """
SELECT s_name, n_name,
       CAST(round(s_acctbal * 100.0) / 100.0 AS DOUBLE) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_1', 'NATION_4', 'NATION_7')
  AND s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE 'red%' OR p_name LIKE 'blue%')
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 60)
ORDER BY s_name
"""


@query("b_sql_q20", _Q20_SQL)
def sql_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-shaped excess-supply query as raw SQL: IN nested in
    IN with a GROUP-HAVING between them.  Inner part IN-list becomes
    a broadcast semi-join pruning the fact scan; the (suppkey,
    partkey) aggregate shuffles once; the outer IN collapses to a
    semi-join on suppkey against the small survivor set (broadcast).
    The supplier table itself never joins the fact — at 100 TB only
    the year-and-part-filtered lineitem slice does any wide work.
    Quantities are integer-valued (Q17's note) so the >60 threshold
    is exact."""
    register_views(spark, sf_dir)
    return spark.sql(_Q20_SQL)


# TPC-H Q21 shape (waiting-orders supplier ranking): the
# double-correlated EXISTS + NOT EXISTS self-reference on the fact.
# No commit/receipt dates → 'the supplier kept the order waiting'
# becomes 'its line shipped strictly LAST among the ≥2 suppliers of
# a finished order' — same plan class: one positive and one negated
# correlated self-join on orderkey.
_Q21_SQL = """
SELECT s_name,
       count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders      ON o_orderkey = l1.l_orderkey
JOIN nation      ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_name = 'NATION_2'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate >= l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@query("b_sql_q21", _Q21_SQL)
def sql_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped blame-the-last-supplier query as raw SQL —
    the heaviest decorrelation exhibit: Catalyst turns the EXISTS
    into a LEFT SEMI and the NOT EXISTS into a LEFT ANTI self-join,
    BOTH keyed on l_orderkey — the same key as the orders join, so
    the three wide edges share one partitioning end-to-end (AQE
    coalesces them; no orderkey re-shuffle).  The nation filter cuts
    the outer fact through the broadcast supplier dim before any of
    it.  Strict '>= shipdate' in the anti-join means ties for last
    place disqualify both — deterministic without a receipt-time
    tiebreak."""
    register_views(spark, sf_dir)
    return spark.sql(_Q21_SQL)
