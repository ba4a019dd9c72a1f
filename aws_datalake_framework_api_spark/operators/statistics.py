"""Statistical-test queries over the events feed (SURVEY.md §2 Tier B
adjacents): the experiment-analysis surface an analytics engine fronts
— independence testing, A/B comparison, metric correlation.

Determinism design (the hard part of cross-engine statistics): every
AGGREGATE in this module sums exact integers (counts, cent-grid
values, products of cent-grid values) — BIGINT addition is associative
and commutative, so any partial-aggregation order yields the same
bits.  The statistical formulas then run as ONE closed-form double
expression over those integers — a fixed arithmetic-expression tree
with no reassociation freedom, hence bit-identical on Spark and
DuckDB.  Where a statistic itself is a sum of per-cell doubles (χ²),
each cell's contribution is quantized to a 10⁻⁶ grid FIRST and the
grid values are summed as BIGINTs — the statistic is *defined* on the
grid, identically on both engines, rather than approximated by a
float sum whose order could drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..sources.readers import register_views

# ---------------------------------------------------------------- chi-square

# Independence test: is event_type distribution stable across days of
# the month?  (The fixture spans one calendar month, so day-of-month
# gives a real 5×30 contingency where month would collapse to one
# column and dof 0.)  Contingency = type × day observed counts; expected = row·col/N;
# χ² = Σ (obs−exp)²/exp over cells, each contribution quantized to
# 1e-6 before the (integer) sum.  Window sums build the marginals
# without a second scan of the rollup.
_CHI2_SQL = """
WITH cells AS (
    SELECT event_type,
           CAST(EXTRACT(day FROM ts) AS INT) AS dom,
           count(*) AS obs
    FROM events
    GROUP BY event_type, CAST(EXTRACT(day FROM ts) AS INT)
),
marg AS (
    SELECT event_type, dom, obs,
           sum(obs) OVER (PARTITION BY event_type) AS row_tot,
           sum(obs) OVER (PARTITION BY dom)        AS col_tot,
           sum(obs) OVER ()                        AS n
    FROM cells
),
contrib AS (
    SELECT CAST(round(
               (CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(n AS DOUBLE))
             * 1000000.0) AS BIGINT) AS contrib_e6,
           event_type, dom, n
    FROM marg
)
SELECT CAST(sum(contrib_e6) / 1000000.0 AS DOUBLE) AS chi2,
       CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT dom) - 1) AS BIGINT)
           AS dof,
       CAST(max(n) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_cells
FROM contrib
"""


@query("b_stat_chi2", _CHI2_SQL)
def stat_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² independence test of event_type vs day-of-month, as
    dialect-shared SQL.  Scale shape: ONE map-combinable groupBy of
    the fact builds the contingency (≤ types×31 rows); marginals are
    window sums over that tiny rollup; the statistic folds ≤155
    quantized BIGINT cells — everything after the first aggregate is
    driver-trivial regardless of fact size.  See the module note for
    why the χ² sum runs on a 1e-6 integer grid."""
    register_views(spark, sf_dir)
    return spark.sql(_CHI2_SQL)


# ---------------------------------------------------------------- A/B z-test

# Two-sample Welch z on the value metric, variants assigned by the
# standard deterministic unit bucketing (user_id parity — the same
# hash-mod discipline as b_llm_sample: re-runs and replicas agree).
# All moments come from exact integer sums of cent-grid values; the
# z statistic is one closed-form expression over them.
_ABTEST_SQL = """
WITH assigned AS (
    SELECT CAST(user_id % 2 AS INT) AS variant,
           CAST(round(value * 100.0) AS BIGINT) AS cents
    FROM events
),
moments AS (
    SELECT variant,
           count(*) AS n,
           sum(cents) AS s1,
           sum(cents * cents) AS s2
    FROM assigned
    GROUP BY variant
),
wide AS (
    SELECT max(CASE WHEN variant = 0 THEN n END)  AS n_a,
           max(CASE WHEN variant = 1 THEN n END)  AS n_b,
           max(CASE WHEN variant = 0 THEN s1 END) AS s1_a,
           max(CASE WHEN variant = 1 THEN s1 END) AS s1_b,
           max(CASE WHEN variant = 0 THEN s2 END) AS s2_a,
           max(CASE WHEN variant = 1 THEN s2 END) AS s2_b
    FROM moments
)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 AS DOUBLE) AS mean_a,
       CAST(CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0 AS DOUBLE) AS mean_b,
       CAST((CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE)
           - CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE))
          / sqrt(
               (CAST(s2_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                - (CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                  * (CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE))) / CAST(n_a AS DOUBLE)
             + (CAST(s2_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                - (CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                  * (CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE))) / CAST(n_b AS DOUBLE))
          AS DOUBLE) AS z_welch
FROM wide
"""


@query("b_stat_abtest", _ABTEST_SQL)
def stat_abtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B comparison of the value metric between user-parity
    variants: ns, means, and the Welch z statistic in one row.
    Everything reduces to five exact BIGINT sums (one shuffle-free
    partial-agg pass over the fact, two output groups), so the plan
    is a full-scan map + 2-row final agg; z is a single expression
    tree over the moments — deterministic on any engine, any
    partitioning.  cents² products stay < 2⁶³ up to ~10¹² rows at
    this value range; beyond that, move the grid to dollars (same
    statistic definition, coarser quantum)."""
    register_views(spark, sf_dir)
    return spark.sql(_ABTEST_SQL)


# ------------------------------------------------------------- corr matrix

# Pairwise Pearson correlation of the per-day value totals of every
# event-type pair — 'do purchases co-move with clicks day over day?'.
# Day totals ride the cent grid (exact BIGINT); the pair join is a
# self-join of the tiny rollup on day (types×days rows, broadcast by
# construction); Σx Σy Σxy Σx² Σy² are BIGINT sums; r is one closed
# form per pair.  cents/day ≲ 1e9 keeps Σxy < 2⁶³ through ~10⁴ days.
_CORR_SQL = """
WITH daily AS (
    SELECT event_type,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           sum(CAST(round(value * 100.0) AS BIGINT)) AS cents
    FROM events
    GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
),
pairs AS (
    SELECT a.event_type AS type_x,
           b.event_type AS type_y,
           count(*) AS n,
           sum(a.cents) AS sx,
           sum(b.cents) AS sy,
           sum(a.cents * b.cents) AS sxy,
           sum(a.cents * a.cents) AS sxx,
           sum(b.cents * b.cents) AS syy
    FROM daily a
    JOIN daily b ON a.day = b.day AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
)
SELECT type_x,
       type_y,
       CAST(n AS BIGINT) AS n_days,
       CAST((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          / sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS DOUBLE) AS pearson_r
FROM pairs
"""


@query("b_stat_corr", _CORR_SQL)
def stat_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day Pearson correlation matrix (upper triangle) of
    event-type value totals.  The only fact-sized work is the daily
    rollup (one map-combinable groupBy); the type-pair self-join runs
    on rollup-sized data keyed by day, and every cross-engine-fragile
    quantity is an exact integer until the final one-expression r per
    pair.  The a.event_type < b.event_type join predicate emits each
    unordered pair once with a deterministic orientation."""
    register_views(spark, sf_dir)
    return spark.sql(_CORR_SQL)
