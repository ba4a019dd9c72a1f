"""Physical-plan admission control — the analytics-side analogue of
the reference control plane's request validation (source-system
`lambda_function.py:132-162` rejects malformed CRUD requests before
they touch storage; this module rejects non-scalable PLANS before
they touch the cluster).

A 100 TB deployment dies to a handful of plan classes: cartesian
products, nested-loop joins against fact-sized inputs, and
shuffle-explosion from missing broadcast opportunities.  Production
engines gate these at submission (e.g. `spark.sql.crossJoin.enabled`
is exactly this idea for one plan class); ``assert_scalable`` is the
engine-side gatekeeper a platform team wires in front of ad-hoc user
SQL, and ``plan_summary`` the observability hook behind it.

Used by the test suite the same way tests/test_plans.py asserts plan
shape — but packaged as a LIBRARY feature so a reference user gets
the guard, not just our tests.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


class PlanRejected(Exception):
    """Raised when a plan contains a class of operator that does not
    survive cluster scale; carries the offending plan fragment."""


@dataclass(frozen=True)
class PlanSummary:
    """Counts of the scale-deciding physical operators in a plan."""

    n_exchanges: int
    n_broadcast_joins: int
    n_sortmerge_joins: int
    n_shuffled_hash_joins: int
    has_cartesian: bool
    has_nested_loop: bool
    n_python_evals: int
    text: str


def _formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


#: Formatted explain prints every node TWICE (once in the tree, once
#: as a "(N) NodeName" detail header), so naive substring counts are
#: doubled — and "Exchange" as a substring also matches
#: BroadcastExchange / ReusedExchange, which are NOT shuffles.  The
#: census therefore counts detail headers only and tallies by EXACT
#: first-token node name, so a shuffle-free broadcast star join
#: really reports n_exchanges=0.
_NODE_HEADER = re.compile(r"^\((\d+)\) (\w+)", re.MULTILINE)


def _node_names(plan_text: str) -> list[str]:
    """Exact physical-node names from the formatted plan's detail
    headers (one per node, subqueries included)."""
    return [m.group(2) for m in _NODE_HEADER.finditer(plan_text)]


def plan_summary(df: DataFrame) -> PlanSummary:
    """One-line structural census of ``df``'s physical plan."""
    p = _formatted_plan(df)
    names = _node_names(p)
    return PlanSummary(
        # "Exchange" alone is the shuffle node; BroadcastExchange and
        # ReusedExchange deliberately do NOT count toward the budget.
        n_exchanges=names.count("Exchange"),
        n_broadcast_joins=names.count("BroadcastHashJoin"),
        n_sortmerge_joins=names.count("SortMergeJoin"),
        n_shuffled_hash_joins=names.count("ShuffledHashJoin"),
        has_cartesian="CartesianProduct" in names,
        has_nested_loop="BroadcastNestedLoopJoin" in names,
        n_python_evals=names.count("BatchEvalPython"),
        text=p,
    )


def assert_scalable(
    df: DataFrame,
    *,
    allow_nested_loop: bool = False,
    allow_python_udf: bool = True,
    max_exchanges: int | None = None,
) -> PlanSummary:
    """Admit ``df``'s plan or raise :class:`PlanRejected`.

    Policy (deny-by-default on the two always-fatal classes):

    - ``CartesianProduct`` is never admitted — |A|×|B| row fan-out
      has no redeeming scale story outside deliberately tiny inputs,
      and those should broadcast (becoming a BroadcastNestedLoopJoin,
      which IS admissible when ``allow_nested_loop=True`` — the
      legitimate plan for small-side non-equi joins like
      `b_join_range`).
    - ``BroadcastNestedLoopJoin`` is opt-in: legitimate for bounded
      broadcast sides, fatal when the optimizer fell back to it
      because a join had no usable equi-key.
    - ``BatchEvalPython`` (row-at-a-time Python UDF) is admitted by
      default but deniable for hot-path enforcement
      (``allow_python_udf=False``) — Arrow/pandas stages
      (ArrowEvalPython / MapInPandas) are always admitted.
    - ``max_exchanges`` caps shuffle rounds for pipelines with a
      known shuffle budget (e.g. a bucketed-join pipeline that must
      stay exchange-free passes 0).

    Returns the :class:`PlanSummary` so callers can log it."""
    s = plan_summary(df)
    if s.has_cartesian:
        raise PlanRejected(
            "plan contains CartesianProduct (unbounded |A|x|B| fan-out); "
            "broadcast the small side or add an equi-key\n" + s.text
        )
    if s.has_nested_loop and not allow_nested_loop:
        raise PlanRejected(
            "plan contains BroadcastNestedLoopJoin; pass "
            "allow_nested_loop=True only if the broadcast side is "
            "bounded by construction\n" + s.text
        )
    if not allow_python_udf and s.n_python_evals:
        raise PlanRejected(
            f"plan contains {s.n_python_evals} row-at-a-time Python "
            "eval stage(s); use pandas_udf/mapInPandas on hot paths\n" + s.text
        )
    if max_exchanges is not None and s.n_exchanges > max_exchanges:
        raise PlanRejected(
            f"plan has {s.n_exchanges} exchanges > budget {max_exchanges}\n"
            + s.text
        )
    return s
