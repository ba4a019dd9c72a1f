"""Physical-plan shape assertions — the scale story, checked in-plan.

These are the properties that decide whether an operator survives a
100× scale-up: broadcasts where a side is bounded, shuffle exchanges
only where semantics demand one, pushdown reaching the scan.  Loose
thresholds on purpose: AQE may re-plan, but the *class* of plan must
hold.
"""

import contextlib
import io

from aws_datalake_framework_api_spark.queries_all import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Bucket-co-located join + bucket-key agg must be shuffle-free."""
    plan = _plan(spark, sf_dir, "b_join_bucketed")
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_star_join_broadcasts_dims(spark, sf_dir):
    """nation/region (bounded dims) must broadcast, never shuffle."""
    plan = _plan(spark, sf_dir, "b_join_star")
    assert plan.count("BroadcastHashJoin") >= 2


def test_star_join_prunes_and_pushes(spark, sf_dir):
    """Scans read only needed columns; filters reach the parquet scan."""
    plan = _plan(spark, sf_dir, "b_join_star")
    assert "PushedFilters: [IsNotNull" in plan
    # lineitem has 16 columns; the star query needs 3
    assert "l_shipdate" not in plan.split("ReadSchema")[1][:400]


def test_smj_is_sort_merge(spark, sf_dir):
    plan = _plan(spark, sf_dir, "b_join_smj")
    assert "SortMergeJoin" in plan


def test_decontamination_broadcasts_eval_side(spark, sf_dir):
    """The eval/benchmark side must broadcast — a shuffled corpus-vs-
    eval join would pay a full corpus shuffle for a tiny probe set."""
    plan = _plan(spark, sf_dir, "b_llm_decontaminate")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_salted_join_broadcasts_exploded_dim(spark, sf_dir):
    """Salting multiplies only the build side (dim ×8) — it must stay
    small enough to broadcast, or the salt bought nothing."""
    plan = _plan(spark, sf_dir, "b_join_salted")
    assert "BroadcastHashJoin" in plan, plan


def test_fuzzy_dedup_never_cross_joins(spark, sf_dir):
    """MinHash+LSH dedup must reach pairs via equi-joins on band/
    shingle keys — a cartesian anywhere means the 100 TB story is
    dead."""
    plan = _plan(spark, sf_dir, "b_llm_dedup_fuzzy")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_neardup_lsh_never_cross_joins(spark, sf_dir):
    """LSH-bucketed near-dup replaces the n² pair space with a
    (tbl, bucket) equi-join; the all-pairs form is only legal in the
    declared ground-truth query."""
    plan = _plan(spark, sf_dir, "b_llm_neardup_lsh")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
