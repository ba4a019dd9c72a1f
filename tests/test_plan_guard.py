"""Admission control for physical plans (plan_guard.py): the guard
must reject the plan classes that die at cluster scale and admit the
ones the engine's own operators rely on."""

import pytest
from pyspark.sql import functions as F

from aws_datalake_framework_api_spark.plan_guard import (
    PlanRejected,
    assert_scalable,
    plan_summary,
)
from aws_datalake_framework_api_spark.queries_all import QUERIES


def test_rejects_cartesian(spark):
    a = spark.range(10_000).select(F.col("id").alias("a"))
    b = spark.range(10_000).select(F.col("id").alias("b"))
    # disable auto-broadcast so the cross join plans as CartesianProduct
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with pytest.raises(PlanRejected, match="CartesianProduct"):
            assert_scalable(a.crossJoin(b))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_nested_loop_opt_in(spark):
    a = spark.range(10_000).select(F.col("id").alias("a"))
    lo = spark.range(5).select(
        (F.col("id") * 1000).alias("lo"), (F.col("id") * 1000 + 999).alias("hi")
    )
    ranged = a.join(
        F.broadcast(lo), (F.col("a") >= F.col("lo")) & (F.col("a") <= F.col("hi"))
    )
    with pytest.raises(PlanRejected, match="BroadcastNestedLoopJoin"):
        assert_scalable(ranged)
    s = assert_scalable(ranged, allow_nested_loop=True)
    assert s.has_nested_loop


def test_python_udf_policy(spark):
    slow = F.udf(lambda x: x + 1, "bigint")
    df = spark.range(100).select(slow("id").alias("y"))
    assert_scalable(df)  # admitted by default
    with pytest.raises(PlanRejected, match="Python"):
        assert_scalable(df, allow_python_udf=False)


def test_exchange_budget(spark, sf_dir):
    df = QUERIES["b_join_bucketed"](spark, sf_dir)
    s = assert_scalable(df, max_exchanges=0)  # bucketed join: shuffle-free
    assert s.n_exchanges == 0
    grouped = spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count()
    with pytest.raises(PlanRejected, match="exchanges"):
        assert_scalable(grouped, max_exchanges=0)


def test_flagship_queries_pass_the_guard(spark, sf_dir):
    """The engine's own scale-critical plans must clear their own
    gate (range/asof use bounded broadcast nested loops — opt-in)."""
    for qid in ("b_join_star", "b_agg_q1", "b_llm_dedup_prefix", "b_sql_q21"):
        assert_scalable(QUERIES[qid](spark, sf_dir), allow_nested_loop=True)
    summary = plan_summary(QUERIES["b_join_star"](spark, sf_dir))
    assert summary.n_broadcast_joins >= 2
