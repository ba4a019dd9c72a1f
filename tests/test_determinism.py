"""Partitioning-invariance: the repo's determinism claims say results
are identical under ANY partitioning (cent grids, integer folds,
full-key tiebreaks, hash-mod sampling).  This test makes that
falsifiable: run order-sensitive queries under shuffle.partitions=7
and =32 and demand row-identical output — a float sum, an unstable
top-k, or a partition-dependent sample would diverge."""

import pytest

from aws_datalake_framework_api_spark.queries_all import QUERIES

#: Queries whose naive implementations are partitioning-SENSITIVE:
#: money sums (partial-agg order), top-k under ties, exact-count
#: stratified sampling, iterative integer PageRank, window folds.
PROBES = [
    "b_join_star",
    "b_agg_q1",
    "b_topk",
    "b_llm_sample_exact",
    "b_graph_pagerank",
    "b_ts_ewma",
    "b_stat_chi2",
]


def _rows(spark, qid, sf_dir):
    df = QUERIES[qid](spark, sf_dir)
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


@pytest.mark.parametrize("qid", PROBES)
def test_result_is_partitioning_invariant(spark, sf_dir, qid):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        seven = _rows(spark, qid, sf_dir)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        thirty_two = _rows(spark, qid, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert seven == thirty_two and len(seven) > 0
