"""Registry-wide plan admission (VERDICT r5 item #8): every registered
query's physical plan must pass ``plan_guard.assert_scalable`` under
the default deny-by-default policy — CartesianProduct never admitted,
BroadcastNestedLoopJoin only for the ids allowlisted BELOW with the
mechanism that bounds their broadcast side.  This converts the per-
operator plan discipline (tests/test_plans.py asserts shapes for the
headline queries) into a regression gate the NEXT operator addition
cannot silently break: a new query that plans a cartesian product or
an unbounded nested-loop join fails here before it ever reaches a
cluster.

The allowlist is EXACT both ways: an id here that stops needing its
exemption fails the test too (the list must shrink when plans
improve, or it rots into a blanket waiver)."""

import pytest

from aws_datalake_framework_api_spark.plan_guard import (
    PlanRejected,
    assert_scalable,
    plan_summary,
)
from aws_datalake_framework_api_spark.queries_all import QUERIES

#: id → why its BroadcastNestedLoopJoin is bounded by construction.
#: Mechanisms (each a crossJoin whose broadcast side cannot grow with
#: the fact table):
#:   scalar    — a 1-row (or k-row, k fixed by the query text) global
#:               aggregate joined back for normalization/denominators
#:   scorecard — a recall gate comparing two bounded panel aggregates
#:   spine     — a generated calendar/grid spine, bounded by the date
#:               range / distinct-type count, explicitly broadcast
#:   exhibit   — the operator EXISTS to demonstrate this join class
#:               (cross join; BNLJ range join on a broadcast dim)
_BNLJ_ALLOWED = {
    "b_agg_f2sketch": "scalar — moment partials × 1-row total",
    "b_agg_quantile_cutoffs": "scalar — cutoff row joined to buckets",
    "b_funnel": "scalar — three 1-row stage counts cross-joined",
    "b_graph_triangles": "scalar — 1-row degree/edge/triangle summary",
    "b_join_cross": "exhibit — the deliberate cross-join operator",
    "b_join_range": "exhibit — BNLJ range join, broadcast dim bounded",
    "b_llm_bm25": "scalar — corpus avgdl/N 1-row join",
    "b_llm_bpe_bounds": "scorecard — bounds vs exact token counts",
    "b_llm_contrastive": "scalar — per-anchor panel × 1-row stats",
    "b_llm_dsir": "scalar — 1-row length-normalizer bits join",
    "b_llm_dedup_minhash_recall": "scorecard — approx vs exact pairs",
    "b_llm_dedup_semantic_recall": "scorecard — approx vs exact pairs",
    "b_llm_dedup_simhash64_recall": "scorecard — approx vs exact pairs",
    "b_llm_emb_quant": "scalar — global quantization range 1-row join",
    "b_llm_knn_ivf_recall": "scorecard — approx vs exact neighbors",
    "b_llm_knn_lsh_recall": "scorecard — approx vs exact neighbors",
    "b_llm_knn_pq_recall": "scorecard — approx vs exact neighbors",
    "b_llm_len_buckets": "scalar — corpus length stats 1-row join",
    "b_llm_mix": "scalar — domain totals × target proportions",
    "b_llm_mix_epochs": "scalar — domain totals × epoch weights",
    "b_llm_mix_tokens": "scalar — token totals × target proportions",
    "b_llm_neardup_cosine": "exhibit — audit-only all-pairs ground "
    "truth; b_llm_neardup_lsh is the declared scale path",
    "b_llm_neardup_lsh_recall": "scorecard — approx vs exact pairs",
    "b_llm_sample_weighted": "scalar — total-weight 1-row join",
    "b_llm_shards": "scalar — global count row for shard sizing",
    "b_llm_surprisal": "scalar — corpus token total 1-row join",
    "b_llm_tfidf": "scalar — corpus doc count 1-row join",
    "b_llm_zipf": "scalar — 1-row integer-moment slope fit join",
    "b_quality_checks": "scalar — 1-row × 1-row expectation stats",
    "b_ts_gapfill": "spine — distinct types × broadcast day spine",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_registered_plan_admits(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    if name in _BNLJ_ALLOWED:
        s = assert_scalable(df, allow_nested_loop=True)
        # exactness: the exemption must still be NEEDED — drop the id
        # from the allowlist when its plan stops using BNLJ
        assert s.has_nested_loop, (
            f"{name} no longer plans a BroadcastNestedLoopJoin; remove "
            "it from _BNLJ_ALLOWED so the waiver doesn't rot"
        )
    else:
        try:
            assert_scalable(df)
        except PlanRejected as e:
            pytest.fail(
                f"{name} plans a non-scalable join class and is not "
                f"allowlisted: {str(e).splitlines()[0]}"
            )


def test_allowlist_ids_exist():
    missing = set(_BNLJ_ALLOWED) - set(QUERIES)
    assert not missing, f"allowlist names unregistered ids: {sorted(missing)}"


def test_summary_counts_star_join(spark, sf_dir):
    """Sanity for the census itself on a known shape: the broadcast
    star join reports broadcast joins and no cartesian/BNLJ."""
    s = plan_summary(QUERIES["b_join_star"](spark, sf_dir))
    assert s.n_broadcast_joins >= 1
    assert not s.has_cartesian and not s.has_nested_loop
