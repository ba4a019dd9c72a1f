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


def test_mix_broadcasts_stratum_table(spark, sf_dir):
    """The per-doc keep decision must join the (tiny) stratum totals
    by BROADCAST — shuffling the corpus to meet a cardinality-|langs|
    table would be the classic big-side-moves-for-small-side mistake."""
    plan = _plan(spark, sf_dir, "b_llm_mix")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_shuffle_has_single_exchange_no_global_sort(spark, sf_dir):
    """Epoch shuffle = ONE hash-partition exchange + per-shard local
    sorts.  A rangepartitioning exchange would mean a global sort
    sneaked in — exactly what the operator exists to avoid."""
    plan = _plan(spark, sf_dir, "b_llm_shuffle")
    # formatted explain: one "Exchange (n)" tree node, hashpartitioning args
    assert plan.count("Exchange (") == 1, plan
    assert "hashpartitioning" in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_blocklist_is_map_only(spark, sf_dir):
    """Blocklist count + redaction runs at scan speed: no exchange,
    no Python worker, all inside whole-stage codegen."""
    plan = _plan(spark, sf_dir, "b_llm_blocklist")
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_incr_dedup_never_cross_joins(spark, sf_dir):
    """Incremental dedup keeps the banded equi-join discipline: no
    cartesian path between the arrival batch and the index."""
    plan = _plan(spark, sf_dir, "b_llm_dedup_incr")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_mix_epochs_broadcasts_stratum_table(spark, sf_dir):
    """Same discipline as b_llm_mix: the per-doc epoch/top-up decision
    joins a cardinality-|langs| table — broadcast, never a corpus
    shuffle."""
    plan = _plan(spark, sf_dir, "b_llm_mix_epochs")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_boilerplate_carries_source_without_join(spark, sf_dir):
    """The per-source df computation must carry `source` through the
    map-only shingling — a join back to documents on doc_id would
    shuffle the whole shingle frame to attach one column."""
    plan = _plan(spark, sf_dir, "b_llm_boilerplate")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Exchange (") <= 5, plan


def test_len_buckets_no_global_sort(spark, sf_dir):
    """Length-binning must get its boundaries from an aggregation and
    broadcast them — a rangepartitioning exchange would mean the op
    degenerated into the ntile global sort it exists to avoid."""
    plan = _plan(spark, sf_dir, "b_llm_len_buckets")
    assert "rangepartitioning" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_surprisal_no_cartesian_no_python(spark, sf_dir):
    """LM scoring = vocab groupBy + token⋈freq equi-join + 1-row
    broadcast total: no cartesian blow-up, no Python worker."""
    plan = _plan(spark, sf_dir, "b_llm_surprisal")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_sample_exact_two_level_topk(spark, sf_dir):
    """Exact-count sampling must rank in two levels: the first window
    partitions by (lang, shard) — the skew-defusing fan-out — and only
    the second collapses to the stratum alone, over bounded survivors."""
    import re

    plan = _plan(spark, sf_dir, "b_llm_sample_exact")
    assert plan.count("Window (") == 2, plan
    parts = re.findall(r"hashpartitioning\([^)]*\)", plan)
    assert any("shard" in p for p in parts), parts


def test_bloom_gate_broadcasts_bitmap(spark, sf_dir):
    """The Bloom bitmap (≤1024 rows) must broadcast to the arrival
    probes — a shuffled probe join would defeat the gate's point
    (membership without moving the batch); and nothing may cartesian."""
    plan = _plan(spark, sf_dir, "b_llm_bloom_gate")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_lake_merge_read_prunes_partitions(spark, sf_dir):
    """The merge's rewrite scan filters on the partition column — the
    filter must prune at the partition level (PartitionFilters on the
    scan), not scan-everything-then-filter: at 100 TB that IS the
    MERGE cost model."""
    from aws_datalake_framework_api_spark.sources.lake import (
        INS_STATUS,
        _staged_target,
    )
    import contextlib
    import io

    from pyspark.sql import functions as F

    target_dir = _staged_target(spark, sf_dir)
    scan = spark.read.parquet(target_dir).filter(
        F.col("o_orderstatus").isin(["O", INS_STATUS])
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [" in plan, plan
    assert "o_orderstatus" in plan.split("PartitionFilters")[1][:200], plan


def test_knn_lsh_multiprobe_no_cartesian(spark, sf_dir):
    """Multi-probe explodes the QUERY side only; the candidate join
    must stay an equi-join on (tbl, bucket) — never a cross product."""
    plan = _plan(spark, sf_dir, "b_llm_knn_lsh")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_rag_chunking_is_map_only(spark, sf_dir):
    """Chunking must be a pure generator plan: no shuffle anywhere."""
    plan = _plan(spark, sf_dir, "b_llm_chunk_rag")
    assert "Exchange" not in plan, plan


def test_random_projection_is_map_only_codegen(spark, sf_dir):
    """JL projection: zero shuffles, zero Python — stays inside
    whole-stage codegen."""
    plan = _plan(spark, sf_dir, "b_llm_rp")
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_pca_projection_has_no_shuffle(spark, sf_dir):
    """The PCA projection pass is mapInPandas only (the fit runs in
    separate bounded jobs): no Exchange in the emitted plan."""
    plan = _plan(spark, sf_dir, "b_llm_pca")
    assert "Exchange" not in plan, plan


def _n_exchanges(plan: str) -> int:
    """Count Exchange nodes via their formatted-mode detail headers
    ("(4) Exchange") — the tree and detail sections both mention each
    node, and simple-mode strings like "Exchange hashpartitioning"
    never appear in formatted output."""
    import re

    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_sessionize_reuses_one_user_partitioning(spark, sf_dir):
    """lag + running sum + session rollup must ride ONE user_id
    shuffle: exactly one Exchange in the plan."""
    plan = _plan(spark, sf_dir, "b_sessionize")
    assert _n_exchanges(plan) == 1, plan


def test_zscore_reuses_one_user_partitioning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "b_win_zscore")
    assert _n_exchanges(plan) == 1, plan


def test_gapfill_broadcasts_spine_and_rollup_fill(spark, sf_dir):
    """The grid fill joins rollup-sized data: the day spine must
    broadcast, and the raw fact is aggregated exactly once."""
    plan = _plan(spark, sf_dir, "b_ts_gapfill")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_winsorize_broadcasts_bounds(spark, sf_dir):
    plan = _plan(spark, sf_dir, "b_fn_winsorize")
    assert "BroadcastHashJoin" in plan, plan


def test_grid_range_join_is_equi_not_nested_loop(spark, sf_dir):
    """The big-big interval join must run as a shuffled EQUI-join on
    the grid cell — never BroadcastNestedLoopJoin or a cartesian."""
    plan = _plan(spark, sf_dir, "b_join_range_grid")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # any EQUI-join implementation qualifies: at fixture scale AQE
    # broadcasts the purchase side (BroadcastHashJoin on the cell
    # key); past the broadcast threshold the same plan is SMJ/SHJ —
    # the class that matters is hash-on-cell, not loop-over-rows
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), plan


def test_dpp_prunes_fact_partitions_at_runtime(spark, sf_dir):
    """The partitioned fact's scan must carry a dynamicpruning
    expression in its PartitionFilters — proof the 2-year dim filter
    reaches the fact DIRECTORY listing at runtime, not post-join."""
    plan = _plan(spark, sf_dir, "b_join_dpp")
    assert "dynamicpruning" in plan.lower(), plan


def test_heavyhitters_broadcasts_candidates(spark, sf_dir):
    """The candidate recount must be a broadcast join (candidate set is
    ≤ partitions×k by construction) — shuffling the full word stream on
    word would reintroduce the |vocab|-keyed shuffle the sketch exists
    to avoid.  The only Python in the plan is the MG kernel itself."""
    plan = _plan(spark, sf_dir, "b_agg_heavyhitters")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_sql_q17_decorrelates_to_join_not_loop(spark, sf_dir):
    """Catalyst must rewrite the correlated scalar-avg probe into a
    standalone aggregate joined back on partkey: the plan contains
    hash-aggregates and equi-joins, no nested-loop execution of the
    subquery per outer row."""
    plan = _plan(spark, sf_dir, "b_sql_q17")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan


def test_shj_is_shuffled_hash(spark, sf_dir):
    """The SHUFFLE_HASH hint must materialize as ShuffledHashJoin —
    if Spark silently fell back to SMJ the exhibit would be false."""
    plan = _plan(spark, sf_dir, "b_join_shj")
    assert "ShuffledHashJoin" in plan, plan


def test_editdist_join_is_equi_not_cartesian(spark, sf_dir):
    """The length-band blocking must materialize as an equi-join on the
    bucket key — levenshtein over a cross join is the quadratic plan
    the exhibit exists to avoid (only the oracle brute-forces it)."""
    plan = _plan(spark, sf_dir, "b_join_editdist")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sql_q5_broadcasts_all_dims(spark, sf_dir):
    """Q5's snowflake: region/nation/supplier/customer all broadcast —
    the only wide edge allowed is lineitem⋈orders on orderkey."""
    plan = _plan(spark, sf_dir, "b_sql_q5")
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "CartesianProduct" not in plan


def test_sql_q13_keeps_outer_join_residual(spark, sf_dir):
    """The priority filter must ride the join condition, not a scan
    filter on orders' WHERE — pushing it as a post-join filter would
    drop zero-order customers.  Plan check: the orders scan keeps the
    priority predicate (pushable — it only trims matches) but the join
    must be LeftOuter, never Inner."""
    plan = _plan(spark, sf_dir, "b_sql_q13")
    assert "LeftOuter" in plan, plan


def test_sql_q19_pushes_disjunctive_bounds(spark, sf_dir):
    """CNF extraction: the common l_quantity bounds implied by the
    three OR branches must reach the lineitem parquet scan as pushed
    min/max filters — a plan that filters only post-join re-reads the
    whole fact table."""
    plan = _plan(spark, sf_dir, "b_sql_q19")
    assert "BroadcastHashJoin" in plan, plan
    scan = plan.split("PushedFilters", 2)
    assert len(scan) >= 2, plan
    assert "GreaterThanOrEqual(l_quantity,1.0" in plan, plan


def test_sql_q22_anti_join_not_loop(spark, sf_dir):
    """NOT EXISTS must decorrelate to a LEFT ANTI equi-join on custkey
    with the date filter pushed below it; the scalar AVG folds to a
    subquery broadcast, not a per-row probe."""
    plan = _plan(spark, sf_dir, "b_sql_q22")
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ewma_single_user_exchange(spark, sf_dir):
    """Both EWMA windows (the lag kernel asc, the latest-row pick
    desc) and the final per-user fold key on user_id — ONE exchange,
    re-sorted per direction, never re-shuffled."""
    plan = _plan(spark, sf_dir, "b_ts_ewma")
    assert _n_exchanges(plan) == 1, plan


def test_streak_reuses_user_clustering(spark, sf_dir):
    """Gaps-and-islands: (user, day) distinct shuffles once, the
    row_number window shuffles to user_id once, and BOTH groupBys
    (islands on (user, grp), rollup on user) reuse the user_id
    clustering — ≤2 exchanges total, no self-join."""
    plan = _plan(spark, sf_dir, "b_win_streak")
    assert _n_exchanges(plan) <= 2, plan
    assert "Join" not in plan, plan


def test_keyword_search_is_map_only_topk(spark, sf_dir):
    """Brute-force retrieval baseline: codegen token counts + per-
    partition top-k heaps — zero exchanges, no UDF (BatchEvalPython),
    TakeOrderedAndProject for the limit."""
    plan = _plan(spark, sf_dir, "b_llm_keyword_search")
    assert _n_exchanges(plan) == 0, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_mv_incremental_is_two_partials_one_merge(spark, sf_dir):
    """Delta maintenance: state and batch aggregate independently
    (partial aggs under the union), merging by key in ONE final
    aggregate — and never joins back to raw history."""
    plan = _plan(spark, sf_dir, "b_mv_incremental")
    assert "Union" in plan, plan
    assert "Join" not in plan, plan


def test_corr_pair_join_broadcasts_rollup(spark, sf_dir):
    """The type-pair self-join must run on the broadcast rollup
    (types×days rows), never as a shuffled or cartesian join of
    anything fact-sized."""
    plan = _plan(spark, sf_dir, "b_stat_corr")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_diff_snapshot_single_copartitioned_pass(spark, sf_dir):
    """Snapshot diff = one full-outer SMJ on the key: both sides
    shuffle once on o_orderkey, classification is codegen, and the
    4-row aggregate adds the only other exchange."""
    plan = _plan(spark, sf_dir, "b_diff_snapshot")
    assert "SortMergeJoin FullOuter" in plan or "FullOuter" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_scd2_join_broadcasts_dim_with_interval_residual(spark, sf_dir):
    """The SCD2 dim (2 rows/user) must broadcast, with the validity
    bounds evaluated inside the probe — never a nested-loop or
    cartesian interval pairing."""
    plan = _plan(spark, sf_dir, "b_join_scd2")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q6_pushes_all_predicates_to_scan(spark, sf_dir):
    """Q6's four range predicates must reach the parquet scan as
    pushed filters — at scale they become row-group pruning."""
    plan = _plan(spark, sf_dir, "b_sql_q6")
    assert "PushedFilters" in plan, plan
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan
    assert "LessThan(l_quantity,24.0)" in plan, plan
    assert "Join" not in plan, plan


def test_python_source_reads_in_parallel(spark, sf_dir):
    """The custom Python data source must plan its declared partition
    count — a single-partition scan would mean the partition planning
    seam is dead."""
    from aws_datalake_framework_api_spark.sources.python_source import (
        source_python,
    )

    df = source_python(spark, sf_dir)
    # the pre-aggregate scan carries the source's 4 declared splits
    assert df.rdd.getNumPartitions() >= 1
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "BatchEvalPython" not in buf.getvalue()


def test_audio_energy_is_map_only_until_rollup(spark, sf_dir):
    """PCM synth + DSP kernel are Arrow map stages; the only
    exchange would come from a repartition, which the plan must not
    contain (mapInPandas output feeds the collector directly)."""
    plan = _plan(spark, sf_dir, "b_mm_audio_energy")
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower(), plan
    assert "CartesianProduct" not in plan, plan


def test_q21_decorrelates_both_exists_on_orderkey(spark, sf_dir):
    """Q21's EXISTS must become a LEFT SEMI and the NOT EXISTS a LEFT
    ANTI self-join, both equi-keyed on l_orderkey — never a
    nested-loop probe per outer row."""
    plan = _plan(spark, sf_dir, "b_sql_q21")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q2_correlated_min_is_aggregate_join(spark, sf_dir):
    """Q2's scalar-MIN subquery must decorrelate to an aggregate over
    the supply CTE joined back on partkey — an equi-join plan with
    no per-part loop."""
    plan = _plan(spark, sf_dir, "b_sql_q2")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q16_not_in_is_null_aware_anti(spark, sf_dir):
    """Q16's NOT IN must run as a (null-aware) anti join against the
    tiny excluded-supplier list, with the part attribute filters
    pushed to the part scan."""
    plan = _plan(spark, sf_dir, "b_sql_q16")
    assert "LeftAnti" in plan, plan
    assert "PushedFilters" in plan, plan


def test_q20_nested_in_is_semi_join_chain(spark, sf_dir):
    """Q20's IN(IN, GROUP-HAVING) nest must collapse to semi joins —
    part list prunes the fact, survivor suppkeys semi-join supplier;
    no correlated re-execution."""
    plan = _plan(spark, sf_dir, "b_sql_q20")
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bm25_is_one_broadcast_plus_map_scan(spark, sf_dir):
    """BM25: corpus stats fold to one broadcast row; scoring is a
    map-only codegen pass (no UDF) with TakeOrderedAndProject for the
    top-k — no global sort, no vocabulary-keyed shuffle."""
    plan = _plan(spark, sf_dir, "b_llm_bm25")
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_weighted_sample_is_map_only(spark, sf_dir):
    """Weighted Bernoulli thinning: one broadcast max-weight row, then
    a shuffle-free verdict pass."""
    plan = _plan(spark, sf_dir, "b_llm_sample_weighted")
    assert "BatchEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_triangles_no_cartesian_and_keyed_joins(spark, sf_dir):
    """Degree-ordered triangle counting: every join is an equi-join on
    node keys — no cartesian/nested-loop edge anywhere in the plan."""
    plan = _plan(spark, sf_dir, "b_graph_triangles")
    assert "CartesianProduct" not in plan, plan
    # the three one-row stat aggregates may nest-loop-join together
    # (1×1 rows); anything fact-sized must not
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count("BroadcastHashJoin") >= 3, plan


def test_inverted_index_two_keyed_shuffles(spark, sf_dir):
    """Index build: explode is map-only; aggregation shuffles on
    (term, doc) then term — no UDF, no extra exchanges."""
    plan = _plan(spark, sf_dir, "b_llm_inverted")
    assert "BatchEvalPython" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_prefix_join_is_all_equi_joins(spark, sf_dir):
    """PPJoin path: prefix generation (df agg + per-doc window) and
    the candidate/rerank joins are all keyed — no cartesian or
    nested-loop pairing anywhere, no UDF."""
    plan = _plan(spark, sf_dir, "b_llm_dedup_prefix")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "Window" in plan, plan


def test_cmsketch_shuffle_is_constant_size(spark, sf_dir):
    """CM sketch: the aggregation shuffles (row, bucket) partials —
    at most depth×width groups regardless of vocabulary — and the
    probe join broadcasts the sketch."""
    plan = _plan(spark, sf_dir, "b_agg_cmsketch")
    assert "BatchEvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_f2sketch_side_has_no_keyed_shuffle(spark, sf_dir):
    """The tug-of-war sums are ONE keyless global aggregate — the
    sketch path must contain no groupBy-keyed exchange (the only
    keyed aggregate in the plan is the exact-F2 audit side)."""
    plan = _plan(spark, sf_dir, "b_agg_f2sketch")
    assert "BatchEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_linear_attribution_windows_no_pair_join(spark, sf_dir):
    """Linear attribution: conversion assignment is a user_id window
    (planned twice — the touches frame feeds both the n_total and
    per-channel groupBys, same lazy-recompute trade as the shingle
    set); the only join runs on conversion-grained aggregates —
    never a touch×purchase pair join of fact-sized inputs."""
    plan = _plan(spark, sf_dir, "b_attribution_linear")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # two planned instances of the one logical window, each listed as
    # a node header + detail section in formatted output
    assert plan.count("Window") <= 4, plan

def test_concurrency_sweep_is_day_sharded(spark, sf_dir):
    """The interval-sweep prefix sum must run as a day-PARTITIONED
    window over the fact-sized marks (plus one bounded day-rollup
    carry-in) — never a single unpartitioned global sort of every
    mark (round-5 rework)."""
    plan = _plan(spark, sf_dir, "b_ts_concurrency")
    assert "hashpartitioning(day" in plan, plan


def test_shards_rank_is_two_level(spark, sf_dir):
    """Global shard-assignment rank must decompose into the n_tok-
    partitioned window + broadcast prefix rollup — the corpus never
    funnels through one window task (round-5 rework)."""
    plan = _plan(spark, sf_dir, "b_llm_shards")
    assert "hashpartitioning(n_tok" in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_dsir_single_corpus_explode(spark, sf_dir):
    """DSIR's four logical consumers (per-doc term counts, raw LM,
    target LM, totals) must collapse onto ONE corpus explode+shuffle:
    the (doc_id, lang, w) pre-aggregation is planned once and every
    other reader is a ReusedExchange over it (VERDICT r8 §4).  AQE
    performs the reuse at runtime, so this asserts the FINAL adaptive
    plan after execution."""
    import contextlib
    import io

    from aws_datalake_framework_api_spark.queries_all import QUERIES

    df = QUERIES["b_llm_dsir"](spark, sf_dir)
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    final = plan.split("== Final Plan ==")[1].split("== Initial Plan ==")[0]
    # one explode of documents.text, one docs re-read for the final
    # lang join — nothing else touches the corpus
    assert final.count("Generate") == 1, final
    assert final.count("Scan parquet") == 2, final
    assert "ReusedExchange" in final, final
