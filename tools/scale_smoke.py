"""10× scale smoke (VERDICT r3 item #8): run the scale-critical LLM
paths end-to-end at sf0.1 and at the generated 10× fixture, and record
measured wall-time scaling.

The claim under test: the plan shapes argued linear in SURVEY §2
(MinHash banding with bounded bucket fan-out, IVF map-only assignment,
two-level stratified top-K, no-global-sort shuffle) actually scale
~linearly in corpus size, converting "the plan looks right at sf0.1"
into measured evidence.  Run on a quiet box; cross-run noise on this
host is documented at ±25% (BASELINE.md), so judge ratios accordingly.

Usage: python tools/scale_smoke.py [sf1_dir]   (default tmp_scale/sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = [
    # the four scale-critical shapes: LSH-banded dedup, IVF ANN,
    # exact-count stratified sampling, global-sort-free epoch shuffle
    "b_llm_dedup_minhash",
    "b_llm_knn_ivf",
    "b_llm_sample_exact",
    "b_llm_shuffle",
    # round-4 additions: cell-bounded semantic dedup (replicated
    # embeddings make every vector a 10-way exact dup — a worst-case
    # in-cell pair load), iterative BPE training on a 10× vocab, and
    # the zero-shuffle PCA fit+projection
    "b_llm_dedup_semantic",
    "b_llm_bpe_train",
    "b_llm_pca",
    # char-level winnowing fingerprints (HOF md5 k-grams — the heaviest
    # map arithmetic in the repo) — documents only, so it scales with
    # the replicated fixture like the dedup family
    "b_llm_dedup_winnow",
    # Misra-Gries heavy hitters: the claim is that the shuffle is
    # bounded by k (candidates), not |vocab| — at 10× the word stream
    # the candidate recount should scale with the scan, not the vocab
    "b_agg_heavyhitters",
    # round-4 session additions over the replicated fact tables:
    # rolling-DAU's claim is distinct-once + ×7 rollup fan-out (never
    # a 7-way raw self-join); corr's is that the pair join runs on
    # rollup-sized data; Q18's is one orderkey partitioning end-to-end
    # through semi-join + 3-way join + rollup; EWMA's is one user_id
    # window shuffle.
    "b_ts_rolling_dau",
    "b_stat_corr",
    "b_sql_q18",
    "b_ts_ewma",
    # session-3 additions: the PPJoin prefix filter vs the naive exact
    # join it replaces (the head-to-head IS the exhibit: both are
    # exact, prefix should scale better), the one-broadcast BM25 scan,
    # degree-ordered triangles, and the term-keyed index build
    "b_llm_dedup_ngram",
    "b_llm_dedup_prefix",
    "b_llm_bm25",
    "b_graph_triangles",
    "b_llm_inverted",
    # r9: DSIR importance resampling — the claim is ONE corpus
    # explode+shuffle shared by all four consumers (ReusedExchange,
    # tests/test_plans.py), so wall should ride the single tokenize
    # pass ~linearly
    "b_llm_dsir",
]


def run(spark, sf_dir: str) -> dict[str, tuple[float, int]]:
    from aws_datalake_framework_api_spark.queries_all import QUERIES

    out = {}
    for qid in SMOKE:
        t0 = time.time()
        n = QUERIES[qid](spark, sf_dir).count()
        out[qid] = (round(time.time() - t0, 2), n)
        print(f"  {sf_dir}: {qid} = {out[qid][0]} s ({n} rows)")
    return out


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "tmp_scale/sf1"
    from aws_datalake_framework_api_spark.session import get_spark

    spark = get_spark("scale-smoke")
    # warm: run the sf0.1 set once so JIT/codegen warmup doesn't load
    # the small-scale numbers (BASELINE.md measurement note)
    run(spark, "/root/testdata/sf0.1")
    small = run(spark, "/root/testdata/sf0.1")
    big = run(spark, sf1)
    print(json.dumps({
        "sf0.1": {k: v[0] for k, v in small.items()},
        "sf1": {k: v[0] for k, v in big.items()},
        "ratio_at_10x_data": {
            k: round(big[k][0] / small[k][0], 1) for k in small
        },
        "rows": {k: {"sf0.1": small[k][1], "sf1": big[k][1]} for k in small},
    }))


if __name__ == "__main__":
    main()
