"""Exact integer twin for the PageRank exhibit: numpy power iteration
with the SAME fixed-point arithmetic (1e9 grid, integer floor
divisions, damping 85/100) must reproduce Spark's ranks BIT-EXACTLY —
the determinism claim of operators/graph.py made falsifiable."""

import numpy as np

from aws_datalake_framework_api_spark.operators.graph import (
    _DAMP_PCT,
    _ITERS,
    _SCALE,
    _edges,
    graph_pagerank,
)


def _numpy_pagerank(edge_list):
    nodes = sorted({s for s, _ in edge_list} | {d for _, d in edge_list})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n, dtype=np.int64)
    for s, _ in edge_list:
        outdeg[idx[s]] += 1
    rank = np.full(n, _SCALE, dtype=np.int64)
    base_term = _SCALE * (100 - _DAMP_PCT) // 100
    for _ in range(_ITERS):
        gathered = np.zeros(n, dtype=np.int64)
        contrib = rank // outdeg  # every node has outdeg >= 1 (undirected)
        for s, d in edge_list:
            gathered[idx[d]] += contrib[idx[s]]
        rank = base_term + (gathered * _DAMP_PCT) // 100
    return {nodes[i]: int(rank[i]) for i in range(n)}


def test_pagerank_matches_numpy_twin_bit_exactly(spark, sf_dir):
    edge_list = [
        (r["src"], r["dst"]) for r in _edges(spark, sf_dir).collect()
    ]
    expect = _numpy_pagerank(edge_list)
    got = graph_pagerank(spark, sf_dir).collect()
    assert len(got) == 20
    for row in got:
        assert expect[row["node"]] == row["rank_e9"], row
    # and the top-20 really is the top-20 of the full vector
    top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["node"], r["rank_e9"]) for r in got] == [
        (n, r) for n, r in top
    ]


def test_pagerank_mass_is_conserved_to_grid(spark, sf_dir):
    """Total rank stays within floor-loss of n×SCALE: each node loses
    <1 grid unit per floor div, bounding |Σrank − n·SCALE| by
    iterations × (edges + nodes) grid units — a sanity rail that the
    damping arithmetic is PageRank, not something else."""
    edge_list = [
        (r["src"], r["dst"]) for r in _edges(spark, sf_dir).collect()
    ]
    expect = _numpy_pagerank(edge_list)
    n = len(expect)
    total = sum(expect.values())
    slack = _ITERS * (len(edge_list) + n) + n
    assert abs(total - n * _SCALE) <= slack
