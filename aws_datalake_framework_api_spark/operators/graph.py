"""Graph analytics over the lake's relational graph (SURVEY.md §2
Tier B adjacents).  Connected components already ship in the dedup
family (`b_llm_dedup_clusters` — min-id label propagation); this
module adds the other canonical iterative-graph representative:
PageRank, expressed as repeated DataFrame joins.

Iterative algorithms are where TWO Spark pitfalls live, and the
implementation demonstrates the fix for both:

1. **Lineage blowup** — each iteration's plan contains the whole
   history; ten iterations of join→groupBy make a plan Catalyst
   re-optimizes in exponential time.  Fix: ``localCheckpoint`` every
   few iterations truncates lineage (cluster code uses reliable
   ``checkpoint`` so executors can be lost).
2. **Float drift** — rank updates sum doubles whose partial-agg
   order varies run to run, so two clusters disagree in the last
   ulp and tie-breaks flip.  Fix: ranks live on an INTEGER grid
   (1e9-scaled BIGINTs) and every update is integer arithmetic
   (floor divisions) — bit-identical on any partitioning, any retry,
   and exactly reproducible by the numpy twin in
   tests/test_graph.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table

#: Fixed-point scale and damping (integer percent so updates stay
#: in BIGINT arithmetic end-to-end).
_SCALE = 1_000_000_000
_DAMP_PCT = 85
_ITERS = 10


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected bipartite trade graph: customer c bought from
    supplier s (distinct pairs via orders⋈lineitem).  Nodes are
    namespaced ('c:'/'s:') so the two key spaces can't collide."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("cust"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("supp"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
    rev = pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    return fwd.unionByName(rev)


@query("b_graph_pagerank")  # rows-only: iterative fixpoint — not
# SQL-expressible in one statement; exact integer twin pinned in
# tests/test_graph.py (numpy power iteration, bit-equal ranks)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer⇄supplier trade graph, 10 fixed
    iterations on the 1e9 integer grid (see module notes), returning
    the top-20 nodes by rank with full-key tiebreak.

    Scale shape per iteration: ONE join of edges against the rank
    vector on src + ONE groupBy dst — both shuffle on node keys, and
    because edges are pre-partitioned (and cached) on src, the join
    side of every iteration reuses the same partitioning; the rank
    vector (|V| rows) is the only thing that moves.  GraphFrames/
    Pregel does exactly this under the hood.  Output is 20 rows;
    ranks are exact BIGINTs so the top-k is stable."""
    edges = _edges(spark, sf_dir).repartition("src").cache()
    degs = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = degs.select(F.col("src").alias("node"))
    base = _SCALE  # every node starts at 1.0 on the grid

    ranks = nodes.select("node", F.lit(base).cast("long").alias("rank"))
    for it in range(_ITERS):
        contribs = (
            edges.join(degs, "src")
            .join(ranks, edges.src == ranks.node)
            .select("dst", F.expr("rank div outdeg").alias("c"))
        )
        gathered = contribs.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = nodes.join(
            gathered, nodes.node == gathered.dst, "left"
        ).select(
            "node",
            (
                F.lit(base * (100 - _DAMP_PCT) // 100)
                + F.expr(f"(coalesce(s, 0L) * {_DAMP_PCT}) div 100")
            ).cast("long").alias("rank"),
        )
        if (it + 1) % 3 == 0:
            # truncate lineage: 10 chained join plans otherwise
            # become a Catalyst re-optimization bomb
            ranks = ranks.localCheckpoint(eager=True)

    return (
        ranks.select(
            F.substring("node", 1, 1).alias("node_type"),
            "node",
            F.col("rank").alias("rank_e9"),
        )
        .orderBy(F.desc("rank_e9"), "node")
        .limit(20)
    )
