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


# ------------------------------------------------------ triangle counting

#: Minimum co-purchase support for an edge — the df-cap analogue for
#: graphs: below-support pairs are noise and above it the edge list is
#: linear in orders.
TRI_MIN_SUPPORT = 2

_TRI_SQL = f"""
    WITH pe AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS a, b.l_partkey AS b
      FROM pe a JOIN pe b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= {TRI_MIN_SUPPORT}
    ),
    deg AS (
      SELECT v, count(*) AS d
      FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
      GROUP BY v
    ),
    tri AS (
      SELECT count(*) AS n_tri
      FROM e e1
      JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
      JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT sum(d * (d - 1) // 2) FROM deg) AS BIGINT) AS n_wedges,
           CAST((SELECT n_tri FROM tri) AS BIGINT) AS n_triangles,
           CAST(round(3.0 * (SELECT n_tri FROM tri)
                      / (SELECT sum(d * (d - 1) // 2) FROM deg)
                      * 1000000.0) AS BIGINT) AS transitivity_e6
"""


@query("b_graph_triangles", _TRI_SQL)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle census of the co-purchase graph (nodes = parts,
    edges = pairs bought together in ≥{TRI_MIN_SUPPORT} orders):
    node/edge/wedge/triangle counts and the transitivity ratio
    3·T/W — the graph-health profile behind community detection and
    recommendation quality checks.

    Scale shape — DEGREE-ORDERED ORIENTATION (the classic MapReduce
    triangle-counting trick, Suri & Vassilvitskii WWW'11, public):
    each undirected edge is directed from its (degree, id)-smaller to
    its larger endpoint, making the graph acyclic with out-degree
    O(√m) — so the wedge join (out-edges of u × out-edges of u)
    fans out by Σ outdeg² ≈ m^1.5 instead of Σ deg² which a hub
    node makes quadratic.  Each triangle then appears EXACTLY once
    (its unique orientation-minimal vertex), so the count needs no
    division by 3/6.  Joins shuffle on node keys; the oracle counts
    the same triangles from the undirected a<b<c enumeration.

    The transitivity division is the only float op: one div of two
    exact BIGINTs, rounded to e6 units."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, "k")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= TRI_MIN_SUPPORT)
        .select("a", "b")
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    # Orient each edge low→high in the (degree, id) total order.
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("d_a"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("d_b"))
    ed = e.join(da, "a").join(db, "b")
    a_first = (F.col("d_a") < F.col("d_b")) | (
        (F.col("d_a") == F.col("d_b")) & (F.col("a") < F.col("b"))
    )
    oe = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("d_b")).otherwise(F.col("d_a")).alias("dst_d"),
    )
    x = oe.select(
        F.col("src"),
        F.col("dst").alias("v"),
        F.col("dst_d").alias("v_d"),
    )
    y = oe.select(
        F.col("src"),
        F.col("dst").alias("w"),
        F.col("dst_d").alias("w_d"),
    )
    wedges = x.join(y, "src").filter(
        (F.col("v_d") < F.col("w_d"))
        | ((F.col("v_d") == F.col("w_d")) & (F.col("v") < F.col("w")))
    )
    closing = oe.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tri_row = (
        wedges.join(closing, ["v", "w"])
        .agg(F.count("*").alias("n_triangles"))
    )
    edge_row = e.agg(F.count("*").alias("n_edges"))
    deg_row = deg.agg(
        F.count("*").alias("n_nodes"),
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("long")).alias(
            "n_wedges"
        ),
    )
    # Three one-row aggregates fold together broadcast-style — the
    # whole report is ONE declarative plan, nothing collected.
    return (
        deg_row.crossJoin(edge_row)
        .crossJoin(tri_row)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.lit(3.0)
                * F.col("n_triangles")
                / F.col("n_wedges")
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("transitivity_e6"),
        )
    )
