"""SemDeDup-style semantic deduplication (SURVEY.md §2 B12).

Embedding-space dedup at corpus scale (Abbas et al. 2023, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication"):
k-means clusters bound where near-duplicates can live, the quadratic
pairwise-cosine check runs ONLY within each cluster, and one
representative per duplicate group survives.  This is the operator
that removes *semantically* redundant training data the lexical family
(MinHash/SimHash over shingles) cannot see — paraphrases, re-encodes,
templated rewrites.

Division of labor vs the neighbours in this package:
- ``b_llm_neardup_cosine`` — exact all-pairs, the audit/ground-truth
  tool (quadratic; sample-scale only).
- ``b_llm_neardup_lsh`` — hyperplane-bucketed near-dup PAIRS (the
  index view).
- ``b_llm_dedup_semantic`` (here) — the per-VECTOR keep/drop verdict a
  curation pipeline actually consumes, clustered the way SemDeDup
  prescribes so the compare cost is Σ|cluster|², not n².

Cluster assignments are engine-specific (no DuckDB k-means twin), so
the main query is rows-only at the gate; the companion
``b_llm_dedup_semantic_recall`` scorecard is fully oracle-pinned: the
exact droppable set is recomputed by DuckDB from the all-pairs SQL,
recall/precision flags ride as integers (and precision is exact-100%
by construction — every semantic drop is witnessed by a real
cos ≥ τ pair, so n_false_pos is pinned to 0).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table
from .recall import _scorecard_sql
from .similarity import _NEARDUP_SQL, llm_neardup_cosine

#: Clusters for the SemDeDup partition.  At 100 TB this scales as
#: n/target_cell_size (FAISS-style √n is also common); recall depends
#: only on near-dup pairs CO-CLUSTERING, which high-τ pairs almost
#: always do — they are nearly the same point.
SEM_CELLS = 16
SEM_ITERS = 8
#: Cells each vector is COMPARED in (home + next-nearest): multi-probe
#: assignment, the IVF trick applied to dedup.  A near-dup pair is
#: found iff the two vectors SHARE any cell; at moderate τ a pair can
#: straddle one Voronoi boundary, and probing 2 cells makes the shared
#: cell overwhelmingly likely at 2× compare cost (measured on the
#: fixture: probes=1 misses the boundary pair, probes=2 catches it).
SEM_PROBES = 2
#: Duplicate threshold (cosine).  SemDeDup's τ; 0.50 here matches the
#: fixture’s near-dup band (the `b_llm_neardup_cosine` threshold — the synthetic embeddings are near-uniform, so high-cosine mass is thin).
SEM_TAU = 0.50


def _train_centroids(emb: DataFrame, n_cells: int, n_iters: int) -> np.ndarray:
    """Deterministic spherical k-means on a bounded sample — the same
    recipe as ``b_llm_knn_ivf`` (similarity.py): ≤2048 rows collected
    (constant vs corpus size), first-k init, fixed Lloyd iterations,
    empty cells keep their centroid.  No RNG anywhere ⇒ the model is
    a pure function of the fixture."""
    sample_rows = (
        emb.filter(F.col("vec_id") % 7 == 0)
        .orderBy("vec_id")
        .limit(2048)
        .select("embedding")
        .collect()
    )
    S = np.stack([np.asarray(r[0], dtype=np.float64) for r in sample_rows])
    Sn = S / np.sqrt((S * S).sum(axis=1))[:, None]
    C = Sn[:n_cells].copy()
    for _ in range(n_iters):
        assign = np.argmax(Sn @ C.T, axis=1)
        for c in range(n_cells):
            members = Sn[assign == c]
            if len(members):
                m = members.mean(axis=0)
                C[c] = m / np.linalg.norm(m)
    return C


@query("b_llm_dedup_semantic")  # rows-only: k-means cells have no SQL
# twin; recall/precision are oracle-pinned via b_llm_dedup_semantic_recall
# and tests/test_llm_ops.py gates exact parity of the drop rule per cell.
def llm_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: cluster → within-cluster pairwise cosine → greedy
    keep-lowest-id per duplicate pair.  Emits one row per vector:
    its cell, the keep/drop verdict, and the witnessing duplicate
    (smallest lower id with cos ≥ τ, null when kept) — exactly what a
    curation join consumes downstream (`b_llm_curation` composes the
    lexical twin of this verdict).

    100 TB shape, stage by stage:
    - TRAIN: driver-side on a ≤2048-row deterministic sample — O(1)
      in corpus size (the SemDeDup paper trains on a sample too).
    - ASSIGN + IN-CELL COMPARE: one shuffle on the cell id, then an
      Arrow-batched numpy all-pairs per cell via applyInPandas.  The
      quadratic is bounded by the LARGEST CELL, the knob being
      SEM_CELLS (scale k with n to hold cell size; a skew-split pass
      — re-cluster any cell over a size cap with a finer local
      k-means — composes without changing the contract).
    - No further shuffles: the verdict is emitted from inside the
      cell group.
    Determinism: sample, init, iteration count, and the keep rule are
    all fixed — reruns and repartitions can't flip a verdict (numpy
    reductions are per-row independent here, no cross-row float
    accumulation order)."""
    C = _train_centroids(
        load_table(spark, sf_dir, "embeddings"), SEM_CELLS, SEM_ITERS
    )
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            B = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Bn = B / np.sqrt((B * B).sum(axis=1))[:, None]
            sims = Bn @ C.T
            # top-SEM_PROBES cells per vector, probe 0 = home cell
            order = np.argsort(-sims, axis=1)[:, :SEM_PROBES]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(
                        pdf["vec_id"].to_numpy(dtype=np.int64), SEM_PROBES
                    ),
                    "cell": order.reshape(-1).astype(np.int32),
                    "home": np.tile(
                        np.arange(SEM_PROBES) == 0, n
                    ).astype(np.int32),
                    "embedding": pdf["embedding"].repeat(SEM_PROBES).to_numpy(),
                }
            )

    assigned = emb.mapInPandas(
        assign, "vec_id bigint, cell int, home int, embedding array<float>"
    )

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        Mn = M / np.sqrt((M * M).sum(axis=1))[:, None]
        sims = np.round(Mn @ Mn.T, 8)  # same 1e-8 grid as the exact twin
        dup_with = np.full(len(ids), -1, dtype=np.int64)
        for i in range(1, len(ids)):
            hits = np.where(sims[i, :i] >= SEM_TAU)[0]
            if len(hits):
                dup_with[i] = ids[hits[0]]  # smallest lower id (sorted)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": pdf["cell"].to_numpy(dtype=np.int32),
                "home": pdf["home"].to_numpy(dtype=np.int32),
                "dup_with": dup_with,
            }
        )

    per_cell = assigned.groupBy("cell").applyInPandas(
        dedup_cell, "vec_id bigint, cell int, home int, dup_with bigint"
    )
    # Merge the SEM_PROBES verdicts per vector: dropped if ANY probed
    # cell produced a witness; report the smallest witness id and the
    # home cell.  One small shuffle on vec_id (probe-count× the corpus
    # row count, constant factor).
    merged = per_cell.groupBy("vec_id").agg(
        F.max(F.when(F.col("home") == 1, F.col("cell"))).alias("cell"),
        F.min(F.when(F.col("dup_with") >= 0, F.col("dup_with"))).alias("dup_with"),
    )
    return merged.select(
        "vec_id",
        "cell",
        F.when(F.col("dup_with").isNull(), 1).otherwise(0).alias("keep"),
        "dup_with",
    )


#: Exact droppable set: ids having ANY lower-id partner at cos ≥ τ —
#: shared by the Spark recall frame and the DuckDB oracle.
_SEM_EXACT_SQL = f"""
    WITH nd AS ({_NEARDUP_SQL})
    SELECT DISTINCT id_b AS vec_id FROM nd WHERE cos_sim >= {SEM_TAU}
"""


@query("b_llm_dedup_semantic_recall", _scorecard_sql(_SEM_EXACT_SQL, 90, 100, True))
def llm_dedup_semantic_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scorecard for ``b_llm_dedup_semantic`` vs the exact all-pairs
    droppable set (any lower-id partner at cos ≥ τ): recall floored at
    90% (a true near-dup pair is nearly one point — it co-clusters
    unless it straddles a k-means boundary), precision pinned at 100%
    with ``n_false_pos = 0`` (every semantic drop carries a concrete
    cos ≥ τ witness, which by definition is in the exact set)."""
    from .recall import _recall_frame

    exact = (
        llm_neardup_cosine(spark, sf_dir)
        .filter(F.col("cos_sim") >= SEM_TAU)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    approx = (
        llm_dedup_semantic(spark, sf_dir)
        .filter(F.col("keep") == 0)
        .select("vec_id")
    )
    return _recall_frame(exact, approx, ["vec_id"], 90, 100, True)
