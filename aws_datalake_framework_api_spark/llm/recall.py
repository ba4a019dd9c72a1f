"""Driver-visible recall gates for the approximate operators
(VERDICT r3 item #6).

The approximate family (MinHash/LSH dedup, hyperplane-LSH and IVF ANN,
SimHash banding) is rows-only at the correctness gate by design — the
engine-specific hashes have no DuckDB twin.  Their quality guarantees
lived only in pytest.  These companion queries surface the SAME
invariants as exact-integer rows the driver CAN hash-check:

- the DENOMINATOR (exact ground-truth pair count) is recomputed by the
  oracle from the exact twin's SQL — if the exact pipeline drifts, the
  row goes red;
- ``recall_ok`` / ``precision_ok`` / ``n_false_pos`` are emitted by
  Spark from the measured approx-vs-exact overlap and by the oracle as
  the literal expected value (1 / 1 / 0) — if an approximate pipeline
  regresses below its floor, the hash mismatches and the driver shows
  a red row instead of a green "rows came back".

Floors are the measured sf0.01 values with margin (knn_lsh multi-probe 0.72→50%,
knn_ivf 0.60→50%, neardup_lsh 1.0→50%, minhash 1.0→90%, simhash64
0.60/0.88→50%/60%); every pipeline is deterministic (seeded
hyperplanes, keyed hashes, no runtime RNG), so the gate is stable.

Each companion runs BOTH the exact and approximate pipelines — that is
the point (it is exactly what a production corpus job does on a sample
to monitor its ANN index), and both sides are bounded: the panels cap
the kNN work, MAX_DF caps the exact dedup self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from .dedup import _NGRAM_SQL, llm_dedup_minhash, llm_dedup_ngram, llm_dedup_simhash64
from .similarity import (
    _KNN_SQL,
    _NEARDUP_SQL,
    llm_knn,
    llm_knn_ivf,
    llm_knn_lsh,
    llm_knn_pq,
    llm_neardup_cosine,
    llm_neardup_lsh,
)


def _recall_frame(
    exact: DataFrame,
    approx: DataFrame,
    keys: list[str],
    floor_pct: int,
    with_precision_floor_pct: int | None = None,
    with_false_pos: bool = False,
) -> DataFrame:
    """One-row recall scorecard: n_exact + integer pass/fail flags.

    All comparisons are pure integer arithmetic on exact counts —
    nothing float-ish can drift.  The crossJoins are 1-row × 1-row
    (aggregate results), so the plan is three bounded aggregations."""
    e = exact.select(*keys)
    a = approx.select(*keys)
    hit = e.join(a, keys, "semi")
    stats = (
        e.agg(F.count("*").alias("n_exact"))
        .crossJoin(hit.agg(F.count("*").alias("n_hit")))
        .crossJoin(a.agg(F.count("*").alias("n_approx")))
    )
    cols = [
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.lit(floor_pct).cast("int").alias("recall_floor_pct"),
        (F.col("n_hit") * 100 >= F.col("n_exact") * floor_pct)
        .cast("int")
        .alias("recall_ok"),
    ]
    if with_precision_floor_pct is not None:
        cols += [
            F.lit(with_precision_floor_pct).cast("int").alias("precision_floor_pct"),
            (F.col("n_hit") * 100 >= F.col("n_approx") * with_precision_floor_pct)
            .cast("int")
            .alias("precision_ok"),
        ]
    if with_false_pos:
        cols.append(
            (F.col("n_approx") - F.col("n_hit")).cast("bigint").alias("n_false_pos")
        )
    return stats.select(*cols)


def _scorecard_sql(
    exact_sql: str,
    floor_pct: int,
    precision_floor_pct: int | None = None,
    false_pos: bool = False,
) -> str:
    """Oracle twin: the denominator from the exact twin's own SQL, the
    flags as the literal expected values."""
    cols = [
        "CAST(count(*) AS BIGINT) AS n_exact",
        f"CAST({floor_pct} AS INT) AS recall_floor_pct",
        "CAST(1 AS INT) AS recall_ok",
    ]
    if precision_floor_pct is not None:
        cols += [
            f"CAST({precision_floor_pct} AS INT) AS precision_floor_pct",
            "CAST(1 AS INT) AS precision_ok",
        ]
    if false_pos:
        cols.append("CAST(0 AS BIGINT) AS n_false_pos")
    return f"WITH exact_twin AS ({exact_sql}) SELECT {', '.join(cols)} FROM exact_twin"


@query("b_llm_knn_lsh_recall", _scorecard_sql(_KNN_SQL, 50))
def llm_knn_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of multi-probe hyperplane-LSH ANN (``b_llm_knn_lsh``)
    against the brute-force top-5 (``b_llm_knn``) over the shared
    query panel.  4 tables × 6 bits × 7 probes measures 0.72 at
    sf0.01 (single-probe was 0.18); floored at 50%."""
    return _recall_frame(
        llm_knn(spark, sf_dir), llm_knn_lsh(spark, sf_dir), ["q_id", "n_id"], 50
    )


@query("b_llm_knn_ivf_recall", _scorecard_sql(_KNN_SQL, 50))
def llm_knn_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of IVF ANN (``b_llm_knn_ivf``, 16 cells × 6 probes)
    against brute force — the quantizer adapts to the corpus's cluster
    structure, so its floor (50%) is far above the data-agnostic LSH
    setting at comparable candidate cost."""
    return _recall_frame(
        llm_knn(spark, sf_dir), llm_knn_ivf(spark, sf_dir), ["q_id", "n_id"], 50
    )


@query("b_llm_neardup_lsh_recall", _scorecard_sql(_NEARDUP_SQL, 50, false_pos=True))
def llm_neardup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-dup pairs vs the exact all-pairs ground
    truth: bucketing may cost recall (floored at 50%) but NEVER
    precision — the exact-cosine rerank makes false positives
    structurally impossible, so ``n_false_pos`` is oracle-pinned 0."""
    return _recall_frame(
        llm_neardup_cosine(spark, sf_dir),
        llm_neardup_lsh(spark, sf_dir),
        ["id_a", "id_b"],
        50,
        with_false_pos=True,
    )


@query("b_llm_dedup_minhash_recall", _scorecard_sql(_NGRAM_SQL, 90, false_pos=True))
def llm_dedup_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH banding vs the exact n-gram Jaccard ground truth:
    ≥90% recall at the 16×2 band setting (theory ≈99% at s=0.5), and
    zero false positives — the candidate-restricted exact-Jaccard
    rerank guarantees emitted pairs ⊆ exact pairs."""
    return _recall_frame(
        llm_dedup_ngram(spark, sf_dir),
        llm_dedup_minhash(spark, sf_dir),
        ["doc_a", "doc_b"],
        90,
        with_false_pos=True,
    )


@query("b_llm_dedup_simhash64_recall", _scorecard_sql(_NGRAM_SQL, 50, 60))
def llm_dedup_simhash64_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash64 banded near-dup vs the n-gram ground truth.  SimHash
    approximates cosine on bags-of-words — a DIFFERENT metric than
    3-gram Jaccard — so both floors are agreement bounds, not an
    exactness claim: recall ≥50%, precision ≥60% (measured sf0.01:
    0.60 / 0.88)."""
    return _recall_frame(
        llm_dedup_ngram(spark, sf_dir),
        llm_dedup_simhash64(spark, sf_dir),
        ["doc_a", "doc_b"],
        50,
        with_precision_floor_pct=60,
    )


@query("b_llm_knn_pq_recall", _scorecard_sql(_KNN_SQL, 50))
def llm_knn_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of product-quantization ANN (``b_llm_knn_pq``, 8×5-bit
    codes + 64-candidate ADC shortlist with exact rerank) against the
    brute-force top-5.  Measured 0.86 at sf0.01 / 0.84 at sf0.001 /
    0.63 at sf0.1; floored at 50% like the IVF gate — PQ trades the
    most memory (5 bytes/vector: 8 codes × log2(PQ_K=32) bits) for the
    coarsest approximate geometry, and the floor bounds that trade."""
    return _recall_frame(
        llm_knn(spark, sf_dir), llm_knn_pq(spark, sf_dir), ["q_id", "n_id"], 50
    )
