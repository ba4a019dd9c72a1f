"""Winnowing fingerprints — local document fingerprinting with a
cross-doc match guarantee (Schleimer, Wilkerson & Aiken, SIGMOD 2003:
"Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
algorithm).  This is the CHARACTER-level complement to the word-chunk
span dedup (`b_llm_dedup_chunks`) and the shingle-set MinHash family:
it detects shared SUBSTRINGS with a hard guarantee — any common run of
at least ``WINNOW_K + WINNOW_W − 1`` characters between two documents
shares at least one selected fingerprint — while storing only
~2/(w+1) of the k-gram hashes.

Pipeline (both engines, 100% oracle-expressible — no RNG, no
engine-specific hash):
1. k-gram hashes: ``md5(substring(text, i, k))`` for every position
   (character semantics match across Spark/DuckDB);
2. window minima: for every window of ``w`` consecutive k-gram
   hashes, keep the minimum (md5 hex compares lexicographically —
   total order, engine-identical);
3. per-doc DISTINCT fingerprints → the document's sketch;
4. cross-doc candidate pairs: equi-join on fingerprint with a
   document-frequency cap (boilerplate fingerprints shared by > DF_CAP
   docs are dropped — the same fan-out bound as MinHash's MAX_DF),
   then pairs sharing ≥ ``WINNOW_MIN_SHARED`` fingerprints.

Scale shape: steps 1-3 are pure per-row HOF arithmetic (one map pass,
JVM codegen, no Python); the only shuffles are the fingerprint
groupBys/join, whose fan-out is bounded by DF_CAP × fingerprint rows
— linear, never the all-pairs n².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table

WINNOW_K = 8  # k-gram length (characters)
WINNOW_W = 8  # winnowing window (consecutive k-grams)
#: Guarantee threshold: any shared substring of this length or more
#: produces at least one shared fingerprint.
WINNOW_GUARANTEE = WINNOW_K + WINNOW_W - 1
#: Fingerprints present in more than this many docs are boilerplate —
#: dropped before pairing (bounds join fan-out, like MinHash MAX_DF).
WINNOW_DF_CAP = 50
#: Minimum shared fingerprints for a reported pair.
WINNOW_MIN_SHARED = 3

_FP_CTE = f"""
    WITH d AS (
      SELECT doc_id, trim(text) AS t FROM documents
      WHERE length(trim(text)) >= {WINNOW_GUARANTEE}
    ),
    kg AS (
      SELECT doc_id,
             list_transform(generate_series(1, length(t) - {WINNOW_K - 1}),
                            i -> md5(substr(t, CAST(i AS INT), {WINNOW_K}))) AS h
      FROM d
    ),
    fp AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               generate_series(1, len(h) - {WINNOW_W - 1}),
               j -> list_aggregate(h[CAST(j AS INT) : CAST(j + {WINNOW_W - 1} AS INT)],
                                   'min'))) AS fp
      FROM kg
    ),
    kept AS (
      SELECT fp FROM (SELECT fp, count(*) AS df FROM fp GROUP BY fp)
      WHERE df <= {WINNOW_DF_CAP}
    )
"""


@query(
    "b_llm_dedup_winnow",
    _FP_CTE
    + f"""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*) AS n_shared
    FROM fp a JOIN kept USING (fp)
    JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {WINNOW_MIN_SHARED}
    """,
)
def llm_dedup_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document shared-substring detection via winnowing
    fingerprints: pairs of documents sharing ≥ WINNOW_MIN_SHARED
    selected k-gram minima, with the SIGMOD-2003 guarantee that any
    common character run ≥ 15 chars (k+w−1) is represented.  The
    per-doc sketch density is ~2/(w+1) of positions — the storage
    knob; k sets the noise floor (shorter spurious matches are
    invisible)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = (
        docs.select("doc_id", F.trim(F.col("text")).alias("t"))
        .filter(F.length("t") >= WINNOW_GUARANTEE)
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(1, length(t) - {WINNOW_K - 1}),"
                f" i -> md5(substring(t, CAST(i AS INT), {WINNOW_K})))"
            ).alias("h"),
        )
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, size(h) - {WINNOW_W - 1}),"
                        f" j -> array_min(slice(h, CAST(j AS INT), {WINNOW_W})))"
                    )
                )
            ).alias("fp"),
        )
        .distinct()
    )
    kept = (
        fp.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= WINNOW_DF_CAP)
        .select("fp")
    )
    a = fp.join(kept, "fp").select("fp", F.col("doc_id").alias("doc_a"))
    b = fp.select("fp", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )
