"""Exact substring-duplication scoring — the Lee et al. (ACL 2022,
"Deduplicating Training Data Makes Language Models Better") ExactSubstr
signal, re-expressed relationally.  The paper builds a corpus-level
suffix array and removes any 50-token span that appears twice; the
relational equivalent scores every document by the fraction of its
K-token windows that ALSO appear in another document, so a curation
pass can drop or trim the flagged docs.

This complements the existing dedup family: MinHash/SimHash flag
whole NEAR-duplicate documents, winnowing (`b_llm_dedup_winnow`)
reports character-level shared-substring PAIRS, while this op yields
the per-document duplicated-SPAN fraction — the signal the paper
shows matters for LM quality (verbatim boilerplate inside otherwise
unique pages).

Parity design (100% oracle-expressible): windows are the literal
K-token strings — no engine hash involved; "duplicated" means the
window string occurs in ≥ 2 DISTINCT documents (cross-doc, the
paper's memorization case).  Counts and the flag's cross-multiplied
threshold are exact integers; the reported fraction is one final
IEEE division of identical integers.

Scale shape: the window fan-out is one JVM HOF map pass (≤ n_tokens
windows per doc, zero Python); the duplicate test is a groupBy on the
window string + a semi-ish join back — both shuffles key on the
window, uniform by construction.  At 100 TB the window string would
be hashed to 8 bytes first (xxhash64) to shrink the shuffle; the
string form here keeps the oracle engine-identical, and the hash
swap-in changes no semantics (documented switch, same shape as
MinHash's banding constants).  Reference scope: the reference
(suprakashn/aws-datalake-framework-api) stubs all data processing
(`# API logic here`, lambda/dataAsset/*.py:25); the dedup surface is
declared in SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table

#: Window length in tokens.  The paper uses 50; the synthetic docs are
#: short (~tens of tokens), so 8 keeps the fixture populated while the
#: constant stays a one-line retune at corpus scale.
SUBSTR_K = 8
#: Flag threshold: ≥ 20% of a doc's windows duplicated → dup_flag=1
#: (cross-multiplied, no float compare).
SUBSTR_FLAG_NUM = 1
SUBSTR_FLAG_DEN = 5
#: Production scale switch: shuffle 8-byte xxhash64(window) instead of
#: the ~50-byte window string (≈6× fewer shuffle bytes through the two
#: window-keyed exchanges).  Default OFF so the driver-checked id runs
#: the exact string semantics the oracle recomputes; the hashed plan's
#: OUTPUT equivalence (modulo 64-bit collisions, ~n²/2⁶⁵) is pinned in
#: tests/test_llm_ops.py and the wall-time win measured in SCALE.md.
SUBSTR_HASH_SHUFFLE = False

_WIN_CTE = f"""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
    ),
    wins AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(t) - {SUBSTR_K - 1}),
               i -> array_to_string(
                      t[CAST(i AS INT) : CAST(i + {SUBSTR_K - 1} AS INT)],
                      ' '))) AS w
      FROM toks
      WHERE len(t) >= {SUBSTR_K}
    ),
    shared AS (
      SELECT w FROM wins GROUP BY w
      HAVING count(DISTINCT doc_id) >= 2
    )
"""


@query(
    "b_llm_dedup_substr",
    _WIN_CTE
    + f"""
    SELECT wins.doc_id,
           count(*) AS n_win,
           CAST(sum(CASE WHEN shared.w IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS dup_win,
           sum(CASE WHEN shared.w IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / count(*) AS dup_frac,
           CASE WHEN sum(CASE WHEN shared.w IS NOT NULL THEN 1 ELSE 0 END)
                     * {SUBSTR_FLAG_DEN} >= count(*) * {SUBSTR_FLAG_NUM}
                THEN 1 ELSE 0 END AS dup_flag
    FROM wins LEFT JOIN shared ON wins.w = shared.w
    GROUP BY wins.doc_id
    """,
)
def llm_dedup_substr(
    spark: SparkSession, sf_dir: str, hash_shuffle: bool | None = None
) -> DataFrame:
    """Per-document exact-substring duplication fraction: the share of
    a doc's K-token windows that also occur verbatim in at least one
    OTHER document, plus a cross-multiplied ≥20% flag.  This is the
    ExactSubstr curation signal (Lee et al. 2022) in relational form —
    window generation is one transform/slice HOF pass, the duplicate
    set is one groupBy on the window string, and the scoring is a
    left join back; nothing is all-pairs.

    ``hash_shuffle`` (default: module constant SUBSTR_HASH_SHUFFLE)
    replaces the shuffled window STRING with its xxhash64 — the 100 TB
    shuffle-bytes knob; output-equivalent modulo 64-bit collisions."""
    if hash_shuffle is None:
        hash_shuffle = SUBSTR_HASH_SHUFFLE
    docs = load_table(spark, sf_dir, "documents")
    # The window fan-out multiplies each doc into ~n_tokens K-token
    # strings — orders of magnitude more bytes than the input — so its
    # parallelism must not be pinned to the INPUT file count (one
    # parquet file would run the whole corpus's fan-out in one task).
    # An explicit-width hash repartition on doc_id (input-sized, cheap
    # next to the fan-out; the fixed width is honored by AQE, which
    # would coalesce a width-less repartition right back to one task
    # on a small input) spreads it across the cluster.
    n_part = max(spark.sparkContext.defaultParallelism, 8)
    wins = (
        docs.select(
            "doc_id", F.split(F.trim(F.col("text")), " ").alias("t")
        )
        .filter(F.size("t") >= SUBSTR_K)
        .repartition(n_part, "doc_id")
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {SUBSTR_K - 1}),"
                    f" i -> array_join(slice(t, CAST(i AS INT),"
                    f" {SUBSTR_K}), ' '))"
                )
            ).alias("w"),
        )
    )
    if hash_shuffle:
        # 8-byte key through BOTH window-keyed exchanges (the distinct-
        # doc groupBy and the join back) instead of the ~50-byte string
        wins = wins.select("doc_id", F.xxhash64("w").alias("w"))
    shared = (
        wins.groupBy("w")
        .agg(F.count_distinct("doc_id").alias("ndoc"))
        .filter(F.col("ndoc") >= 2)
        .select("w", F.lit(1).alias("is_shared"))
    )
    dup = F.sum(F.coalesce(F.col("is_shared"), F.lit(0)))
    n_win = F.count("*")
    return (
        wins.join(shared, "w", "left")
        .groupBy("doc_id")
        .agg(
            n_win.alias("n_win"),
            dup.cast("long").alias("dup_win"),
            (dup * F.lit(1.0) / n_win).alias("dup_frac"),
            F.when(
                dup * SUBSTR_FLAG_DEN >= n_win * SUBSTR_FLAG_NUM, 1
            )
            .otherwise(0)
            .alias("dup_flag"),
        )
    )
