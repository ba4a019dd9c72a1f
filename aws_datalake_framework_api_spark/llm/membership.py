"""Bloom-filter membership gate (SURVEY.md §2 B11 extension): test an
arrival batch against a corpus-sized index WITHOUT joining the corpus.

The 100 TB problem: "have we already ingested this document?" asked
per arrival batch.  The join answer shuffles the arrival keys against
a corpus-scale index every batch.  The sketch answer — what this op
implements — builds a Bloom filter over the index ONCE (one linear
pass, map-side partial bitmaps OR-merged in one small shuffle), then
gates arrivals with a BROADCAST of the ~KB-to-MB bitmap: the corpus
is never re-read, the arrivals never shuffle.  Spark itself uses this
exact shape for runtime join filters; here it is surfaced as a
data-pipeline operator (the pre-dedup cheap gate in front of
``b_llm_dedup_incr``'s full near-dup pass).

Design for verifiability: positions come from md5 (not xxhash64), so
the DuckDB oracle reconstructs the SAME bitmap and the SAME hits —
including any false positives — bit for bit.  The filter is k=4
probes into an m=65536-bit bitmap stored as 1024 BIGINT words in a
(word_idx, bits) TABLE (not a driver-side array): building is a
grouped ``bit_or`` over shifted bits, probing is a broadcast join on
word_idx — both shapes stay distributed at any m.

At the fixture's index size (≤ a few hundred docs) the false-positive
rate is ~(n·k/m)^k ≈ 1e-6, so the emitted ``is_fp`` column is almost
always all-zero — but it is COMPUTED, not assumed, and the oracle
recomputes it: a hash-family or bitmap regression shows up as a hash
mismatch, not a silent quality drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table
from .dedup import INCR_ARRIVAL_MOD

BLOOM_BITS = 65536          # m: bitmap size (1024 × 64-bit words)
BLOOM_HASHES = 4            # k: probes per document
_WORD_BITS = 64


def _pos_sql(col_sql: str, i: int) -> str:
    """DuckDB: probe position i from md5 hex window [i*8+1, i*8+8]."""
    return (
        f"CAST(('0x' || substr(md5({col_sql}), {i * 8 + 1}, 8)) AS BIGINT) "
        f"% {BLOOM_BITS}"
    )


def _pos_col(col: F.Column, i: int) -> F.Column:
    """Spark twin of :func:`_pos_sql` — same md5 window, same mod."""
    return (
        F.conv(F.substring(F.md5(col), i * 8 + 1, 8), 16, 10).cast("bigint")
        % BLOOM_BITS
    )


#: single-bit mask for bit position p % 64.  Bit 63 is spelled as the
#: BIGINT MIN literal: Spark's shiftleft(1, 63) two's-complement-wraps
#: to it silently, while DuckDB refuses the overflowing shift — the
#: CASE makes both engines compute the identical signed value.
_MIN64 = -9223372036854775808
_MASK_SQL = (
    f"CASE WHEN p % {_WORD_BITS} = 63 THEN CAST({_MIN64} AS BIGINT) "
    f"ELSE shiftleft(CAST(1 AS BIGINT), CAST(p % {_WORD_BITS} AS INT)) END"
)
_DUCK_MASK_SQL = (
    f"CASE WHEN p % {_WORD_BITS} = 63 THEN CAST({_MIN64} AS BIGINT) "
    f"ELSE CAST(1 AS BIGINT) << CAST(p % {_WORD_BITS} AS INT) END"
)


_BLOOM_SQL = f"""
    WITH idx AS (
      SELECT text FROM documents WHERE doc_id % {INCR_ARRIVAL_MOD} <> 0
    ),
    idx_pos AS (
      SELECT DISTINCT p FROM idx, (VALUES {", ".join(f"({i})" for i in range(BLOOM_HASHES))}) probes(i),
      LATERAL (SELECT CASE i {" ".join(f"WHEN {i} THEN {_pos_sql('text', i)}" for i in range(BLOOM_HASHES))} END AS p) q
    ),
    bloom AS (
      SELECT p // {_WORD_BITS} AS word_idx,
             bit_or({_DUCK_MASK_SQL}) AS bits
      FROM idx_pos GROUP BY 1
    ),
    arrivals AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {INCR_ARRIVAL_MOD} = 0
    ),
    arr_pos AS (
      SELECT a.doc_id, probes.i,
             CASE probes.i {" ".join(f"WHEN {i} THEN {_pos_sql('a.text', i)}" for i in range(BLOOM_HASHES))} END AS p
      FROM arrivals a, (VALUES {", ".join(f"({i})" for i in range(BLOOM_HASHES))}) probes(i)
    ),
    probed AS (
      SELECT doc_id,
             CASE WHEN bits IS NOT NULL AND (bits & ({_DUCK_MASK_SQL})) <> 0
                  THEN 1 ELSE 0 END AS hit
      FROM (SELECT ap.doc_id, ap.p, b.bits
            FROM arr_pos ap LEFT JOIN bloom b ON ap.p // {_WORD_BITS} = b.word_idx)
    ),
    gated AS (
      SELECT doc_id, CAST(min(hit) AS INT) AS bloom_hit
      FROM probed GROUP BY doc_id
    )
    SELECT g.doc_id, g.bloom_hit,
           CAST(CASE WHEN a.text IN (SELECT text FROM idx) THEN 1 ELSE 0 END AS INT)
             AS exact_member,
           CAST(CASE WHEN g.bloom_hit = 1
                      AND a.text NOT IN (SELECT text FROM idx)
                     THEN 1 ELSE 0 END AS INT) AS is_fp
    FROM gated g JOIN arrivals a ON g.doc_id = a.doc_id
"""


@query("b_llm_bloom_gate", _BLOOM_SQL)
def llm_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate today's arrival batch (``doc_id % 3 == 0``, the
    ``b_llm_dedup_incr`` convention) against a Bloom filter of the
    historical index's exact texts.

    Plan shape: ONE pass over the index builds the bitmap (map-side
    partial ``bit_or`` per word, ≤1024-row shuffle), the bitmap
    broadcasts, arrivals probe it map-side via a broadcast join on
    word_idx, and the all-k-probes-set reduction is a groupBy on the
    arrival key only.  ``exact_member``/``is_fp`` (the audit columns a
    production gate samples) are computed with a broadcast semi-join
    of the arrivals — a batch-sized, not corpus-sized, shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    idx = docs.filter(F.col("doc_id") % INCR_ARRIVAL_MOD != 0).select("text")
    arrivals = docs.filter(F.col("doc_id") % INCR_ARRIVAL_MOD == 0).select(
        "doc_id", "text"
    )

    # --- build: index texts → k probe positions → distinct → bitmap
    idx_pos = (
        idx.select(
            F.explode(
                F.array(*[_pos_col(F.col("text"), i) for i in range(BLOOM_HASHES)])
            ).alias("p")
        )
        .distinct()
    )
    bloom = idx_pos.groupBy(
        F.floor(F.col("p") / _WORD_BITS).alias("word_idx")
    ).agg(F.bit_or(F.expr(_MASK_SQL)).alias("bits"))

    # --- probe: arrival positions ⋈ broadcast bitmap, require all k
    arr_pos = arrivals.select(
        "doc_id",
        F.explode(
            F.array(*[_pos_col(F.col("text"), i) for i in range(BLOOM_HASHES)])
        ).alias("p"),
    )
    probed = (
        arr_pos.join(
            F.broadcast(bloom),
            F.floor(F.col("p") / _WORD_BITS) == F.col("word_idx"),
            "left",
        )
        .select(
            "doc_id",
            F.when(
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.expr(_MASK_SQL)) != 0),
                1,
            )
            .otherwise(0)
            .alias("hit"),
        )
    )
    gated = probed.groupBy("doc_id").agg(F.min("hit").cast("int").alias("bloom_hit"))

    # --- audit: exact membership via broadcast of the (batch-sized)
    # arrival texts against the index — the ground truth a production
    # gate samples to monitor its fp rate
    exact_hits = (
        arrivals.join(idx.distinct(), "text", "semi").select("doc_id")
        .withColumn("exact_member", F.lit(1))
    )
    return (
        gated.join(arrivals.select("doc_id"), "doc_id")
        .join(exact_hits, "doc_id", "left")
        .select(
            "doc_id",
            "bloom_hit",
            F.coalesce("exact_member", F.lit(0)).cast("int").alias("exact_member"),
            (
                (F.col("bloom_hit") == 1)
                & (F.coalesce("exact_member", F.lit(0)) == 0)
            )
            .cast("int")
            .alias("is_fp"),
        )
    )
