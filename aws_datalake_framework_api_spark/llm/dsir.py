"""DSIR-style importance resampling for pretraining-data selection
(SURVEY.md §2 B11; Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling" — public paper).

DSIR scores every raw document by how much more likely its features
are under a TARGET (in-domain) corpus' language model than under the
RAW corpus' one — ``log w(d) = Σ_f c_df · [log p_tgt(f) − log
p_raw(f)]`` — then keeps the top of the distribution.  Here the
target is the English slice of ``documents`` (standing in for "the
domain you want more of"), features are word unigrams, and both LMs
are add-half-smoothed count models.

Cross-engine determinism: the log-ratio runs in INTEGER BITS, the
same no-libm treatment as `b_llm_tfidf`/`b_llm_bm25` —
``bits(x) = floor(log₂ x) = length(bin(x)) − 1`` on exact BIGINTs,
so a word's score is ``bits(2·c_tgt+1) − bits(2·c_raw+1)`` and the
length normalizer is ``bits(T_tgt) − bits(T_raw)`` (the smoothing
denominators' difference, folded once per token).  Quantization is
under one bit per term; the multi-term document ranking tracks true
DSIR the way tfidf_bits tracks tfidf.  Everything is an exact
integer sum — no float log to drift between Spark and the oracle, or
between two runs of a 1000-executor job.

Scale shape: ONE explode + ONE (doc_id, lang, w) pre-aggregation
that every downstream consumer (raw LM, target LM, totals, per-doc
term counts) derives from — the four consumers share the identical
exchange subtree, so Spark plans one shuffled explode pass and three
``ReusedExchange`` reads (asserted in tests/test_plans.py), not four
corpus scans (ADVICE r8 / VERDICT r8 §4).  Then a vocab equi-join +
ONE 1-row scalar join for the normalizer — no UDFs, no driver loops.
At 100 TB the paper's hashed n-gram buckets (fixed 2^k vocab) bound
the score-table join; the exact-word variant here IS that
computation with k = ∞, the switch is one `hash(w) % 2^k` away and
changes no other line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table
from .text import _ws_tokens

#: the in-domain slice DSIR upsamples toward
TARGET_LANG = "en"
DSIR_TOP_K = 50


def _bits(col):
    """floor(log2(col)) for a positive integral column — binary-string
    length minus one, the repo's no-libm log (text.py:431)."""
    return (F.length(F.bin(col)) - F.lit(1)).cast("long")


@query(
    "b_llm_dsir",
    f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(trim(text), ' ')) AS w
      FROM documents
    ),
    raw AS (SELECT w, count(*) AS cr FROM tok GROUP BY w),
    tgt AS (
      SELECT w, count(*) AS ct FROM tok
      WHERE lang = '{TARGET_LANG}' GROUP BY w
    ),
    tot AS (
      SELECT (SELECT count(*) FROM tok) AS tr,
             (SELECT count(*) FROM tok WHERE lang = '{TARGET_LANG}') AS tt
    ),
    score AS (
      SELECT w,
             (length(bin(2 * COALESCE(ct, 0) + 1)) - 1)
               - (length(bin(2 * cr + 1)) - 1) AS s
      FROM raw LEFT JOIN tgt USING (w)
    ),
    dc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w),
    wgt AS (
      SELECT doc_id,
             CAST(sum(c * s)
                  - sum(c) * ((length(bin(tt)) - 1)
                              - (length(bin(tr)) - 1)) AS BIGINT)
               AS weight
      FROM dc JOIN score USING (w) CROSS JOIN tot
      GROUP BY doc_id, tt, tr
    )
    SELECT doc_id, lang, weight, rnk FROM (
      SELECT d.doc_id, d.lang, w.weight,
             CAST(row_number() OVER (ORDER BY w.weight DESC, d.doc_id)
                  AS BIGINT) AS rnk
      FROM wgt w JOIN documents d USING (doc_id))
    WHERE rnk <= {DSIR_TOP_K}
    """,
)
def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K raw documents by quantized DSIR importance weight
    toward the English target slice.  The oracle recomputes the
    whole pipeline (tokenize → two LMs → per-word bit scores →
    per-doc integer weights → rank) — a smoothing slip, a missed
    vocabulary word, or a mis-folded normalizer all fail the hash
    compare.  In-domain (en) documents dominate the selection by
    construction, which is the operator's acceptance check."""
    docs = load_table(spark, sf_dir, "documents")
    # _ws_tokens trims before splitting — byte-identical to the
    # oracle's string_split(trim(text), ' ') (ADVICE r8: an untrimmed
    # split mints phantom empty tokens on padded documents).
    tok = docs.select(
        "doc_id", "lang",
        F.explode(_ws_tokens(F.col("text"))).alias("w"),
    )
    # The single corpus pass: pre-aggregate to (doc_id, lang, w, c).
    # lang is functionally dependent on doc_id, so folding it into the
    # key changes no count but lets both consumers below (per-doc term
    # counts AND the vocab LMs) derive from this exact exchange
    # subtree — Spark plans one explode+shuffle and a ReusedExchange
    # read, not two corpus scans (VERDICT r8 §4; a persist() was
    # measured 2-7× SLOWER on the shingle analogue, dedup.py
    # shared_shingle_set).  The explicit isNotNull matches the filter
    # the final docs join infers on the dc branch, keeping the two
    # subtrees canonically identical.
    tokc = (
        tok.filter(F.col("doc_id").isNotNull())
        .groupBy("doc_id", "lang", "w")
        .agg(F.count("*").alias("c"))
    )
    # BOTH LMs in one vocab aggregation (conditional sum for the
    # target slice) — no raw⋈tgt join, and absent-in-target words get
    # ct = 0 exactly as the oracle's COALESCE does.
    raw_tgt = tokc.groupBy("w").agg(
        F.sum("c").alias("cr"),
        F.sum(
            F.when(F.col("lang") == TARGET_LANG, F.col("c")).otherwise(F.lit(0))
        ).alias("ct"),
    )
    score = raw_tgt.select(
        "w",
        (
            _bits(F.lit(2) * F.col("ct") + F.lit(1))
            - _bits(F.lit(2) * F.col("cr") + F.lit(1))
        ).alias("s"),
    )
    # Corpus totals fold out of the vocab frame (Σcr / Σct) — this
    # reads raw_tgt's Exchange(w) again (reused), never the corpus.
    totals = raw_tgt.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    ).select((_bits(F.col("tt")) - _bits(F.col("tr"))).alias("norm_bits"))
    dc = tokc.select("doc_id", "w", "c")
    wgt = (
        dc.join(score, "w")
        .crossJoin(F.broadcast(totals))  # 1-row scalar normalizer
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.col("c") * F.col("s"))
                - F.sum("c") * F.first("norm_bits")
            ).cast("long").alias("weight")
        )
    )
    # top-K via TakeOrderedAndProject (per-partition heaps, never a
    # global sort); the rank window then runs over K rows only
    top = (
        wgt.join(docs.select("doc_id", "lang"), "doc_id")
        .orderBy(F.desc("weight"), "doc_id")
        .limit(DSIR_TOP_K)
    )
    return top.select(
        "doc_id", "lang", "weight",
        F.row_number()
        .over(Window.orderBy(F.desc("weight"), "doc_id"))
        .cast("long")
        .alias("rnk"),
    )
