"""Corpus-distribution statistics for training-data curation:
character-entropy quality filtering and the Zipf rank-frequency fit.

`b_llm_char_entropy` — per-document character-level Shannon entropy,
the classic gibberish/boilerplate detector (binary blobs and repeated
padding score near 0 bits/char, natural language ~4): CCNet and most
open curation stacks gate on it alongside perplexity.  Same libm trap
and same cure as `b_llm_surprisal` (llm/text.py): per-char information
is scored in INTEGER BITS — floor(log2(n/cnt)) computed as
``length(bin(n DIV cnt)) - 1`` on exact integers, summed as BIGINT —
so no float log ever runs and the keep flag is a cross-multiplied
integer compare.  The only float is the final IEEE division for the
reported mean.

`b_llm_zipf` — corpus token-frequency profile bucketed by
floor(log2(rank)) plus a log-log slope (natural corpora fit slope
≈ −1; a corpus whose slope collapses toward 0 is template spam, one
diverging below −2 lost its long tail — both are mixture red flags).
The slope regresses y = floor(log2(tf)) on x = floor(log2(rank)) with
Σx Σy Σxy Σx² as exact BIGINTs and ONE closed-form double division —
the `b_stat_corr` integer-moment pattern.

Scale shape: entropy is explode + two groupBys keyed on (doc_id[,ch])
— uniform keys, map-combinable.  Zipf's vocabulary relation is
Heaps-law sized (≈√corpus); the single-window rank over it is the
one global sort, vocab-sized not corpus-sized (at extreme scale,
swap for a two-stage range-partitioned sort — documented knob, not a
semantic change).  No Python anywhere.  Reference scope: the
reference stubs all data processing (`# API logic here`,
lambda/dataAsset/*.py:25); this family is declared in SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.readers import load_table

#: keep iff mean entropy ≥ ENTROPY_LO_NUM/ENTROPY_LO_DEN bits/char
#: (cross-multiplied: DEN·sum_bits ≥ NUM·n_chars).
ENTROPY_LO_NUM = 3
ENTROPY_LO_DEN = 2


@query(
    "b_llm_char_entropy",
    f"""
    WITH ch AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c
      FROM documents WHERE length(text) > 0
    ),
    cnt AS (
      SELECT doc_id, c, count(*) AS k FROM ch GROUP BY doc_id, c
    ),
    tot AS (
      SELECT doc_id, CAST(sum(k) AS BIGINT) AS n,
             count(*) AS n_distinct
      FROM cnt GROUP BY doc_id
    )
    SELECT cnt.doc_id,
           CAST(max(tot.n) AS BIGINT) AS n_chars,
           CAST(max(tot.n_distinct) AS BIGINT) AS n_distinct,
           CAST(sum(cnt.k * (length(bin(tot.n // cnt.k)) - 1))
                AS BIGINT) AS sum_bits,
           sum(cnt.k * (length(bin(tot.n // cnt.k)) - 1)) * 1.0
             / max(tot.n) AS mean_bits,
           CASE WHEN {ENTROPY_LO_DEN}
                     * sum(cnt.k * (length(bin(tot.n // cnt.k)) - 1))
                     >= {ENTROPY_LO_NUM} * max(tot.n)
                THEN 1 ELSE 0 END AS keep
    FROM cnt JOIN tot USING (doc_id)
    GROUP BY cnt.doc_id
    """,
)
def llm_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character entropy in integer bits: each character
    contributes cnt·floor(log2(n/cnt)) — the plug-in Shannon estimate
    quantized to whole bits per symbol, identical on both engines
    because it never leaves BIGINT arithmetic.  keep=1 iff the mean
    clears 1.5 bits/char (cross-multiplied)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    ch = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("c")
    )
    cnt = ch.groupBy("doc_id", "c").agg(F.count("*").alias("k"))
    tot = cnt.groupBy("doc_id").agg(
        F.sum("k").cast("long").alias("n"),
        F.count("*").alias("n_distinct"),
    )
    bits = F.length(F.bin(F.expr("n DIV k"))) - 1
    sum_bits = F.sum(F.col("k") * bits)
    n = F.max("n")
    return (
        cnt.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            n.cast("long").alias("n_chars"),
            F.max("n_distinct").cast("long").alias("n_distinct"),
            sum_bits.cast("long").alias("sum_bits"),
            (sum_bits * F.lit(1.0) / n).alias("mean_bits"),
            F.when(
                ENTROPY_LO_DEN * sum_bits >= ENTROPY_LO_NUM * n, 1
            )
            .otherwise(0)
            .alias("keep"),
        )
    )


@query(
    "b_llm_zipf",
    """
    WITH freq AS (
      SELECT w, count(*) AS tf FROM (
        SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents
      ) GROUP BY w
    ),
    ranked AS (
      SELECT w, tf,
             row_number() OVER (ORDER BY tf DESC, w) AS rank
      FROM freq
    ),
    pts AS (
      SELECT length(bin(rank)) - 1 AS x,
             length(bin(tf)) - 1 AS y,
             tf
      FROM ranked
    ),
    fit AS (
      SELECT count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM pts
    )
    SELECT x AS rank_bucket,
           count(*) AS n_terms,
           CAST(sum(tf) AS BIGINT) AS sum_tf,
           CAST(sum(y) AS BIGINT) AS sum_bits,
           CAST(CASE WHEN fit.n * fit.sxx - fit.sx * fit.sx = 0 THEN 0.0
                ELSE (CAST(fit.n AS DOUBLE) * CAST(fit.sxy AS DOUBLE)
                      - CAST(fit.sx AS DOUBLE) * CAST(fit.sy AS DOUBLE))
                   / (CAST(fit.n AS DOUBLE) * CAST(fit.sxx AS DOUBLE)
                      - CAST(fit.sx AS DOUBLE) * CAST(fit.sx AS DOUBLE))
                END AS DOUBLE) AS zipf_slope
    FROM pts, fit
    GROUP BY x, fit.n, fit.sx, fit.sy, fit.sxy, fit.sxx
    """,
)
def llm_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf profile: one row per floor(log2(rank)) bucket of the
    corpus vocabulary (term count, total occurrences, total log2-tf
    bits) plus the corpus-wide log-log slope fitted on exact integer
    moments.  The rank window runs over the vocab-sized frequency
    relation, never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("tf"))
    )
    ranked = freq.select(
        "tf",
        F.row_number()
        .over(Window.orderBy(F.col("tf").desc(), F.col("w")))
        .alias("rank"),
    )
    pts = ranked.select(
        (F.length(F.bin(F.col("rank"))) - 1).alias("x"),
        (F.length(F.bin(F.col("tf"))) - 1).alias("y"),
        "tf",
    )
    fit = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(den == 0, F.lit(0.0)).otherwise(
        (
            F.col("n").cast("double") * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy").cast("double")
        )
        / (
            F.col("n").cast("double") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        )
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .groupBy("x", "n", "sx", "sy", "sxy", "sxx")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("tf").cast("long").alias("sum_tf"),
            F.sum("y").cast("long").alias("sum_bits"),
        )
        .select(
            F.col("x").alias("rank_bucket"),
            "n_terms",
            "sum_tf",
            "sum_bits",
            slope.cast("double").alias("zipf_slope"),
        )
    )
