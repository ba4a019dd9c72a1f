"""End-to-end corpus curation (SURVEY.md §2 B11): the composition that
turns the individual signal operators into one keep/drop decision per
document, with a per-stage audit trail — the way a real training-data
pass actually runs over a 100 TB crawl.

Stages (each independently computed, then joined on doc_id):

1. **quality** — Gopher/C4-style cheap filters (length, punctuation
   ratio, alphabetic ratio); the thresholds are the ones
   ``b_llm_quality`` publishes, cross-multiplied to integer
   comparisons so the decision never touches a float.
2. **repetition** — the Gopher repeated-3-gram rule from
   ``b_llm_repetition`` (drop if >20 % of gram occurrences are
   intra-doc duplicates); documents too short to have a 3-gram pass
   vacuously.
3. **boilerplate** — the intra-source template rule from
   ``b_llm_boilerplate`` (drop if ≥half the doc's shingles appear in
   ≥3 docs of the same source); shingle-less documents pass vacuously.
4. **near-dup canonical election** — MinHash+LSH pairs
   (:func:`~.dedup._fuzzy_pairs_df`) → connected components
   (:func:`~.dedup.connected_components`) → only each cluster's
   min-doc_id canonical survives.
5. **decontamination** — any document sharing a word-8-gram with the
   eval set (:func:`~.dedup.contamination_pairs`) is dropped.

``keep`` is the AND of the five stage flags; ``reason`` names the
first failing stage (quality → repetition → boilerplate →
contaminated → duplicate)
so a curation run is auditable per document, not just filterable.
Stages are deliberately independent — a duplicate of a dropped
canonical is still reported as ``duplicate`` (production pipelines
re-elect canonicals among survivors; that variant is one extra
semi-join and does not change any plan shape, so the auditable
independent form is what ships and what the oracle pins).

Scale shape: stage 1 is map-only; stage 2 is map-only shingling plus
one groupBy(doc_id); stages 3-4 are exactly the audited dedup /
decontamination plans (banded candidate join, broadcast eval side —
see their docstrings).  The final assembly is four doc_id-keyed
left/inner joins of per-doc frames whose payload is a handful of ints
— at 100 TB every join input is orders of magnitude smaller than the
text column already scanned, and AQE picks broadcast for the contam
side (matches are rare by construction).

Reference anchor: the reference lake lands raw documents per
``cft/sourceSystem.yaml:77`` and curates downstream (SURVEY.md §0
fact 3); this operator IS that downstream pass, Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table
from .dedup import (
    BOILER_MAX_FRAC,
    BOILER_MIN_DOCS,
    DECON_EVAL_MOD,
    DECON_NGRAM,
    MAX_DF,
    _DECON_GRAM,
    _FUZZY_CTE,
    _fuzzy_pairs_df,
    connected_components,
    contamination_pairs,
    raw_shingles,
    raw_shingles_with,
)

# Quality thresholds (same decision surface as b_llm_quality, written
# as integer cross-multiplications: punct/tokens < 3/10, alpha/chars
# > 1/2, tokens >= 10).
MIN_TOKENS = 10

_CURATION_SQL = (
    _FUZZY_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + f""",
    verts AS (SELECT DISTINCT doc_id FROM documents),
    sym AS (
      SELECT doc_a AS a, doc_b AS b FROM fuzzy_pairs
      UNION
      SELECT doc_b, doc_a FROM fuzzy_pairs
    ),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM verts
      UNION
      SELECT r.a, e.b FROM reach r JOIN sym e ON r.b = e.a
    ),
    cc AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
    qual AS (
      SELECT doc_id,
             CASE WHEN len(string_split(trim(text), ' ')) >= {MIN_TOKENS}
                   AND len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) * 10
                       < len(string_split(trim(text), ' ')) * 3
                   AND len(regexp_extract_all(text, '[A-Za-z]')) * 2
                       > length(text)
                  THEN 1 ELSE 0 END AS q_keep
      FROM documents
    ),
    rep AS (
      SELECT doc_id,
             CASE WHEN (count(*) - count(DISTINCT shingle)) * 5 > count(*)
                  THEN 0 ELSE 1 END AS rep_keep
      FROM grams WHERE is_full GROUP BY doc_id
    ),
    sb AS (
      SELECT DISTINCT g.doc_id, d.source, g.shingle
      FROM grams g JOIN documents d USING (doc_id) WHERE g.is_full
    ),
    src_df AS (
      SELECT source, shingle, count(*) AS df_src FROM sb GROUP BY 1, 2
    ),
    boiler AS (
      SELECT sb.doc_id,
             CASE WHEN sum(CASE WHEN df_src >= {BOILER_MIN_DOCS}
                                THEN 1 ELSE 0 END) * {BOILER_MAX_FRAC}
                       > count(*)
                  THEN 0 ELSE 1 END AS boiler_keep
      FROM sb JOIN src_df USING (source, shingle)
      GROUP BY sb.doc_id
    ),
    tok8 AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w,
             generate_subscripts(string_split(trim(text), ' '), 1) AS pos
      FROM documents
    ),
    grams8 AS (
      SELECT doc_id, {_DECON_GRAM} AS shingle,
             lead(w, {DECON_NGRAM - 1}) OVER win8 IS NOT NULL AS is_full
      FROM tok8 WINDOW win8 AS (PARTITION BY doc_id ORDER BY pos)
    ),
    s8_all AS (SELECT DISTINCT doc_id, shingle FROM grams8 WHERE is_full),
    s8 AS (
      SELECT * FROM s8_all WHERE shingle NOT IN (
        SELECT shingle FROM s8_all GROUP BY shingle HAVING count(*) > {MAX_DF})
    ),
    contam AS (
      SELECT DISTINCT c.doc_id
      FROM s8 c JOIN s8 e ON c.shingle = e.shingle AND c.doc_id <> e.doc_id
      WHERE e.doc_id % {DECON_EVAL_MOD} = 0
    )
    SELECT v.doc_id,
           cc.cluster_id,
           q.q_keep,
           COALESCE(r.rep_keep, 1) AS rep_keep,
           COALESCE(b.boiler_keep, 1) AS boiler_keep,
           CASE WHEN ct.doc_id IS NULL THEN 1 ELSE 0 END AS decon_keep,
           CASE WHEN v.doc_id = cc.cluster_id THEN 1 ELSE 0 END AS canonical,
           CASE WHEN q.q_keep = 1 AND COALESCE(r.rep_keep, 1) = 1
                 AND COALESCE(b.boiler_keep, 1) = 1
                 AND ct.doc_id IS NULL AND v.doc_id = cc.cluster_id
                THEN 1 ELSE 0 END AS keep,
           CASE WHEN q.q_keep = 0 THEN 'quality'
                WHEN COALESCE(r.rep_keep, 1) = 0 THEN 'repetition'
                WHEN COALESCE(b.boiler_keep, 1) = 0 THEN 'boilerplate'
                WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
                WHEN v.doc_id <> cc.cluster_id THEN 'duplicate'
                ELSE 'keep' END AS reason
    FROM verts v
    JOIN cc ON cc.doc_id = v.doc_id
    JOIN qual q ON q.doc_id = v.doc_id
    LEFT JOIN rep r ON r.doc_id = v.doc_id
    LEFT JOIN boiler b ON b.doc_id = v.doc_id
    LEFT JOIN contam ct ON ct.doc_id = v.doc_id
"""
)


@query("b_llm_curation", _CURATION_SQL)
def llm_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship curation pass: one row per document with all five
    stage verdicts, the final ``keep``, and the first-failure
    ``reason`` — fully oracle-checked end to end (the DuckDB twin
    recomputes every stage including the recursive-CTE components)."""
    docs = load_table(spark, sf_dir, "documents")

    # stage 1: quality (map-only; integer comparisons only)
    toks = F.split(F.trim(F.col("text")), " ")
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col("text"), r"[^A-Za-z0-9 ]", "")
    )
    n_alpha = n_chars - F.length(F.regexp_replace(F.col("text"), r"[A-Za-z]", ""))
    q_keep = (
        F.when(
            (n_tokens >= MIN_TOKENS)
            & (n_punct * 10 < n_tokens * 3)
            & (n_alpha * 2 > n_chars),
            1,
        )
        .otherwise(0)
    )
    base = docs.select("doc_id", q_keep.alias("q_keep"))

    # stage 2: repetition (docs with < NGRAM tokens emit no grams →
    # absent from this frame → pass via the coalesce below)
    rep = raw_shingles(docs).groupBy("doc_id").agg(
        F.when(
            (F.count("*") - F.countDistinct("shingle")) * 5 > F.count("*"), 0
        )
        .otherwise(1)
        .alias("rep_keep_raw")
    )

    # stage 2.5: intra-source boilerplate (same decision surface as
    # b_llm_boilerplate; shingle-less docs absent → pass via coalesce)
    sb = raw_shingles_with(docs, ["source"]).distinct()
    src_df = sb.groupBy("source", "shingle").agg(F.count("*").alias("df_src"))
    boiler = (
        sb.join(src_df, ["source", "shingle"])
        .groupBy("doc_id")
        .agg(
            F.when(
                F.sum(
                    F.when(F.col("df_src") >= BOILER_MIN_DOCS, 1).otherwise(0)
                )
                * BOILER_MAX_FRAC
                > F.count("*"),
                0,
            )
            .otherwise(1)
            .alias("boiler_keep_raw")
        )
    )

    # stage 3: near-dup components → canonical election
    pairs = _fuzzy_pairs_df(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(docs.select("doc_id"), pairs)

    # stage 4: decontamination (broadcast eval side; see
    # contamination_pairs for the no-corpus-shuffle argument)
    eval_docs = docs.filter(F.col("doc_id") % DECON_EVAL_MOD == 0)
    contam = (
        contamination_pairs(docs, eval_docs, DECON_NGRAM)
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(1))
    )

    joined = (
        base.join(rep, "doc_id", "left")
        .join(boiler, "doc_id", "left")
        .join(labels, "doc_id")
        .join(contam, "doc_id", "left")
    )
    rep_keep = F.coalesce(F.col("rep_keep_raw"), F.lit(1))
    boiler_keep = F.coalesce(F.col("boiler_keep_raw"), F.lit(1))
    decon_keep = F.when(F.col("contaminated").isNotNull(), 0).otherwise(1)
    canonical = F.when(F.col("doc_id") == F.col("cluster_id"), 1).otherwise(0)
    keep = (
        F.when(
            (F.col("q_keep") == 1)
            & (rep_keep == 1)
            & (boiler_keep == 1)
            & (F.col("contaminated").isNull())
            & (F.col("doc_id") == F.col("cluster_id")),
            1,
        )
        .otherwise(0)
    )
    reason = (
        F.when(F.col("q_keep") == 0, "quality")
        .when(rep_keep == 0, "repetition")
        .when(boiler_keep == 0, "boilerplate")
        .when(F.col("contaminated").isNotNull(), "contaminated")
        .when(F.col("doc_id") != F.col("cluster_id"), "duplicate")
        .otherwise("keep")
    )
    return joined.select(
        "doc_id",
        "cluster_id",
        "q_keep",
        rep_keep.alias("rep_keep"),
        boiler_keep.alias("boiler_keep"),
        decon_keep.alias("decon_keep"),
        canonical.alias("canonical"),
        keep.alias("keep"),
        reason.alias("reason"),
    )


@query(
    "b_llm_curation_funnel",
    f"""
    WITH curated AS ({_CURATION_SQL}),
    tok AS (
      SELECT doc_id, len(string_split(trim(text), ' ')) AS n_tok
      FROM documents
    )
    SELECT reason,
           CASE reason WHEN 'quality' THEN 1 WHEN 'repetition' THEN 2
                       WHEN 'boilerplate' THEN 3 WHEN 'contaminated' THEN 4
                       WHEN 'duplicate' THEN 5 ELSE 0 END AS stage,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM curated JOIN tok USING (doc_id)
    GROUP BY reason
    """,
)
def llm_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation FUNNEL REPORT — what a data lead actually reads
    after a corpus pass: documents and tokens attributed to each drop
    reason (first-failing-stage attribution from `b_llm_curation`)
    plus the surviving mass under reason 'keep'.  One groupBy over the
    per-doc audit frame joined to whitespace token counts; output is
    ≤6 rows at any corpus size.  Fully oracle-proven by wrapping the
    curation SQL itself."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tok")
    )
    stage = (
        F.when(F.col("reason") == "quality", 1)
        .when(F.col("reason") == "repetition", 2)
        .when(F.col("reason") == "boilerplate", 3)
        .when(F.col("reason") == "contaminated", 4)
        .when(F.col("reason") == "duplicate", 5)
        .otherwise(0)
    )
    return (
        llm_curation(spark, sf_dir)
        .join(tok, "doc_id")
        .groupBy("reason")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").cast("long").alias("n_tokens"))
        .select("reason", stage.alias("stage"), "n_docs", "n_tokens")
    )
