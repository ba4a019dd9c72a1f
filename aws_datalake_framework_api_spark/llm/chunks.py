"""Sub-document dedup + PII scrubbing (SURVEY.md §2 B11 extensions).

Document-level dedup misses the dominant duplication mode in web-scale
pretraining corpora: REPEATED SPANS — boilerplate paragraphs, quoted
passages, syndicated fragments — inside otherwise-distinct documents.
Modern pipelines (C4's line dedup, RefinedWeb/FineWeb's exact-span
pass) deduplicate at sub-document granularity and REASSEMBLE the
surviving text.  ``b_llm_dedup_chunks`` is that operator over
fixed-size word windows; ``b_llm_pii`` is the companion scrubber that
redacts structured PII spans (emails/phones) before training.

Both are map-heavy plans with exact integer/string outputs, so both
carry full DuckDB oracles — including the regex redaction, which pins
Java-regex vs RE2 parity on the shared pattern subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table

CHUNK_WORDS = 20  # fixed dedup window, in whitespace tokens


_CHUNKS_SQL = f"""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS t,
             (greatest(len(string_split(trim(text), ' ')), 1) + {CHUNK_WORDS - 1})
               // {CHUNK_WORDS} AS n_chunks
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, n_chunks, i AS chunk_idx,
             array_to_string(list_slice(t, i * {CHUNK_WORDS} + 1,
                                        i * {CHUNK_WORDS} + {CHUNK_WORDS}), ' ')
               AS chunk
      FROM toks, LATERAL (SELECT unnest(generate_series(0, CAST(n_chunks AS BIGINT) - 1)) AS i) g
    ),
    ranked AS (
      SELECT doc_id, n_chunks, chunk_idx, chunk,
             row_number() OVER (PARTITION BY md5(chunk)
                                ORDER BY doc_id, chunk_idx) AS occurrence
      FROM chunks
    )
    SELECT doc_id,
           CAST(max(n_chunks) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN occurrence > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           coalesce(string_agg(CASE WHEN occurrence = 1 THEN chunk END, ' '
                               ORDER BY chunk_idx), '') AS kept_text
    FROM ranked GROUP BY doc_id
"""


@query("b_llm_dedup_chunks", _CHUNKS_SQL)
def llm_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact span (chunk-level) dedup: split every document into
    fixed {CHUNK_WORDS}-word windows, keep only each span's GLOBAL
    first occurrence (ordered by (doc_id, chunk_idx) — deterministic
    canonical election, same rule as the cluster ops), and reassemble
    the surviving text per document.

    Scale shape: chunking is a map-only explode (corpus × ~n_chunks
    rows, each a bounded string); the only wide operations are the
    per-span-hash window (group size = duplication count, bounded in
    practice; the md5 keys are uniform so the shuffle is skew-free)
    and the per-doc reassembly groupBy.  No self-join — unlike
    pairwise dedup, span dedup is a rank-and-filter, which is why
    production pipelines run it FIRST: it shrinks the corpus before
    the expensive near-dup pass.

    Exactness: occurrence ranking, drop counts, and the reassembled
    text are integer/string-deterministic — the oracle reproduces all
    of it, including ' '-joined reassembly order."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.split(F.trim(F.col("text")), " ").alias("t"),
    ).withColumn(
        "n_chunks",
        F.floor(
            (F.greatest(F.size("t"), F.lit(1)) + (CHUNK_WORDS - 1)) / CHUNK_WORDS
        ).cast("bigint"),
    )
    chunks = toks.select(
        "doc_id",
        "n_chunks",
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("n_chunks") - 1)).alias(
            "chunk_idx"
        ),
        "t",
    ).select(
        "doc_id",
        "n_chunks",
        "chunk_idx",
        F.array_join(
            F.slice(
                "t", (F.col("chunk_idx") * CHUNK_WORDS + 1).cast("int"), CHUNK_WORDS
            ),
            " ",
        ).alias("chunk"),
    )
    w = Window.partitionBy(F.md5("chunk")).orderBy("doc_id", "chunk_idx")
    ranked = chunks.withColumn("occurrence", F.row_number().over(w))
    return ranked.groupBy("doc_id").agg(
        F.max("n_chunks").cast("bigint").alias("n_chunks"),
        F.sum((F.col("occurrence") > 1).cast("int")).cast("bigint").alias("n_dropped"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("occurrence") == 1,
                            F.struct("chunk_idx", "chunk"),
                        )
                    )
                ),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("kept_text"),
    )


# ------------------------------------------------------------------ PII scrub

#: shared Java-regex/RE2 subset: no lookaround, no backrefs.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\d{3}-\d{3}-\d{4}"


_PII_SQL = f"""
    WITH planted AS (
      SELECT c_custkey AS entity_id,
             'contact ' || lower(c_name) || '@example.com or call ' ||
             lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-555-' ||
             lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
             ' about segment ' || c_mktsegment AS text
      FROM customer
    )
    SELECT entity_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS INT) AS n_phones,
           regexp_replace(regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                          '{PII_PHONE}', '<PHONE>', 'g') AS redacted
    FROM planted
"""


@query("b_llm_pii", _PII_SQL)
def llm_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-PII detection + redaction — the scrub every
    training-data pipeline runs before tokenization.  The fixture
    corpus carries no organic PII, so the exhibit PLANTS deterministic
    emails/phones derived from the customer table and then detects and
    redacts them; the oracle recomputes the identical planting,
    counting, and redaction, which pins Java-regex vs RE2 behavior on
    the shared pattern subset (char classes + bounded repeats — no
    lookaround, no backrefs, identical semantics in both engines).

    Scale shape: pure map — regex count + two-pass global
    ``regexp_replace`` at scan speed, no shuffle at all (the
    aggregate-free plan a 100 TB scrub must have).  Swap the planted
    frame for a real corpus and nothing else changes."""
    cust = load_table(spark, sf_dir, "customer")
    planted = cust.select(
        F.col("c_custkey").alias("entity_id"),
        F.concat(
            F.lit("contact "),
            F.lower("c_name"),
            F.lit("@example.com or call "),
            F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
            F.lit("-555-"),
            F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
            F.lit(" about segment "),
            F.col("c_mktsegment"),
        ).alias("text"),
    )
    return planted.select(
        "entity_id",
        # F.regexp_count (not F.expr): a SQL string literal would
        # escape-process the pattern's backslashes ('\d' -> 'd')
        F.regexp_count("text", F.lit(PII_EMAIL)).cast("int").alias("n_emails"),
        F.regexp_count("text", F.lit(PII_PHONE)).cast("int").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", PII_EMAIL, "<EMAIL>"),
            PII_PHONE,
            "<PHONE>",
        ).alias("redacted"),
    )


# ------------------------------------------------------------ RAG chunking

RAG_CHUNK_CHARS = 200  # chunk window, characters
RAG_STRIDE = 150  # window stride ⇒ 50-char overlap between neighbours


@query(
    "b_llm_chunk_rag",
    f"""
    WITH d AS (
      SELECT doc_id, text, length(text) AS n FROM documents WHERE length(text) >= 1
    ),
    s AS (
      SELECT doc_id, text, CAST(i AS BIGINT) AS chunk_id
      FROM d, LATERAL (SELECT unnest(generate_series(0, (n - 1) // {RAG_STRIDE})) AS i) g
    )
    SELECT doc_id, chunk_id,
           CAST(chunk_id * {RAG_STRIDE} + 1 AS BIGINT) AS start,
           CAST(length(substr(text, CAST(chunk_id * {RAG_STRIDE} + 1 AS INT),
                              {RAG_CHUNK_CHARS})) AS BIGINT) AS chunk_chars,
           md5(substr(text, CAST(chunk_id * {RAG_STRIDE} + 1 AS INT),
                      {RAG_CHUNK_CHARS})) AS chunk_hash
    FROM s
    """,
)
def llm_chunk_rag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunking — the retrieval-corpus builder:
    every document becomes ⌈n/stride⌉ fixed-size character windows
    with ``RAG_CHUNK_CHARS − RAG_STRIDE`` characters of overlap, so no
    retrievable span straddles a chunk boundary unseen.  Emits the
    chunk GEOMETRY plus a content hash (the embedding step runs
    downstream over `b_llm_join_modal`-style plumbing); the hash makes
    the output oracle-checkable and doubles as the chunk's cache/dedup
    key.

    Scale shape: PURELY MAP-SIDE — sequence + explode + substring
    inside the row, zero shuffles, zero Python; output size is
    (1 + overlap/stride)× the corpus, the irreducible cost of overlap.
    The explode is Spark's generator node, which streams — no
    per-doc array of chunks is ever materialized for long documents."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = docs.filter(F.length("text") >= 1).select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.expr(f"(length(text) - 1) DIV {RAG_STRIDE}").cast("long"),
            )
        ).alias("chunk_id"),
    )
    piece = F.expr(f"substring(text, CAST(chunk_id * {RAG_STRIDE} + 1 AS INT), {RAG_CHUNK_CHARS})")
    return chunks.select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_id") * RAG_STRIDE + 1).cast("long").alias("start"),
        F.length(piece).cast("long").alias("chunk_chars"),
        F.md5(piece).alias("chunk_hash"),
    )
