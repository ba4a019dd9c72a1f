"""Text-analysis operators for training-data pipelines (SURVEY.md §2
B11): token counting, quality scoring, language ID, document
fingerprinting, corpus statistics, exact dedup.

Scale stance: every operator here is a narrow projection or a single
keyed shuffle over the ``documents`` table — no Python in the hot
path (higher-order JVM functions only), no driver-side collection.
At 100 TB the text column dominates I/O, so each query projects only
the columns it reads (column pruning reaches the parquet scan).

These realize the data-quality surface the reference's lake fronts
(documents land under ``init/*`` per ``cft/sourceSystem.yaml:77``;
curation happens downstream — SURVEY.md §0 fact 3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table, register_views

# BPE-ish word/number/punctuation segmentation — one token per word,
# number, or standalone punctuation mark (the pre-tokenizer shape GPT
# BPEs use, minus unicode categories the fixture doesn't exercise).
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Stopword list used by the quality score (public/en).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def _ws_tokens(col: Column) -> Column:
    """Whitespace tokenization — split on a SINGLE LITERAL SPACE,
    byte-identical to the DuckDB twin's ``string_split(trim(text),
    ' ')``.  (A ``\\s+`` regex here would diverge from the oracle on
    any document with consecutive spaces or tabs; parity must not
    depend on the fixture being single-spaced — ADVICE r1.)"""
    return F.split(F.trim(col), " ")


# ---------------------------------------------------------------- token counts


@query(
    "b_llm_tokens",
    """
    SELECT doc_id,
           len(string_split(trim(text), ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_tokens,
           length(text) AS n_chars,
           length(text) * 1.0 / len(regexp_extract_all(
                 text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS chars_per_token
    FROM documents
    """,
)
def llm_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens +
    chars-per-token ratio (the standard "is this text token-dense
    enough to train on" signal).  Pure JVM regexp — at 100 TB this is
    scan-bound, exactly as it should be.

    The regex char class uses a literal space (not ``\\s``) so the
    Spark and DuckDB regex engines see byte-identical patterns; the
    fixture has no tabs/newlines.
    """
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), F.lit(0)))
    return docs.select(
        "doc_id",
        F.size(_ws_tokens(F.col("text"))).alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.length("text").alias("n_chars"),
        (F.length("text") / bpe).alias("chars_per_token"),
    )


# ---------------------------------------------------------------- quality score


@query(
    "b_llm_quality",
    """
    WITH t AS (
      SELECT doc_id, lang, source,
             length(text) AS n_chars,
             len(string_split(trim(text), ' ')) AS n_tokens,
             len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct,
             len(list_filter(string_split(trim(text), ' '),
                 w -> list_contains(['the','a','of','and','to','in','is','on','for','with'],
                                    lower(w)))) AS n_stop,
             len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars, n_tokens,
           n_punct * 1.0 / n_tokens AS punct_ratio,
           n_stop * 1.0 / n_tokens AS stop_ratio,
           n_alpha * 1.0 / n_chars AS alpha_ratio,
           CASE WHEN n_tokens >= 10 AND n_punct * 1.0 / n_tokens < 0.3
                     AND n_alpha * 1.0 / n_chars > 0.5
                THEN 1 ELSE 0 END AS keep
    FROM t
    """,
)
def llm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (Gopher/C4-style cheap filters): length,
    punctuation ratio, stopword ratio, alphabetic ratio, and a
    keep/drop verdict.  One pass, no shuffle; the ``keep`` flag is
    what a 100 TB curation job would partition-write on."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _ws_tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    # single-char counts via length arithmetic on regexp_replace — ONE
    # regex pass, no per-character match array (regexp_extract_all on a
    # 1-char class materializes an array element per matching char)
    n_punct = n_chars - F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z0-9 ]", ""))
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, F.lower(w))))
    n_alpha = n_chars - F.length(F.regexp_replace(F.col("text"), r"[A-Za-z]", ""))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_punct / n_tokens).alias("punct_ratio"),
        (n_stop / n_tokens).alias("stop_ratio"),
        (n_alpha / n_chars).alias("alpha_ratio"),
        F.when(
            (n_tokens >= 10) & (n_punct / n_tokens < 0.3) & (n_alpha / n_chars > 0.5), 1
        )
        .otherwise(0)
        .alias("keep"),
    )


# ---------------------------------------------------------------- language ID


# Marker lexicon: (lang, marker word). In production this is a real
# per-language stopword lexicon loaded as a table; the mechanism —
# explode tokens, broadcast-join the lexicon, majority-vote per doc —
# is the scalable n-gram/lexicon language-ID shape (no Python, no
# per-row model call). Markers here are drawn from the fixture vocab
# so the fixture exercises real tie-breaking.
LANG_MARKERS = [
    ("en", "the"), ("en", "a"), ("en", "value"), ("en", "table"),
    ("de", "der"), ("de", "und"), ("de", "row"), ("de", "scan"),
    ("es", "el"), ("es", "los"), ("es", "fast"), ("es", "slow"),
    ("fr", "le"), ("fr", "et"), ("fr", "hash"), ("fr", "merge"),
    ("zh", "data"), ("zh", "spark"), ("zh", "query"), ("zh", "join"),
]

_MARKER_SQL_VALUES = ", ".join(f"('{lang}', '{w}')" for lang, w in LANG_MARKERS)

LANGID_SQL = f"""
    WITH markers(m_lang, m_word) AS (VALUES {_MARKER_SQL_VALUES}),
    tok AS (
      SELECT doc_id, lang, unnest(string_split(trim(text), ' ')) AS word
      FROM documents
    ),
    hits AS (
      SELECT t.doc_id, t.lang, m.m_lang, count(*) AS n_hits
      FROM tok t JOIN markers m ON lower(t.word) = m.m_word
      GROUP BY 1, 2, 3
    ),
    best AS (
      SELECT doc_id, lang, m_lang AS predicted,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY n_hits DESC, m_lang) AS rn
      FROM hits
    )
    SELECT lang, predicted, count(*) AS n_docs
    FROM best WHERE rn = 1
    GROUP BY lang, predicted
"""


@query("b_llm_langid", LANGID_SQL)
def llm_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon language ID: explode tokens → broadcast-join a
    (lang, marker) lexicon → count hits per (doc, lang) → argmax with
    deterministic tie-break → confusion-matrix rollup vs the labeled
    ``lang`` column.  The lexicon is tiny and broadcast; the token
    explosion is map-side; the only shuffle is the per-doc argmax —
    the right shape at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    # JVM-side literal lexicon (LocalRelation — no Python-worker RDD)
    markers = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"('{lang}', '{w}')" for lang, w in LANG_MARKERS)
        + " AS m(m_lang, m_word)"
    )
    tok = docs.select(
        "doc_id", "lang", F.explode(_ws_tokens(F.col("text"))).alias("word")
    )
    hits = (
        tok.join(F.broadcast(markers), F.lower(F.col("word")) == F.col("m_word"))
        .groupBy("doc_id", "lang", "m_lang")
        .agg(F.count("*").alias("n_hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("n_hits"), F.asc("m_lang"))
    best = hits.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.groupBy("lang", F.col("m_lang").alias("predicted"))
        .agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------- fingerprint


@query(
    "b_llm_fingerprint",
    """
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(7 AS BIGINT),
               list_transform(string_split(trim(text), ' '),
                 t -> CAST(ascii(t) * 1000 + length(t) AS BIGINT))),
             (acc, h) -> (acc * 131 + h) % 1000000007) AS fingerprint,
           list_aggregate(
             list_transform(string_split(trim(text), ' '),
               t -> CAST(ascii(t) * 1000 + length(t) AS BIGINT)),
             'min') AS min_token_hash
    FROM documents
    """,
)
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: an order-SENSITIVE rolling polynomial
    hash (reorder-detecting) plus an order-INSENSITIVE min-token-hash
    (bag-of-words signature, the 1-permutation MinHash primitive).
    Both fold token hashes JVM-side with ``aggregate`` — sequential,
    mod-reduced each step so values stay far from 2^63 on arbitrarily
    long documents.  The per-token hash (ascii*1000+len) is engine-
    portable for the oracle; production swaps in ``xxhash64`` (used by
    the MinHash dedup in llm/dedup.py) without changing the fold."""
    docs = load_table(spark, sf_dir, "documents")
    tok_hash = F.transform(
        _ws_tokens(F.col("text")),
        lambda t: (F.ascii(t) * 1000 + F.length(t)).cast("long"),
    )
    rolling = F.aggregate(
        tok_hash,
        F.lit(7).cast("long"),
        lambda acc, h: (acc * 131 + h) % 1000000007,
    )
    return docs.select(
        "doc_id",
        rolling.alias("fingerprint"),
        F.array_min(tok_hash).alias("min_token_hash"),
    )


# ---------------------------------------------------------------- corpus stats


@query(
    "b_llm_textstats",
    """
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS total_tokens,
           sum(len(string_split(trim(text), ' '))) * 1.0 / count(*) AS avg_tokens,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars,
           count(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY lang
    """,
)
def llm_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics by language: doc/token counts, char extremes,
    source diversity — the dataset-card rollup.  ``avg_tokens`` is the
    exact-integer ratio ``sum(n_tok)*1.0/count(*)`` on BOTH engines —
    one IEEE division of identical operands — NOT ``round(avg(...))``,
    whose internal accumulation/rounding differs across engines
    (CORRECTNESS_r01 hash mismatch; policy in functions/numeric.py)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(_ws_tokens(F.col("text")))
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_tok).alias("total_tokens"),
            (F.sum(n_tok) * F.lit(1.0) / F.count("*")).alias("avg_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


# ---------------------------------------------------------------- exact dedup


@query(
    "b_llm_dedup_exact",
    """
    WITH hashed AS (
      SELECT doc_id, lang, source,
             sha256(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS text_hash
      FROM documents
    )
    SELECT doc_id, lang, source, text_hash,
           CAST(dup_count AS BIGINT) AS dup_count
    FROM (
      SELECT doc_id, lang, source, text_hash,
             row_number() OVER (PARTITION BY text_hash ORDER BY doc_id) AS rn,
             count(*) OVER (PARTITION BY text_hash) AS dup_count
      FROM hashed
    ) WHERE rn = 1
    """,
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text hash: normalize (lowercase,
    trim, collapse whitespace) → sha256 → keep the lowest doc_id per
    hash, carrying the duplicate count.  The shuffle key is the
    256-bit hash, so the 100 TB shape is a single well-distributed
    hash-partitioned exchange of (hash, id) pairs — the text column
    itself never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.sha2(F.lower(F.trim(F.regexp_replace(F.col("text"), " +", " "))), 256)
    w = Window.partitionBy("text_hash")
    hashed = docs.select("doc_id", "lang", "source", h.alias("text_hash"))
    return (
        hashed.withColumn("rn", F.row_number().over(w.orderBy("doc_id")))
        .withColumn("dup_count", F.count("*").over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "text_hash", "dup_count")
    )


# ---------------------------------------------------------- blocklist filter


#: C4-style term blocklist ("List of Dirty, Naughty …" in the real
#: pipeline); the terms here are fixture-vocabulary stand-ins chosen to
#: actually occur in the synthetic corpus so every code path (count,
#: flag, redact) is exercised and oracle-hash-checked.  Word-boundary
#: anchored so substrings don't match ("customers" stays).
BLOCKLIST = ("customer", "vector")
_BLOCK_RE = r"\b(" + "|".join(BLOCKLIST) + r")\b"
REDACTION = "[REDACTED]"
MAX_BLOCKED = 2  # C4 drops on ANY hit; we keep a tolerance knob


@query(
    "b_llm_blocklist",
    f"""
    WITH m AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(text, '{_BLOCK_RE}')) AS n_blocked,
             regexp_replace(text, '{_BLOCK_RE}', '{REDACTION}', 'g') AS red_text
      FROM documents
    )
    SELECT doc_id, lang, CAST(n_blocked AS BIGINT) AS n_blocked,
           CASE WHEN n_blocked > {MAX_BLOCKED} THEN 0 ELSE 1 END AS keep,
           red_text
    FROM m
    """,
)
def llm_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist filtering + redaction — the C4 badwords rule, the
    third standard text-curation filter next to quality and repetition:
    count word-boundary blocklist hits, drop documents over the
    tolerance, and emit the redacted text for pipelines that scrub
    instead of drop (PII redaction is this same operator with the
    pattern swapped for email/phone/ID regexes — the fixture corpus
    contains none, so the term list is what a non-vacuous oracle
    check can pin).

    Map-only: one regex count + one regex rewrite per document, no
    shuffle, no Python — at 100 TB this runs at scan speed inside
    whole-stage codegen, and the regex (alternation of literals,
    word-boundary anchored) is identical RE2/Java semantics, so the
    DuckDB twin hash-matches the redacted text byte-for-byte."""
    docs = load_table(spark, sf_dir, "documents")
    n_blocked = F.regexp_count(F.col("text"), F.lit(_BLOCK_RE))
    return docs.select(
        "doc_id",
        "lang",
        n_blocked.cast("long").alias("n_blocked"),
        F.when(n_blocked > MAX_BLOCKED, 0).otherwise(1).alias("keep"),
        F.regexp_replace(F.col("text"), _BLOCK_RE, REDACTION).alias("red_text"),
    )


# ------------------------------------------------------ surprisal filter

# Keep-band bounds as 20ths of a bit (integer cross-multiplication:
# keep iff LO_X20·n_tok ≤ 20·sum_bits < HI_X20·n_tok, i.e. mean bits
# in [4.00, 4.05) on this fixture's narrow synthetic distribution).
# On a real corpus the band comes from the reference-corpus quantiles,
# exactly as CCNet buckets perplexity into head/middle/tail.
SURPRISAL_LO_X20 = 80
SURPRISAL_HI_X20 = 81


@query(
    "b_llm_surprisal",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
      FROM documents
    ),
    freq AS (SELECT w, count(*) AS tf FROM tok GROUP BY w),
    tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total FROM freq),
    scored AS (
      SELECT t.doc_id, length(bin(total // tf)) - 1 AS bits
      FROM tok t JOIN freq USING (w) CROSS JOIN tot
    )
    SELECT doc_id,
           count(*) AS n_tok,
           CAST(sum(bits) AS BIGINT) AS sum_bits,
           sum(bits) * 1.0 / count(*) AS mean_bits,
           CASE WHEN {SURPRISAL_LO_X20} * count(*) <= 20 * sum(bits)
                 AND 20 * sum(bits) < {SURPRISAL_HI_X20} * count(*)
                THEN 1 ELSE 0 END AS keep
    FROM scored GROUP BY doc_id
    """,
)
def llm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-surprisal (perplexity-band) filter — the CCNet-style
    quality signal: score every document by the average information
    content of its tokens under the corpus's own unigram model, then
    keep only the middle band (too-predictable = boilerplate/spam,
    too-surprising = noise/garbled text).

    The cross-engine trap in any LM score is the float log: libm
    ``ln`` can differ in the last ulp between engines and a float SUM
    is order-dependent.  Both are dodged by scoring in INTEGER BITS —
    per-token surprisal ≈ floor(log2(total/tf)) computed as
    ``length(bin(total DIV tf)) - 1`` (binary-string length, exact
    integer arithmetic in both engines), summed as BIGINT
    (order-independent), with the band test cross-multiplied.  The
    only float is the final exact-IEEE division for the reported
    mean.

    Scale shape: the unigram table is vocab-sized (≈√corpus by
    Heaps's law) built with one groupBy; scoring joins tokens⋈freq on
    the token string — the standard LM-scoring shuffle, uniform keys;
    the corpus total broadcasts as one row.  No Python, no floats in
    decisions, no per-doc state."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
    )
    freq = tok.groupBy("w").agg(F.count("*").alias("tf"))
    tot = freq.agg(F.sum("tf").cast("long").alias("total"))
    scored = (
        tok.join(freq, "w")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", (F.length(F.bin(F.expr("total DIV tf"))) - 1).alias("bits"))
    )
    n_tok = F.count("*")
    sum_bits = F.sum("bits")
    return scored.groupBy("doc_id").agg(
        n_tok.alias("n_tok"),
        sum_bits.cast("long").alias("sum_bits"),
        (sum_bits * F.lit(1.0) / n_tok).alias("mean_bits"),
        F.when(
            (SURPRISAL_LO_X20 * n_tok <= 20 * sum_bits)
            & (20 * sum_bits < SURPRISAL_HI_X20 * n_tok),
            1,
        )
        .otherwise(0)
        .alias("keep"),
    )


# ---------------------------------------------------------------- BPE pairs

BPE_TOP_K = 50


@query(
    "b_llm_bpe_pairs",
    f"""
    WITH words AS (
      SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents
    ),
    pairs AS (
      SELECT substr(w, CAST(i AS INT), 2) AS pair
      FROM words, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) g
      WHERE len(w) >= 2
    ),
    counted AS (
      SELECT pair, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, pair) AS rnk
      FROM pairs GROUP BY pair
    )
    SELECT CAST(rnk AS INT) AS rnk, pair, n FROM counted
    WHERE rnk <= {BPE_TOP_K}
    """,
)
def llm_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE-training inner statistic: corpus-wide counts of
    adjacent character pairs within words, ranked — exactly the
    quantity one merge iteration of byte-pair encoding maximizes
    (Sennrich et al. 2016).  A full trainer loops this K times,
    re-pairing after each merge; the loop is a driver-side iteration
    over THIS distributed kernel, so pinning the kernel pins the
    trainer's cost model.

    Scale shape: explode to (word-occurrence × chars) rows — linear in
    corpus bytes, map-only — then ONE hash aggregate whose key space
    is the pair alphabet (≤ a few thousand keys — map-side combine
    collapses almost everything before the shuffle), then a top-K over
    that tiny aggregate.  Deterministic tie-break on the pair string
    makes the ranking exact, so the oracle hash-checks rank, pair, and
    count."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"), "w"
    ).select(F.expr("substr(w, i, 2)").alias("pair"))
    counted = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return (
        counted.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= BPE_TOP_K)
        .select("rnk", "pair", "n")
    )


# -------------------------------------------------- bigram LM surprisal


@query(
    "b_llm_surprisal2",
    """
    WITH d AS (
      SELECT doc_id, string_split(trim(text), ' ') AS a FROM documents
    ),
    pairs AS (
      -- parallel unnests of equal-length slices zip row-wise
      SELECT doc_id,
             unnest(a[1 : len(a) - 1]) AS prev,
             unnest(a[2 : len(a)]) AS w
      FROM d WHERE len(a) >= 2
    ),
    cbw AS (SELECT prev, w, count(*) AS cbw FROM pairs GROUP BY prev, w),
    cp AS (SELECT prev, CAST(sum(cbw) AS BIGINT) AS cp FROM cbw GROUP BY prev),
    scored AS (
      SELECT p.doc_id, length(bin(cp // cbw)) - 1 AS bits
      FROM pairs p JOIN cbw USING (prev, w) JOIN cp USING (prev)
    )
    SELECT doc_id,
           count(*) AS n_bigrams,
           CAST(sum(bits) AS BIGINT) AS sum_bits,
           sum(bits) * 1.0 / count(*) AS mean_bits
    FROM scored GROUP BY doc_id
    """,
)
def llm_surprisal_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIGRAM-LM surprisal — the order-2 upgrade of `b_llm_surprisal`:
    score each document by the average conditional information of its
    token transitions, −log₂ P(w|prev) with P estimated from the
    corpus's own bigram counts (c(prev,w)/c(prev)).  Repetitive or
    templated text has near-deterministic transitions (low bits);
    shuffled/garbled text has high bits — a sharper quality signal
    than unigram frequency, and the standard KenLM-lite decontamination
    heuristic.

    Same INTEGER-BITS discipline as the unigram query: per-transition
    bits = floor(log₂(c(prev)/c(prev,w))) computed as binary-string
    length of the exact integer quotient — no libm log, no float sum;
    the reported mean is the single exact-IEEE division at the end.

    Scale shape: bigrams come from zip-sliced token arrays (map-side
    only — NO per-doc window/sort shuffle; `arrays_zip(slice(a,1,n-1),
    slice(a,2,n-1))` pairs neighbours inside the row).  The bigram
    table is one groupBy on (prev,w); context totals fold from it by a
    second groupBy on prev (vocab-sized, not corpus-sized).  Scoring
    joins transitions⋈counts on natural-language keys — Zipf-skewed,
    which is exactly what AQE skew-join handles; at known-extreme skew
    the salting pattern from `b_join_salted` applies unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", _ws_tokens(F.col("text")).alias("a")
    ).filter(F.size("a") >= 2)
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.expr("slice(a, 1, size(a) - 1)").alias("prev"),
                F.expr("slice(a, 2, size(a) - 1)").alias("w"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.prev").alias("prev"), F.col("p.w").alias("w"))
    cbw = pairs.groupBy("prev", "w").agg(F.count("*").alias("cbw"))
    cp = cbw.groupBy("prev").agg(F.sum("cbw").cast("long").alias("cp"))
    scored = (
        pairs.join(cbw, ["prev", "w"])
        .join(cp, "prev")
        .select(
            "doc_id",
            (F.length(F.bin(F.expr("cp DIV cbw"))) - 1).alias("bits"),
        )
    )
    n_big = F.count("*")
    sum_bits = F.sum("bits")
    return scored.groupBy("doc_id").agg(
        n_big.alias("n_bigrams"),
        sum_bits.cast("long").alias("sum_bits"),
        (sum_bits * F.lit(1.0) / n_big).alias("mean_bits"),
    )


# ------------------------------------------------------------ tf-idf terms

#: Terms reported per source.
TFIDF_TOP_K = 5


@query(
    "b_llm_tfidf",
    f"""
    WITH tok AS (
      SELECT doc_id, source, unnest(string_split(trim(text), ' ')) AS w
      FROM documents
    ),
    dfreq AS (SELECT w, count(DISTINCT doc_id) AS df FROM tok GROUP BY w),
    n AS (SELECT count(*) AS n_docs FROM documents),
    tf AS (SELECT source, w, count(*) AS tf FROM tok GROUP BY source, w),
    scored AS (
      SELECT source, w AS term, tf, df,
             CAST(tf * (length(bin(n_docs // df)) - 1) AS BIGINT) AS score
      FROM tf JOIN dfreq USING (w) CROSS JOIN n
    )
    SELECT source, term, tf, df, score, rnk FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY source ORDER BY score DESC, term) AS BIGINT) AS rnk
      FROM scored)
    WHERE rnk <= {TFIDF_TOP_K}
    """,
)
def llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k characteristic terms per source by TF-IDF — the corpus-
    exploration primitive (what distinguishes each crawl/domain slice)
    and the feature extractor behind classic quality classifiers.

    IDF runs in INTEGER BITS — idf_bits = floor(log₂(N/df)) as
    binary-string length of the exact quotient — so the score
    ``tf × idf_bits`` is an exact BIGINT: no libm log to drift between
    engines, and stopwords (df ≈ N ⇒ idf_bits = 0) drop out of the
    ranking arithmetic exactly, with ties broken lexicographically.

    Scale shape: document frequency distincts (w, doc_id) BEFORE
    counting (two shuffles, both on the term key — never a
    count(DISTINCT) holding per-group sets); term frequency is one
    (source, term) groupBy; N broadcasts as one row.  The final
    row_number partitions by source — fine while vocab fits a
    partition sort; at web-corpus vocab the two-level top-K from
    `b_llm_sample_exact` substitutes for the window without changing
    the contract."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(_ws_tokens(F.col("text"))).alias("w"),
    )
    dfreq = (
        tok.select("w", "doc_id")
        .distinct()
        .groupBy("w")
        .agg(F.count("*").alias("df"))
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    tf = tok.groupBy("source", "w").agg(F.count("*").alias("tf"))
    scored = (
        tf.join(dfreq, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            F.col("w").alias("term"),
            "tf",
            "df",
            (F.col("tf") * (F.length(F.bin(F.expr("n_docs DIV df"))) - 1))
            .cast("long")
            .alias("score"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), "term")
    return (
        scored.select(
            "source",
            "term",
            "tf",
            "df",
            "score",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= TFIDF_TOP_K)
    )


# ------------------------------------------------------------ keyword search

#: Conjunctive search terms drawn from the fixture's vocabulary.
SEARCH_TERMS = ("spark", "join", "query")


@query(
    "b_llm_keyword_search",
    f"""
    SELECT doc_id,
           CAST(tf_total AS BIGINT) AS tf_total,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM (SELECT doc_id,
                 len(list_filter(string_split(text, ' '), w -> w = 'spark'))
               + len(list_filter(string_split(text, ' '), w -> w = 'join'))
               + len(list_filter(string_split(text, ' '), w -> w = 'query'))
                   AS tf_total,
                 len(string_split(text, ' ')) AS n_tokens
          FROM documents
          WHERE len(list_filter(string_split(text, ' '), w -> w = 'spark')) > 0
            AND len(list_filter(string_split(text, ' '), w -> w = 'join'))  > 0
            AND len(list_filter(string_split(text, ' '), w -> w = 'query')) > 0
         ) AS hits
    ORDER BY tf_total DESC, doc_id
    LIMIT 20
    """,
)
def llm_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive keyword search with term-frequency ranking — the
    exact-integer retrieval primitive under BM25-class scoring (the
    idf×tf refinement needs log(), whose last-ulp behavior differs
    between libm implementations; raw tf keeps the exhibit bit-exact,
    and `b_llm_tfidf` carries the weighted variant with its own
    determinism treatment).  Documents containing ALL query terms
    rank by total term frequency, doc_id tiebreak, top-20.

    Scale shape: the whole query is a MAP-ONLY scan — per-doc token
    split + three integer counts in codegen, no UDF, no shuffle —
    followed by TakeOrderedAndProject for the top-k (per-partition
    heaps, never a global sort).  At 100 TB you'd front this with an
    inverted index or `b_llm_bloom_gate`-style pre-filter; the
    brute-force scan is the correctness baseline those accelerate."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    tf = lambda term: F.size(F.filter(toks, lambda w: w == F.lit(term)))  # noqa: E731
    scored = docs.select(
        "doc_id",
        sum((tf(t) for t in SEARCH_TERMS), F.lit(0)).alias("tf_total"),
        F.size(toks).alias("n_tokens"),
        *[tf(t).alias(f"_tf_{t}") for t in SEARCH_TERMS],
    )
    hits = scored.filter(
        " AND ".join(f"_tf_{t} > 0" for t in SEARCH_TERMS)
    )
    return (
        hits.select(
            "doc_id",
            F.col("tf_total").cast("long").alias("tf_total"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
        .orderBy(F.desc("tf_total"), "doc_id")
        .limit(20)
    )


# ------------------------------------------------------------ corpus report

_CORPUS_REPORT_SQL = """
SELECT CASE WHEN grouping(lang) = 1 THEN 'ALL' ELSE lang END AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS DOUBLE)
           AS avg_chars
FROM documents
GROUP BY GROUPING SETS ((lang), ())
"""


@query("b_llm_corpus_report", _CORPUS_REPORT_SQL)
def llm_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card in one query: per-language corpus vitals
    (doc count, exact-dup count via md5 identity, source diversity,
    character volume, length extremes and mean) plus an ALL rollup
    row — the summary a training-data release publishes alongside
    the shards (`b_llm_shards`), and the first report a curation run
    (`b_llm_curation_funnel`) is compared against.

    Dialect-shared GROUPING SETS text on both engines.  Scale shape:
    ONE pass over documents; the two DISTINCTs ride Spark's standard
    expand strategy keyed on (lang, hash) — no per-language rescan;
    every emitted number is an exact integer except the closed-form
    mean.  Deeper length distribution lives in `b_llm_len_buckets`;
    near-dup (vs exact-dup) rates in `b_llm_dup_stats`."""
    register_views(spark, sf_dir)
    return spark.sql(_CORPUS_REPORT_SQL)


# -------------------------------------------------------- normalized dedup


@query(
    "b_llm_dedup_norm",
    """
    WITH normed AS (
        SELECT doc_id,
               md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                   ' +', ' ', 'g'))) AS norm_key
        FROM documents
    ),
    groups AS (
        SELECT norm_key,
               count(*) AS n_docs,
               min(doc_id) AS canonical_id
        FROM normed
        GROUP BY norm_key
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(n_docs) - count(*) AS BIGINT) AS n_norm_dups,
           CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_groups,
           CAST(max(n_docs) AS BIGINT) AS largest_group
    FROM groups
    """,
)
def llm_dedup_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized (near-exact) dedup — the standard pipeline stage
    BETWEEN byte-exact (`b_llm_dedup_exact`) and fuzzy
    (`b_llm_dedup_minhash`): lowercase, strip punctuation, collapse
    whitespace, then group on the md5 of the canonical form.  Catches
    the trivial variants (case, trailing punctuation, double spaces)
    that byte-exact misses, at exact-dedup cost — one map-side md5 +
    one groupBy, no shingles, no candidate joins.  The regexes stay
    in the character-class subset where Java and RE2 semantics
    coincide, so the canonical form — and therefore every group —
    is byte-identical across engines (min-id canonical election as
    everywhere else in the dedup family)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
                " +",
                " ",
            )
        )
    )
    groups = docs.select("doc_id", norm.alias("norm_key")).groupBy(
        "norm_key"
    ).agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_id"))
    return groups.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        (F.sum("n_docs") - F.count("*")).cast("long").alias("n_norm_dups"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_groups"),
        F.max("n_docs").cast("long").alias("largest_group"),
    )


# ---------------------------------------------------------------- BM25

#: BM25 saturation constants (Robertson et al., public).  k1 tempers
#: term-frequency saturation, b the length normalization.  Both are
#: short decimals chosen representable enough that the arithmetic
#: below stays in one fixed IEEE op order.
BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_sql() -> str:
    """DuckDB twin of :func:`llm_bm25` with the IDENTICAL op order in
    every float expression, so scores are bit-equal before the final
    e6 rounding.  The idf is the bit-quantized Lucene form — see the
    operator docstring: floor(log2(1 + odds)) computed as
    length(bin((2N + 2) DIV (2·df + 1))) - 1, exact in BIGINT."""
    tf = lambda t: f"len(list_filter(string_split(trim(text), ' '), w -> w = '{t}'))"  # noqa: E731
    per_term = []
    dfs = []
    for i, t in enumerate(SEARCH_TERMS):
        dfs.append(
            f"sum(CASE WHEN {tf(t)} > 0 THEN 1 ELSE 0 END) AS df{i}"
        )
        per_term.append(
            f"""CAST(round(
              CAST(length(bin((2 * n_docs + 2) // (2 * df{i} + 1))) - 1 AS DOUBLE)
              * (tf{i} * {BM25_K1 + 1.0}
                 / (tf{i} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * (dl / avgdl))))
              * 1000000.0) AS BIGINT)"""
        )
    return f"""
    WITH stats AS (
      SELECT count(*) AS n_docs,
             CAST(sum(len(string_split(trim(text), ' '))) AS DOUBLE)
               / count(*) AS avgdl,
             {', '.join(dfs)}
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS dl,
             {', '.join(f'{tf(t)} AS tf{i}' for i, t in enumerate(SEARCH_TERMS))}
      FROM documents
    )
    SELECT doc_id,
           {' + '.join(per_term)} AS score_e6
    FROM scored CROSS JOIN stats
    WHERE {' + '.join(f'tf{i}' for i in range(len(SEARCH_TERMS)))} > 0
    ORDER BY score_e6 DESC, doc_id
    LIMIT 20
    """


@query("b_llm_bm25", _bm25_sql())
def llm_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document ranking for the fixture query terms — the
    retrieval scorer a RAG or eval-retrieval pipeline runs at corpus
    scale, upgrading `b_llm_keyword_search`'s raw-tf ranking with
    df-weighted, length-normalized, saturated term weights.

    Determinism treatment: classic BM25's ln() is the one non-exact
    step (libm last-ulp differs between engines — the reason
    `b_llm_tfidf` uses integer-bit idf).  Raw pre-log odds are NOT a
    substitute once scores SUM over terms (sum of odds is not order-
    equivalent to sum of log-odds — rare terms would be exponentially
    overweighted), so the idf here is the BIT-QUANTIZED Lucene form:
    ``idf_bits = floor(log2(1 + (N - df + 0.5)/(df + 0.5)))``,
    computed exactly as ``length(bin((2N + 2) DIV (2·df + 1))) - 1``
    (the +1 inside the log keeps it non-negative, exactly as Lucene's
    ``ln(1 + odds)`` does; floor(log2(a DIV b)) equals
    floor(log2(a/b)) for a >= b, so the quantization error vs true
    log2 is under one bit per term and the multi-term ranking tracks
    classic BM25 up to that quantum — unlike raw odds, which distort
    it without bound).  Every remaining op (div, mul, add) is
    IEEE-exact-rounded and written in the same order on both engines,
    so scores are bit-identical and the e6 integer grid makes the
    hash stable.

    Scale shape: ONE corpus aggregation produces (N, avgdl, per-term
    df) as a single broadcast row; scoring is then a map-only pass
    (token counts in codegen, no UDF) and the top-20 rides
    TakeOrderedAndProject per-partition heaps — no global sort, no
    per-term shuffle, nothing keyed on vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    tf = lambda t: F.size(F.filter(toks, lambda w: w == F.lit(t)))  # noqa: E731
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        (F.sum(F.size(toks)).cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum(F.when(tf(t) > 0, 1).otherwise(0)).alias(f"df{i}")
            for i, t in enumerate(SEARCH_TERMS)
        ],
    )
    scored = docs.select(
        "doc_id",
        F.size(toks).cast("double").alias("dl"),
        *[tf(t).alias(f"tf{i}") for i, t in enumerate(SEARCH_TERMS)],
    ).crossJoin(F.broadcast(stats))

    def term_score(i: int):
        # floor(log2(1 + odds)) on the exact rational (2N+2)/(2df+1),
        # as bin-string length of the integer quotient — engine-stable
        # (no libm), non-negative, within one bit of Lucene's
        # ln(1+odds)/ln(2).
        idf = (
            F.length(F.bin(F.expr(f"(2 * n_docs + 2) DIV (2 * df{i} + 1)")))
            - F.lit(1)
        ).cast("double")
        sat = (F.col(f"tf{i}") * F.lit(BM25_K1 + 1.0)) / (
            F.col(f"tf{i}")
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl") / F.col("avgdl")))
        )
        return F.round(idf * sat * F.lit(1000000.0)).cast("long")

    score = sum(
        (term_score(i) for i in range(1, len(SEARCH_TERMS))),
        term_score(0),
    )
    any_tf = sum(
        (F.col(f"tf{i}") for i in range(1, len(SEARCH_TERMS))),
        F.col("tf0"),
    )
    return (
        scored.filter(any_tf > 0)
        .select("doc_id", score.alias("score_e6"))
        .orderBy(F.desc("score_e6"), "doc_id")
        .limit(20)
    )


# ------------------------------------------------------- inverted index

#: Terms reported from the index build (df-ranked head).
INV_TOP_TERMS = 20
#: Posting-list sample length per term.
INV_SAMPLE = 5


@query(
    "b_llm_inverted",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
      FROM documents
    ),
    tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
    post AS (
      SELECT term,
             CAST(count(*) AS BIGINT) AS df,
             CAST(sum(tf) AS BIGINT) AS total_tf,
             array_to_string(list_sort(list(doc_id))[1:{INV_SAMPLE}], ',')
               AS head_postings
      FROM tf
      GROUP BY term
    )
    SELECT term, df, total_tf, head_postings
    FROM post
    ORDER BY df DESC, term
    LIMIT {INV_TOP_TERMS}
    """,
)
def llm_inverted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction — the structure `b_llm_keyword_
    search`'s docstring defers to at 100 TB: per term, the document
    frequency, total term frequency, and the (sorted) head of the
    posting list.  The registered query reports the df-ranked head of
    the index; the full index is the same frame without the limit,
    written term-bucketed for point lookups.

    Scale shape: tokenization is a map-only explode; (term, doc)
    term-frequency is one shuffle keyed on the term+doc pair; the
    posting rollup groups on term.  The head sample is selected by a
    row_number window BEFORE the rollup so the collect_list holds at
    most {INV_SAMPLE} ids per term — a collect over the raw posting
    list would buffer a stopword's ENTIRE posting set in one
    aggregation buffer (unspillable, OOM at web scale), where the
    window's per-term sort spills to disk like any sort.  The sample
    is canon-safe text, so the whole build hash-checks against the
    oracle."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("term"),
    )
    tf = tok.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    w = Window.partitionBy("term").orderBy("doc_id")
    ranked = tf.withColumn("rn", F.row_number().over(w))
    post = ranked.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"),
        F.array_join(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("rn") <= INV_SAMPLE, F.col("doc_id"))
                )
            ),
            ",",
        ).alias("head_postings"),
    )
    return post.orderBy(F.desc("df"), "term").limit(INV_TOP_TERMS)
