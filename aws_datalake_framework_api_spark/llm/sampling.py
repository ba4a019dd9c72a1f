"""Deterministic sampling & split assignment for training corpora.

A 100 TB pipeline cannot use ``rand()`` for sampling or train/val/test
splits: task retries would resample, adding executors would change the
draw, and no other engine could reproduce the result.  The standard
fix is HASH-MOD sampling — a salted content hash of a stable key,
thresholded — which is reproducible across reruns, partitionings,
engines, and time, and composes (a doc's split never changes when the
corpus grows).

Everything here thresholds on the FIRST TWO HEX CHARS of a salted md5
(256 uniform buckets) with plain string comparison, so the DuckDB
twin is byte-identical — no hex→int conversion that would need
engine-specific functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table
from . import dedup as _dedup

SPLIT_SALT = "split-v1"

# 256 hex buckets: '00'..'cb' = 204/256 ≈ 80% train, 'cc'..'e5' = 26/256
# ≈ 10% val, rest test.  Boundaries are data-independent constants.
TRAIN_HI = "cb"
VAL_HI = "e5"

# per-language stratified keep-rate, as a bucket threshold ('ff' = keep
# all).  The mix-construction knob: upsample rare strata by keeping
# everything, downsample the dominant language.
LANG_KEEP_HI = {"en": "7f", "default": "ff"}  # en ≈ 50%, others 100%


def hash_bucket(key: Column, salt: str) -> Column:
    """2-hex-char uniform bucket of a salted stable key."""
    return F.substring(F.md5(F.concat_ws(":", F.lit(salt), key)), 1, 2)


@query(
    "b_llm_sample",
    f"""
    WITH b AS (
      SELECT doc_id, lang,
             substring(md5('{SPLIT_SALT}:' || CAST(doc_id AS VARCHAR)), 1, 2)
               AS bucket,
             CASE WHEN lang = 'en' THEN '{LANG_KEEP_HI["en"]}'
                  ELSE '{LANG_KEEP_HI["default"]}' END AS keep_hi
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN bucket <= '{TRAIN_HI}' THEN 'train'
                WHEN bucket <= '{VAL_HI}' THEN 'val'
                ELSE 'test' END AS split,
           CASE WHEN bucket <= keep_hi THEN 1 ELSE 0 END AS sampled
    FROM b
    """,
)
def llm_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible split assignment + stratified downsampling over the
    documents table: one md5 per doc, thresholded for an 80/10/10
    train/val/test split and a per-language keep flag.  Map-only, no
    shuffle, no state — the properties that make it safe to re-run on
    a 1000-executor cluster and get the identical corpus."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id").cast("string"), SPLIT_SALT)
    keep_hi = (
        F.when(F.col("lang") == "en", F.lit(LANG_KEEP_HI["en"]))
        .otherwise(F.lit(LANG_KEEP_HI["default"]))
    )
    return docs.select(
        "doc_id",
        "lang",
        F.when(bucket <= TRAIN_HI, "train")
        .when(bucket <= VAL_HI, "val")
        .otherwise("test")
        .alias("split"),
        F.when(bucket <= keep_hi, 1).otherwise(0).alias("sampled"),
    )


# ----------------------------------------------------------- domain mixture

MIX_SALT = "mix-v1"

#: instr() needle shared by both engines: maps a lowercase hex char to
#: its value+1, so ``instr(_HEX, c) - 1`` is an exact hex-digit decode
#: with no engine-specific hex→int cast.
_HEX = "0123456789abcdef"


def _bucket256_sql(key_sql: str, salt: str) -> str:
    """DuckDB twin of the 0..255 bucket decode."""
    m = f"md5('{salt}:' || {key_sql})"
    return (
        f"(instr('{_HEX}', substring({m}, 1, 1)) - 1) * 16"
        f" + instr('{_HEX}', substring({m}, 2, 1)) - 1"
    )


@query(
    "b_llm_mix",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split(trim(text), ' ')) AS n_tok,
             {_bucket256_sql("CAST(doc_id AS VARCHAR)", MIX_SALT)} AS idx
      FROM documents
    ),
    tot AS (
      SELECT lang, CAST(sum(n_tok) AS BIGINT) AS lang_tokens
      FROM t GROUP BY lang
    ),
    mn AS (SELECT min(lang_tokens) AS min_tokens FROM tot)
    SELECT t.lang,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN idx * lang_tokens < 256 * min_tokens
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN idx * lang_tokens < 256 * min_tokens
                         THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens
    FROM t JOIN tot USING (lang) CROSS JOIN mn
    GROUP BY t.lang
    """,
)
def llm_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: downsample every language stratum to
    the smallest stratum's token budget, deterministically.

    The mixture knob real pretraining runs turn ("N% code, equal
    parts per language, …") reduces to: per-stratum keep-probability
    p_l = min_tokens / lang_tokens, applied as a salted hash-mod
    threshold so the draw is rerun/engine/scale-stable (same argument
    as :func:`llm_sample`).  The comparison is the exact integer
    cross-multiplication ``bucket·lang_tokens < 256·min_tokens`` —
    no float probability is ever materialized.

    Scale shape: one map-only pass computes tokens + bucket; one
    groupBy(lang) builds the stratum table (strata cardinality is
    tiny — it BROADCASTS at any corpus size, so the per-doc keep
    decision joins without shuffling the corpus); the final stats are
    one more groupBy(lang).  The corpus is scanned once, shuffled
    never (map-side partial aggs only)."""
    docs = load_table(spark, sf_dir, "documents")
    b2 = hash_bucket(F.col("doc_id").cast("string"), MIX_SALT)
    t = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tok"),
        b2.alias("bucket2"),
    ).withColumn(
        "idx",
        (F.expr(f"instr('{_HEX}', substring(bucket2, 1, 1))") - 1) * 16
        + F.expr(f"instr('{_HEX}', substring(bucket2, 2, 1))")
        - 1,
    )
    tot = t.groupBy("lang").agg(F.sum("n_tok").alias("lang_tokens"))
    mn = tot.agg(F.min("lang_tokens").alias("min_tokens"))
    keep = F.col("idx") * F.col("lang_tokens") < 256 * F.col("min_tokens")
    return (
        t.join(F.broadcast(tot.crossJoin(mn)), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(keep, F.col("n_tok")).otherwise(0)).alias("kept_tokens"),
        )
    )


# ------------------------------------------------------------ epoch shuffle

SHUFFLE_SALT = "shuffle-epoch0"  # new epoch = new salt: a fresh permutation
SHUFFLE_SHARDS = 16  # one hex digit; scale knob — use 2+ digits for more


@query(
    "b_llm_shuffle",
    f"""
    WITH k AS (
      SELECT doc_id,
             md5('{SHUFFLE_SALT}:' || CAST(doc_id AS VARCHAR)) AS key,
             instr('{_HEX}',
                   substring(md5('{SHUFFLE_SALT}:' || CAST(doc_id AS VARCHAR)),
                             1, 1)) - 1 AS shard
      FROM documents
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY key) - 1
                AS BIGINT) AS pos
    FROM k
    """,
)
def llm_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle → (shard, pos).

    Pretraining wants each epoch to visit documents in a fresh
    pseudo-random order, reproducibly.  Sorting 100 TB globally to get
    one is the anti-pattern — a total order forces a range-partition
    sort of the whole corpus.  The standard decomposition: the salted
    md5 key IS the permutation; its first hex digit hash-PARTITIONS
    docs into shards (uniform by construction, no skew possible), and
    only WITHIN a shard is order materialized (``row_number`` per
    shard = per-partition local sorts after one hash shuffle).  A
    reader that interleaves shards round-robin by ``pos`` replays the
    full permutation without any node ever seeing a global sort.
    New epoch = new salt — no reshuffling state, nothing stored.

    Scale: one hash shuffle on a perfectly uniform key + local sorts;
    shard count is a constant knob (one more hex digit per 16×)."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(
        F.concat_ws(":", F.lit(SHUFFLE_SALT), F.col("doc_id").cast("string"))
    )
    k = docs.select("doc_id", key.alias("key")).withColumn(
        "shard",
        (F.expr(f"instr('{_HEX}', substring(key, 1, 1))") - 1).cast("long"),
    )
    w = Window.partitionBy("shard").orderBy("key")
    return k.select(
        "doc_id",
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    )


# ---------------------------------------------------------------- packing


SEQ_LEN = 512  # token budget per packed sequence
PACK_SHARDS = 16  # packing parallelism: sequences never cross a shard


@query(
    "b_llm_pack",
    f"""
    WITH t AS (
      SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
             len(string_split(trim(text), ' ')) AS n_tok
      FROM documents
    ),
    packed AS (
      SELECT doc_id, shard, n_tok,
             CAST((sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) - n_tok)
                  // {SEQ_LEN} AS BIGINT) AS seq_in_shard
      FROM t
    )
    SELECT shard, seq_in_shard,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS seq_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM packed
    GROUP BY shard, seq_in_shard
    """,
)
def llm_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget
    training sequences by running token count — greedy first-fit in
    stable doc_id order, the standard pretraining packing scheme.

    Scale shape: a GLOBAL running sum would serialize the corpus
    through one window partition, so packing runs per SHARD
    (``doc_id % PACK_SHARDS``) and sequences never cross shards —
    the same contract that lets 1000 executors pack 1000 shards
    independently (shard count scales with the corpus; boundaries
    stay deterministic).  One window + one groupBy, both on the shard
    key; all outputs exact ints."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    t = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = t.withColumn(
        "seq_in_shard",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / SEQ_LEN),
    )
    return packed.groupBy("shard", "seq_in_shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------- leakage-safe split

LEAKAGE_SALT = "split-leakage-v1"

_LEAKAGE_SQL = (
    _dedup._FUZZY_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
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
    cc AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a)
    SELECT doc_id, cluster_id,
           CASE WHEN bucket <= '{TRAIN_HI}' THEN 'train'
                WHEN bucket <= '{VAL_HI}' THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id, cluster_id,
             substring(md5('{LEAKAGE_SALT}:' || CAST(cluster_id AS VARCHAR)),
                       1, 2) AS bucket
      FROM cc
    )
"""
)


@query("b_llm_split_leakage", _LEAKAGE_SQL)
def llm_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the hash-mod split key is the
    near-dup CLUSTER id, not the doc id, so two near-duplicate
    documents can never land on opposite sides of a split boundary —
    the eval-contamination mode a doc-keyed split
    (:func:`llm_sample`) cannot prevent, because a near-dup pair in
    train and test leaks the answer without any id collision.

    Composition: the md5-minhash pair graph (``b_llm_dedup_fuzzy``) →
    connected components (the ``b_llm_dedup_clusters`` machinery) →
    the SAME 80/10/10 salted-md5 bucket thresholds as the doc-keyed
    split, applied to ``cluster_id``.  Singleton docs are their own
    cluster, so the unclustered corpus splits exactly like
    :func:`llm_sample` would — the cluster key only changes the
    outcome where it must.

    Scale: adds nothing beyond the cluster formation it reuses — the
    split assignment itself is one broadcast-free map over the label
    frame.  tests/test_llm_ops.py proves the invariant (no fuzzy pair
    straddles splits) and that a doc-keyed split DOES straddle on the
    same data (the exhibit is non-vacuous)."""
    pairs = _dedup._fuzzy_pairs_df(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    cc = _dedup.connected_components(docs, pairs)
    bucket = hash_bucket(F.col("cluster_id").cast("string"), LEAKAGE_SALT)
    return cc.select(
        "doc_id",
        "cluster_id",
        F.when(bucket <= TRAIN_HI, "train")
        .when(bucket <= VAL_HI, "val")
        .otherwise("test")
        .alias("split"),
    )


# ------------------------------------------------- capped-epoch upsampling

EPOCH_CAP = 4  # data-constrained recipe: repeat rare strata at most 4x
MIX_EPOCH_SALT = "mix-epochs-v1"


@query(
    "b_llm_mix_epochs",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split(trim(text), ' ')) AS n_tok,
             {_bucket256_sql("CAST(doc_id AS VARCHAR)", MIX_EPOCH_SALT)} AS idx
      FROM documents
    ),
    tot AS (
      SELECT lang, CAST(sum(n_tok) AS BIGINT) AS lang_tokens
      FROM t GROUP BY lang
    ),
    mx AS (SELECT max(lang_tokens) AS target_tokens FROM tot),
    e AS (
      SELECT lang, lang_tokens,
             CASE WHEN lang_tokens * {EPOCH_CAP} <= target_tokens
                  THEN {EPOCH_CAP}
                  ELSE target_tokens // lang_tokens END AS epochs,
             target_tokens FROM tot CROSS JOIN mx
    )
    SELECT t.lang,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(max(epochs) AS BIGINT) AS epochs,
           CAST(sum(CASE WHEN epochs < {EPOCH_CAP}
                          AND idx * lang_tokens
                              < 256 * (target_tokens - epochs * lang_tokens)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_extra_docs,
           CAST(max(epochs) * sum(n_tok)
                + sum(CASE WHEN epochs < {EPOCH_CAP}
                            AND idx * lang_tokens
                                < 256 * (target_tokens - epochs * lang_tokens)
                           THEN n_tok ELSE 0 END) AS BIGINT) AS emitted_tokens
    FROM t JOIN e USING (lang)
    GROUP BY t.lang
    """,
)
def llm_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped-epoch UPSAMPLING — the mirror image of the downsampling
    mixture (:func:`llm_mix`): bring every language stratum up toward
    the LARGEST stratum's token budget by integer repetition (epochs),
    capped at {EPOCH_CAP} epochs so rare domains are never memorized
    into the model — the standard data-constrained scaling recipe.

    Per stratum: ``epochs = min(CAP, target // lang_tokens)`` whole
    passes, plus a fractional top-up epoch selected by the same
    integer cross-multiplied hash-mod threshold as every sampler here
    (``idx·lang_tokens < 256·(target − epochs·lang_tokens)``) — no
    float probability, rerun/engine-stable.  The top-up is an
    INDEPENDENT per-doc hash-Bernoulli draw, so for uncapped strata
    the emitted token total matches the target in expectation with
    binomial wobble (not within-one-doc exactness — an exact top-up
    would need ranked cumulative token sums, the
    ``b_llm_sample_exact`` two-level top-K machinery).

    Scale shape: identical to :func:`llm_mix` — one map-only corpus
    pass, a tiny broadcastable stratum table, map-side aggregation;
    the corpus never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    b2 = hash_bucket(F.col("doc_id").cast("string"), MIX_EPOCH_SALT)
    t = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tok"),
        b2.alias("bucket2"),
    ).withColumn(
        "idx",
        (F.expr(f"instr('{_HEX}', substring(bucket2, 1, 1))") - 1) * 16
        + F.expr(f"instr('{_HEX}', substring(bucket2, 2, 1))")
        - 1,
    )
    tot = t.groupBy("lang").agg(F.sum("n_tok").alias("lang_tokens"))
    mx = tot.agg(F.max("lang_tokens").alias("target_tokens"))
    e = tot.crossJoin(mx).select(
        "lang",
        "lang_tokens",
        "target_tokens",
        F.when(F.col("lang_tokens") * EPOCH_CAP <= F.col("target_tokens"), EPOCH_CAP)
        .otherwise(F.floor(F.col("target_tokens") / F.col("lang_tokens")))
        .cast("long")
        .alias("epochs"),
    )
    extra = (F.col("epochs") < EPOCH_CAP) & (
        F.col("idx") * F.col("lang_tokens")
        < 256 * (F.col("target_tokens") - F.col("epochs") * F.col("lang_tokens"))
    )
    return (
        t.join(F.broadcast(e), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.max("epochs").alias("epochs"),
            F.sum(F.when(extra, 1).otherwise(0)).alias("n_extra_docs"),
            (
                F.max("epochs") * F.sum("n_tok")
                + F.sum(F.when(extra, F.col("n_tok")).otherwise(0))
            ).alias("emitted_tokens"),
        )
    )


# ------------------------------------------------ contrastive pair mining

#: Salt for the deterministic negative draw.  The draw is the first 15
#: hex chars of a salted md5 (60 bits, always positive, < 2^63) taken
#: mod corpus size — overflow-free at ANY doc_id (the previous Knuth
#: multiply overflowed BIGINT for doc_a ≳ 3.5e9, ADVICE r3) and
#: bit-identical in both engines.
_NEG_SALT = "contrastive-neg-v1"


_CONTRASTIVE_SQL = (
    _dedup._FUZZY_CTE
    + f""",
    n AS (SELECT count(*) AS n_docs FROM documents),
    raw AS (
      SELECT doc_a AS anchor, doc_b AS positive, jaccard,
             CAST(('0x' || substr(md5('{_NEG_SALT}:' || CAST(doc_a AS VARCHAR)),
                                  1, 15)) AS BIGINT) % n_docs AS neg0,
             n_docs
      FROM fuzzy_pairs CROSS JOIN n
    ),
    step AS (
      SELECT anchor, positive, jaccard, n_docs,
             CASE WHEN neg0 = anchor OR neg0 = positive
                  THEN (neg0 + 1) % n_docs ELSE neg0 END AS neg1
      FROM raw
    )
    SELECT anchor, positive,
           CASE WHEN neg1 = anchor OR neg1 = positive
                THEN (neg1 + 1) % n_docs ELSE neg1 END AS negative,
           jaccard
    FROM step
"""
)


@query("b_llm_contrastive", _CONTRASTIVE_SQL)
def llm_contrastive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair mining for embedding-model training data:
    every near-dup pair becomes an (anchor, positive) example, and a
    deterministic pseudo-random corpus document becomes the negative —
    the (a, p, n) triple shape contrastive/embedding losses consume.

    The negative draw is a salted md5 prefix (60 bits, positive,
    overflow-free at any doc_id) mod corpus size, with two CASE steps
    to walk off collisions with the anchor/positive — two steps
    suffice because at most two ids are excluded.  No ``rand()``: the
    triple set is rerun/engine/scale-stable like every sampler here,
    and the oracle runs the identical arithmetic.  (Production
    hard-negative mining would rerank negatives by embedding distance
    — that composes with the ANN ops; this op pins the
    deterministic-triple plumbing.)

    ASSUMPTION: doc_ids are dense 0-based (true of this fixture and
    of the row-number ids a packing/ingest stage assigns), so a draw
    in [0, n_docs) IS a document id.  On sparse ids, compose with a
    rank-join (zipWithIndex-style) to map draw → id first.

    Scale: built entirely on the fuzzy-pair output (no new corpus
    pass); the corpus-count scalar broadcasts."""
    pairs = _dedup._fuzzy_pairs_df(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.select(F.count("*").alias("n_docs"))
    neg_hash = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{_NEG_SALT}:"), F.col("doc_a").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    raw = pairs.crossJoin(F.broadcast(n_docs)).select(
        F.col("doc_a").alias("anchor"),
        F.col("doc_b").alias("positive"),
        "jaccard",
        (neg_hash % F.col("n_docs")).alias("neg0"),
        "n_docs",
    )
    hit = lambda c: (F.col(c) == F.col("anchor")) | (F.col(c) == F.col("positive"))  # noqa: E731
    step = raw.withColumn(
        "neg1",
        F.when(hit("neg0"), (F.col("neg0") + 1) % F.col("n_docs")).otherwise(
            F.col("neg0")
        ),
    )
    return step.select(
        "anchor",
        "positive",
        F.when(hit("neg1"), (F.col("neg1") + 1) % F.col("n_docs"))
        .otherwise(F.col("neg1"))
        .alias("negative"),
        "jaccard",
    )


# ------------------------------------------------ length-bucket curriculum

N_LEN_BUCKETS = 4  # quartiles; one boundary per 25%


_LEN_BUCKETS_SQL = f"""
    WITH t AS (
      SELECT doc_id, len(string_split(trim(text), ' ')) AS n_tok
      FROM documents
    ),
    b AS (
      SELECT {", ".join(
          f"quantile_cont(n_tok, {k / N_LEN_BUCKETS}) AS q{k}"
          for k in range(1, N_LEN_BUCKETS)
      )}
      FROM t
    )
    SELECT t.doc_id, t.n_tok,
           CASE
             WHEN t.n_tok <= b.q1 THEN 0
             WHEN t.n_tok <= b.q2 THEN 1
             WHEN t.n_tok <= b.q3 THEN 2
             ELSE 3
           END AS bucket
    FROM t CROSS JOIN b
"""


@query("b_llm_len_buckets", _LEN_BUCKETS_SQL)
def llm_len_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum length-binning: assign every document its corpus
    token-length quartile — the bucketing a curriculum schedule or a
    length-balanced batch sampler consumes.

    The WRONG way at scale is ``ntile`` over a global ORDER BY — a
    full range-partition sort of the corpus to compute four labels.
    Instead: one exact-percentile aggregation produces the 3 boundary
    scalars (exact, not approx, because token LENGTHS have bounded
    distinct cardinality — counting-style aggregation stays cheap at
    any corpus size), the 1-row boundary frame broadcasts, and the
    bucket label is a map-only CASE — the corpus is scanned once and
    never shuffled.  Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` share the lerp definition (proven bit-identical
    by ``b_agg_quantiles``), and int-vs-boundary comparisons inherit
    that parity."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tok")
    )
    b = t.agg(
        *[
            F.expr(f"percentile(n_tok, {k / N_LEN_BUCKETS})").alias(f"q{k}")
            for k in range(1, N_LEN_BUCKETS)
        ]
    )
    bucket = (
        F.when(F.col("n_tok") <= F.col("q1"), 0)
        .when(F.col("n_tok") <= F.col("q2"), 1)
        .when(F.col("n_tok") <= F.col("q3"), 2)
        .otherwise(3)
    )
    return t.crossJoin(F.broadcast(b)).select("doc_id", "n_tok", bucket.alias("bucket"))


# --------------------------------------------- exact-count stratified sample

EXACT_CAP = 50  # exactly this many docs per stratum (or all, if fewer)
EXACT_SALT = "exact-sample-v1"
_TOPK_SHARDS = 64  # level-1 parallelism for the distributed top-K


@query(
    "b_llm_sample_exact",
    f"""
    SELECT doc_id, lang, rank FROM (
      SELECT doc_id, lang,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('{EXACT_SALT}:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS BIGINT) AS rank
      FROM documents
    ) WHERE rank <= {EXACT_CAP}
    """,
)
def llm_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-COUNT stratified sampling: exactly min({EXACT_CAP}, n)
    documents per language, selected as the {EXACT_CAP} smallest
    salted-md5 hashes — the deterministic replacement for a reservoir
    sample when the contract is a hard per-stratum budget, which a
    rate-based hash-mod draw (:func:`llm_sample`) only hits in
    expectation (± binomial noise).

    Scale shape — the naive form is a skew trap: ``row_number() OVER
    (PARTITION BY lang)`` funnels each stratum through ONE reducer,
    and at 100 TB the dominant language is most of the corpus.  So
    the engine runs the classic two-level distributed top-K: level 1
    takes a local top-{EXACT_CAP} within (lang, shard) across
    {_TOPK_SHARDS} deterministic shards — {_TOPK_SHARDS}× the
    parallelism, bounded output of shards×cap rows per stratum —
    and level 2 re-ranks only those ≤ {_TOPK_SHARDS}·{EXACT_CAP}
    survivors per stratum.  The result is provably the same exact
    top-{EXACT_CAP} (any global top-K survives every local top-K
    containing it), so the oracle can stay the one-window naive form
    while the engine runs the skew-safe plan."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(
        F.concat_ws(":", F.lit(EXACT_SALT), F.col("doc_id").cast("string"))
    )
    rows = docs.select(
        "doc_id",
        "lang",
        key.alias("k"),
        F.pmod(F.col("doc_id"), F.lit(_TOPK_SHARDS)).alias("shard"),
    )
    w1 = Window.partitionBy("lang", "shard").orderBy("k", "doc_id")
    survivors = (
        rows.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= EXACT_CAP)
        .drop("r1", "shard")
    )
    w2 = Window.partitionBy("lang").orderBy("k", "doc_id")
    return (
        survivors.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= EXACT_CAP)
        .select("doc_id", "lang", "rank")
    )


# ------------------------------------------------------------ shard writer

#: Output shards for the packed corpus (a real run uses thousands).
OUT_SHARDS = 8
#: Largest/smallest shard token ratio the balance flag tolerates, ×100.
SHARD_BALANCE_PCT = 120


@query(
    "b_llm_shards",
    f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split(trim(text), ' ')) AS n_tok
      FROM documents
    ),
    assigned AS (
      SELECT doc_id, n_tok,
             (row_number() OVER (ORDER BY n_tok DESC, doc_id) - 1)
               % {OUT_SHARDS} AS shard
      FROM t
    ),
    s AS (
      SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tokens
      FROM assigned GROUP BY shard
    ),
    b AS (SELECT max(tokens) AS mx, min(tokens) AS mn FROM s)
    SELECT CAST(shard AS BIGINT) AS shard, n_docs, tokens,
           CAST((SELECT CASE WHEN mx * 100 <= mn * {SHARD_BALANCE_PCT}
                             THEN 1 ELSE 0 END FROM b) AS INT) AS balanced
    FROM s
    """,
)
def llm_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced output-shard manifest — the LAST step of a training-
    data pipeline: assign every document to one of ``OUT_SHARDS``
    output files such that shard token totals are near-equal (data
    loaders stream shards round-robin; a fat shard straggles every
    epoch).  Assignment is ranked round-robin — docs ordered by token
    count descending, shard = rank mod N — the classic LPT-flavored
    greedy that bounds imbalance by one max-document per shard; the
    ``balanced`` flag pins max/min ≤ {SHARD_BALANCE_PCT}% in exact
    integer cross-multiplication.

    Scale shape — EXACT two-level global rank, no single-partition
    corpus sort: rank(doc) decomposes as (number of docs with a
    strictly larger n_tok) + (row_number among same-n_tok docs by
    doc_id).  The first term is a running sum over the DISTINCT
    n_tok values — a bounded rollup (distinct document lengths, not
    documents) that broadcasts back — and the second is a window
    PARTITIONED by n_tok, so the sort parallelizes across length
    groups instead of funneling every document through one task
    (Spark's WindowExec warns on exactly that).  Identical output to
    the naive global window — the oracle keeps the single-window SQL
    and the hashes must match.  Residual skew: the heaviest length
    group bounds a task; document lengths spread over thousands of
    values, and a pathological single-length corpus degrades to the
    naive shape, never below it.  Output is OUT_SHARDS rows no
    matter the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tok")
    )
    # docs-with-larger-n_tok prefix counts: distinct-length rollup,
    # bounded by |distinct lengths| — the only unpartitioned window,
    # over rollup-sized data.
    len_w = (
        Window.orderBy(F.desc("n_tok"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix = (
        t.groupBy("n_tok")
        .agg(F.count("*").alias("n_here"))
        .select(
            "n_tok",
            (F.sum("n_here").over(len_w) - F.col("n_here")).alias("n_ahead"),
        )
    )
    in_len_w = Window.partitionBy("n_tok").orderBy(F.asc("doc_id"))
    assigned = t.join(F.broadcast(prefix), "n_tok").select(
        "n_tok",
        F.pmod(
            F.col("n_ahead") + F.row_number().over(in_len_w) - 1,
            F.lit(OUT_SHARDS),
        ).alias("shard"),
    )
    s = assigned.groupBy("shard").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").cast("long").alias("tokens")
    )
    b = s.agg(F.max("tokens").alias("mx"), F.min("tokens").alias("mn"))
    return s.crossJoin(F.broadcast(b)).select(
        F.col("shard").cast("long").alias("shard"),
        "n_docs",
        "tokens",
        (F.col("mx") * 100 <= F.col("mn") * SHARD_BALANCE_PCT)
        .cast("int")
        .alias("balanced"),
    )


# -------------------------------------------------------- SFT formatting

#: Token budget for an assembled SFT record (whitespace tokens of the
#: rendered string, template overhead included).
SFT_MAX_TOKENS = 160


@query(
    "b_llm_sft_format",
    f"""
    SELECT doc_id,
           rendered_tokens,
           CAST(md5(rendered) AS VARCHAR) AS rendered_md5
    FROM (SELECT doc_id,
                 '<|system|>summarize<|user|>' || text
                     || '<|assistant|>' || upper(substr(text, 1, 40)) AS rendered,
                 CAST(len(string_split(
                     '<|system|>summarize<|user|>' || text
                     || '<|assistant|>' || upper(substr(text, 1, 40)), ' '))
                     AS BIGINT) AS rendered_tokens
          FROM documents
          WHERE doc_id % 5 = 0) AS t
    WHERE rendered_tokens <= {SFT_MAX_TOKENS}
    """,
)
def llm_sft_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT record assembly — the post-training data-prep step after
    the pretraining pipeline: render each sampled document into a
    chat-template string (system + user + assistant segments; the
    'assistant' span here is a deterministic transform of the doc so
    the fixture needs no second table), count the RENDERED tokens
    (template overhead included — budgeting the raw text undercounts
    every record by the template length), and drop records over the
    sequence budget.  Emitting md5(rendered) rather than the string
    keeps the driver canon small while still pinning every rendered
    BYTE against the oracle — a template drift of one character fails
    the hash.

    Scale shape: map-only string assembly in codegen + a scan-level
    sampling predicate; no shuffle at all.  Downstream, records flow
    into the SAME packing/sharding path as pretraining data
    (`b_llm_pack`, `b_llm_shards`)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    rendered = F.concat(
        F.lit("<|system|>summarize<|user|>"),
        F.col("text"),
        F.lit("<|assistant|>"),
        F.upper(F.substring("text", 1, 40)),
    )
    out = docs.select(
        "doc_id",
        F.size(F.split(rendered, " ")).cast("long").alias("rendered_tokens"),
        F.md5(rendered).alias("rendered_md5"),
    )
    return out.filter(F.col("rendered_tokens") <= SFT_MAX_TOKENS)


# -------------------------------------------------------- preference pairs

#: Quality margin (integer token-count proxy) a chosen/rejected pair
#: must clear, and the per-source pair cap.
DPO_MARGIN = 20
DPO_PER_SOURCE = 8


@query(
    "b_llm_pref_pairs",
    f"""
    WITH scored AS (
        SELECT doc_id, source,
               CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS q
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, source, q,
               row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id)
                   AS r_top,
               row_number() OVER (PARTITION BY source ORDER BY q ASC, doc_id)
                   AS r_bot
        FROM scored
    )
    SELECT t.source,
           t.doc_id AS chosen_id,
           b.doc_id AS rejected_id,
           CAST(t.q - b.q AS BIGINT) AS margin
    FROM (SELECT * FROM ranked WHERE r_top <= {DPO_PER_SOURCE}) t
    JOIN (SELECT * FROM ranked WHERE r_bot <= {DPO_PER_SOURCE}) b
      ON t.source = b.source AND t.r_top = b.r_bot
    WHERE t.q - b.q >= {DPO_MARGIN}
    """,
)
def llm_pref_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair mining (DPO/RLHF data prep): within each
    source, pair the top-k documents by quality signal against the
    bottom-k (rank-matched: best-vs-worst, 2nd-best-vs-2nd-worst, …)
    and keep pairs whose margin clears the threshold — the standard
    recipe when preferences are derived from a scalar judge score
    rather than human labels.  The quality signal here is the
    integer token count (deterministic stand-in for a model score;
    the real pipeline swaps ONE column).

    Scale discipline: rank-matching makes pair count ≤ k per source
    (never the k² all-pairs cross), both row_numbers share one
    source-keyed window partition, and the join keys on (source,
    rank) — rollup-sized.  Full-key tiebreaks (doc_id) keep the
    ranking deterministic under equal scores."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("q"),
    )
    w_top = Window.partitionBy("source").orderBy(F.desc("q"), "doc_id")
    w_bot = Window.partitionBy("source").orderBy(F.asc("q"), "doc_id")
    ranked = scored.select(
        "doc_id", "source", "q",
        F.row_number().over(w_top).alias("r_top"),
        F.row_number().over(w_bot).alias("r_bot"),
    )
    top = ranked.filter(F.col("r_top") <= DPO_PER_SOURCE).select(
        F.col("source"), F.col("doc_id").alias("chosen_id"),
        F.col("q").alias("q_top"), F.col("r_top").alias("rk"),
    )
    bot = ranked.filter(F.col("r_bot") <= DPO_PER_SOURCE).select(
        F.col("source").alias("b_source"), F.col("doc_id").alias("rejected_id"),
        F.col("q").alias("q_bot"), F.col("r_bot").alias("rk_b"),
    )
    pairs = top.join(
        bot,
        (top.source == bot.b_source) & (top.rk == bot.rk_b),
    )
    return pairs.filter(
        F.col("q_top") - F.col("q_bot") >= DPO_MARGIN
    ).select(
        "source",
        "chosen_id",
        "rejected_id",
        (F.col("q_top") - F.col("q_bot")).cast("long").alias("margin"),
    )


# ------------------------------------------------------- span masking

#: One-in-MASK_MOD tokens is replaced by the sentinel (BERT/T5-style
#: denoising prep).  The decision hashes (token ‖ doc_id), so it is
#: content-keyed — reproducible on any engine/partitioning, and the
#: same token masks differently in different documents.
MASK_MOD = 5
MASK_SENTINEL = "<mask>"


@query(
    "b_llm_mask_spans",
    f"""
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(masked, t -> t = '{MASK_SENTINEL}')) AS BIGINT)
               AS n_masked,
           CAST(md5(array_to_string(masked, ' ')) AS VARCHAR) AS masked_md5
    FROM (SELECT doc_id, toks,
                 list_transform(toks,
                     t -> CASE WHEN CAST(('0x' || substr(
                                   md5(t || CAST(doc_id AS VARCHAR)), 1, 4))
                                   AS INTEGER) % {MASK_MOD} = 0
                               THEN '{MASK_SENTINEL}' ELSE t END) AS masked
          FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks
                FROM documents
                WHERE doc_id % 10 = 0)) AS m
    """,
)
def llm_mask_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked-token corruption prep (the BERT/T5 denoising input
    pipeline): replace a content-keyed ~1/5 of each document's tokens
    with the sentinel and emit the masked text's md5 + mask counts.
    The mask decision hashes (token ‖ doc_id) — position-free, so
    both engines express it as a pure ``transform`` lambda over the
    token array (no posexplode / list-index divergence), and it is
    deterministic across runs, partitions, and engines; the md5 pins
    the entire masked rendering byte-for-byte.

    Scale shape: split + transform + filter + concat run INSIDE the
    array functions — one codegen'd map pass over the sampled docs,
    zero shuffles, no UDF.  A real pipeline would emit (masked,
    target-span) pairs; the target side is the complementary filter
    of the same lambda."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    toks = F.split(F.trim(F.col("text")), " ")

    def mask(t):
        h = F.conv(
            F.substring(F.md5(F.concat(t, F.col("doc_id").cast("string"))), 1, 4),
            16,
            10,
        ).cast("int")
        return F.when(h % MASK_MOD == 0, F.lit(MASK_SENTINEL)).otherwise(t)

    masked = F.transform(toks, mask)
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.filter(masked, lambda t: t == F.lit(MASK_SENTINEL)))
        .cast("long")
        .alias("n_masked"),
        F.md5(F.concat_ws(" ", masked)).alias("masked_md5"),
    )


# ------------------------------------------------------- weighted sampling

WEIGHTED_SALT = "wsample-v1"

#: 32-bit uniform from the first 8 md5 hex chars.  The keep test is
#: the integer cross-multiplication ``u32 * max_w < weight * 2^32``;
#: with u32 < 2^32 both products stay below 2^63 for any
#: max_w < 2^31 — i.e. for ANY realistic document length (a 48-bit
#: uniform would silently wrap the signed-64-bit product as soon as
#: one document reaches 32 KiB, since 2^48 * 2^15 = 2^63).
_U32 = 4294967296  # 2^32


@query(
    "b_llm_sample_weighted",
    f"""
    WITH w AS (
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
             CAST(concat('0x',
               substring(md5('{WEIGHTED_SALT}:' || CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) AS u32
      FROM documents
    ),
    mx AS (SELECT max(weight) AS max_w FROM w)
    SELECT doc_id, lang, weight,
           CASE WHEN u32 * max_w < weight * {_U32} THEN 1 ELSE 0 END AS sampled
    FROM w CROSS JOIN mx
    """,
)
def llm_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional Bernoulli downsampling: each doc is kept
    with probability weight/max_weight (weight = n_chars here; in a
    real pipeline a quality or domain score) — the importance-sampling
    primitive behind quality-weighted corpus construction (heavier
    docs survive proportionally more often), kept fully deterministic
    and EXACT: the keep test is the integer cross-multiplication
    ``u32 * max_w < weight * 2^32`` on a salted-md5 32-bit uniform, so
    there is no float probability anywhere and the same doc gets the
    same verdict on any engine, partitioning, or rerun.  The uniform
    is 32-bit ON PURPOSE: both cross-products then stay below 2^63
    for any max_w < 2^31, where a 48-bit uniform would overflow the
    signed product (non-ANSI Spark wraps silently) once any document
    reaches 32 KiB.  (The top-k
    variant of weighted sampling — Efraimidis-Spirakis exponential
    keys — needs ln(u); this threshold form is the libm-free exhibit,
    and `b_llm_sample_exact` covers exact-count selection.)

    Scale shape: the max-weight aggregate is one broadcast row; the
    verdict pass is map-only codegen (md5 + integer compare), no
    shuffle, no state — rerunnable on 1000 executors with identical
    output."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("weight"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(WEIGHTED_SALT), F.col("doc_id").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("u32"),
    )
    mx = w.agg(F.max("weight").alias("max_w"))
    return w.crossJoin(F.broadcast(mx)).select(
        "doc_id",
        "lang",
        "weight",
        F.when(
            F.col("u32") * F.col("max_w") < F.col("weight") * F.lit(_U32), 1
        )
        .otherwise(0)
        .alias("sampled"),
    )
