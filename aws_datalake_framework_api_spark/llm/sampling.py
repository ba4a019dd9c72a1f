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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table

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
