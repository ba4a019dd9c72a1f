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
