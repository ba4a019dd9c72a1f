"""Lake-scale MERGE (upsert) on a partitioned parquet table
(SURVEY.md §2 B1 extension; complements :mod:`..txlog`).

The catalog's txlog handles METADATA-scale mutations; this module is
the 100 TB side of the north star's MERGE story: upserting a change
batch into a partitioned LAKE table.  The scale-correct cost model —
what Delta/Iceberg MERGE compiles to under the hood — is:

1. **identify touched partitions** from the (small) update batch — a
   broadcast semi-join against the target, never a full-table rewrite
   plan;
2. **rewrite only those partitions**: read them (partition-pruned
   scan), left-join the broadcast batch to apply updates, union the
   inserts;
3. **commit via dynamic partition overwrite**
   (``partitionOverwriteMode=dynamic``): Spark replaces exactly the
   partitions present in the written frame — untouched partitions'
   files are never read, rewritten, or deleted.

On a 100 TB table where a daily batch touches 1% of partitions, this
is the difference between rewriting 1 TB and rewriting 100 TB.  The
exhibit runs the REAL thing end-to-end on a scratch copy: stage the
fixture's orders table partitioned by ``o_orderstatus``, merge a
deterministic update+insert batch (price bumps on ``key % 97 == 0``;
brand-new rows with a NEW status value — so dynamic overwrite must
also CREATE a partition), read the merged table back, and return a
per-partition verification aggregate the DuckDB oracle recomputes
from the same deterministic rule.  All money math in integer cents.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from .readers import load_table

#: update rule constants — shared by the Spark path and the oracle
UPD_MOD = 97          # keys getting a price bump
INS_MOD = 293         # keys spawning a brand-new inserted row
BUMP_CENTS = 100000   # +1000.00 per updated row
KEY_OFFSET = 10_000_000_000  # insert key namespace (beyond any SF's keys)
INS_STATUS = "N"      # inserts land in a NEW partition

#: staged partitioned templates, one per (session-ish process, sf_dir)
_LAKE_TMPL: dict[str, str] = {}


def _tracked_tmp(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _orders_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"),
    )


def _staged_target(spark: SparkSession, sf_dir: str) -> str:
    """Write the orders table partitioned by o_orderstatus ONCE per
    (process, sf); each merge call gets a cheap file-level clone (the
    merge MUTATES its target, so runs must not share one — and must
    not double-apply bumps on rerun)."""
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    if key not in _LAKE_TMPL:
        tmpl = _tracked_tmp(f"spark_graft_lake_tmpl_{key}_")
        _orders_cents(spark, sf_dir).write.mode("overwrite").partitionBy(
            "o_orderstatus"
        ).parquet(tmpl)
        _LAKE_TMPL[key] = tmpl
    clone = _tracked_tmp(f"spark_graft_lake_{key}_")
    shutil.rmtree(clone)
    shutil.copytree(_LAKE_TMPL[key], clone)
    return clone


def lake_upsert(spark: SparkSession, sf_dir: str) -> str:
    """Run the MERGE against a fresh clone of the staged target;
    returns the merged table's path.  This is the operator — the
    registered query wraps it with a verification aggregate."""
    target_dir = _staged_target(spark, sf_dir)
    merge_batch(spark, sf_dir, target_dir)
    return target_dir


def merge_batch(spark: SparkSession, sf_dir: str, target_dir: str) -> set[str]:
    """Apply the deterministic update+insert batch to the partitioned
    table at ``target_dir``; returns the touched partition values."""
    orders = _orders_cents(spark, sf_dir)
    updates = orders.filter(F.col("o_orderkey") % UPD_MOD == 0).select(
        "o_orderkey", F.lit(BUMP_CENTS).alias("bump_cents")
    )
    inserts = orders.filter(F.col("o_orderkey") % INS_MOD == 0).select(
        (F.col("o_orderkey") + KEY_OFFSET).alias("o_orderkey"),
        F.lit(INS_STATUS).alias("o_orderstatus"),
        "price_cents",
    )
    target = spark.read.parquet(target_dir)

    # 1. touched partitions: statuses the batch actually hits — a
    #    broadcast semi-join; the collect is bounded by the partition
    #    cardinality (single digits), not the data
    touched = {
        r["o_orderstatus"]
        for r in target.join(F.broadcast(updates), "o_orderkey", "semi")
        .select("o_orderstatus")
        .distinct()
        .collect()
    } | {INS_STATUS}

    # 2. rewrite plan for ONLY those partitions (partition-pruned scan
    #    + broadcast left join + union of inserts)
    merged = (
        target.filter(F.col("o_orderstatus").isin(sorted(touched)))
        .join(F.broadcast(updates), "o_orderkey", "left")
        .select(
            "o_orderkey",
            "o_orderstatus",
            (F.col("price_cents") + F.coalesce("bump_cents", F.lit(0))).alias(
                "price_cents"
            ),
        )
        .unionByName(inserts)
    )
    # self-referential rewrite: materialize the merged frame before
    # overwriting the directory it reads from (what Delta gets from
    # its snapshot file list).  localCheckpoint keeps it executor-side.
    merged = merged.localCheckpoint(eager=True)

    # 3. dynamic partition overwrite: replaces exactly the partitions
    #    present in `merged`, creates the new INS_STATUS partition,
    #    leaves every other partition's files untouched
    (
        merged.write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(target_dir)
    )
    return touched


@query(
    "b_lake_upsert",
    f"""
    WITH target AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders
    ),
    merged AS (
      SELECT o_orderkey, o_orderstatus,
             price_cents + CASE WHEN o_orderkey % {UPD_MOD} = 0
                                THEN {BUMP_CENTS} ELSE 0 END AS price_cents
      FROM target
      UNION ALL
      SELECT o_orderkey + {KEY_OFFSET}, '{INS_STATUS}', price_cents
      FROM target WHERE o_orderkey % {INS_MOD} = 0
    )
    SELECT o_orderstatus, count(*) AS n_rows,
           CAST(sum(price_cents) AS BIGINT) AS total_cents,
           CAST(sum(CASE WHEN o_orderkey >= {KEY_OFFSET} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_inserted
    FROM merged GROUP BY o_orderstatus
    """,
)
def lake_upsert_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO a partitioned lake table, end-to-end: price bumps
    for matched keys, inserts into a brand-new partition, dynamic
    partition overwrite commits only touched partitions.  The returned
    frame aggregates the POST-MERGE table as read back from disk, so
    the oracle's recomputation of the same deterministic batch checks
    the whole pipeline — batch derivation, join-apply, partition
    rewrite, and the read-back — not just the arithmetic."""
    merged_dir = lake_upsert(spark, sf_dir)
    return (
        spark.read.parquet(merged_dir)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("price_cents").alias("total_cents"),
            F.sum((F.col("o_orderkey") >= KEY_OFFSET).cast("int")).alias(
                "n_inserted"
            ),
        )
    )
