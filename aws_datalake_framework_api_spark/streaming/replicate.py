"""Cross-format CDC REPLICATION: stream a Delta table's change feed
into an Iceberg replica (SURVEY.md §2 B9 ∪ B1 composition, r8).

This is the Flink-CDC-into-Iceberg shape built from this engine's own
parts: the Delta side WRITES row-level changes (``merge_delta`` cdc
files), the ``delta_stream`` ``readChangeFeed`` tail streams them,
and each micro-batch lands on the replica as

1. one **equality-delete** commit for the net-dead keys
   (``delete_by_key_iceberg`` — O(keys), reads NO data file), then
2. one **merge-on-read MERGE** for the net-live rows
   (``merge_iceberg(strategy="mor")`` — commit bytes ∝ changed rows,
   SCALE.md r8),

so replica cost per batch rides the CHANGE volume on both the read
and the write side — the only shape that survives a 100 TB source.

Exactly-once: the batch is gated on the replica's ``txn.<app_id>``
property (read BEFORE applying, advanced atomically by the final
merge commit).  A crash between the delete and the merge replays the
whole batch: the watermark hasn't advanced, the re-issued equality
delete re-kills already-dead keys (a semantic no-op), and the merge
lands once.  Within a batch, the NET effect per key is applied — the
last change by ``_commit_version`` wins, with add-type changes
(insert/update_postimage) outranking remove-types within the same
version because a copy-on-write rewrite emits delete+insert pairs
for carried rows whose net is "still here".
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table

#: change types that carry the key's surviving row version
_PLUS = ("insert", "update_postimage")


def replicate_batch(
    replica: str, on: list[str], app_id: str
):
    """foreachBatch callable applying one CDF micro-batch to the
    Iceberg replica as net per-key effects."""
    from ..sources.iceberg import (
        delete_by_key_iceberg,
        last_txn_version_iceberg,
        merge_iceberg,
    )

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        # A deletes-only batch advances the watermark too: the
        # zero-change merge commits a properties-only txn advance
        # (no snapshot — merge_iceberg, ADVICE r8), so a checkpoint
        # replay of such a batch skips ENTIRELY instead of
        # re-committing a redundant (if idempotent) delete snapshot.
        spark = batch_df.sparkSession
        if int(batch_id) <= last_txn_version_iceberg(
            spark, replica, app_id
        ):
            return  # checkpoint replayed an applied batch
        cols = [
            c for c in batch_df.columns
            if c not in ("_change_type", "_commit_version")
        ]
        is_plus = F.col("_change_type").isin(*_PLUS).cast("int")
        w = Window.partitionBy(*on).orderBy(
            F.desc("_commit_version"), F.desc(F.col("_is_plus"))
        )
        # Materialize the net-effect frame ONCE (r11 optimization,
        # guide §5): every downstream action — the dead-key probe, the
        # equality-delete staging, and merge_iceberg's ~6 planning
        # actions (dup check, key bounds, touched/insert counts, the
        # two staging writes) — otherwise re-executes this lineage,
        # and its root is the Python-DataSource CDF stream read (a
        # JVM→Python→JVM hop per re-run).  Measured at sf0.1: the
        # foreachBatch apply dropped ~2.8× (5.9 s → 2.1 s warm).  The
        # frame is one micro-batch's net changes — bounded by change
        # volume, the same working set the merge stages anyway.
        from ..sources.merge_clauses import pin

        net = pin(
            batch_df.withColumn("_is_plus", is_plus)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
        )
        dead = net.filter(F.col("_is_plus") == 0).select(*on)
        live = net.filter(F.col("_is_plus") == 1).select(*cols)
        if dead.limit(1).count():
            # O(keys) equality delete: no replica data file is read;
            # idempotent under batch replay (re-killing dead keys)
            delete_by_key_iceberg(spark, replica, dead)
        # merge-on-read upsert carries the txn watermark — the batch
        # is "applied" exactly when this commits
        merge_iceberg(
            spark, replica, live, on,
            txn=(app_id, int(batch_id)), strategy="mor",
        )

    return apply


def run_replication(
    spark: SparkSession,
    source_table: str,
    replica: str,
    on: list[str],
    checkpoint_dir: str,
    app_id: str = "delta-replica",
) -> None:
    """Tail ``source_table``'s change feed from genesis and converge
    the Iceberg ``replica`` to it."""
    from .delta_source import register
    from .drive import run_stream_to_completion

    register(spark)
    run_stream_to_completion(
        lambda: (
            spark.readStream.format("delta_stream")
            .option("readChangeFeed", "true")
            .load(source_table)
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(replicate_batch(replica, on, app_id))
            .start()
        )
    )


@query(
    "b_stream_replicate",
    """
    WITH b AS (
      SELECT o_orderkey AS k, o_orderpriority, o_totalprice
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    final AS (
      SELECT o_orderpriority,
             CASE WHEN k % 12 = 0 THEN o_totalprice + 1000
                  ELSE o_totalprice END AS o_totalprice
      FROM b
      WHERE NOT (k % 6 = 0 AND k % 12 <> 0)
      UNION ALL
      SELECT o_orderpriority, o_totalprice
      FROM orders WHERE o_orderkey % 3 = 1
    )
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT))
                AS BIGINT) / 100.0 AS total_price
    FROM final
    GROUP BY o_orderpriority
    """,
)
def stream_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END cross-format replication: a CDF-enabled Delta table
    takes a full-clause MERGE (update/delete/insert); its change feed
    streams into an empty Iceberg replica as equality-deletes + MOR
    merges; the REPLICA's final state must equal the oracle's
    recompute of the Delta table's final state.  A wrong net-effect
    precedence (a COW rewrite's delete+insert pair mis-resolved), a
    lost delete, or a double-applied replay all fail the hash
    compare.  (r8 — composes the round's CDF writer, CDF stream tail,
    equality deletes, and merge-on-read MERGE.)"""
    from ..functions.numeric import money_sum
    from ..sources.delta import alter_table_properties_delta, merge_delta
    from ..sources.delta import write_delta
    from ..sources.iceberg import read_iceberg, write_iceberg

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    tmp = tempfile.mkdtemp(prefix="spark_graft_repl_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    t = os.path.join(tmp, "t")
    write_delta(
        orders.filter(F.col("o_orderkey") % 3 == 0).coalesce(2),
        t, mode="error",
    )                                                            # v0
    alter_table_properties_delta(
        spark, t, {"delta.enableChangeDataFeed": "true"}
    )                                                            # v1
    source = orders.filter(F.col("o_orderkey") % 6 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
    ).unionByName(orders.filter(F.col("o_orderkey") % 3 == 1))
    merge_delta(
        spark, t, source, on=["o_orderkey"],
        clauses=[
            {"when": "matched", "action": "update",
             "condition": "t.o_orderkey % 12 = 0"},
            {"when": "matched", "action": "delete"},
            {"when": "not_matched", "action": "insert"},
        ],
    )                                                            # v2
    replica = os.path.join(tmp, "replica")
    write_iceberg(orders.limit(0).coalesce(1), replica, mode="error")
    run_replication(
        spark, t, replica, ["o_orderkey"], os.path.join(tmp, "ckpt")
    )
    return read_iceberg(spark, replica).groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        money_sum("o_totalprice").alias("total_price"),
    )
