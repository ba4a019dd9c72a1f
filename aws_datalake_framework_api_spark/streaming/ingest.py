"""File-source streaming ingestion + stateful processing (SURVEY.md
§2 A12/B9).

``b_stream_ingest`` IS the reference's ingestion topology rebuilt on
Spark: where the reference wires S3 ``createObject`` → SNS topic →
processing Lambda per source system (``cft/sourceSystem.yaml:29-63``,
landing prefix ``*/init/*`` :77), Structured Streaming's file source
watches a landing directory, discovers new files per micro-batch, and
writes them to the curated zone exactly-once (checkpointed) — the
whole push topology collapses into ``readStream`` → ``writeStream``.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from ..registry import query
from ..sources.readers import load_table, normalize_event_ts

# Landing-file ts handling: the fixture's parquet TIMESTAMP(NANOS)
# physical type surfaces as raw int64 nanos on older Spark builds
# (``nanosAsLong``) and as TIMESTAMP_NTZ on newer ones — see
# sources/readers.py normalize_event_ts.  A streaming source NEVER
# infers its schema (inference would race arriving files), so the
# explicit schema is probed ONCE from the already-landed footers at
# stream definition (a footer-only batch read, no data scan); a real
# deployment pins it from the asset's registered schema instead.


#: Pinned fallback schema for the events feed — what a real deployment
#: registers for the asset.  Used when the landing dir has no files yet
#: (the NORMAL streaming pattern: define the stream before any file
#: lands; a footer probe of an empty dir throws).  ``ts`` is declared
#: TIMESTAMP_NTZ to match what this Spark build reads from the
#: fixture's TIMESTAMP(NANOS) parquet footers.
LANDING_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampNTZType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def landing_schema(spark: SparkSession, landing_dir: str):
    """Schema for the landing stream: probe already-landed footers when
    present (footer-only read, no data scan); fall back to the pinned
    registered schema on an empty/absent landing dir so a stream can be
    DEFINED before its first file arrives (ADVICE r3)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        return spark.read.parquet(landing_dir).schema
    except Exception:  # noqa: BLE001 — empty dir / no footers yet
        return LANDING_SCHEMA


def ingest_stream(
    spark: SparkSession, landing_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """The engine's ingestion pipeline: watch ``landing_dir`` for
    parquet drops, normalize timestamps, write curated parquet with
    exactly-once checkpointing.  ``availableNow`` processes the
    current backlog then stops — the batch-backfill trigger; a live
    deployment uses the default micro-batch trigger instead."""
    from .drive import run_stream_to_completion

    run_stream_to_completion(
        lambda: (
            normalize_event_ts(
                spark.readStream.schema(
                    landing_schema(spark, landing_dir)
                ).parquet(landing_dir)
            )
            .writeStream.trigger(availableNow=True)
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
    )


@query(
    "b_stream_ingest",
    """
    SELECT event_id, ts, user_id, event_type, round(value, 2) AS value, props
    FROM events
    """,
)
def stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END streaming ingest: stage the events feed as landing
    files, run the real ``readStream`` → ``writeStream`` pipeline
    (availableNow), read back the curated output.  The oracle is the
    identity over the source feed — ingestion must lose and corrupt
    nothing.  (This query does real filesystem work in a temp dir;
    it is the one queries() entry that is a pipeline, not a plan.)

    Exactly-once: the checkpoint's source log records which landing
    files each committed batch read, and the parquet sink's
    ``_spark_metadata`` commit log publishes batch output atomically —
    kill/restart at any point resumes from the last committed batch
    (demonstrated as data in tests/test_streaming.py: the no-op rerun
    and the incremental checkpoint-recovery test)."""
    tmp = tempfile.mkdtemp(prefix="spark_graft_ingest_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    landing = os.path.join(tmp, "landing")
    out = os.path.join(tmp, "curated")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(landing)
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(landing, "events-000.parquet"),
    )
    ingest_stream(spark, landing, out, ckpt)
    df = spark.read.parquet(out)
    return df.select(
        "event_id", "ts", "user_id", "event_type", F.round("value", 2).alias("value"), "props"
    )


# ---------------------------------------------------------------- stateful


STATE_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("event_id", LongType(), True),
        StructField("running_total", DoubleType(), True),
        StructField("running_n", LongType(), True),
    ]
)




@query(
    "b_stream_stateful",
    """
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 6) AS running_total,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS running_n
    FROM events
    """,
)
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful per-key processing: running (total, count) per user in
    event-time order — the custom-state shape (per-key accumulator) of
    ``applyInPandasWithState``.  Implemented with the SAME pandas
    kernel a streaming deployment uses (grouped-map, Arrow-batched);
    the oracle twin is the cumulative window — proving the stateful
    fold equals its relational definition.  The true incremental
    plumbing (GroupState across micro-batches, timeout-driven
    finalization) runs in tests/test_streaming.py.

    Scale: one shuffle on user_id; state per key is O(1); pandas sees
    one group at a time (bounded by the largest single key, the usual
    applyInPandas constraint — salt mega-keys upstream if one user
    exceeds executor memory)."""
    # Kernel nested so cloudpickle serializes it by value (executor
    # workers don't import this package when the driver loads
    # __spark_entry__.py by file path from a foreign cwd).
    def running_totals(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (uid,) = key
        rows = pdf.sort_values(["ts", "event_id"])
        run = rows["value"].cumsum()
        return pd.DataFrame(
            {
                "user_id": uid,
                "event_id": rows["event_id"],
                "running_total": run.round(6),
                "running_n": range(1, len(rows) + 1),
            }
        )

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(running_totals, schema=STATE_SCHEMA)
    )
