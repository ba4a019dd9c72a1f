"""True Structured-Streaming paths: real ``readStream`` sources,
micro-batch triggers, stateful processing with GroupState — the
behavior the batch-mode oracle queries can't check."""

import os
import shutil

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from aws_datalake_framework_api_spark.sources.readers import (
    load_table,
    normalize_event_ts,
)
from aws_datalake_framework_api_spark.streaming.ingest import (
    ingest_stream,
    landing_schema,
)


@pytest.fixture()
def landing(tmp_path, sf_dir):
    d = tmp_path / "landing"
    d.mkdir()
    shutil.copy(os.path.join(sf_dir, "events.parquet"), d / "events-000.parquet")
    return str(d)


def _event_stream(spark, landing_dir):
    return normalize_event_ts(
        spark.readStream.schema(landing_schema(spark, landing_dir)).parquet(landing_dir)
    )


def test_landing_schema_empty_dir_falls_back_to_pinned(spark, tmp_path):
    """A stream must be definable BEFORE any file lands (the normal
    streaming deployment order): an empty landing dir falls back to
    the pinned registered schema instead of throwing (ADVICE r3), and
    the pinned schema matches what a footer probe yields once files
    exist — so the fallback never changes downstream plans."""
    from aws_datalake_framework_api_spark.streaming.ingest import LANDING_SCHEMA

    empty = tmp_path / "empty_landing"
    empty.mkdir()
    assert landing_schema(spark, str(empty)) == LANDING_SCHEMA
    # nonexistent dir: same fallback, same reason
    assert landing_schema(spark, str(tmp_path / "never_created")) == LANDING_SCHEMA


def test_landing_schema_probe_matches_pinned(spark, landing):
    """With landed files present the probe path runs; it must agree
    with the pinned schema (name + type, ignoring nullability)."""
    from aws_datalake_framework_api_spark.streaming.ingest import LANDING_SCHEMA

    probed = landing_schema(spark, landing)
    assert [(f.name, f.dataType) for f in probed.fields] == [
        (f.name, f.dataType) for f in LANDING_SCHEMA.fields
    ]


def test_ingest_roundtrip_exactly_once(spark, sf_dir, tmp_path, landing):
    """File-source ingest: no rows lost or duplicated; a RE-RUN over
    the same checkpoint must be a no-op (exactly-once)."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    ingest_stream(spark, landing, out, ckpt)
    n_src = load_table(spark, sf_dir, "events").count()
    assert spark.read.parquet(out).count() == n_src
    # rerun with same checkpoint: backlog already committed -> no dup rows
    ingest_stream(spark, landing, out, ckpt)
    assert spark.read.parquet(out).count() == n_src


def test_ingest_checkpoint_recovery_incremental(spark, sf_dir, tmp_path, landing):
    """RECOVERY semantics: stop, drop a new landing file, restart over
    the SAME checkpoint — the new file is processed, the committed one
    is not reprocessed, every event_id lands exactly once.  This is
    the property that makes the file source safe to kill at any point:
    the checkpoint's source log records which files each committed
    batch read, and the parquet sink's _spark_metadata commit log makes
    batch output visible atomically, so a restart resumes from the
    last committed batch instead of double-writing it."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    ingest_stream(spark, landing, out, ckpt)
    n_src = load_table(spark, sf_dir, "events").count()

    # stage a second-generation file: same feed shape (raw ts as the
    # reader surfaces it), event_ids offset so exactly-once is
    # observable per id
    gen2 = (
        spark.read.schema(landing_schema(spark, landing))
        .parquet(landing)
        .limit(100)
        .withColumn("event_id", F.col("event_id") + F.lit(10**9))
    )
    scratch = str(tmp_path / "gen2")
    gen2.coalesce(1).write.parquet(scratch)
    part = next(p for p in os.listdir(scratch) if p.endswith(".parquet"))
    shutil.copy(os.path.join(scratch, part), os.path.join(landing, "events-001.parquet"))

    ingest_stream(spark, landing, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == n_src + 100
    dup = got.groupBy("event_id").count().filter("count > 1").count()
    assert dup == 0, "a committed file was reprocessed after restart"


def test_streaming_windowed_agg_matches_batch(spark, sf_dir, landing):
    """The SAME window transformation through a real stream (memory
    sink, availableNow) equals its batch execution — the unified-model
    contract the oracle-checked queries rely on."""
    stream = _event_stream(spark, landing)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window"]["start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    want = {
        (r["window"]["start"], r["event_type"]): r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_stream_static_join(spark, sf_dir, landing):
    """Stream-static broadcast enrichment through a real micro-batch."""
    stream = _event_stream(spark, landing)
    cust = load_table(spark, sf_dir, "customer")
    joined = stream.join(F.broadcast(cust), stream.user_id == cust.c_custkey).select(
        "event_id", "c_mktsegment"
    )
    q = (
        joined.writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName("enriched")
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    n = spark.sql("SELECT count(*) AS n FROM enriched").collect()[0]["n"]
    want = (
        load_table(spark, sf_dir, "events")
        .join(cust, F.col("user_id") == F.col("c_custkey"))
        .count()
    )
    assert n == want > 0


def test_apply_in_pandas_with_state(spark, sf_dir, landing):
    """The REAL stateful API: per-user event counts/sums accumulated
    in GroupState across micro-batches; final state must equal the
    batch groupBy."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType(
        [
            StructField("user_id", LongType(), True),
            StructField("total", DoubleType(), True),
            StructField("n", LongType(), True),
        ]
    )
    state_schema = StructType(
        [
            StructField("total", DoubleType(), True),
            StructField("n", LongType(), True),
        ]
    )

    def update(key, pdfs, state: GroupState):
        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            total += float(pdf["value"].sum())
            n += len(pdf)
        state.update((total, n))
        yield pd.DataFrame({"user_id": [key[0]], "total": [total], "n": [n]})

    stream = _event_stream(spark, landing).select("user_id", "value")
    result = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        result.writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName("user_state")
        .outputMode("update")
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (round(r["total"], 4), r["n"])
        for r in spark.sql(
            "SELECT user_id, last(total) AS total, last(n) AS n FROM user_state GROUP BY user_id"
        ).collect()
    }
    want = {
        r["user_id"]: (round(r["total"], 4), r["n"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_transform_with_state_in_pandas(spark, sf_dir, landing):
    """Spark 4's successor state API (transformWithStateInPandas /
    StatefulProcessor with typed ValueState): same per-user running
    totals, final state must equal the batch groupBy.

    The TWS driver worker speaks protobuf to the JVM state server;
    this container ships a broken google.protobuf (no pip installs
    allowed), so the test skips where the import fails — the same
    honest-seam policy as the multimodal codec stub."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable: TWS driver worker cannot start")
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # transformWithState requires the RocksDB state store
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType(), True),
            StructField("total", DoubleType(), True),
            StructField("n", LongType(), True),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals",
                StructType(
                    [
                        StructField("total", DoubleType(), True),
                        StructField("n", LongType(), True),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            total, n = (
                self._state.get() if self._state.exists() else (0.0, 0)
            )
            for pdf in rows:
                total += float(pdf["value"].sum())
                n += len(pdf)
            self._state.update((total, n))
            yield pd.DataFrame(
                {"user_id": [key[0]], "total": [total], "n": [n]}
            )

        def close(self) -> None:
            pass

    stream = _event_stream(spark, landing).select("user_id", "value")
    result = stream.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
    q = (
        result.writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName("user_state_tws")
        .outputMode("update")
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (round(r["total"], 4), r["n"])
        for r in spark.sql(
            "SELECT user_id, last(total) AS total, last(n) AS n "
            "FROM user_state_tws GROUP BY user_id"
        ).collect()
    }
    want = {
        r["user_id"]: (round(r["total"], 4), r["n"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """The REAL stream-stream join: views and purchases land as two
    file-source streams, both watermarked, joined on user_id with the
    event-time bound, availableNow.  The streamed pair set must equal
    the batch plan's (Spark's unified model, proven end-to-end).  The
    time bound + watermarks are what let Spark evict join state — this
    is the no-unbounded-state contract for stream-stream joins."""
    import pyspark.sql.functions as SF

    from aws_datalake_framework_api_spark.streaming.windows import ATTRIB_WINDOW

    ev = load_table(spark, sf_dir, "events")
    views_dir = str(tmp_path / "views")
    purch_dir = str(tmp_path / "purchases")
    ev.filter(SF.col("event_type") == "view").write.mode("overwrite").parquet(views_dir)
    ev.filter(SF.col("event_type") == "purchase").write.mode("overwrite").parquet(
        purch_dir
    )

    v_schema = spark.read.parquet(views_dir).schema
    views = (
        spark.readStream.schema(v_schema)
        .parquet(views_dir)
        .withWatermark("ts", "2 hours")
        .select(SF.col("user_id").alias("v_user"), SF.col("ts").alias("v_ts"))
    )
    purchases = (
        spark.readStream.schema(v_schema)
        .parquet(purch_dir)
        .withWatermark("ts", "2 hours")
        .select(SF.col("user_id").alias("p_user"), SF.col("ts").alias("p_ts"))
    )
    joined = views.join(
        purchases,
        SF.expr(
            f"v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + INTERVAL {ATTRIB_WINDOW}"
        ),
    )
    out = str(tmp_path / "sjoin_out")
    ckpt = str(tmp_path / "sjoin_ckpt")
    q = (
        joined.writeStream.trigger(availableNow=True)
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()

    streamed = {
        (r["v_user"], r["v_ts"], r["p_ts"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r["user_id"], r["v_ts"], r["p_ts"])
        for r in ev.filter(SF.col("event_type") == "view")
        .select(SF.col("user_id"), SF.col("ts").alias("v_ts"))
        .join(
            ev.filter(SF.col("event_type") == "purchase").select(
                SF.col("user_id"), SF.col("ts").alias("p_ts")
            ),
            "user_id",
        )
        .filter(
            (SF.col("p_ts") >= SF.col("v_ts"))
            & (SF.col("p_ts") <= SF.col("v_ts") + SF.expr(f"INTERVAL {ATTRIB_WINDOW}"))
        )
        .collect()
    }
    assert streamed == batch and len(batch) > 0


def test_stream_upsert_replay_is_idempotent(spark, tmp_path):
    """The table-side batch high-water mark (Delta's txn action) must
    make a replayed micro-batch a no-op: same version, same rows —
    while a genuinely new batch still applies."""
    from aws_datalake_framework_api_spark.streaming.upsert import (
        FEED_SCHEMA,
        merge_microbatch,
    )
    from aws_datalake_framework_api_spark.txlog import TxLogTable

    t = TxLogTable(spark, str(tmp_path / "t"))
    b0 = spark.createDataFrame([(1, 100, 1), (2, 200, 1)], FEED_SCHEMA)
    b1 = spark.createDataFrame([(2, 250, 2)], FEED_SCHEMA)

    merge_microbatch(t, b0, 0)
    merge_microbatch(t, b1, 1)
    v_after = t.snapshot()["version"]
    state = {(r["k"], r["price_cents"]) for r in t.read(FEED_SCHEMA).collect()}
    assert state == {(1, 100), (2, 250)}

    # crash-recovery replay: the checkpoint redelivers batch 1
    merge_microbatch(t, b1, 1)
    assert t.snapshot()["version"] == v_after  # no new commit
    assert {(r["k"], r["price_cents"]) for r in t.read(FEED_SCHEMA).collect()} == state

    # a NEW batch still applies on top
    merge_microbatch(t, spark.createDataFrame([(3, 300, 3)], FEED_SCHEMA), 2)
    assert t.snapshot()["version"] == v_after + 1
    assert (3, 300) in {
        (r["k"], r["price_cents"]) for r in t.read(FEED_SCHEMA).collect()
    }


def test_stream_stream_outer_join_matches_batch_on_decided_region(
    spark, sf_dir, tmp_path
):
    """The REAL leftOuter stream-stream join: watermarks on both
    sides, availableNow; Spark's no-data batch advances the final
    watermark so NULL (no-match) rows flush for every view whose
    attribution window the watermark has fully passed.  On that
    decided region the streamed pair set — including the NULL
    verdicts — must equal the batch left join's."""
    import pyspark.sql.functions as SF

    ev = load_table(spark, sf_dir, "events")
    views_dir = str(tmp_path / "o_views")
    purch_dir = str(tmp_path / "o_purchases")
    ev.filter(SF.col("event_type") == "view").write.mode("overwrite").parquet(
        views_dir
    )
    ev.filter(SF.col("event_type") == "purchase").write.mode("overwrite").parquet(
        purch_dir
    )
    schema = spark.read.parquet(views_dir).schema
    views = (
        spark.readStream.schema(schema)
        .parquet(views_dir)
        .withWatermark("ts", "2 hours")
        .select(SF.col("user_id").alias("v_user"), SF.col("ts").alias("v_ts"))
    )
    purchases = (
        spark.readStream.schema(schema)
        .parquet(purch_dir)
        .withWatermark("ts", "2 hours")
        .select(SF.col("user_id").alias("p_user"), SF.col("ts").alias("p_ts"))
    )
    joined = views.join(
        purchases,
        SF.expr(
            "v_user = p_user AND p_ts >= v_ts "
            "AND p_ts <= v_ts + INTERVAL 1 HOUR"
        ),
        "leftOuter",
    )
    out = str(tmp_path / "osjoin_out")
    ckpt = str(tmp_path / "osjoin_ckpt")
    q = (
        joined.writeStream.trigger(availableNow=True)
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()

    m = ev.agg(SF.max("ts")).first()[0]
    boundary = SF.lit(m) - SF.expr("INTERVAL 3 HOUR")
    streamed = {
        (r["v_user"], r["v_ts"], r["p_ts"])
        for r in spark.read.parquet(out)
        .filter(SF.col("v_ts") < boundary)
        .collect()
    }
    batch_views = (
        ev.filter(SF.col("event_type") == "view")
        .filter(SF.col("ts") < boundary)
        .select(SF.col("user_id").alias("v_user"), SF.col("ts").alias("v_ts"))
    )
    batch_p = ev.filter(SF.col("event_type") == "purchase").select(
        SF.col("user_id").alias("p_user"), SF.col("ts").alias("p_ts")
    )
    batch = {
        (r["v_user"], r["v_ts"], r["p_ts"])
        for r in batch_views.join(
            batch_p,
            SF.expr(
                "v_user = p_user AND p_ts >= v_ts "
                "AND p_ts <= v_ts + INTERVAL 1 HOUR"
            ),
            "leftOuter",
        ).collect()
    }
    assert streamed == batch and len(batch) > 0
    assert any(p is None for _, _, p in batch)  # NULL verdicts compared too
