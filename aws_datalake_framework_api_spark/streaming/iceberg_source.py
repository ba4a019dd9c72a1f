"""Streaming SOURCE over Iceberg v2 tables: ``spark.readStream
.format("iceberg_stream").load(path)`` tails the snapshot log the way
iceberg-spark's streaming read does — offsets are SNAPSHOT positions
in sequence-number order, each micro-batch reads exactly the data
files ADDED by the snapshots in ``(start, end]``, and checkpoint
restart resumes from the last committed snapshot.

Same architecture as :mod:`.delta_source` (Spark 4 Python Data Source
API): driver-side ``partitions()`` diffs the ACTIVE FILE SETS of
consecutive snapshots — pure-Python metadata work, no session needed
— and ships one :class:`InputPartition` per newly-added data file;
executor-side ``read()`` opens that parquet file with pyarrow.  Data
files in Iceberg physically contain their partition columns, so no
value injection is needed.

Semantics (iceberg-spark parity):

- append-only tails: a snapshot that REMOVES active data files
  (overwrite, delete, rewrite/compaction) refuses by default;
  ``ignoreChanges=true`` streams its newly-added files anyway
  (consumers dedupe by key).  Compaction is indistinguishable from an
  overwrite at the file level here because Iceberg carries no
  per-file dataChange flag — the honest default is therefore refusal,
  where the Delta source can stay silent;
- position-delete snapshots (new delete files, data files untouched)
  also REFUSE by default: their row removals are invisible to an
  append-level stream, and iceberg-spark likewise fails on delete
  snapshots unless ``streaming-skip-delete-snapshots`` is set —
  ``ignoreChanges=true`` is this source's equivalent skip switch.
"""

from __future__ import annotations

import urllib.parse

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from ..sources.iceberg import (
    _current_schema,
    _load_metadata,
    _manifest_entries,
    _resolution,
    _schema_to_spark,
)


class _IceFilePartition(InputPartition):
    def __init__(
        self, file_path: str, names: list[str], resolve: dict | None
    ) -> None:
        self.file_path = file_path
        self.names = names
        #: rename-resolution tables for tables whose schema history
        #: shows a rename (see sources.iceberg._resolution): id →
        #: current name, unambiguous history name → id, ambiguous
        #: names.  None for never-renamed tables (by-name fast path).
        self.resolve = resolve


def _ordered_snapshots(meta: dict) -> list[dict]:
    return sorted(
        meta.get("snapshots") or [],
        key=lambda s: (s.get("sequence-number", 0), s.get("timestamp-ms", 0)),
    )


def _active_files(path: str, meta: dict, snap: dict) -> tuple[set, set]:
    data, deletes, eq_deletes = _manifest_entries(path, meta, snap)
    # equality deletes count as delete files: a snapshot that adds one is
    # a delete/upsert snapshot and triggers the same refusal gate
    return (
        {r["path"] for r in data},
        {r["path"] for r in deletes} | {r["path"] for r in eq_deletes},
    )


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("iceberg_stream requires .load(<table path>)")
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self.schema = schema

    def initialOffset(self) -> dict:
        return {"pos": 0, "sid": None}  # before the first snapshot

    def latestOffset(self) -> dict:
        meta = _load_metadata(self.path)
        snaps = _ordered_snapshots(meta)
        # offsets ANCHOR their position to the snapshot id at pos-1:
        # snapshot expiry shifts log positions, and a restart that
        # silently re-interpreted an old position against the shifted
        # log would re-read or skip snapshots — a misread.  The anchor
        # turns that into the loud refusal below.
        return {
            "pos": len(snaps),
            "sid": snaps[-1]["snapshot-id"] if snaps else None,
        }

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["pos"]), int(end["pos"])
        meta = _load_metadata(self.path)
        snaps = _ordered_snapshots(meta)
        if hi > len(snaps):
            raise ValueError(
                "iceberg_stream: offset past the snapshot log (snapshots "
                "were expired?) — the stream's starting snapshot is no "
                "longer available; restart from a fresh checkpoint"
            )
        sid = start.get("sid")
        if lo >= 1 and sid is not None and (
            snaps[lo - 1]["snapshot-id"] != sid
        ):
            raise ValueError(
                "iceberg_stream: the checkpoint's starting snapshot "
                f"{sid} is no longer in the snapshot log (expired?) — "
                "the positions after it have shifted; restart from a "
                "fresh checkpoint"
            )
        names = [f.name for f in self.schema.fields]
        res = _resolution(meta)
        resolve = None
        if res is not None:
            # Map each STREAM column (schema pinned at stream start,
            # possibly pre-rename) to its field id: current schema
            # first, then the history's unambiguous name→id map.
            cur_by_name = {f["name"]: int(f["id"]) for f in res["ordered"]}
            ids = {}
            for n in names:
                fid = cur_by_name.get(n, res["name_to_id"].get(n))
                if fid is not None:
                    ids[int(fid)] = n
            resolve = {
                "ids": ids,
                "name_to_id": res["name_to_id"],
                "ambiguous": sorted(res["ambiguous"]),
            }
        out: list[_IceFilePartition] = []
        prev, prev_del = (
            _active_files(self.path, meta, snaps[lo - 1])
            if lo >= 1
            else (set(), set())
        )
        for i in range(lo, hi):
            cur, cur_del = _active_files(self.path, meta, snaps[i])
            changed = (prev - cur) or (cur_del - prev_del)
            if changed and not self.ignore_changes:
                raise ValueError(
                    f"iceberg_stream: snapshot {snaps[i]['snapshot-id']} "
                    f"({(snaps[i].get('summary') or {}).get('operation')}) "
                    "removes or position-deletes rows; streaming a change "
                    "as silence is wrong — set ignoreChanges=true to "
                    "stream only its added files (downstream must dedupe "
                    "by key)"
                )
            for p in sorted(cur - prev):
                out.append(
                    _IceFilePartition(urllib.parse.unquote(p), names, resolve)
                )
            prev, prev_del = cur, cur_del
        return out

    def read(self, partition: _IceFilePartition):
        import pyarrow.parquet as pq

        table = pq.read_table(partition.file_path)
        if partition.resolve is None:
            colmap = {n: n for n in table.column_names}
        else:
            # Renamed table: the file may spell OLD names — resolve by
            # parquet field id (same contract as the batch reader's
            # _resolved_union; silent NULLs for renamed columns would
            # be a misread, not a degradation).
            r = partition.resolve
            colmap = {}
            for fld in table.schema:
                raw = (fld.metadata or {}).get(b"PARQUET:field_id")
                if raw is not None:
                    fid = int(raw)
                else:
                    if fld.name in r["ambiguous"]:
                        raise ValueError(
                            f"iceberg_stream: cannot resolve column "
                            f"{fld.name!r}: no parquet field ids and the "
                            "name maps to multiple field ids across "
                            "schema history"
                        )
                    fid = r["name_to_id"].get(fld.name)
                cur = r["ids"].get(fid) if fid is not None else None
                if cur is not None:
                    colmap[cur] = fld.name
        for row in table.to_pylist():
            yield tuple(
                row.get(colmap[n]) if n in colmap else None
                for n in partition.names
            )

    def commit(self, end: dict) -> None:
        pass


class IcebergStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "iceberg_stream"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("iceberg_stream requires .load(<table path>)")
        return _schema_to_spark(_current_schema(_load_metadata(path)))

    def streamReader(self, schema: StructType) -> IcebergStreamReader:
        return IcebergStreamReader(schema, self.options)


def register(spark: SparkSession) -> None:
    try:
        spark.dataSource.register(IcebergStreamSource)
    except Exception:  # noqa: BLE001 — already registered in this session
        pass



# ------------------------------------------------------------------ query


def stream_from_iceberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream FROM an Iceberg table: two append snapshots over an
    orders slice, tailed by the ``iceberg_stream`` source
    (availableNow) into a parquet sink, then aggregated.  The oracle
    recomputes the union of both appends from the fixture — a dropped
    file, a double-read snapshot, or a broken offset diff all fail
    the hash compare.  (The Iceberg twin of ``b_stream_delta_source``;
    r6.)"""
    import atexit as _atexit
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from pyspark.sql import functions as F

    from ..functions.numeric import money_sum
    from ..sources.iceberg import write_iceberg
    from ..sources.readers import load_table

    register(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    tmp = _tempfile.mkdtemp(prefix="spark_graft_istream_")
    _atexit.register(_shutil.rmtree, tmp, ignore_errors=True)
    t = _os.path.join(tmp, "t")
    write_iceberg(
        orders.filter(F.col("o_orderkey") % 11 == 0).coalesce(1),
        t, mode="error", partition_by=["o_orderpriority"],
    )
    write_iceberg(
        orders.filter(F.col("o_orderkey") % 11 == 1).coalesce(1),
        t, mode="append", partition_by=["o_orderpriority"],
    )
    out = _os.path.join(tmp, "out")
    q = (
        spark.readStream.format("iceberg_stream").load(t)
        .writeStream.trigger(availableNow=True)
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", _os.path.join(tmp, "ckpt"))
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        money_sum("o_totalprice").alias("total_price"),
    )


def _register_query() -> None:
    from ..functions.numeric import sql_money_sum
    from ..registry import query

    query(
        "b_stream_iceberg_source",
        f"""
        SELECT o_orderpriority, count(*) AS n,
               {sql_money_sum("o_totalprice")} AS total_price
        FROM orders
        WHERE o_orderkey % 11 = 0 OR o_orderkey % 11 = 1
        GROUP BY o_orderpriority
        """,
    )(stream_from_iceberg)


_register_query()
