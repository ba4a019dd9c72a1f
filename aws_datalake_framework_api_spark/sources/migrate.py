"""In-place MIGRATION of existing plain-parquet directories into the
two open table formats — iceberg-spark's ``add_files``/``migrate``
procedures and delta-spark's ``CONVERT TO DELTA``: the day-one gesture
of every lakehouse adoption ("my data is already here; give me a
table over it WITHOUT rewriting 100 TB").

Both directions are zero-copy: the source directory's parquet files
are referenced by absolute path from a fresh table log/metadata at
``dst``; hive-layout ``col=value`` directory segments become the
table's partitioning — Delta ``partitionColumns`` + per-add
``partitionValues``, or an Iceberg identity partition spec +
per-file manifest partition tuples.  Hive-layout files do NOT contain
their partition columns (Spark's ``partitionBy`` writer strips them),
which both readers already handle: Delta injects from the log's
partitionValues, Iceberg serves identity sources from partition
metadata via ``_plan_scan``'s constants injection (spec §Column
Projection — the rule written FOR migrated tables).

Partition value typing mirrors Spark's partition discovery, reduced
to the deterministic subset: all-int segments type as ``long``,
ISO-date segments as ``date``, everything else ``string``
(``__HIVE_DEFAULT_PARTITION__`` → NULL).  Ambiguity never misreads —
a value that fails the narrow parse falls back to string.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import shutil
import time
import urllib.parse
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import money_sum, sql_money_sum
from ..registry import query
from .landing import _scratch
from .readers import load_table

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _walk_hive_layout(src: str) -> tuple[list[str], list[tuple[str, dict]]]:
    """(partition column names in directory order, [(abs parquet path,
    {col: raw string value or None})]).  Every file must sit at the
    same ``col=value`` depth with the same column sequence — mixed
    layouts refuse (a misparsed partition value is a misread)."""
    part_cols: list[str] | None = None
    files: list[tuple[str, dict]] = []
    for root, _dirs, names in sorted(os.walk(src)):
        pq_names = [n for n in sorted(names) if n.endswith(".parquet")]
        if not pq_names:
            continue
        rel = os.path.relpath(root, src)
        segs = [] if rel == "." else rel.split(os.sep)
        cols, vals = [], {}
        for seg in segs:
            k, eq, v = seg.partition("=")
            if not eq:
                raise ValueError(
                    f"non-hive directory segment {seg!r} under {src!r} — "
                    "cannot derive partitioning"
                )
            cols.append(k)
            vals[k] = (
                None if v == _HIVE_NULL else urllib.parse.unquote(v)
            )
        if part_cols is None:
            part_cols = cols
        elif cols != part_cols:
            raise ValueError(
                f"inconsistent hive layout: {cols} vs {part_cols} — "
                "cannot derive a single partition spec"
            )
        for n in pq_names:
            files.append((os.path.abspath(os.path.join(root, n)), vals))
    if not files:
        raise FileNotFoundError(f"no parquet files under {src!r}")
    return part_cols or [], files


def _infer_part_type(values: list[str | None]) -> str:
    """Iceberg-type name for a partition column's raw strings: long if
    every non-null parses as int, date if every non-null is ISO,
    else string — the deterministic core of Spark's partition-type
    inference."""
    non_null = [v for v in values if v is not None]
    if non_null and all(_is_int(v) for v in non_null):
        return "long"
    if non_null and all(_is_date(v) for v in non_null):
        return "date"
    return "string"


def _is_int(v: str) -> bool:
    try:
        int(v)
        return True
    except ValueError:
        return False


def _is_date(v: str) -> bool:
    try:
        _dt.date.fromisoformat(v)
        return True
    except ValueError:
        return False


def _link_unique(files: list[tuple[str, dict]], dst: str) -> list[tuple[str, dict]]:
    """Hardlink every source parquet under ``dst/data/`` with a
    UNIQUE basename.  Spark's dynamic-partition writer reuses the same
    ``part-NNNNN-<jobuuid>`` filename across partition directories, and
    both connectors key row attribution (DV subtraction, delete
    targeting, constants injection) on basenames — which are unique for
    every file THEY write but not for a foreign hive layout.  A
    hardlink is still zero-copy (same inode, no data bytes move) and
    the source directory is untouched; cross-filesystem migration
    falls back to a real copy (the one case bytes must move anyway)."""
    ddir = os.path.join(dst, "data")
    os.makedirs(ddir, exist_ok=True)
    out = []
    for ap, vals in sorted(files):
        name = f"{uuid.uuid4().hex[:8]}-{os.path.basename(ap)}"
        target = os.path.join(ddir, name)
        try:
            os.link(ap, target)
        except OSError:
            shutil.copy2(ap, target)
        out.append((os.path.abspath(target), vals))
    return out


def _typed_physical(v: str | None, ice_type: str):
    """Raw path-segment string → the Iceberg manifest's avro PHYSICAL
    form (int days for date, int for long)."""
    if v is None:
        return None
    if ice_type == "long":
        return int(v)
    if ice_type == "date":
        return (_dt.date.fromisoformat(v) - _dt.date(1970, 1, 1)).days
    return v


def _prepare_migration(
    spark: SparkSession, src: str, dst: str
) -> tuple[list[str], list[tuple[str, dict]], dict, "object"]:
    """Shared migration prologue (both directions): walk + link the
    layout, infer partition types, and build the FULL table schema —
    the data-column half MERGED ACROSS EVERY file's footer
    (mergeSchema; review finding: a first-file-only schema silently
    drops columns added later in a schema-evolved source), the
    partition half appended with the inferred types."""
    import pyspark.sql.types as T

    part_cols, files = _walk_hive_layout(src)
    files = _link_unique(files, dst)
    file_schema = (
        spark.read.option("mergeSchema", "true")
        .parquet(*[ap for ap, _v in files])
        .schema
    )
    for f in file_schema.fields:
        if f.name in part_cols:
            raise ValueError(
                f"data files already contain partition column {f.name!r} "
                "— not a hive layout; load the directory as plain parquet"
            )
    part_types = {
        c: _infer_part_type([vals[c] for _p, vals in files])
        for c in part_cols
    }
    full = T.StructType(
        list(file_schema.fields)
        + [
            T.StructField(
                c,
                {"long": T.LongType(), "date": T.DateType()}.get(
                    part_types[c], T.StringType()
                ),
                True,
            )
            for c in part_cols
        ]
    )
    return part_cols, files, part_types, full


def add_files_iceberg(spark: SparkSession, src: str, dst: str) -> int:
    """iceberg-spark's ``add_files``/``migrate`` procedure: register a
    hive-layout (or flat) parquet directory as an Iceberg v2 table at
    ``dst`` — zero bytes move; the manifest references the source
    parquet by absolute path (hardlinked under dst/data with unique
    basenames).  Schema = the parquet footprint MERGED across every
    file's footer (mergeSchema — schema-evolved sources keep their
    late columns) + the
    path-derived partition columns; the spec is identity over those.
    The referenced files carry no parquet field ids (the id-less
    legacy read path) and LACK the partition columns (served from
    partition metadata by the constants injection — the spec's
    migrated-table rule).  The ``migrated-data-files`` table property
    marks provenance so renamed-column reads refuse loudly instead of
    NULL-filling (same gate as Delta-converted tables)."""
    from .iceberg import (
        _commit_snapshot,
        _metadata_versions,
        _spark_to_ice,
        _write_manifest,
    )

    if _metadata_versions(dst):
        raise FileExistsError(f"iceberg table already exists at {dst}")
    part_cols, files, part_types, full = _prepare_migration(spark, src, dst)
    ids = iter(range(1, 10_000))
    ice = _spark_to_ice(full, lambda: next(ids))
    schema_json = {"schema-id": 0, "type": "struct", "fields": ice["fields"]}
    by_name = {f["name"]: f for f in schema_json["fields"]}
    part_spec = [
        {
            "name": c, "transform": "identity", "source": c,
            "source-id": int(by_name[c]["id"]),
            "ptype": part_types[c], "stype": part_types[c],
        }
        for c in part_cols
    ]
    import pyarrow.parquet as _pq

    data_files = [
        {
            "content": 0,
            "file_path": ap,
            "file_format": "PARQUET",
            "partition": {
                c: _typed_physical(vals[c], part_types[c])
                for c in part_cols
            },
            "record_count": _pq.ParquetFile(ap).metadata.num_rows,
            "file_size_in_bytes": os.path.getsize(ap),
            "lower_bounds": None,
            "upper_bounds": None,
        }
        for ap, vals in sorted(files)
    ]
    os.makedirs(dst, exist_ok=True)
    entries = [
        {
            "status": 1,
            "snapshot_id": None,
            "sequence_number": None,
            "file_sequence_number": None,
            "data_file": f,
        }
        for f in data_files
    ]
    manifest = _write_manifest(
        dst, entries, part_spec, 0, "data", schema_json, spec_id=0
    )
    return _commit_snapshot(
        dst, None, [manifest], [], "append",
        schema_json=schema_json, part_spec=part_spec,
        properties=(
            {"migrated-data-files": "true"} if part_spec else None
        ),
    )


def convert_parquet_to_delta(spark: SparkSession, src: str, dst: str) -> int:
    """delta-spark's ``CONVERT TO DELTA``: write a Delta log at ``dst``
    whose version-0 commit references a hive-layout (or flat) parquet
    directory's files by absolute path — zero bytes move.  Path
    segments become ``partitionColumns`` + per-add ``partitionValues``
    (the log's wire strings — hive segments already are), and the
    declared schema appends the typed partition columns the data
    files don't contain; the Delta reader injects them from the log
    exactly as for native tables."""
    from .delta import _table_version

    if _table_version(dst) is not None:
        raise FileExistsError(f"delta table already exists at {dst}")
    part_cols, files, part_types, full = _prepare_migration(spark, src, dst)
    import pyarrow.parquet as _pq

    now = int(time.time() * 1000)
    actions: list[dict] = [
        {
            "commitInfo": {
                "operation": "CONVERT",
                "operationParameters": {"source": src, "format": "parquet"},
                "timestamp": now,
            }
        },
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": uuid.uuid4().hex,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": full.json(),
                "partitionColumns": part_cols,
                "configuration": {},
                "createdTime": now,
            }
        },
    ]
    for ap, vals in sorted(files):
        actions.append(
            {
                "add": {
                    "path": urllib.parse.quote(ap),
                    "partitionValues": {c: vals[c] for c in part_cols},
                    "size": os.path.getsize(ap),
                    "modificationTime": now,
                    "dataChange": True,
                    "stats": json.dumps(
                        {
                            "numRecords": int(
                                _pq.ParquetFile(ap).metadata.num_rows
                            )
                        }
                    ),
                }
            }
        )
    from .delta import _commit

    _commit(dst, 0, actions)
    return 0


# ---------------------------------------------------------------- queries


@query(
    "b_lake_addfiles",
    f"""
    SELECT o_orderpriority, count(*) AS n,
           {sql_money_sum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderkey % 11 IN (3, 4)
      AND o_orderkey % 33 <> 25
    GROUP BY o_orderpriority
    """,
)
def lake_addfiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``add_files`` migration end-to-end: a hive-layout parquet
    directory (written by Spark's own partitionBy — partition column
    NOT in the files) registers as an Iceberg table with zero copies,
    then lives a full Iceberg life: an id-stamped APPEND joins the
    id-less referenced files, and a merge-on-read positional DELETE
    keyed on BOTH a data and the partition column (the predicate only
    evaluates through the constants injection).  The final aggregate
    groups on the injected column, so a misparsed path segment, a
    mis-typed partition value, a lost file, or a broken injection all
    fail the hash."""
    from .iceberg import delete_iceberg_rows, read_iceberg, write_iceberg

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    src = _scratch(f"addfiles_src_{os.path.basename(sf_dir.rstrip('/'))}")
    dst = _scratch(f"addfiles_ice_{os.path.basename(sf_dir.rstrip('/'))}")
    done = os.path.join(dst, "_fixture_complete")
    if not os.path.exists(done):
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)
        orders.filter(F.col("o_orderkey") % 11 == 3).write.partitionBy(
            "o_orderpriority"
        ).parquet(src)
        add_files_iceberg(spark, src, dst)
        write_iceberg(
            orders.filter(F.col("o_orderkey") % 11 == 4),
            dst, mode="append", partition_by=["o_orderpriority"],
        )
        delete_iceberg_rows(
            spark, dst,
            (F.col("o_orderkey") % 33 == 25)
            & F.col("o_orderpriority").isNotNull(),
        )
        open(done, "w").close()
    back = read_iceberg(spark, dst)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        money_sum("o_totalprice").alias("total_price"),
    )


@query(
    "b_lake_convert_parquet",
    f"""
    SELECT o_orderpriority, count(*) AS n,
           {sql_money_sum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderkey % 11 IN (5, 6)
      AND o_orderkey % 33 <> 16
    GROUP BY o_orderpriority
    """,
)
def lake_convert_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``CONVERT TO DELTA`` end-to-end: the same hive-layout shape
    converts to a Delta log referencing the parquet in place, then a
    partitioned APPEND and a merge-on-read DV DELETE (predicate
    touching the log-injected partition column) land on the converted
    table.  The aggregate groups on the injected column — wrong
    partitionValues wire strings, a missed file, or DV misattribution
    fail the hash."""
    from .delta import delete_where_delta, read_delta, write_delta

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    src = _scratch(f"convpq_src_{os.path.basename(sf_dir.rstrip('/'))}")
    dst = _scratch(f"convpq_delta_{os.path.basename(sf_dir.rstrip('/'))}")
    done = os.path.join(dst, "_fixture_complete")
    if not os.path.exists(done):
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)
        orders.filter(F.col("o_orderkey") % 11 == 5).write.partitionBy(
            "o_orderpriority"
        ).parquet(src)
        convert_parquet_to_delta(spark, src, dst)
        write_delta(
            orders.filter(F.col("o_orderkey") % 11 == 6),
            dst, mode="append", partition_by=["o_orderpriority"],
        )
        delete_where_delta(
            spark, dst,
            (F.col("o_orderkey") % 33 == 16)
            & F.col("o_orderpriority").isNotNull(),
        )
        open(done, "w").close()
    back = read_delta(spark, dst)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        money_sum("o_totalprice").alias("total_price"),
    )


@query(
    "b_lake_iceberg_rewrite_posdel",
    f"""
    WITH survivors AS (
        SELECT o_orderpriority, o_totalprice
        FROM orders
        WHERE o_orderkey % 11 = 7
          AND o_orderkey % 44 <> 7
          AND o_orderkey % 44 <> 18
    )
    SELECT o_orderpriority, count(*) AS n,
           {sql_money_sum('o_totalprice')} AS total_price,
           CAST(1 AS BIGINT) AS delete_files_after
    FROM survivors
    GROUP BY o_orderpriority
    """,
)
def lake_iceberg_rewrite_posdel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rewrite_position_delete_files`` end-to-end (the maintenance
    action the streaming residency gate names): two separate
    positional-delete commits fragment the delete state, the rewrite
    consolidates them into ONE sorted file, and the read-back
    aggregate must be unchanged — with the post-rewrite delete-file
    count pinned as a literal column (the oracle says 1), so a
    rewrite that resurrects a row, over-deletes, or fails to
    consolidate all fail the hash."""
    from .iceberg import (
        _load_metadata,
        _manifest_entries,
        _snapshot_by_id,
        delete_iceberg_rows,
        read_iceberg,
        rewrite_position_delete_files,
        write_iceberg,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    path = _scratch(f"rewrite_posdel_{os.path.basename(sf_dir.rstrip('/'))}")
    done = os.path.join(path, "_fixture_complete")
    if not os.path.exists(done):
        shutil.rmtree(path, ignore_errors=True)
        write_iceberg(
            orders.filter(F.col("o_orderkey") % 11 == 7).repartition(4),
            path, mode="error", partition_by=["o_orderpriority"],
        )
        delete_iceberg_rows(spark, path, F.col("o_orderkey") % 44 == 7)
        delete_iceberg_rows(spark, path, F.col("o_orderkey") % 44 == 18)
        res = rewrite_position_delete_files(spark, path)
        assert res["delete_files_after"] == 1, res
        open(done, "w").close()
    meta = _load_metadata(path)
    _d, dels, _eq = _manifest_entries(
        path, meta, _snapshot_by_id(meta, None)
    )
    back = read_iceberg(spark, path)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        money_sum("o_totalprice").alias("total_price"),
        F.lit(len(dels)).cast("long").alias("delete_files_after"),
    )
