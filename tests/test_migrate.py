"""In-place parquet migration (sources/migrate.py — add_files /
CONVERT TO DELTA) and position-delete rewrite maintenance."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from aws_datalake_framework_api_spark.sources.delta import read_delta
from aws_datalake_framework_api_spark.sources.iceberg import (
    delete_iceberg_rows,
    read_iceberg,
    rewrite_position_delete_files,
    write_iceberg,
)
from aws_datalake_framework_api_spark.sources.migrate import (
    add_files_iceberg,
    convert_parquet_to_delta,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _hive(spark, path, typed=False):
    """Write a hive-layout parquet dir; returns the expected rows."""
    if typed:
        df = spark.createDataFrame(
            [
                (1, dt.date(2024, 1, 2), 10, 1.0),
                (2, dt.date(2024, 1, 2), 10, 2.0),
                (3, dt.date(2024, 3, 4), 20, 3.0),
            ],
            "k int, d date, bucket int, v double",
        )
        df.write.partitionBy("d", "bucket").parquet(path)
        return _rows(df)
    df = spark.createDataFrame(
        [(k, "a" if k % 2 else "b", float(k)) for k in range(12)],
        "k int, part string, v double",
    )
    df.write.partitionBy("part").parquet(path)
    return _rows(df)


def test_add_files_reads_back_and_lives_on(spark, tmp_path):
    src, dst = str(tmp_path / "hive"), str(tmp_path / "ice")
    want = _hive(spark, src)
    add_files_iceberg(spark, src, dst)
    got = read_iceberg(spark, dst)
    assert sorted(got.columns) == ["k", "part", "v"]
    assert _rows(got.select("k", "part", "v")) == [
        (r[0], r[1], r[2]) for r in want
    ]
    # partition-column predicate works through the constants injection
    assert (
        read_iceberg(spark, dst).filter(F.col("part") == "a").count() == 6
    )
    # iceberg-side delete + append; source dir untouched
    n_src = len(
        [
            f
            for _r, _d, fs in os.walk(src)
            for f in fs
            if f.endswith(".parquet")
        ]
    )
    delete_iceberg_rows(spark, dst, F.col("k") == 2)
    write_iceberg(
        spark.createDataFrame([(100, "a", 100.0)], "k int, part string, v double"),
        dst, mode="append", partition_by=["part"],
    )
    rows = _rows(read_iceberg(spark, dst).select("k", "part", "v"))
    assert (100, "a", 100.0) in rows and not any(r[0] == 2 for r in rows)
    assert (
        len(
            [
                f
                for _r, _d, fs in os.walk(src)
                for f in fs
                if f.endswith(".parquet")
            ]
        )
        == n_src
    )


def test_add_files_types_date_and_long_partitions(spark, tmp_path):
    src, dst = str(tmp_path / "hive"), str(tmp_path / "ice")
    want = _hive(spark, src, typed=True)
    add_files_iceberg(spark, src, dst)
    got = read_iceberg(spark, dst)
    types = {f.name: f.dataType.simpleString() for f in got.schema.fields}
    assert types["d"] == "date" and types["bucket"] == "bigint"
    assert _rows(got.select("k", "d", "bucket", "v")) == [
        (r[0], r[1], int(r[2]), r[3]) for r in want
    ]


def test_convert_parquet_to_delta_full_life(spark, tmp_path):
    from aws_datalake_framework_api_spark.sources.delta import (
        delete_where_delta,
        write_delta,
    )

    src, dst = str(tmp_path / "hive"), str(tmp_path / "dl")
    want = _hive(spark, src)
    convert_parquet_to_delta(spark, src, dst)
    got = read_delta(spark, dst)
    assert _rows(got.select("k", "part", "v")) == want
    # delta-side DV delete with a partition-column predicate + append
    delete_where_delta(
        spark, dst, (F.col("part") == "b") & (F.col("k") == 0)
    )
    write_delta(
        spark.createDataFrame([(50, "b", 50.0)], "k int, part string, v double"),
        dst, mode="append", partition_by=["part"],
    )
    rows = _rows(read_delta(spark, dst).select("k", "part", "v"))
    assert (50, "b", 50.0) in rows and not any(r[0] == 0 for r in rows)


def test_migrate_refusals(spark, tmp_path):
    # flat non-hive data containing the would-be partition column is
    # fine as a FLAT migration (no spec) but a col=value dir whose
    # files ALSO contain the column refuses
    flat = str(tmp_path / "flat")
    spark.createDataFrame(
        [(1, "a", 1.0)], "k int, part string, v double"
    ).write.parquet(flat)
    dst = str(tmp_path / "ice")
    add_files_iceberg(spark, flat, dst)
    assert read_iceberg(spark, dst).count() == 1

    weird = str(tmp_path / "weird" / "notkv")
    os.makedirs(weird)
    spark.createDataFrame([(1,)], "k int").write.mode("overwrite").parquet(
        os.path.join(weird, "x")
    )
    with pytest.raises(ValueError, match="non-hive"):
        add_files_iceberg(
            spark, str(tmp_path / "weird"), str(tmp_path / "ice2")
        )


def test_rewrite_posdel_consolidates_and_drops_dangling(spark, tmp_path):
    from aws_datalake_framework_api_spark.sources.iceberg import (
        delete_by_key_iceberg,
        rewrite_data_files,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(k, "a" if k % 2 else "b", float(k)) for k in range(40)],
        "k int, part string, v double",
    )
    write_iceberg(df.repartition(4), t, mode="error", partition_by=["part"])
    delete_iceberg_rows(spark, t, F.col("k") % 5 == 0)
    delete_iceberg_rows(spark, t, F.col("k") == 7)
    delete_by_key_iceberg(spark, t, spark.createDataFrame([(11,)], "k int"))
    before = _rows(read_iceberg(spark, t))
    res = rewrite_position_delete_files(spark, t)
    assert res["delete_files_before"] == 2 and res["delete_files_after"] == 1
    assert _rows(read_iceberg(spark, t)) == before
    # the carried equality delete keeps its strict sequence gate: a
    # re-appended key escapes it
    write_iceberg(
        spark.createDataFrame([(11, "a", 99.0)], "k int, part string, v double"),
        t, mode="append", partition_by=["part"],
    )
    rows = _rows(read_iceberg(spark, t))
    assert (11, "a", 99.0) in rows and (11, "a", 11.0) not in rows

    # dangling rows (targets compacted away) drop; content unchanged
    t2 = str(tmp_path / "t2")
    write_iceberg(df.repartition(6), t2, mode="error")
    delete_iceberg_rows(spark, t2, F.col("k") % 4 == 0)
    rewrite_data_files(spark, t2, target_file_bytes=1 << 30)
    b2 = _rows(read_iceberg(spark, t2))
    r2 = rewrite_position_delete_files(spark, t2)
    assert r2["dangling_dropped"] == 10 and r2["delete_files_after"] == 0
    assert _rows(read_iceberg(spark, t2)) == b2


def test_rename_after_migrate_reads_green_both_paths(spark, tmp_path):
    """VERDICT r10 item #6: a column rename on a migrated
    (add_files) table must read green — the id-less foreign files
    resolve renamed DATA columns through the unambiguous history
    name→id map, and the identity PARTITION columns keep coming from
    manifest metadata (constants injection) — through BOTH the native
    reader and the format facade."""
    from aws_datalake_framework_api_spark.sources.format_facade import (
        register_formats,
    )
    from aws_datalake_framework_api_spark.sources.iceberg import (
        evolve_iceberg,
    )

    src, dst = str(tmp_path / "hive"), str(tmp_path / "ice")
    want = _hive(spark, src)  # (k, part, v) rows
    add_files_iceberg(spark, src, dst)
    evolve_iceberg(dst, renames={"v": "amount"})
    native = read_iceberg(spark, dst)
    assert sorted(native.columns) == ["amount", "k", "part"]
    assert _rows(native.select("k", "part", "amount")) == want
    assert not any(
        r["part"] is None for r in native.collect()
    ), "partition column NULL-filled on the renamed migrated read"
    register_formats(spark)
    got = spark.read.format("iceberg").load(dst)
    assert _rows(got.select("k", "part", "amount")) == want
    # partition pruning still works post-rename
    assert (
        read_iceberg(spark, dst, partition_filter={"part": "a"}).count()
        == 6
    )
