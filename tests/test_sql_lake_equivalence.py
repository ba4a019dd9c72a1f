"""Layout-sweep equivalence for the DV-carrying Delta read paths
(VERDICT r10 'Next round' #1b).

The r10 driver hash-mismatched ``b_sql_lake`` — the native
``read_delta``-via-temp-view path over the partitioned + DV-deleted
fixture — on a box where no local config reproduced it.  The leading
hypothesis was a file-layout-dependent edge in the native scan's DV
anti-join / partition-map join (delta.py ``_scan_files``): the
fixture's on-disk shape used to inherit session parallelism.  This
test pins the invariant the driver checks, across every layout axis
the environment could vary:

  for each layout L:
      native read_delta rows      ==  expected surviving rows
      facade format('delta') rows ==  expected surviving rows
      the b_sql_lake join/agg through a temp view == parquet truth

Layout axes: files per partition (1 / 2 / 8), multi-row-group data
files (tiny parquet.block.size at write), split reads (tiny
spark.sql.files.maxPartitionBytes at read), and the single-scan plan
shape (partition count above _UNION_BRANCH_CAP, exercised by
test_single_scan_shape_with_dv).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from aws_datalake_framework_api_spark.functions.numeric import money_sum
from aws_datalake_framework_api_spark.sources.delta import (
    delete_where_delta,
    read_delta,
    write_delta,
)
from aws_datalake_framework_api_spark.sources.format_facade import (
    register_formats,
)
from aws_datalake_framework_api_spark.sources.readers import load_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _build(spark, sf_dir, path, n_parts, block_size=None):
    """Partitioned Delta fixture + DV delete under a controlled layout."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    src = orders.filter(F.col("o_orderkey") % 6 == 0)
    if n_parts == 1:
        src = src.coalesce(1)
    else:
        src = src.repartition(n_parts, "o_orderkey").sortWithinPartitions(
            "o_orderkey"
        )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old = hconf.get("parquet.block.size")
    try:
        if block_size is not None:
            hconf.set("parquet.block.size", str(block_size))
            hconf.set("parquet.page.size", str(max(1024, block_size // 8)))
        write_delta(src, path, mode="error",
                    partition_by=["o_orderpriority"])
    finally:
        if block_size is not None:
            if old is None:
                hconf.unset("parquet.block.size")
                hconf.unset("parquet.page.size")
            else:
                hconf.set("parquet.block.size", old)
    delete_where_delta(spark, path, F.col("o_orderkey") % 12 == 0)
    return orders


def _check_all_paths(spark, sf_dir, path, orders):
    expected = _rows(
        orders.filter(
            (F.col("o_orderkey") % 6 == 0) & (F.col("o_orderkey") % 12 != 0)
        )
    )
    native = read_delta(spark, path).select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    assert _rows(native) == expected, "native read_delta diverged"
    register_formats(spark)
    facade = (
        spark.read.format("delta").load(path)
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    )
    assert _rows(facade) == expected, "format facade diverged"
    # the b_sql_lake shape: SQL over the registered view joined against
    # a parquet view, vs the same agg recomputed with no lake machinery
    read_delta(spark, path).createOrReplaceTempView("eq_lake_orders")
    customer = load_table(spark, sf_dir, "customer")
    customer.createOrReplaceTempView("eq_customer_v")
    via_view = spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM eq_lake_orders JOIN eq_customer_v ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )
    truth = (
        orders.filter(
            (F.col("o_orderkey") % 6 == 0) & (F.col("o_orderkey") % 12 != 0)
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents"),
        )
    )
    assert _rows(via_view) == _rows(truth), "view-seam join/agg diverged"


@pytest.mark.parametrize(
    "n_parts,block_size",
    [
        (1, None),        # one file per partition
        (2, None),        # the shipped fixture's deterministic shape
        (8, None),        # many small files per partition
        (2, 16 * 1024),   # multi-row-group files
    ],
)
def test_layout_equivalence(spark, sf_dir, tmp_path, n_parts, block_size):
    path = str(tmp_path / "tbl")
    orders = _build(spark, sf_dir, path, n_parts, block_size)
    _check_all_paths(spark, sf_dir, path, orders)


def test_split_read_equivalence(spark, sf_dir, tmp_path):
    """Tiny maxPartitionBytes at READ time: every data file splits
    across many tasks, so ``_metadata.row_index`` must stay aligned
    with the physical row order the DV positions were computed from."""
    path = str(tmp_path / "tbl")
    orders = _build(spark, sf_dir, path, 2, 16 * 1024)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    try:
        _check_all_paths(spark, sf_dir, path, orders)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_single_scan_shape_with_dv(spark, sf_dir, tmp_path):
    """Above ``_UNION_BRANCH_CAP`` distinct partition tuples the native
    read switches to ONE FileScan + broadcast partition-map join; the
    DV anti-join must key correctly in that shape too (the r10 fixture
    only ever exercised the 5-partition union shape)."""
    path = str(tmp_path / "tbl")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).withColumn("bucket", (F.col("o_orderkey") % 40).cast("string"))
    src = orders.filter(F.col("o_orderkey") % 2 == 0)
    write_delta(
        src.repartition(2, "o_orderkey"), path,
        mode="error", partition_by=["bucket"],
    )
    delete_where_delta(spark, path, F.col("o_orderkey") % 4 == 0)
    expected = _rows(
        src.filter(F.col("o_orderkey") % 4 != 0)
        .select("o_orderkey", "o_custkey", "o_totalprice", "bucket")
    )
    native = read_delta(spark, path).select(
        "o_orderkey", "o_custkey", "o_totalprice", "bucket"
    )
    assert _rows(native) == expected


def test_fixture_layout_is_deterministic(spark, sf_dir, tmp_path):
    """The shipped b_scan_delta_fmt fixture layout (repartition(2, key)
    + sortWithinPartitions) must produce byte-identical data files on
    two independent builds — the property that decouples the driver
    box's parallelism from the fixture the oracle is checked against."""
    import hashlib

    def build(p):
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
        )
        write_delta(
            orders.filter(F.col("o_orderkey") % 6 == 0)
            .repartition(2, "o_orderkey")
            .sortWithinPartitions("o_orderkey"),
            p, mode="error", partition_by=["o_orderpriority"],
        )
        out = {}
        for f in glob.glob(os.path.join(p, "**", "*.parquet"),
                           recursive=True):
            rel = os.path.relpath(f, p)
            # strip the task-UUID suffix: same slot -> same content
            key = "/".join(rel.split("/")[:-1]) + "/" + rel.split("/")[-1][:16]
            out[key] = hashlib.sha256(open(f, "rb").read()).hexdigest()
        return out

    a = build(str(tmp_path / "a"))
    b = build(str(tmp_path / "b"))
    assert a == b
