"""The bench's split-layout prep (r12, VERDICT r11 item #3): the
re-laid-out tables must carry the same rows and actually restore scan
parallelism (the original fixture is one file / one row group, so
every scan was a single task at any core count)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _split_layout  # noqa: E402

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def split_dir():
    return _split_layout(SF_DIR, 64)


def test_split_layout_same_rows(spark, split_dir):
    """Every table's multiset of rows is unchanged by the re-layout."""
    for name in ("orders", "lineitem", "region"):
        a = spark.read.parquet(os.path.join(SF_DIR, f"{name}.parquet"))
        b = spark.read.parquet(os.path.join(split_dir, f"{name}.parquet"))
        assert a.count() == b.count()
        # exceptAll both ways == multiset equality
        assert a.exceptAll(b).limit(1).count() == 0
        assert b.exceptAll(a).limit(1).count() == 0


def test_split_layout_parallelizes_scan(spark, tmp_path):
    """With the one-file-per-task open cost the bench sets
    (openCostInBytes == maxPartitionBytes), a BIG split table's scan
    plans one input partition per ~192 KB slice (the whole point of
    the prep), while the single-file original plans exactly one.
    Slicing is byte-proportional, so the big bench SF's lineitem is
    the meaningful subject (the sf0.001 test tables are under one
    slice's worth of bytes by design)."""
    big_sf = "/root/testdata/sf0.1"
    if not os.path.isdir(big_sf):
        pytest.skip("sf0.1 fixtures unavailable")
    split_dir = _split_layout(big_sf, 64)
    spark.conf.set("spark.sql.files.openCostInBytes", str(128 * 1024 * 1024))
    try:
        split = spark.read.parquet(
            os.path.join(split_dir, "lineitem.parquet")
        ).rdd.getNumPartitions()
        single = spark.read.parquet(
            os.path.join(big_sf, "lineitem.parquet")
        ).rdd.getNumPartitions()
    finally:
        spark.conf.unset("spark.sql.files.openCostInBytes")
    assert split >= 16, f"split scan still serial: {split} partitions"
    assert single <= 2
    # byte-proportional: a small dim must NOT fan out
    small = len(os.listdir(os.path.join(split_dir, "part.parquet")))
    assert small <= 2, f"tiny dim was sliced into {small} files"


def test_split_layout_reuses_marker(split_dir):
    """Second call with an unchanged source is a no-op (marker hit)."""
    import time

    t0 = time.time()
    again = _split_layout(SF_DIR, 64)
    assert again == split_dir
    assert time.time() - t0 < 1.0
