"""Isolated DV-read scaling probe (VERDICT r6 item #2): after moving
deletion-vector decode + apply executor-side, measure read wall as the
DELETED-row count grows 1% -> 10% -> 30% of a fixed-size table.

The r6 measurement (driver-side decode) showed read wall 2.2x/5.6x at
10x/30x deleted rows.  The claim post-fix: driver memory stays
O(files) and the decode parallelizes, so the slope flattens.

Usage: python tools/dv_scale_probe.py
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from aws_datalake_framework_api_spark.sources.delta import (
        delete_where_delta,
        read_delta,
        write_delta,
    )

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tmp = tempfile.mkdtemp(prefix="dv_probe_")
    path = os.path.join(tmp, "t")
    try:
        li = (
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .select("l_orderkey", "l_partkey", "l_quantity")
            .withColumn("rid", F.monotonically_increasing_id())
        )
        n = li.count()
        write_delta(li.repartition(8), path, mode="error")
        # warmup read
        read_delta(spark, path).count()
        out = {"table_rows": n, "steps": []}
        deleted = 0
        # cumulative deletes: ~1%, then to ~10%, then to ~30%
        for label, mod in (("1pct", 100), ("10pct", 10), ("30pct", 3)):
            _, nd = delete_where_delta(
                spark, path, (F.col("rid") % mod) == 0
            )
            deleted += nd
            walls = []
            for _ in range(2):
                t0 = time.time()
                got = read_delta(spark, path).count()
                walls.append(round(time.time() - t0, 3))
            assert got == n - deleted, (got, n, deleted)
            out["steps"].append(
                {"label": label, "deleted_rows": deleted,
                 "read_wall_best": min(walls), "read_walls": walls}
            )
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
