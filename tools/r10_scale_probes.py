"""Round-10 scale probes (numbers recorded in SCALE.md):

- add_files migration wall + per-file cost at 1x vs 10x file count
  (the O(files)-metadata claim, zero data bytes either way);
- rewrite_position_delete_files wall at 1x vs 10x delete-row volume;
- identity-partition constants injection: partitioned-scan wall with
  the injected plan vs a pre-injection-style full-schema scan, plus
  the bytes-read delta visible in ReadSchema.

Usage: python tools/r10_scale_probes.py [migrate|posdel|inject|all]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"


def probe_migrate(spark) -> None:
    from pyspark.sql import functions as F

    from aws_datalake_framework_api_spark.sources.migrate import (
        add_files_iceberg,
    )
    from aws_datalake_framework_api_spark.sources.readers import load_table

    orders = load_table(spark, SF01, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    for label, parts in (("32f", 32), ("320f", 320)):
        src = tempfile.mkdtemp(prefix="probe_mig_src_")
        dst = tempfile.mkdtemp(prefix="probe_mig_dst_") + "/t"
        shutil.rmtree(src, ignore_errors=True)
        orders.repartition(parts // 5).write.partitionBy(
            "o_orderpriority"
        ).parquet(src)
        n = sum(
            1
            for _r, _d, fs in os.walk(src)
            for f in fs
            if f.endswith(".parquet")
        )
        t0 = time.time()
        add_files_iceberg(spark, src, dst)
        wall = time.time() - t0
        meta_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(os.path.join(dst, "metadata"))
            for f in fs
        )
        print(
            f"add_files {label}: {n} files, {wall:.2f}s "
            f"({1000*wall/n:.1f} ms/file), metadata {meta_bytes/1024:.0f} KB"
        )
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(os.path.dirname(dst), ignore_errors=True)


def probe_posdel(spark) -> None:
    from pyspark.sql import functions as F

    from aws_datalake_framework_api_spark.sources.iceberg import (
        delete_iceberg_rows,
        rewrite_position_delete_files,
        write_iceberg,
    )
    from aws_datalake_framework_api_spark.sources.readers import load_table

    orders = load_table(spark, SF01, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    for label, mod in (("1x(~15k rows)", 10), ("10x(~150k rows)", 1)):
        t = tempfile.mkdtemp(prefix="probe_posdel_") + "/t"
        write_iceberg(orders.repartition(8), t, mode="error")
        # fragment the delete state across 5 commits
        for i in range(5):
            delete_iceberg_rows(
                spark, t,
                (F.col("o_orderkey") % 50 == i) if mod == 1
                else (F.col("o_orderkey") % 500 == i),
            )
        t0 = time.time()
        res = rewrite_position_delete_files(spark, t)
        wall = time.time() - t0
        print(f"rewrite_posdel {label}: {res} in {wall:.2f}s")
        shutil.rmtree(os.path.dirname(t), ignore_errors=True)


def probe_inject(spark) -> None:
    from pyspark.sql import functions as F

    from aws_datalake_framework_api_spark.sources.iceberg import (
        read_iceberg,
        write_iceberg,
    )
    from aws_datalake_framework_api_spark.sources.readers import load_table

    lineitem = load_table(spark, SF01, "lineitem")
    t = tempfile.mkdtemp(prefix="probe_inject_") + "/t"
    write_iceberg(
        lineitem.repartition(16), t, mode="error",
        partition_by=["l_returnflag"],
    )

    def agg():
        return (
            read_iceberg(spark, t)
            .filter(F.col("l_quantity") > 25)
            .groupBy("l_returnflag")
            .agg(F.sum("l_extendedprice"))
        )

    agg().write.mode("overwrite").format("noop").save()  # warm
    t0 = time.time()
    for _ in range(3):
        agg().write.mode("overwrite").format("noop").save()
    print(f"injected partitioned scan+agg x3: {time.time()-t0:.2f}s")
    plan = agg()._jdf.queryExecution().executedPlan().toString()
    rs = [ln.strip() for ln in plan.splitlines() if "ReadSchema" in ln]
    print("ReadSchema:", rs[:1])
    shutil.rmtree(os.path.dirname(t), ignore_errors=True)


def main() -> None:
    from aws_datalake_framework_api_spark.session import get_spark

    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("r10-scale-probes")
    if what in ("migrate", "all"):
        probe_migrate(spark)
    if what in ("posdel", "all"):
        probe_posdel(spark)
    if what in ("inject", "all"):
        probe_inject(spark)


if __name__ == "__main__":
    main()
