"""Round-9 scale probes (numbers recorded in SCALE.md):

- ExactSubstr span dedup wall at sf0.1 vs the 10x salted-replica
  fixture (build it first: ``python tools/gen_scale_fixture.py 10
  tmp_scale/sf1``);
- PQ-ADC ANN wall at the same two scales;
- Delta SHALLOW CLONE wall + metadata bytes at 32 vs 320 source
  files (zero data bytes either way).

Usage: python tools/r9_scale_probes.py [substr|pq|clone|all]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF10X = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tmp_scale", "sf1",
)


def _timed(fn, *a) -> float:
    fn(*a).write.mode("overwrite").format("noop").save()  # warm
    t0 = time.time()
    fn(*a).write.mode("overwrite").format("noop").save()
    return time.time() - t0


def probe_substr(spark) -> None:
    from aws_datalake_framework_api_spark.llm.substr import llm_dedup_substr

    for label, d in (("sf0.1", SF01), ("10x", SF10X)):
        print(f"substr {label}: {_timed(llm_dedup_substr, spark, d):.2f}s")


def probe_pq(spark) -> None:
    from aws_datalake_framework_api_spark.llm.similarity import llm_knn_pq

    for label, d in (("sf0.1", SF01), ("10x", SF10X)):
        print(f"pq {label}: {_timed(llm_knn_pq, spark, d):.2f}s")


def probe_clone(spark) -> None:
    import tempfile

    from pyspark.sql import functions as F  # noqa: F401

    from aws_datalake_framework_api_spark.sources.delta import (
        clone_delta,
        read_delta,
        write_delta,
    )
    from aws_datalake_framework_api_spark.sources.readers import load_table

    orders = load_table(spark, SF01, "orders")

    def du(p: str) -> int:
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p)
            for f in fs
        )

    base = tempfile.mkdtemp(prefix="clone_probe_")
    try:
        for nfiles in (32, 320):
            src = os.path.join(base, f"src_{nfiles}")
            dst = os.path.join(base, f"dst_{nfiles}")
            write_delta(orders.repartition(nfiles), src, mode="error")
            t0 = time.time()
            clone_delta(spark, src, dst)
            dt = time.time() - t0
            ok = read_delta(spark, dst).count() == orders.count()
            print(
                f"clone files={nfiles} wall={dt * 1000:.1f}ms "
                f"src={du(src) // 1024}K dst_meta={du(dst) // 1024}K "
                f"rows_match={ok}"
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from aws_datalake_framework_api_spark.session import get_spark

    spark = get_spark("r9-scale-probes")
    if which in ("substr", "all"):
        probe_substr(spark)
    if which in ("pq", "all"):
        probe_pq(spark)
    if which in ("clone", "all"):
        probe_clone(spark)


if __name__ == "__main__":
    main()
