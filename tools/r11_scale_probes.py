"""Round-11 scale probes (numbers recorded in SCALE.md):

- DV-carrying Delta→Iceberg conversion: wall + zero-copied-bytes at
  1× vs 10× deleted-row volume (the materialized position-delete
  commit must cost O(deleted rows) executor work + O(files) driver
  metadata, never a data-file copy);
- changelog equality-kill chunking: one LARGE single eq-delete key
  file streamed with a small maxEqDeleteRows chunk vs one big chunk —
  identical rows, walls within noise (residency, not wall, is what
  the chunk bounds);
- contiguous identity minting: append wall at 1× vs 10× rows (the
  eager-checkpoint pin + count pass are the added cost; both scale
  linearly with the batch, not the table);
- MOR Iceberg→Delta conversion: wall at 1× vs 10× merge-on-read
  delete volume (kills plan distributed, one executor-side DV bitmap
  per touched file, zero data-file copies);
- UniForm enable + refresh: wall at 1× vs 8× file count (both are
  O(files) metadata passes — per-file footer/DV work, never data).

Usage: python tools/r11_scale_probes.py
       [convert|eqchunk|mint|morconv|uniform|all]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"


def probe_convert(spark) -> None:
    from pyspark.sql import functions as F

    from aws_datalake_framework_api_spark.sources.delta import (
        delete_where_delta,
        read_delta,
        write_delta,
    )
    from aws_datalake_framework_api_spark.sources.iceberg import (
        convert_delta_to_iceberg,
        read_iceberg,
    )
    from aws_datalake_framework_api_spark.sources.readers import load_table

    orders = load_table(spark, SF01, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    for label, mod in (("~15k dv rows", 10), ("~150k dv rows", 1)):
        base = tempfile.mkdtemp(prefix="probe_conv_")
        src, dst = base + "/d", base + "/i"
        write_delta(
            orders.repartition(4, "o_orderkey"), src, mode="error",
            partition_by=["o_orderpriority"],
        )
        _v, n_del = delete_where_delta(
            spark, src, (F.col("o_orderkey") % (2 * mod)) == 0
        )
        t0 = time.time()
        convert_delta_to_iceberg(spark, src, dst)
        wall = time.time() - t0
        copied = [
            f
            for f in os.listdir(os.path.join(dst, "data"))
            if f.endswith(".parquet") and "delete-" not in f
        ]
        n_ice = read_iceberg(spark, dst).count()
        n_delta = read_delta(spark, src).count()
        print(
            f"convert_dv {label}: {n_del} deleted rows materialized, "
            f"{wall:.2f}s, copied data files: {len(copied)}, "
            f"rows match: {n_ice == n_delta}"
        )
        shutil.rmtree(base, ignore_errors=True)


def probe_eqchunk(spark) -> None:
    from aws_datalake_framework_api_spark.sources.iceberg import (
        delete_by_key_iceberg,
        write_iceberg,
    )
    from aws_datalake_framework_api_spark.sources.readers import load_table
    from aws_datalake_framework_api_spark.streaming.iceberg_source import (
        register as ice_register,
    )

    ice_register(spark)
    orders = load_table(spark, SF01, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix="probe_eq_")
    t = base + "/t"
    write_iceberg(orders.coalesce(2), t, mode="error")
    # ONE big equality-delete key file: every 3rd order (~50k keys)
    from pyspark.sql import functions as F

    keys = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey"
    )
    n_keys = keys.count()
    delete_by_key_iceberg(spark, t, keys.coalesce(1))
    results = {}
    for label, chunk in (("chunk=4k", "4096"), ("chunk=1M", "1000000")):
        out, ckpt = base + f"/o_{chunk}", base + f"/c_{chunk}"
        t0 = time.time()
        q = (
            spark.readStream.format("iceberg_stream")
            .option("readChangeFeed", "true")
            .option("maxEqDeleteRows", chunk)
            .option("startingPos", "1")
            .load(t)
            .writeStream.trigger(availableNow=True)
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        wall = time.time() - t0
        n = spark.read.parquet(out).count()
        results[label] = (wall, n)
        print(
            f"eqchunk {label}: single {n_keys}-key file, "
            f"{n} change rows, {wall:.2f}s"
        )
    (w4, n4), (w1m, n1m) = results["chunk=4k"], results["chunk=1M"]
    print(
        f"eqchunk rows identical: {n4 == n1m}; "
        f"small-chunk wall ratio {w4 / w1m:.2f}x"
    )
    shutil.rmtree(base, ignore_errors=True)


def probe_mint(spark) -> None:
    from aws_datalake_framework_api_spark.sources.delta import (
        create_identity_delta,
        read_delta,
        write_delta,
    )
    from aws_datalake_framework_api_spark.sources.readers import load_table

    orders = load_table(spark, SF01, "orders").select(
        F.col("o_orderpriority").alias("name"),
        F.col("o_totalprice").alias("v"),
    )
    n_total = orders.count()
    for label, frac in (("15k rows", 10), ("150k rows", 1)):
        base = tempfile.mkdtemp(prefix="probe_mint_")
        path = base + "/t"
        from pyspark.sql import functions as F2

        batch = orders.filter(
            (F2.monotonically_increasing_id() % frac) == 0
        ) if frac > 1 else orders
        create_identity_delta(
            spark,
            spark.createDataFrame([("seed", 0.0)], "name string, v double"),
            path, "id", start=1, step=1,
        )
        n = batch.count()
        t0 = time.time()
        write_delta(batch.repartition(8), path, mode="append")
        wall = time.time() - t0
        ids = read_delta(spark, path).agg(
            F2.min("id"), F2.max("id"), F2.count("id")
        ).collect()[0]
        contiguous = int(ids[1]) - int(ids[0]) + 1 == int(ids[2])
        print(
            f"mint {label}: {n} rows appended in {wall:.2f}s, "
            f"id range [{ids[0]}, {ids[1]}], contiguous: {contiguous}"
        )
        shutil.rmtree(base, ignore_errors=True)


from pyspark.sql import functions as F  # noqa: E402  (probe_mint uses it)

def probe_morconv(spark) -> None:
    """Iceberg→Delta conversion of a MOR-carrying snapshot: the DV
    materialization must cost distributed kill-plan work ∝ deleted
    rows + O(touched files) driver metadata — never a data copy."""
    from pyspark.sql import functions as F

    from aws_datalake_framework_api_spark.sources.delta import (
        _snapshot,
        convert_iceberg_to_delta,
        read_delta,
    )
    from aws_datalake_framework_api_spark.sources.iceberg import (
        delete_by_key_iceberg,
        delete_iceberg_rows,
        write_iceberg,
    )
    from aws_datalake_framework_api_spark.sources.readers import load_table

    orders = load_table(spark, SF01, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    for label, posmod, eqmod in (("1x", 500, 700), ("10x", 50, 70)):
        base = tempfile.mkdtemp(prefix="probe_morconv_")
        src, dst = base + "/ice", base + "/dl"
        write_iceberg(
            orders.repartition(8), src, mode="error",
            partition_by=["o_orderpriority"],
        )
        delete_iceberg_rows(
            spark, src, F.col("o_orderkey") % posmod == 0
        )
        delete_by_key_iceberg(
            spark, src,
            orders.filter(F.col("o_orderkey") % eqmod == 1).select(
                "o_orderkey"
            ),
        )
        t0 = time.time()
        convert_iceberg_to_delta(spark, src, dst)
        wall = time.time() - t0
        snap, _ = _snapshot(spark, dst)
        dv_files = sum(
            1 for a in snap.files.values() if a.get("deletionVector")
        )
        dv_card = sum(
            int((a.get("deletionVector") or {}).get("cardinality") or 0)
            for a in snap.files.values()
        )
        copied = sum(
            1
            for root, _, fs in os.walk(dst)
            for f in fs
            if f.endswith(".parquet")
        )
        n = read_delta(spark, dst).count()
        print(
            f"[morconv {label}] wall {wall:.2f}s; files_with_dv "
            f"{dv_files}; dv_cardinality {dv_card}; live rows {n}; "
            f"data parquet copied into dst: {copied} (expect 0)"
        )
        shutil.rmtree(base, ignore_errors=True)


def probe_uniform(spark) -> None:
    """UniForm enable + refresh walls at 1× vs 8× file count — both
    O(files) metadata passes (footer row counts + manifest writes),
    zero data bytes."""
    from pyspark.sql import functions as F

    from aws_datalake_framework_api_spark.sources.delta import (
        delete_where_delta,
        write_delta,
    )
    from aws_datalake_framework_api_spark.sources.iceberg import (
        enable_uniform_iceberg,
        read_iceberg,
        refresh_uniform_iceberg,
    )
    from aws_datalake_framework_api_spark.sources.readers import load_table

    orders = load_table(spark, SF01, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    for label, parts in (("1x files", 4), ("8x files", 32)):
        base = tempfile.mkdtemp(prefix="probe_uniform_")
        path = base + "/t"
        write_delta(
            orders.repartition(parts), path, mode="error",
            partition_by=["o_orderpriority"],
        )
        t0 = time.time()
        enable_uniform_iceberg(spark, path)
        w_enable = time.time() - t0
        delete_where_delta(spark, path, F.col("o_orderkey") % 97 == 0)
        t0 = time.time()
        refresh_uniform_iceberg(spark, path)
        w_refresh = time.time() - t0
        n = read_iceberg(spark, path).count()
        print(
            f"[uniform {label}] enable {w_enable:.2f}s; refresh "
            f"(with DV materialization) {w_refresh:.2f}s; iceberg "
            f"rows {n}"
        )
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    from aws_datalake_framework_api_spark.session import get_spark

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("r11-scale-probes")
    if which in ("convert", "all"):
        probe_convert(spark)
    if which in ("eqchunk", "all"):
        probe_eqchunk(spark)
    if which in ("mint", "all"):
        probe_mint(spark)
    if which in ("morconv", "all"):
        probe_morconv(spark)
    if which in ("uniform", "all"):
        probe_uniform(spark)
