"""Lake-scale MERGE (sources/lake.py): upsert semantics AND the
partition-level cost model — untouched partitions' files must survive
the merge byte-identically (the property that makes MERGE affordable
at 100 TB)."""

import os

from pyspark.sql import functions as F

from aws_datalake_framework_api_spark.sources.lake import (
    BUMP_CENTS,
    INS_MOD,
    INS_STATUS,
    KEY_OFFSET,
    UPD_MOD,
    _orders_cents,
    _staged_target,
    merge_batch,
)


def _partition_files(target_dir):
    """{partition_value: {relpath: (size, mtime_ns)}} for data files."""
    out = {}
    for part in os.listdir(target_dir):
        if not part.startswith("o_orderstatus="):
            continue
        val = part.split("=", 1)[1]
        pdir = os.path.join(target_dir, part)
        out[val] = {
            f: (os.path.getsize(os.path.join(pdir, f)),
                os.stat(os.path.join(pdir, f)).st_mtime_ns)
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        }
    return out


def test_merge_rewrites_only_touched_partitions(spark, sf_dir):
    """Dynamic partition overwrite: with a batch restricted to ONE
    status, the other partitions' data files must remain untouched
    (same names, sizes, mtimes) and the insert partition must appear."""
    target_dir = _staged_target(spark, sf_dir)
    before = _partition_files(target_dir)
    assert set(before) == {"F", "O", "P"}
    touched = merge_batch(spark, sf_dir, target_dir)
    after = _partition_files(target_dir)
    assert INS_STATUS in touched and INS_STATUS in after
    for status, files in before.items():
        if status in touched:
            # rewritten: file set changed or at least mtimes moved
            assert after[status] != files, f"touched partition {status} not rewritten"
        else:
            assert after[status] == files, f"untouched partition {status} was rewritten"
    # the fixture's update keys span all statuses, so assert the model
    # the other way too: every status with a matched update is touched
    orders = _orders_cents(spark, sf_dir)
    statuses_with_updates = {
        r["o_orderstatus"]
        for r in orders.filter(F.col("o_orderkey") % UPD_MOD == 0)
        .select("o_orderstatus").distinct().collect()
    }
    assert touched == statuses_with_updates | {INS_STATUS}


def test_merge_semantics_match_naive_recompute(spark, sf_dir):
    """Row-level check against a naively recomputed merge: bumped
    prices for key%97, inserted rows for key%293 in the new partition,
    everything else byte-identical."""
    target_dir = _staged_target(spark, sf_dir)
    merge_batch(spark, sf_dir, target_dir)
    got = {
        r["o_orderkey"]: (r["o_orderstatus"], r["price_cents"])
        for r in spark.read.parquet(target_dir).collect()
    }
    src = {
        r["o_orderkey"]: (r["o_orderstatus"], r["price_cents"])
        for r in _orders_cents(spark, sf_dir).collect()
    }
    want = {
        k: (s, c + (BUMP_CENTS if k % UPD_MOD == 0 else 0)) for k, (s, c) in src.items()
    }
    for k, (s, c) in src.items():
        if k % INS_MOD == 0:
            want[k + KEY_OFFSET] = (INS_STATUS, c)
    assert got == want


def test_merge_runs_are_isolated(spark, sf_dir):
    """Each lake_upsert call clones the template: two runs must not
    double-apply bumps (the clone-per-call idempotence contract)."""
    from aws_datalake_framework_api_spark.queries_all import QUERIES

    a = {tuple(r) for r in QUERIES["b_lake_upsert"](spark, sf_dir).collect()}
    b = {tuple(r) for r in QUERIES["b_lake_upsert"](spark, sf_dir).collect()}
    assert a == b


def test_cdc_apply_matches_python_reference(spark, sf_dir):
    """Last-write-wins CDC semantics vs an independent Python replay:
    updated keys carry their final bump, deleted keys are gone,
    untouched keys keep base prices — per-status totals must agree
    exactly."""
    from collections import defaultdict

    from aws_datalake_framework_api_spark.queries_all import QUERIES
    from aws_datalake_framework_api_spark.sources.lake import (
        CDC_BUMP1,
        CDC_BUMP2,
        CDC_DEL_MOD,
        CDC_UPD2_MOD,
        CDC_UPD_MOD,
        _orders_cents,
    )

    base = {
        r["o_orderkey"]: (r["o_orderstatus"], r["price_cents"])
        for r in _orders_cents(spark, sf_dir).collect()
    }
    want = defaultdict(lambda: [0, 0, 0])  # status -> [n_live, total, n_updated]
    for k, (status, cents) in base.items():
        if k % CDC_DEL_MOD == 0:
            continue  # deleted last
        final = cents
        if k % CDC_UPD2_MOD == 0:
            final = cents + CDC_BUMP2
        elif k % CDC_UPD_MOD == 0:
            final = cents + CDC_BUMP1
        want[status][0] += 1
        want[status][1] += final
        want[status][2] += int(final != cents)
    got = {
        r["o_orderstatus"]: [r["n_live"], r["total_cents"], r["n_updated"]]
        for r in QUERIES["b_lake_cdc"](spark, sf_dir).collect()
    }
    assert got == dict(want)
    # the feed must exercise all three change classes on this fixture
    assert any(k % CDC_DEL_MOD == 0 for k in base)
    assert any(k % CDC_UPD_MOD == 0 and k % CDC_DEL_MOD != 0 for k in base)


def test_compaction_reduces_files_and_preserves_rows(spark, sf_dir):
    """After compaction each partition holds ONE parquet file (was
    fragmented into many), and the row data is untouched."""
    from aws_datalake_framework_api_spark.sources.lake import (
        _orders_cents,
        compact_table,
    )

    d = compact_table(spark, sf_dir)
    for part in os.listdir(d):
        if not part.startswith("o_orderstatus="):
            continue
        files = [f for f in os.listdir(os.path.join(d, part)) if f.endswith(".parquet")]
        assert len(files) == 1, (part, len(files))
    assert spark.read.parquet(d).count() == _orders_cents(spark, sf_dir).count()
