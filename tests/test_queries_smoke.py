"""Every registered query runs at sf0.001 and returns a stable,
non-degenerate result (full oracle comparison happens in
tools/verify_local.py and the driver's gate at sf0.01)."""

import pytest

#: driver-budget split (r12): deep suite, excluded from the default
#: run by pytest.ini; runs via  pytest -m slow  in the builder's loop
pytestmark = pytest.mark.slow

from aws_datalake_framework_api_spark.queries_all import ORACLE, QUERIES


def test_registry_not_empty():
    assert len(QUERIES) >= 30


def test_oracle_keys_subset_of_queries():
    assert set(ORACLE) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    rows = df.count()
    assert rows >= 0
    assert len(df.columns) > 0


def test_entry_flagship(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"n_name", "o_month", "revenue", "n_items"}


def test_quality_checks_find_exactly_planted_violations(spark, sf_dir):
    """The expectation suite must count EXACTLY the planted breaks on
    top of the base table's true state: seed_n null dates, seed_n
    range breaks, seed_n FK orphans, and duplicate keys counted from
    the exact planted key multiset (the fixture's generator does NOT
    enforce key uniqueness, and clone keys can collide with base
    rows — the expectation honestly reports all of it)."""
    from pyspark.sql import functions as F

    from aws_datalake_framework_api_spark.operators.quality import PLANT_MOD
    from aws_datalake_framework_api_spark.queries_all import QUERIES
    from aws_datalake_framework_api_spark.sources.readers import load_table

    from aws_datalake_framework_api_spark.operators.quality import FK_ORPHAN_OFFSET

    li = load_table(spark, sf_dir, "lineitem")
    base_keys = [
        (r["l_orderkey"], r["l_linenumber"])
        for r in li.select("l_orderkey", "l_linenumber").collect()
    ]
    seed_keys = [(o, l) for o, l in base_keys if o % PLANT_MOD == 0]
    seed_n = len(seed_keys)
    assert seed_n > 0
    # exact expected dup count over the planted batch's key multiset
    # (clone keys can collide with base rows or each other — count,
    # don't assume)
    batch_keys = (
        base_keys
        + seed_keys                                   # null-date clones
        + [(o, l + 100) for o, l in seed_keys]        # bad-qty clones
        + seed_keys                                   # dup clones
        + [(o + FK_ORPHAN_OFFSET, l) for o, l in seed_keys]  # orphans
    )
    want_unique_viol = len(batch_keys) - len(set(batch_keys))
    got = {
        r["expectation"]: (r["n_violations"], r["passed"])
        for r in QUERIES["b_quality_checks"](spark, sf_dir).collect()
    }
    assert got == {
        "not_null_l_shipdate": (seed_n, 0),
        "range_l_quantity_1_50": (seed_n, 0),
        "unique_orderkey_linenumber": (want_unique_viol, 0),
        "fk_orderkey_in_orders": (seed_n, 0),
    }
