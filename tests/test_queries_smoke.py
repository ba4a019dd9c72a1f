"""Every registered query runs at sf0.001 and returns a stable,
non-degenerate result (full oracle comparison happens in
tools/verify_local.py and the driver's gate at sf0.01)."""

import pytest

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
