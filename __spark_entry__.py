"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``aws_datalake_framework_api_spark``; this
module only adapts the registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this file by path from any cwd — make the
# sibling package importable regardless, and export it to executor
# Python workers too (cloudpickled UDF kernels that reference the
# package by module path unpickle on workers, whose sys.path comes
# from PYTHONPATH, not from this process's sys.path).
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)
_pp = os.environ.get("PYTHONPATH", "")
if _REPO_DIR not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = _REPO_DIR + (os.pathsep + _pp if _pp else "")

from aws_datalake_framework_api_spark.operators.joins import star_join  # noqa: E402
from aws_datalake_framework_api_spark.queries_all import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship star-join (revenue by nation/month) on sf0.001."""
    return star_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(ORACLE)
