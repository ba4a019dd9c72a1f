"""Query/oracle registry.

Every implemented operator from ``SURVEY.md`` §2 registers itself here
with a ``(spark, sf_dir) -> DataFrame`` callable and (when the
semantics are ANSI-SQL-expressible) a DuckDB-runnable oracle SQL
string.  ``__spark_entry__.py`` re-exports these dicts to the driver.

Registration happens at import time of the operator modules;
``queries_all.py`` imports every module so a single
``from .queries_all import QUERIES, ORACLE`` wires the whole engine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is the equivalent
    DuckDB SQL (omit for non-SQL-expressible ops → rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
