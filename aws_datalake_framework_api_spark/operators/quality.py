"""Data-asset quality expectations (SURVEY.md §2 Tier-A-adjacent).

The reference registers data assets (the data-asset Lambda/API) but
never validates them — its CRUD bodies are stubs.  A lake framework's
asset registration is only useful with a CONTRACT check behind it:
declarative expectations (not-null, range, key uniqueness,
referential integrity) evaluated per ingest batch, dbt-test /
Delta-Live-Tables-expectations class.  ``b_quality_checks`` is that
engine surface.

Scale shape: row-local expectations (null/range) fold into ONE
aggregation over a single scan — adding an expectation adds a
map-side counter, not a pass.  The two key-level expectations are the
minimum-shuffle forms: uniqueness is ``count(*) −
count(DISTINCT key)`` (two counters in the same aggregate, no
self-join), and the FK check is a broadcast-able anti-join against
the parent's key projection.  At 100 TB the whole suite is one fact
scan + one key anti-join.

The fixture is TPC-H-clean (every expectation passes), so the exhibit
UNIONs a deterministic planted-violation batch (null dates, range
breaks, duplicated keys, orphan FKs derived from ``l_orderkey % 1000
= 0`` rows) — the checks must find EXACTLY the planted counts, which
the oracle recomputes independently.  A production deployment points
the same suite at the raw batch and skips the planting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table

#: deterministic planted-violation seed: these lineitem rows are
#: cloned into a "bad batch" with one violation class each
PLANT_MOD = 1000
FK_ORPHAN_OFFSET = 10_000_000_000


def _with_planted(li: DataFrame) -> DataFrame:
    """The checked batch: the clean table UNION a cloned bad batch.
    Seed rows (l_orderkey % PLANT_MOD == 0) are cloned four ways, one
    expectation break per clone; linenumber is shifted so clones don't
    collide with real keys except where a collision IS the point."""
    seed = li.filter(F.col("l_orderkey") % PLANT_MOD == 0)
    null_dates = seed.withColumn("l_shipdate", F.lit(None).cast("timestamp"))
    bad_qty = seed.withColumn("l_quantity", F.lit(999.0)).withColumn(
        "l_linenumber", F.col("l_linenumber") + 100
    )
    dup_keys = seed  # exact clone: duplicates (l_orderkey, l_linenumber)
    orphans = seed.withColumn(
        "l_orderkey", F.col("l_orderkey") + FK_ORPHAN_OFFSET
    )
    return li.unionByName(null_dates).unionByName(bad_qty).unionByName(
        dup_keys
    ).unionByName(orphans)


_QUALITY_SQL = f"""
    WITH seed AS (
      SELECT * FROM lineitem WHERE l_orderkey % {PLANT_MOD} = 0
    ),
    batch AS (
      SELECT * FROM lineitem
      UNION ALL SELECT * REPLACE (CAST(NULL AS TIMESTAMP) AS l_shipdate) FROM seed
      UNION ALL SELECT * REPLACE (999.0 AS l_quantity,
                                  l_linenumber + 100 AS l_linenumber) FROM seed
      UNION ALL SELECT * FROM seed
      UNION ALL SELECT * REPLACE (l_orderkey + {FK_ORPHAN_OFFSET} AS l_orderkey)
        FROM seed
    ),
    rowlocal AS (
      SELECT count(*) AS n_rows,
             sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS v_null,
             sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
               AS v_range,
             count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS v_unique
      FROM batch
    ),
    fk AS (
      SELECT count(*) AS v_fk FROM batch b
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = b.l_orderkey)
    )
    SELECT c.name AS expectation,
           CAST(c.v AS BIGINT) AS n_violations,
           CAST(CASE WHEN c.v = 0 THEN 1 ELSE 0 END AS INT) AS passed,
           CAST(r.n_rows AS BIGINT) AS n_rows
    FROM rowlocal r, fk f,
         LATERAL (VALUES ('not_null_l_shipdate', r.v_null),
                         ('range_l_quantity_1_50', r.v_range),
                         ('unique_orderkey_linenumber', r.v_unique),
                         ('fk_orderkey_in_orders', f.v_fk)) c(name, v)
"""


@query("b_quality_checks", _QUALITY_SQL)
def quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the expectation suite over the planted batch; one row per
    expectation with its exact violation count and pass flag."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    batch = _with_planted(li)

    rowlocal = batch.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_shipdate").isNull().cast("int")).alias("v_null"),
        F.sum(
            ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("int")
        ).alias("v_range"),
        (
            F.count("*") - F.countDistinct("l_orderkey", "l_linenumber")
        ).alias("v_unique"),
    )
    v_fk = (
        batch.join(
            orders.select("o_orderkey"),
            batch.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("v_fk"))
    )
    stats = rowlocal.crossJoin(v_fk)  # 1-row × 1-row
    checks = [
        ("not_null_l_shipdate", "v_null"),
        ("range_l_quantity_1_50", "v_range"),
        ("unique_orderkey_linenumber", "v_unique"),
        ("fk_orderkey_in_orders", "v_fk"),
    ]
    frames = [
        stats.select(
            F.lit(name).alias("expectation"),
            F.col(col).cast("bigint").alias("n_violations"),
            (F.col(col) == 0).cast("int").alias("passed"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
        )
        for name, col in checks
    ]
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out
