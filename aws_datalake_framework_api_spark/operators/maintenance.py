"""Operational / maintenance queries (SURVEY.md §2 Tier B adjacents):
the jobs a lake team runs ABOUT its tables, not on behalf of an
analyst — skew diagnostics before a big join, incremental
materialized-view maintenance instead of full recompute, and
snapshot-to-snapshot data diffing for reconciliation.  All three are
exact-integer (or selection-only) plans with full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table, register_views

# ---------------------------------------------------------------- skew report

# Key-frequency histogram on log2 buckets.  THE pre-flight check
# before shuffling 100 TB on a key: one partial-aggregatable groupBy
# over the fact gives per-key counts, then a second (tiny — one row
# per distinct key) groupBy folds them into ~40 histogram rows.  A
# max bucket far above the median bucket is the salting signal
# (`b_join_salted` / `b_agg_salted` are the remedies this report
# triggers).  log2 of an exact integer count is exact at every power
# of two, so the floor cannot straddle an ulp between engines.
_SKEW_SQL = """
SELECT CAST(floor(log2(cnt)) AS INT) AS bucket_log2,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(max(cnt) AS BIGINT) AS max_key_rows
FROM (SELECT user_id, count(*) AS cnt
      FROM events
      GROUP BY user_id) AS per_key
GROUP BY CAST(floor(log2(cnt)) AS INT)
"""


@query("b_diag_skew", _SKEW_SQL)
def diag_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report for events.user_id: how many keys and
    rows land in each power-of-two frequency bucket, plus the heaviest
    key's row count.  Cost = one map-combinable aggregate of the fact
    + one aggregate of key-cardinality-sized data; output is O(log n)
    rows regardless of scale."""
    register_views(spark, sf_dir)
    return spark.sql(_SKEW_SQL)


# ------------------------------------------------- incremental MV maintenance

# Materialized-view delta maintenance: the monthly-rollup MV is
# 'current' through the cutoff; a new micro-batch arrives; the
# refreshed MV is state ⊎ batch-aggregate — two partial aggregates
# merged by key, NEVER a rescan of history.  Counts and cent-grid
# sums are the classic self-maintainable aggregates (avg derives as
# sum/count downstream; min/max would need the deletion log).  The
# oracle recomputes the rollup from scratch — equality of the two IS
# the incremental-maintenance correctness statement.
# Two-thirds through the fixture's single observed month, so BOTH
# partials are non-trivial (state ~2/3, batch ~1/3 of events).
_MV_CUTOFF = "TIMESTAMP '2024-01-20'"

_MV_SQL = """
SELECT event_type,
       CAST(date_trunc('month', ts) AS DATE) AS month,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) / 100.0 AS DOUBLE)
           AS total_value
FROM events
GROUP BY event_type, CAST(date_trunc('month', ts) AS DATE)
"""


@query("b_mv_incremental", _MV_SQL)
def mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained monthly rollup: aggregate the
    pre-cutoff state and the post-cutoff batch SEPARATELY, then merge
    by (type, month) — the union re-aggregates rollup-sized inputs,
    so refresh cost is O(state + batch), independent of history
    depth.  At 100 TB this is the difference between a nightly
    full-table job and a minutes-long merge; the cent-grid BIGINT
    sums make the merge bit-identical to the oracle's from-scratch
    recompute under ANY partial-aggregation order."""
    register_views(spark, sf_dir)
    part = """
        SELECT event_type,
               CAST(date_trunc('month', ts) AS DATE) AS month,
               count(*) AS n,
               sum(CAST(round(value * 100.0) AS BIGINT)) AS cents
        FROM events WHERE ts {op} {cutoff}
        GROUP BY event_type, CAST(date_trunc('month', ts) AS DATE)
    """
    state = part.format(op="<", cutoff=_MV_CUTOFF)
    batch = part.format(op=">=", cutoff=_MV_CUTOFF)
    return spark.sql(f"""
        SELECT event_type,
               month,
               CAST(sum(n) AS BIGINT) AS n,
               CAST(sum(cents) / 100.0 AS DOUBLE) AS total_value
        FROM (({state}) UNION ALL ({batch})) AS partials
        GROUP BY event_type, month
    """)


# ---------------------------------------------------------------- table diff

# Snapshot reconciliation: classify every key of two table versions
# as added / removed / changed / unchanged and report counts — the
# data-diff audit that backs migration sign-off and replication
# checks.  The synthetic snapshots below derive DETERMINISTICALLY
# from the orders fixture (drop-by-modulus + a point mutation), so
# both engines build identical inputs from the shared parquet.
_DIFF_SQL = """
WITH snap_a AS (
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 50 <> 0
),
snap_b AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
           o_totalprice
    FROM orders WHERE o_orderkey % 73 <> 0
)
SELECT change_class,
       CAST(count(*) AS BIGINT) AS n_keys
FROM (SELECT CASE
                 WHEN a.o_orderkey IS NULL THEN 'added'
                 WHEN b.o_orderkey IS NULL THEN 'removed'
                 WHEN a.o_orderstatus <> b.o_orderstatus
                   OR a.o_totalprice <> b.o_totalprice THEN 'changed'
                 ELSE 'unchanged'
             END AS change_class
      FROM snap_a a
      FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey) AS classified
GROUP BY change_class
"""


@query("b_diff_snapshot", _DIFF_SQL)
def diff_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-snapshot diff summary over orders.  Plan: ONE full outer
    sort-merge join on the primary key (both snapshots shuffle once on
    o_orderkey), per-row classification in codegen, then a 4-row
    aggregate — cost is a single co-partitioned pass regardless of
    table width; at 100 TB you'd bucket both snapshots on the key and
    the exchange disappears entirely (`b_join_bucketed` shows that
    plan).  Column comparisons are exact (selections of the same
    parquet values, no arithmetic)."""
    register_views(spark, sf_dir)
    return spark.sql(_DIFF_SQL)


# ------------------------------------------------------------- observe API


@query(
    "b_diag_observe",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(CASE WHEN value IS NULL THEN 1 END) AS BIGINT)
               AS n_null_value,
           CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
               AS n_purchase,
           CAST(sum(CAST(round(value * 100.0) AS BIGINT)) / 100.0 AS DOUBLE)
               AS total_value,
           CAST((SELECT count(*)
                 FROM (SELECT event_type, count(*)
                       FROM events GROUP BY event_type)) AS BIGINT)
               AS main_job_rows
    FROM events
    """,
)
def diag_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-flight pipeline metrics via Spark's ``Observation`` API —
    the monitoring pattern that beats a second scan: data-quality
    counters (row count, null count, cent-grid total, per-class counts)
    accumulate DURING the main job's only pass over the fact, not in
    a separate audit query.  At 100 TB the difference is one full
    scan vs two; the observe() aggregates ride the same tasks as the
    main aggregation, cost a few registers each, and arrive on the
    driver with the job result.

    The returned row carries the observed metrics PLUS the main
    job's own output size, and the oracle recomputes all of them
    from raw events — so a metric that silently missed rows (e.g.
    observe attached after a filter instead of before) fails the
    hash.  Observed metrics reject DISTINCT aggregates by design
    (they must be mergeable per-task registers); cardinality watching
    belongs to approx_count_distinct, as `b_agg_approx` exhibits."""
    from pyspark.sql import Observation

    from ..sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    obs = Observation("quality")
    watched = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("n_null_value"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchase"),
        F.sum(F.round(F.col("value") * 100.0).cast("long")).alias("cents"),
    )
    # the "main job": the per-type rollup a pipeline would actually
    # ship; its action is what populates the observation.
    main_rows = watched.groupBy("event_type").count().count()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["n_null_value"]),
                int(m["n_purchase"]),
                m["cents"] / 100.0,
                int(main_rows),
            )
        ],
        "n_rows long, n_null_value long, n_purchase long, "
        "total_value double, main_job_rows long",
    )


# ---------------------------------------------------------- column profile


@query(
    "b_diag_profile",
    """
    SELECT col,
           CAST(n AS BIGINT) AS n,
           CAST(n_null AS BIGINT) AS n_null,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(min_s AS VARCHAR) AS min_s,
           CAST(max_s AS VARCHAR) AS max_s
    FROM (
        SELECT 'o_orderstatus' AS col, count(*) AS n,
               count(*) - count(o_orderstatus) AS n_null,
               count(DISTINCT o_orderstatus) AS n_distinct,
               CAST(min(o_orderstatus) AS VARCHAR) AS min_s,
               CAST(max(o_orderstatus) AS VARCHAR) AS max_s
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*),
               count(*) - count(o_orderpriority),
               count(DISTINCT o_orderpriority),
               CAST(min(o_orderpriority) AS VARCHAR),
               CAST(max(o_orderpriority) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_custkey', count(*),
               count(*) - count(o_custkey),
               count(DISTINCT o_custkey),
               CAST(min(o_custkey) AS VARCHAR),
               CAST(max(o_custkey) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderkey', count(*),
               count(*) - count(o_orderkey),
               count(DISTINCT o_orderkey),
               CAST(min(o_orderkey) AS VARCHAR),
               CAST(max(o_orderkey) AS VARCHAR)
        FROM orders
    ) AS profile
    """,
)
def diag_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (the deequ / data-catalog 'profile this table'
    report): one row per column with row/null/distinct counts and
    min/max rendered as strings (type-erased so heterogeneous columns
    share one output schema).  The Spark side computes ALL columns'
    statistics in ONE aggregate pass (multiple aggregate expressions
    over one scan — count+null+distinct+min+max per column), then
    melts the single wide row to the per-column report; the oracle's
    4-scan UNION ALL proves the fused pass loses nothing.

    At 100 TB: one scan for the whole profile vs deequ's same trick;
    the exact distincts become approx_count_distinct past ~10⁹
    cardinality (swap documented, `b_agg_approx` exhibits the
    bound)."""
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderstatus", "o_orderpriority", "o_custkey", "o_orderkey"]
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            (F.count("*") - F.count(c)).alias(f"{c}__nn"),
            F.count_distinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__mn"),
            F.max(c).cast("string").alias(f"{c}__mx"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n`, `{c}__nn`, `{c}__nd`, `{c}__mn`, `{c}__mx`"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col, n, n_null, n_distinct, min_s, max_s)"
    ).select(
        "col",
        F.col("n").cast("long").alias("n"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("min_s").cast("string").alias("min_s"),
        F.col("max_s").cast("string").alias("max_s"),
    )


# ------------------------------------------------- retractable MV (CDC)


@query(
    "b_mv_retract",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100.0) AS BIGINT)) / 100.0 AS DOUBLE)
               AS total_value
    FROM events
    WHERE NOT (event_id % 11 = 0 AND ts >= TIMESTAMP '2024-01-20')
    GROUP BY event_type
    """,
)
def mv_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRACTABLE materialized-view maintenance — the CDC
    generalization of `b_mv_incremental`: the change feed carries
    DELETES as well as inserts, and the MV folds them as SIGNED
    deltas (+1/+cents for an insert, −1/−cents for a delete) merged
    into the standing state by key.  Counts and grid-sums are the
    abelian-group aggregates that support retraction (min/max do
    not — they'd need the full deletion log; Flink draws the same
    retract-stream line).

    Synthetic feed, deterministic on both engines: the standing MV is
    the pre-cutoff rollup; the batch INSERTS the post-cutoff rows and
    then DELETES those with event_id % 11 = 0 — so the refreshed MV
    must equal the oracle's direct aggregate with those rows
    excluded.  Refresh cost is O(state + batch); signed BIGINT deltas
    merge identically under any partial-agg order."""
    register_views(spark, sf_dir)
    cut = "TIMESTAMP '2024-01-20'"
    signed = f"""
        SELECT event_type, count(*) AS n,
               sum(CAST(round(value * 100.0) AS BIGINT)) AS cents
        FROM events WHERE ts < {cut}
        GROUP BY event_type
        UNION ALL
        SELECT event_type, count(*),
               sum(CAST(round(value * 100.0) AS BIGINT))
        FROM events WHERE ts >= {cut}
        GROUP BY event_type
        UNION ALL
        SELECT event_type, -count(*),
               -sum(CAST(round(value * 100.0) AS BIGINT))
        FROM events WHERE ts >= {cut} AND event_id % 11 = 0
        GROUP BY event_type
    """
    return spark.sql(f"""
        SELECT event_type,
               CAST(sum(n) AS BIGINT) AS n,
               CAST(sum(cents) / 100.0 AS DOUBLE) AS total_value
        FROM ({signed}) AS deltas
        GROUP BY event_type
    """)


# ------------------------------------------------- anti-entropy checksum

#: Tables fingerprinted by the replica-verification sweep.
CHECKSUM_TABLES = ("documents", "customer", "orders")


def _ck_fields(*cols: str, text_md5: bool = False) -> str:
    """NULL-canonicalized '|'-joined row digest, valid in BOTH SQL
    dialects (STRING is DuckDB's VARCHAR alias and Spark's native
    type): each field is ``coalesce(CAST(col AS STRING), chr(1))``
    so NULLs are position-preserving sentinels instead of silently
    skipped (Spark concat_ws) or row-annihilating (DuckDB ||)."""
    parts = [f"coalesce(CAST({c} AS STRING), chr(1))" for c in cols]
    if text_md5:
        parts.append("md5(coalesce(text, chr(1)))")
    return " || '|' || ".join(parts)


def _checksum_sql() -> str:
    parts = []
    # Every field is coalesced to a chr(1) sentinel BEFORE the
    # concat on BOTH engines: Spark's concat_ws would silently skip a
    # NULL column and its separator (letting ('a',NULL,'b') collide
    # with ('a','b',NULL)) while DuckDB's || chain NULL-propagates
    # (dropping the row from bit_xor entirely) — either way a NULL
    # would desynchronize an anti-entropy comparison.  With the
    # sentinel, NULL is a first-class, position-preserving value and
    # the two engines canonicalize identically.
    for t, key in (
        ("documents", _ck_fields("doc_id", "lang", "source", "n_chars", text_md5=True)),
        ("customer", _ck_fields("c_custkey", "c_name", "c_nationkey", "c_mktsegment")),
        ("orders", _ck_fields("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")),
    ):
        parts.append(
            f"""    SELECT '{t}' AS table_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(CAST(concat('0x', substring(md5({key}), 1, 12))
                        AS BIGINT)) AS BIGINT) AS checksum48
    FROM {t}"""
        )
    return "\n    UNION ALL\n".join(parts) + "\n    ORDER BY table_name"


@query("b_diag_checksum", _checksum_sql())
def diag_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprints — the anti-entropy
    primitive behind replica verification: XOR-fold a 48-bit salted
    row digest across each table so two replicas (or a primary and a
    secondary region — the data-plane half of the reference's
    `primary_region`/`secondary_region` config that `GlobalConfig`
    parses) can compare a table in O(1) exchanged bytes.  XOR is
    commutative/associative, so the checksum is independent of row
    order, partitioning, and merge order — any single-row divergence
    flips it (48-bit collision odds ~3.6e-15 per comparison).

    Scale shape: one map-only digest pass per table + an XOR
    aggregate (map-side partials, 8 bytes of state per partition);
    nothing shuffles but one long per partition.  The digest string
    canonicalizes each row exactly the same way in both engines, so
    the checksum itself — not just the row count — is oracle-pinned."""
    register_views(spark, sf_dir)
    frames = []
    for t in CHECKSUM_TABLES:
        frames.append(
            load_table(spark, sf_dir, t).agg(
                F.lit(t).alias("table_name"),
                F.count("*").cast("long").alias("n_rows"),
                F.expr(
                    f"bit_xor(CAST(conv(substring(md5({_digest_expr(t)}), 1, 12), 16, 10) AS BIGINT))"
                ).alias("checksum48"),
            )
        )
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionAll(f2)
    return out.orderBy("table_name")


def _digest_expr(t: str) -> str:
    """Spark-side twin of the per-table canonical row string used by
    :func:`diag_checksum` (bit_xor needs F.expr, so the digest is
    spelled once in SQL) — byte-identical to the oracle's because the
    expression IS the oracle's (Spark accepts VARCHAR casts, chr()
    and || natively)."""
    return {
        "documents": _ck_fields("doc_id", "lang", "source", "n_chars", text_md5=True),
        "customer": _ck_fields("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
        "orders": _ck_fields("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"),
    }[t]
