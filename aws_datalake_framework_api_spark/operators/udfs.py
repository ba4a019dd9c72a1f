"""UDF / UDAF surface (SURVEY.md §2 B10) — the three Python
extension points, each used where it's the RIGHT tool and documented
with its cost model:

- row-at-a-time ``F.udf``: ~10-100× slower than built-ins (per-row
  pickle + GIL); exists for API completeness and genuinely scalar
  Python logic.  The query that uses it also shows the built-in
  expression that replaces it.
- ``pandas_udf``: Arrow-batched, vectorized — the right Python path
  for numeric kernels (numpy) the built-ins can't express.
- ``applyInPandas``: grouped-map for per-group model logic
  (normalization, fitting); one group = one pandas frame, so the
  largest key must fit an executor (salt mega-keys upstream).

Float policy: numpy reductions use pairwise summation while SQL
engines fold sequentially, so UDF outputs are rounded at 6 dp —
coarse enough that a last-ulp disagreement can't flip the rounding
(see functions/numeric.py)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import query
from ..sources.readers import load_table

# ---------------------------------------------------------------- scalar UDF


@query(
    "b_udf_scalar",
    """
    SELECT o_orderkey,
           o_orderstatus || ':' || split_part(o_orderpriority, '-', 1) AS label_udf,
           o_orderstatus || ':' || split_part(o_orderpriority, '-', 1) AS label_builtin
    FROM orders
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Python UDF next to its built-in replacement — the query
    output proves they agree; the plan shows why the built-in wins
    (BatchEvalPython breaks whole-stage codegen around the UDF
    column)."""
    # Kernel defined in-function: cloudpickle then serializes it BY
    # VALUE, so executor workers need no importable package (the
    # driver loads __spark_entry__.py by file path from any cwd).
    @F.udf(returnType=StringType())
    def priority_label(status: str, priority: str) -> str:
        band = priority.split("-")[0]
        return f"{status}:{band}"

    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        priority_label("o_orderstatus", "o_orderpriority").alias("label_udf"),
        F.concat_ws(
            ":", F.col("o_orderstatus"), F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1))
        ).alias("label_builtin"),
    )


# ---------------------------------------------------------------- pandas UDF


@query(
    "b_udf_pandas",
    """
    SELECT vec_id,
           round(
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(embedding, x -> CAST(x AS DOUBLE))), (a,b) -> a+b)
             / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                  (a,b) -> a+b))
                * sqrt(64.0)), 6) AS cos_ones
    FROM embeddings
    """,
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas UDF (cosine vs the ones vector).  numpy's
    pairwise summation differs from SQL's sequential fold in the last
    ulp, hence the 6 dp round on both sides."""
    @F.pandas_udf(DoubleType())
    def cos_to_ones(emb: pd.Series) -> pd.Series:
        # vectorized over Arrow batches - no per-row Python
        m = np.vstack(emb.to_numpy())
        dots = m.sum(axis=1, dtype=np.float64)
        norms = np.sqrt((m.astype(np.float64) ** 2).sum(axis=1))
        return pd.Series(dots / (norms * math.sqrt(m.shape[1])))

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", F.round(cos_to_ones("embedding"), 6).alias("cos_ones"))


# ---------------------------------------------------------------- grouped map


_Z_SCHEMA = StructType(
    [
        StructField("c_custkey", LongType(), True),
        StructField("c_mktsegment", StringType(), True),
        StructField("zscore", DoubleType(), True),
    ]
)


@query(
    "b_udf_grouped",
    """
    SELECT c_custkey, c_mktsegment,
           round((c_acctbal - avg(c_acctbal) OVER seg)
                 / stddev_samp(c_acctbal) OVER seg, 6) AS zscore
    FROM customer
    WINDOW seg AS (PARTITION BY c_mktsegment)
    """,
)
def udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``applyInPandas`` z-score per market segment; the oracle twin
    is the window formulation — proving the grouped-map kernel equals
    its relational definition (same guarantee the stateful streaming
    query pins down)."""
    def zscore(key, pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["c_acctbal"].astype(float)
        mu, sd = x.mean(), x.std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": key[0],
                "zscore": ((x - mu) / sd).round(6),
            }
        )

    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select("c_custkey", "c_mktsegment", "c_acctbal")
        .groupBy("c_mktsegment")
        .applyInPandas(zscore, schema=_Z_SCHEMA)
    )


# ------------------------------------------------------- grouped-agg UDF


@query(
    "b_udf_grouped_agg",
    """
    SELECT c_mktsegment,
           count(*) AS n,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents,
           CAST(max(CAST(round(c_acctbal * 100) AS BIGINT))
                - min(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS range_cents
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the third UDF API next to the scalar
    pandas_udf and the grouped-map ``applyInPandas``: a Series→scalar
    custom AGGREGATE that Spark evaluates per group with Arrow
    transfer (and, unlike grouped-map, composes with other aggregates
    in the same ``agg()``).

    The custom aggregates run on cent-quantized ints (sum, max−min
    range), so the result is exact and fully oracle-proven — the
    practical template for any custom sketch/statistic Spark lacks
    as a builtin.  CAVEAT at scale: a grouped-agg UDF is NOT
    partial-aggregatable — Spark shuffles the group's raw column to
    one task (unlike builtin sums, no map-side combine).  Fine for
    bounded groups; for corpus-sized groups prefer the mergeable-
    partial pattern (`b_llm_pca`'s fit, `b_agg_regression`)."""
    import pandas as pd

    @F.pandas_udf("long")
    def cents_n(s: pd.Series) -> int:
        # Spark disallows mixing grouped-agg pandas UDFs with builtin
        # aggregates in one agg() — the count rides as a UDF too
        return int(len(s))

    @F.pandas_udf("long")
    def cents_sum(s: pd.Series) -> int:
        return int(s.sum())

    @F.pandas_udf("long")
    def cents_range(s: pd.Series) -> int:
        return int(s.max() - s.min())

    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        cust.select("c_mktsegment", cents.alias("cents"))
        .groupBy("c_mktsegment")
        .agg(
            cents_n("cents").alias("n"),
            cents_sum("cents").alias("bal_cents"),
            cents_range("cents").alias("range_cents"),
        )
    )


# ---------------------------------------------------------------- UDTF


@query(
    "b_udf_table",
    r"""
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_sentences,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           CAST(max(n_words) AS BIGINT) AS longest_words
    FROM (SELECT d.doc_id,
                 len(regexp_extract_all(seg.s, '\S+')) AS n_words
          FROM documents d,
               LATERAL (SELECT unnest(string_split(d.text, '.')) AS s) seg
          WHERE trim(seg.s) <> ''
            AND d.doc_id % 10 = 0) sentences
    GROUP BY doc_id
    """,
)
def udf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) — the FOURTH Python extension
    point after scalar/pandas/grouped: one input row yields MANY
    output rows, consumed with SQL ``LATERAL`` (the `flat_map` shape
    built-ins express as explode, shown by the oracle's
    unnest twin).  The UDTF splits each sampled document into
    sentences and emits per-sentence word counts; the outer query
    folds them back per doc, so the Python fan-out never leaves the
    executor unaggregated.

    Cost model, same ethos as the scalar exhibit: a UDTF is
    row-at-a-time Python — at 100 TB this exact query should be the
    explode/split builtin chain (which the DuckDB oracle spells);
    reach for a UDTF only when the per-row expansion logic is real
    Python (a parser, a tokenizer library) that no builtin
    composition expresses."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, n_words int")
    class SentenceSplit:
        def eval(self, text):  # noqa: ANN001 — UDTF eval signature
            idx = 0
            for seg in (text or "").split("."):
                if seg.strip():
                    yield idx, len(re.findall(r"\S+", seg))
                    idx += 1

    spark.udtf.register("sentence_split", SentenceSplit)
    from ..sources.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_sentences,
               CAST(sum(n_words) AS BIGINT) AS total_words,
               CAST(max(n_words) AS BIGINT) AS longest_words
        FROM (SELECT d.doc_id, s.n_words
              FROM documents d, LATERAL sentence_split(d.text) s
              WHERE d.doc_id % 10 = 0) sentences
        GROUP BY doc_id
        """
    )


# ---------------------------------------------------------------- mapInArrow


@query(
    "b_udf_arrow",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM events
    GROUP BY event_type
    """,
)
def udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the lowest-overhead Python extension point:
    the kernel receives raw ``pyarrow.RecordBatch``es and returns
    RecordBatches, skipping even the Arrow→pandas conversion that
    ``mapInPandas`` pays.  The right seam for kernels that are
    themselves Arrow-native (Arrow compute, polars, DuckDB-embedded,
    tokenizers with Arrow bindings).

    The kernel quantizes value→cents with ``pyarrow.compute`` (the
    same cent-grid rule as the built-in path) and passes ids through;
    the aggregate then runs JVM-side.  Parity with the oracle's pure
    SQL proves the batch-level round-trip is lossless.  Cost note:
    pa.compute runs vectorized C++ — for THIS arithmetic the built-in
    expression is still better (no serialization at all); the exhibit
    documents the API for kernels built-ins can't express."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")

    def cents_kernel(batches):
        for batch in batches:
            cents = pc.cast(
                pc.round(pc.multiply(batch.column("value"), pa.scalar(100.0))),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("event_type"), cents], ["event_type", "cents"]
            )

    mapped = ev.mapInArrow(cents_kernel, "event_type string, cents long")
    return mapped.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cents").cast("long").alias("total_cents"),
    )


# ----------------------------------------------------------- pandas API


@query(
    "b_api_pandas",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100.0) AS BIGINT)) / 100.0 AS DOUBLE)
               AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def api_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas API on Spark (``pyspark.pandas``) — the migration
    surface: a pandas user's ``groupby().agg()`` runs distributed,
    unchanged, against the lake.  The frame never leaves the cluster
    (``pandas_api()`` and ``to_spark()`` are metadata conversions, not
    collects), and the generated plan is the SAME Catalyst aggregate
    the DataFrame API produces — parity with the SQL oracle proves
    the facade adds no semantics.  Cent quantization happens
    Spark-side before entering the pandas facade so the sums stay
    exact BIGINTs."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.round(F.col("value") * 100.0).cast("long").alias("cents"),
        )
    )
    psdf = ev.pandas_api()
    out = psdf.groupby("event_type", as_index=False).agg(
        n=("cents", "count"), total_cents=("cents", "sum")
    )
    sdf = out.to_spark()
    return sdf.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (F.col("total_cents") / 100.0).cast("double").alias("total_value"),
    )
