"""Custom Python DataSource (Spark 4's Python Data Source API) —
the extensibility seam that lets a lake team expose ANY system
(REST catalogs, internal services, synthetic generators) as a
first-class `spark.read.format(...)` with partition-parallel reads.

The exhibit source generates rows DETERMINISTICALLY from integer
arithmetic alone (id, id % 7, a Knuth-multiplicative-hash payload),
so the DuckDB oracle can reproduce the exact content from
``generate_series`` — proving the partition→executor plumbing loses
and reorders nothing, not just that "rows came back".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..registry import query

_ROWS_PER_PART = 1000
_PARTS = 4


class _DemoPartition(InputPartition):
    def __init__(self, index: int) -> None:
        self.index = index


class DemoRowsReader(DataSourceReader):
    """Each partition yields its own id range — the same contract a
    JDBC/REST partitioned reader honors: disjoint, deterministic,
    executor-side (the generator never runs on the driver)."""

    def __init__(self, options) -> None:
        self.rows_per_part = int(options.get("rows_per_part", _ROWS_PER_PART))
        self.parts = int(options.get("parts", _PARTS))

    def partitions(self):
        return [_DemoPartition(i) for i in range(self.parts)]

    def read(self, partition):
        base = partition.index * self.rows_per_part
        for i in range(base, base + self.rows_per_part):
            # Knuth multiplicative hash payload: exact BIGINT on both
            # engines (max product ~1e13 << 2^63)
            yield (i, i % 7, (i * 2654435761) % 100000)


class DemoRowsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "demo_rows"

    def schema(self) -> str:
        return "id long, bucket int, cents long"

    def reader(self, schema) -> DataSourceReader:
        return DemoRowsReader(self.options)


@query(
    "b_source_python",
    f"""
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(min(id) AS BIGINT) AS min_id,
           CAST(max(id) AS BIGINT) AS max_id
    FROM (SELECT i AS id,
                 CAST(i % 7 AS INT) AS bucket,
                 (i * 2654435761) % 100000 AS cents
          FROM generate_series(0, {_ROWS_PER_PART * _PARTS} - 1) AS t(i))
    GROUP BY bucket
    """,
)
def source_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read from the registered custom Python data source and
    aggregate per bucket.  The oracle regenerates the identical rows
    with ``generate_series`` + the same integer formulas, so the
    hash compare certifies the full plumbing: schema declaration,
    partition planning, per-partition generator execution on
    executors, and Arrow transfer back into the JVM.

    Scale shape: N partitions read in parallel (the API's point —
    a single-threaded driver-side fetch is exactly what this seam
    replaces); the aggregate is map-combinable.  ``sf_dir`` is
    unused: this source IS the data."""
    try:
        spark.dataSource.register(DemoRowsSource)
    except Exception:  # noqa: BLE001 — already registered in this session
        pass
    df = (
        spark.read.format("demo_rows")
        .option("rows_per_part", _ROWS_PER_PART)
        .option("parts", _PARTS)
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.min("id").cast("long").alias("min_id"),
        F.max("id").cast("long").alias("max_id"),
    )
