"""PySpark-native analytics engine with the capabilities of
``suprakashn/aws-datalake-framework-api``.

The reference (see ``SURVEY.md``) is an AWS data-lake control plane:
a generic entity catalog (source systems / target systems / data
assets — one copy-pasted CRUD template, source-system
``lambda_function.py:56-130``), a per-call audit-event log
(``lambda_function.py:6-54``), and event-driven file ingestion
(``cft/sourceSystem.yaml:29-63``).  This package re-expresses that
surface — plus the data-lake analytics layer the reference fronts —
as idiomatic PySpark:

- ``session``   — SparkSession builder tuned for the lake workload
- ``sources``   — scans/sinks (parquet/csv/json, partitioned writes)
- ``operators`` — relational core: project/filter, joins, aggregates,
                  windows, set ops, sort/limit
- ``functions`` — scalar function families (string/date/math/null/
                  array/map/json/hash)
- ``streaming`` — Structured Streaming ingestion + event-time windows
- ``llm``       — LLM-data-pipeline operators: dedup (exact/MinHash/
                  SimHash/n-gram), similarity search, text analysis,
                  multimodal column plumbing
- ``catalog``   — the reference's generic entity CRUD + audit log
                  (Tier A of SURVEY.md §2)
- ``api``       — dispatch/validation/health (reference
                  ``lambda_function.py:132-162``)

Everything is DataFrame/SQL-first: Catalyst handles pushdown,
pruning, join selection and AQE; Python UDFs appear only where the
built-in operators cannot express the semantics (and then as
Arrow-vectorized pandas UDFs).
"""

__version__ = "0.1.0"
