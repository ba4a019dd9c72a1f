"""A11: the API-Gateway request envelope, materialized as DATA.

The reference's gateway wraps every request in a VTL-built JSON
envelope before it reaches a Lambda (``swagger/aws-dl-fmwrk-swagger-
apigateway.yaml`` requestTemplates: ``body-json`` = the raw payload,
``params`` = path/querystring/header maps with string-escaped values,
``context`` = request metadata like ``request-id`` / ``resource-path``
/ ``http-method``).  ``api.dispatch`` consumes a pre-parsed dict; this
module is the missing data-plane half — build and parse the envelope
as DataFrame columns, so a lake of raw gateway logs can be decoded
with one ``from_json`` projection (typed schema pushed into the parse,
no Python in the hot path)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query
from .sources.readers import load_table

#: from_json DDL for the envelope, body typed per caller.  VTL quotes
#: every params value (``$util.escapeJavaScript``), so querystring
#: fields are STRING here regardless of their logical type.
_ENVELOPE_DDL = (
    "`body-json` STRUCT<{body}>, "
    "params STRUCT<querystring: STRUCT<tasktype: STRING, user_id: STRING>>, "
    "context STRUCT<`http-method`: STRING, `request-id`: STRING, "
    "`resource-path`: STRING>"
)


def make_envelope(body_json: Column, tasktype: Column, user_id: Column,
                  request_id: Column, resource_path: str,
                  http_method: str = "POST") -> Column:
    """Build the gateway envelope as a JSON string column — the
    engine-side twin of the swagger VTL template (body passes through
    as nested JSON; params values stringify, as VTL escapes them)."""
    return F.to_json(
        F.struct(
            body_json.alias("body-json"),
            F.struct(
                F.struct(
                    tasktype.alias("tasktype"),
                    user_id.cast("string").alias("user_id"),
                ).alias("querystring")
            ).alias("params"),
            F.struct(
                F.lit(http_method).alias("http-method"),
                request_id.alias("request-id"),
                F.lit(resource_path).alias("resource-path"),
            ).alias("context"),
        )
    )


def parse_envelope(df: DataFrame, envelope_col: str, body_ddl: str) -> DataFrame:
    """Decode an envelope column into a typed ``env`` struct —
    ``from_json`` with the full envelope schema; callers project
    ``env['body-json']`` / ``env.params`` / ``env.context`` fields."""
    return df.withColumn(
        "env", F.from_json(F.col(envelope_col), _ENVELOPE_DDL.format(body=body_ddl))
    )


@query(
    "b_envelope",
    """
    WITH env AS (
      SELECT event_id,
             json_object(
               'body-json', props::JSON,
               'params', json_object('querystring', json_object(
                   'tasktype', event_type,
                   'user_id', CAST(user_id AS VARCHAR))),
               'context', json_object(
                   'http-method', 'POST',
                   'request-id', 'req-' || CAST(event_id AS VARCHAR),
                   'resource-path', '/events/create')
             ) AS envelope
      FROM events
    )
    SELECT event_id,
           CAST(envelope->'body-json'->>'k' AS BIGINT) AS body_k,
           envelope->'params'->'querystring'->>'tasktype' AS tasktype,
           CAST(envelope->'params'->'querystring'->>'user_id' AS BIGINT) AS user_id,
           envelope->'context'->>'request-id' AS request_id,
           envelope->'context'->>'resource-path' AS resource_path,
           envelope->'context'->>'http-method' AS http_method
    FROM env
    """,
)
def envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the A11 envelope over the events table: wrap each
    event's ``props`` payload in a gateway envelope, then decode it
    with ``from_json`` and project the typed fields back out.  Both
    build and parse are pure JVM JSON expressions — at 100 TB this is
    a scan-bound single pass, no shuffle."""
    ev = load_table(spark, sf_dir, "events")
    wrapped = ev.select(
        "event_id",
        make_envelope(
            body_json=F.from_json(F.col("props"), "k BIGINT"),
            tasktype=F.col("event_type"),
            user_id=F.col("user_id"),
            request_id=F.concat(F.lit("req-"), F.col("event_id").cast("string")),
            resource_path="/events/create",
        ).alias("envelope"),
    )
    parsed = parse_envelope(wrapped, "envelope", "k: BIGINT")
    env = F.col("env")
    return parsed.select(
        "event_id",
        env["body-json"]["k"].alias("body_k"),
        env["params"]["querystring"]["tasktype"].alias("tasktype"),
        env["params"]["querystring"]["user_id"].cast("bigint").alias("user_id"),
        env["context"]["request-id"].alias("request_id"),
        env["context"]["resource-path"].alias("resource_path"),
        env["context"]["http-method"].alias("http_method"),
    )
