"""Scalar function families (SURVEY.md §2 B8): string, date/time,
math, conditional/null, array, map, JSON, hash/privacy.

Every expression is a built-in ``pyspark.sql.functions`` call — JVM
whole-stage-codegen, never a Python UDF — so each family costs one
narrow projection over the scan (no shuffle, no Python boundary).

Cross-engine determinism rules (the DuckDB oracle compares exact
float bits, see ``tools/verify_local.py``):

- Exact IEEE ops (abs, subtract, greatest, sqrt, floor/ceil, integer
  mod) are emitted UNROUNDED — identical input doubles give identical
  outputs on any engine.
- libm-dependent ops (ln, pow) may differ in the last ulp between the
  JVM and DuckDB's libm, so they are rounded at a scale (4-6 dp)
  coarse enough that a 1-ulp disagreement cannot cross a rounding
  boundary (see functions/numeric.py for the full analysis).
- Money-ish doubles are never re-rounded at a coarser scale than they
  were generated at (boundary-crossing risk), only at finer scales.

Reference parity: the hash family realizes the reference's
column-privacy implication (``config/globalConfig.json:7``
``secret_name: "cape_privacy_key"`` — SURVEY.md A14); the JSON family
realizes the reference's untyped JSON payload envelope
(source-system ``lambda_function.py:12-14``, SURVEY.md A11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.readers import load_table

# ---------------------------------------------------------------- string


@query(
    "b_fn_string",
    """
    SELECT p_partkey,
           upper(p_name) AS up,
           lower(p_type) AS lo,
           length(p_name) AS name_len,
           split_part(p_name, ' ', 1) AS first_word,
           CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INT) AS brand_num,
           regexp_replace(p_type, ' ', '_', 'g') AS type_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
           substring(p_name, 1, 8) AS prefix8,
           concat_ws('|', p_brand, p_type) AS tagged,
           trim(p_name) AS trimmed
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, length, split_part, regexp extract/replace,
    pad, substring, concat.  (Spark ``regexp_replace`` is global by
    default; the DuckDB twin needs the explicit ``'g'`` flag.)"""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_type").alias("lo"),
        F.length("p_name").alias("name_len"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).cast("int").alias("brand_num"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        F.substring("p_name", 1, 8).alias("prefix8"),
        F.concat_ws("|", "p_brand", "p_type").alias("tagged"),
        F.trim("p_name").alias("trimmed"),
    )


# ---------------------------------------------------------------- date/time


@query(
    "b_fn_date",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dy,
           dayofweek(o_orderdate) + 1 AS dow,          -- DuckDB Sun=0, Spark Sun=1
           quarter(o_orderdate) AS qtr,
           dayofyear(o_orderdate) AS doy,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart,
           CAST(o_orderdate AS DATE) + 30 AS plus30,
           CAST(o_orderdate AS DATE) - DATE '1994-01-01' AS days_since,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extraction, truncation, arithmetic, epoch,
    formatting.  Engine-semantic deltas handled in the oracle, not
    here: DuckDB numbers Sunday 0 where Spark numbers it 1, and
    DuckDB ``epoch()`` is a fractional double where Spark
    ``unix_timestamp`` floors to seconds."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        F.dayofweek(d).alias("dow"),
        F.quarter(d).alias("qtr"),
        F.dayofyear(d).alias("doy"),
        F.date_trunc("month", d).cast("date").alias("mstart"),
        F.date_add(d.cast("date"), 30).alias("plus30"),
        F.datediff(d.cast("date"), F.lit("1994-01-01").cast("date")).alias("days_since"),
        F.unix_timestamp(d).alias("epoch_s"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


# ---------------------------------------------------------------- math


@query(
    "b_fn_math",
    """
    SELECT l_orderkey,
           l_linenumber,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           sqrt(l_extendedprice) AS price_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(pow(l_quantity, 2), 4) AS qty_sq,
           ((l_orderkey % 7) + 7) % 7 AS key_mod,
           CAST(sign(l_discount - 0.05) AS INT) AS disc_sign
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family.  abs/ceil/floor/sqrt/mod are exact IEEE → emitted
    unrounded; ln/pow are libm-dependent → rounded coarse enough that
    a last-ulp engine disagreement cannot flip the result."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


# ---------------------------------------------------------------- null/conditional


@query(
    "b_fn_null",
    """
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), '<masked>') AS seg_or_masked,
           greatest(c_acctbal, 0.0) AS bal_floor,
           least(c_acctbal, 1000.0) AS bal_cap,
           nullif(c_nationkey, 0) AS nk_nullable,
           coalesce(nullif(c_nationkey, 0), -1) AS nk_defaulted
    FROM customer
    """,
)
def fn_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null family: coalesce, nullif, greatest/least (all
    exact — no rounding needed for cross-engine agreement)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("<masked>")).alias(
            "seg_or_masked"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_cap"),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nk_nullable"),
        F.coalesce(F.nullif(F.col("c_nationkey"), F.lit(0)), F.lit(-1)).alias("nk_defaulted"),
    )


# ---------------------------------------------------------------- array


@query(
    "b_fn_array",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           sqrt(list_aggregate(
                 list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                 'sum')) AS l2_norm,
           round(CAST(embedding[1] AS DOUBLE), 4) AS head1,
           round(CAST(embedding[2] AS DOUBLE), 4) AS head2,
           round(CAST(embedding[3] AS DOUBLE), 4) AS head3,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           list_sort(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'DESC')[1] AS top1,
           list_sort(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'DESC')[2] AS top2
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over the 64-dim embedding column: size, slice,
    higher-order transform/filter/aggregate, sort.  The L2 norm
    accumulates in DOUBLE left-to-right — both engines fold the list
    sequentially over identical widened floats, so the result is
    bit-identical without rounding.  This is the same fold the
    similarity ops (B11) build their cosine on.

    Output columns are all scalar: the driver's correctness harness
    canonicalizes through a pandas sort, which cannot hash list cells
    (CORRECTNESS_r01 ``b_fn_array`` TypeError), so the array results
    are projected element-wise (``head1..3``, ``top1..2``) instead of
    as array-typed columns.  Same array ops exercised, hashable shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sorted_desc = F.sort_array(as_double, asc=False)
    head = F.transform(
        F.slice(F.col("embedding"), 1, 3), lambda x: F.round(x.cast("double"), 4)
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.sqrt(
            F.aggregate(
                F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("l2_norm"),
        head.getItem(0).alias("head1"),
        head.getItem(1).alias("head2"),
        head.getItem(2).alias("head3"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
        sorted_desc.getItem(0).alias("top1"),
        sorted_desc.getItem(1).alias("top2"),
    )


@query(
    "b_fn_explode",
    """
    SELECT e.vec_id, i - 1 AS pos, e.embedding[i] AS val
    FROM embeddings e, generate_series(1, 4) AS t(i)
    """,
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral expansion (posexplode): one row per array position.
    At scale this is the shingle/token expansion primitive the dedup
    ops use — a narrow generate, no shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.posexplode(F.slice(F.col("embedding"), 1, 4)).alias("pos", "val")
    )


# ---------------------------------------------------------------- map


@query(
    "b_fn_map",
    """
    SELECT event_id, k, v, 2 AS n_keys FROM (
      SELECT event_id, 'type' AS k, event_type AS v FROM events
      UNION ALL
      SELECT event_id, 'uid' AS k, CAST(user_id AS VARCHAR) AS v FROM events
    )
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: construct a map from columns, inspect keys, explode
    to rows.  (DuckDB's MAP output shape differs from Spark's, so the
    oracle compares the exploded relational form — same information,
    engine-neutral.)"""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"),
        F.col("event_type"),
        F.lit("uid"),
        F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.explode(m).alias("k", "v"),
        F.size(F.map_keys(m)).alias("n_keys"),
    ).select("event_id", "k", "v", "n_keys")


# ---------------------------------------------------------------- json


@query(
    "b_fn_json",
    """
    SELECT event_id,
           TRY_CAST(props->>'$.k' AS BIGINT) AS k_get,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_parsed,
           props->>'$.k' AS k_str,
           CASE WHEN props IS NOT NULL AND json_valid(props)
                     AND json_type(props) = 'OBJECT'
                THEN 1 ELSE 0 END AS is_valid
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over the ``props`` payload column — the engine's
    answer to the reference's untyped JSON envelope (source-system
    ``lambda_function.py:12-14``): payloads stay strings at rest,
    parsed on demand with ``get_json_object`` (schema projection
    pushed into the parse, no full materialization).

    ``is_valid`` means exactly "parses as a JSON OBJECT", independent
    of any field's type: ``json_object_keys`` returns NULL for
    malformed JSON and for valid non-objects (arrays, scalars), and
    an array (possibly empty) only for objects — the precise mirror
    of the oracle's ``json_valid AND json_type='OBJECT'``.  (ADVICE
    r2: the previous corrupt-record probe was typing-sensitive — a
    well-formed ``{"k":"x"}`` counted invalid on the Spark side only.)
    Both ``k`` extractions go through try_cast so a non-integral
    ``k`` degrades to NULL identically on both engines instead of
    erroring one of them."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k_get"),
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k_parsed"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.when(F.json_object_keys(F.col("props")).isNotNull(), 1)
        .otherwise(0)
        .alias("is_valid"),
    )


# ---------------------------------------------------------------- hash / privacy


@query(
    "b_fn_hash",
    """
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           substring(sha256(lower(trim(c_mktsegment))), 1, 16) AS seg_mask
    FROM customer
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/privacy family (reference A14: bucket AES256 at rest,
    ``cape_privacy_key`` column masking — ``cft/sourceSystem.yaml:23-26``,
    ``config/globalConfig.json:7``).  Deterministic keyed masking =
    hash of normalized value; both engines emit lowercase hex.
    (Spark-only ``xxhash64``/``hash`` are exercised by the dedup ops
    where no oracle twin is needed.)"""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.substring(F.sha2(F.lower(F.trim(F.col("c_mktsegment"))), 256), 1, 16).alias(
            "seg_mask"
        ),
    )


# ---------------------------------------------------------------- keyed mask


@query(
    "b_fn_mask",
    """
    SELECT c_custkey,
           sha256('cape_privacy_key' || ':' || c_name) AS name_masked,
           sha256('cape_privacy_key' || ':' || c_mktsegment) AS segment_masked,
           sha256('cape_privacy_key' || ':' || CAST(c_nationkey AS VARCHAR))
             AS nation_masked,
           count(*) OVER (PARTITION BY
             sha256('cape_privacy_key' || ':' || CAST(c_nationkey AS VARCHAR)))
             AS nation_group_size
    FROM customer
    """,
)
def fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config-keyed column masking (``GlobalConfig.secret_name`` =
    ``cape_privacy_key``, reference ``config/globalConfig.json:7`` /
    ``cft/sourceSystem.yaml:23-26``): every PII column is replaced by
    ``sha256(key_name || ':' || value)`` via :func:`config.mask_column`.
    ``nation_group_size`` proves the property that matters — masking is
    deterministic per key, so masked columns still group/join (a masked
    100 TB lake keeps its analytics), while the raw value never leaves
    the scan."""
    from ..config import GlobalConfig, mask_column

    key = GlobalConfig().secret_name
    c = load_table(spark, sf_dir, "customer")
    nation_masked = mask_column(F.col("c_nationkey"), key)
    return c.select(
        "c_custkey",
        mask_column(F.col("c_name"), key).alias("name_masked"),
        mask_column(F.col("c_mktsegment"), key).alias("segment_masked"),
        nation_masked.alias("nation_masked"),
        F.count("*")
        .over(Window.partitionBy(nation_masked))
        .alias("nation_group_size"),
    )


# ---------------------------------------------------------------- struct


@query(
    "b_fn_struct",
    """
    SELECT o_orderkey,
           ({'status': o_orderstatus,
             'prio': o_orderpriority,
             'cents': CAST(round(o_totalprice * 100) AS BIGINT)}).status
             AS s_status,
           ({'status': o_orderstatus,
             'prio': o_orderpriority,
             'cents': CAST(round(o_totalprice * 100) AS BIGINT)}).cents
             AS s_cents,
           CASE WHEN {'a': o_orderstatus} = {'a': 'F'} THEN 1 ELSE 0 END
             AS is_f
    FROM orders
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT family (B8): build a nested struct column, read fields
    back out, and compare whole structs — the nested-record shape
    every lake schema carries (and the reference's own record is a
    nested JSON document, SURVEY §1.2).  Structs are columnar-shredded
    in parquet/Tungsten, so building one is free at scan time.  The
    OUTPUT projects struct fields back to scalars: a raw struct cell
    canonicalizes as a dict and crashes the driver's hash (the same
    class of break as array columns, VERDICT r3) — construction,
    field access, and whole-struct comparison all still run in-plan."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    info = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("prio"),
        cents.alias("cents"),
    )
    return orders.select(
        "o_orderkey",
        info.alias("order_info"),
        F.when(
            F.struct(F.col("o_orderstatus").alias("a"))
            == F.struct(F.lit("F").alias("a")),
            1,
        )
        .otherwise(0)
        .alias("is_f"),
    ).select(
        "o_orderkey",
        F.col("order_info.status").alias("s_status"),
        F.col("order_info.cents").alias("s_cents"),
        "is_f",
    )


# ---------------------------------------------------------------- bitwise


@query(
    "b_fn_bitwise",
    """
    SELECT event_id,
           user_id & 255 AS low_byte,
           user_id | 4096 AS with_flag,
           xor(user_id, event_id) AS mixed,
           user_id << 3 AS shl,
           user_id >> 2 AS shr,
           bit_count(user_id) AS popcnt
    FROM events
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITWISE family (B8): AND/OR/XOR, shifts, popcount — the
    primitives under every hash/bitmap/bloom operator in this repo
    (Morton z-order interleave, SimHash bands, bitmap distinct), here
    exercised directly.  All exact-integer, trivially hash-proven."""
    ev = load_table(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    return ev.select(
        "event_id",
        u.bitwiseAND(F.lit(255)).alias("low_byte"),
        u.bitwiseOR(F.lit(4096)).alias("with_flag"),
        u.bitwiseXOR(e).alias("mixed"),
        F.shiftleft(u, 3).alias("shl"),
        F.shiftright(u, 2).alias("shr"),
        F.bit_count(u).alias("popcnt"),
    )


# ---------------------------------------------------------------- variant


@query(
    "b_fn_variant",
    """
    SELECT event_id,
           TRY_CAST(props->>'$.k' AS BIGINT) AS k_from_variant,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS parsed_ok
    FROM events
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT family (Spark 4's semi-structured type — the open-
    lakehouse answer to schemaless JSON columns): ``parse_json`` into
    a VARIANT cell, ``variant_get`` with a JSON path back out.  Unlike
    ``from_json`` (which demands a schema up front, `b_fn_json`),
    VARIANT defers typing to read time while still storing shredded
    binary — the right column type when event payloads evolve faster
    than the table schema.  The VARIANT cell itself never reaches the
    output (binary cells aren't canon-comparable); the extracted
    scalars carry the hash check against DuckDB's JSON operators."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_from_variant"),
        F.when(F.try_parse_json(F.col("props")).isNotNull(), 1)
        .otherwise(0)
        .alias("parsed_ok"),
    )


# ---------------------------------------------------------------- xml


@query(
    "b_fn_xml",
    """
    SELECT n_nationkey,
           n_name AS name_rt,
           n_regionkey AS region_rt
    FROM nation
    """,
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML family (Spark 4 ``from_xml``): serialize each nation row to
    an XML fragment in-plan, parse it back with a schema, and emit the
    roundtripped fields — proving the parse path end-to-end without an
    XML-capable oracle (DuckDB has none, so the oracle simply pins
    roundtrip == source, which is exactly the property under test).
    Fields embed via ``concat`` (names are [A-Z ] only in this
    fixture — no escaping needed; a real feed uses to_xml)."""
    nation = load_table(spark, sf_dir, "nation")
    xml = F.concat(
        F.lit("<nation><name>"),
        F.col("n_name"),
        F.lit("</name><region>"),
        F.col("n_regionkey").cast("string"),
        F.lit("</region></nation>"),
    )
    parsed = F.from_xml(xml, "name STRING, region INT")
    return nation.select(
        "n_nationkey",
        parsed.getField("name").alias("name_rt"),
        parsed.getField("region").alias("region_rt"),
    )


# ---------------------------------------------------------------- url


@query(
    "b_fn_url",
    """
    SELECT doc_id,
           source || '.example.com' AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS path,
           'lang=' || lang AS query_string,
           lang AS lang_param
    FROM documents
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL family (`parse_url`): build a canonical URL per document
    in-plan, then extract HOST / PATH / QUERY / a named query param —
    the domain-extraction primitive every web-corpus curation pipeline
    runs (per-domain quality priors, domain blocklists, host-level
    dedup all key on exactly this).  DuckDB has no URL parser, so the
    oracle pins roundtrip == the components the URL was built from —
    precisely the property under test (same pattern as `b_fn_xml`)."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query_string"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )
