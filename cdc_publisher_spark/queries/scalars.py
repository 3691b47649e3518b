"""Family H — scalar functions (SURVEY.md §2.2 H).

One query per function group, each a thin projection over a base table
so the whole thing stays inside whole-stage codegen. The JSON group is
the batch form of the reference's T1/T2 payload parse (core.clj:17);
the regexp group mirrors its queue-ref split (jms_publisher.clj:179).

Dialect pairing notes (Spark ↔ DuckDB):
- split: Spark's pattern is a Java regex, DuckDB string_split is
  literal — pass a literal-safe separator only.
- transcendentals (ln/exp/power): libm results can differ in the last
  ulp across runtimes → ROUND(…, 6).
- epoch: unix_micros ↔ epoch_us (both BIGINT); DuckDB year()/etc.
  return BIGINT and are cast to match Spark's INT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load


@register(
    "q_h1_string_funcs",
    family="H",
    doc="concat/substr/upper/lower/trim/length/replace/lpad over part.",
    oracle="""
        SELECT p_partkey,
               p_brand || '#' || p_type                    AS brand_type,
               substr(p_name, 1, 10)                       AS name10,
               upper(p_name)                               AS name_up,
               lower(p_brand)                              AS brand_lo,
               trim('  ' || p_name || '  ')                AS name_trim,
               CAST(length(p_name) AS INT)                 AS name_len,
               replace(p_type, 'E', '3')                   AS type_l33t,
               lpad(p_brand, 12, '*')                      AS brand_pad
        FROM part
        ORDER BY p_partkey
    """,
)
def q_h1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.substring("p_name", 1, 10).alias("name10"),
        F.upper("p_name").alias("name_up"),
        F.lower("p_brand").alias("brand_lo"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit("E"), F.lit("3")).alias("type_l33t"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
    ).orderBy("p_partkey")


@register(
    "q_h2_regexp_queue_ref",
    family="H",
    doc="The reference's queue-ref split (schema.queue via regex, "
    "jms_publisher.clj:179) as regexp_extract + split over synthetic "
    "'schema.queue' strings.",
    oracle="""
        WITH refs AS (
            SELECT p_partkey,
                   lower(p_type) || '.' || replace(lower(p_name), ' ', '_') AS queue_ref
            FROM part
        )
        SELECT p_partkey, queue_ref,
               regexp_extract(queue_ref, '^([^.]+)\\.(.+)$', 1) AS schema_part,
               regexp_extract(queue_ref, '^([^.]+)\\.(.+)$', 2) AS queue_part,
               string_split(queue_ref, '.')[1]                  AS schema_by_split,
               regexp_extract(queue_ref, '([a-z]+)_([a-z]+)', 2) AS name_word2
        FROM refs
        ORDER BY p_partkey
    """,
)
def q_h2_regexp_queue_ref(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    ref = F.concat(
        F.lower("p_type"), F.lit("."), F.replace(F.lower("p_name"), F.lit(" "), F.lit("_"))
    )
    refs = p.select("p_partkey", ref.alias("queue_ref"))
    pat = r"^([^.]+)\.(.+)$"
    return refs.select(
        "p_partkey",
        "queue_ref",
        F.regexp_extract("queue_ref", pat, 1).alias("schema_part"),
        F.regexp_extract("queue_ref", pat, 2).alias("queue_part"),
        F.split("queue_ref", r"\.").getItem(0).alias("schema_by_split"),
        F.regexp_extract("queue_ref", r"([a-z]+)_([a-z]+)", 2).alias("name_word2"),
    ).orderBy("p_partkey")


@register(
    "q_h3_datetime_funcs",
    family="H",
    doc="year/month/day/date_trunc/date_add/datediff/to_date/epoch "
    "over orders.",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT)                      AS yr,
               CAST(month(o_orderdate) AS INT)                     AS mo,
               CAST(day(o_orderdate) AS INT)                       AS dy,
               CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
               CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR)     AS due_date,
               CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since_epoch_start,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR)          AS order_date,
               epoch_us(o_orderdate)                               AS order_us
        FROM orders
        ORDER BY o_orderkey
    """,
)
def q_h3_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("string").alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch_start"
        ),
        F.to_date("o_orderdate").cast("string").alias("order_date"),
        F.unix_micros("o_orderdate").alias("order_us"),
    ).orderBy("o_orderkey")


@register(
    "q_h4_math_funcs",
    family="H",
    doc="round/floor/ceil/abs/mod/power/sqrt/ln/exp/sign over lineitem.",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice, 1)                    AS price_r1,
               CAST(floor(l_extendedprice) AS BIGINT)       AS price_floor,
               CAST(ceil(l_extendedprice) AS BIGINT)        AS price_ceil,
               ROUND(abs(l_discount - 0.05), 4)             AS disc_dev,
               l_orderkey % 7                               AS key_mod7,
               ROUND(power(l_quantity, 2), 4)               AS qty_sq,
               ROUND(sqrt(l_quantity), 6)                   AS qty_sqrt,
               ROUND(ln(l_extendedprice), 6)                AS price_ln,
               ROUND(exp(l_discount), 6)                    AS disc_exp,
               CAST(sign(l_quantity - 25.0) AS INT)         AS qty_sign
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber
    """,
)
def q_h4_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.signum(F.col("l_quantity") - 25.0).cast("int").alias("qty_sign"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q_h5_conditional_funcs",
    family="H",
    doc="CASE WHEN / coalesce / nullif / least / greatest over customer.",
    oracle="""
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                    WHEN c_acctbal < 5000 THEN 'standard'
                    ELSE 'premium' END                       AS tier,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '-') AS seg_or_dash,
               ROUND(LEAST(c_acctbal, 1000.0), 2)            AS capped,
               ROUND(GREATEST(c_acctbal, 0.0), 2)            AS floored
        FROM customer
        ORDER BY c_custkey
    """,
)
def q_h5_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("-")).alias(
            "seg_or_dash"
        ),
        F.round(F.least("c_acctbal", F.lit(1000.0)), 2).alias("capped"),
        F.round(F.greatest("c_acctbal", F.lit(0.0)), 2).alias("floored"),
    ).orderBy("c_custkey")


@register(
    "q_h6_json_extract",
    family="H",
    doc="JSON payload access — batch T1/T2 (core.clj:17): "
    "get_json_object + typed from_json over events.props.",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k')                 AS k_str,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
               CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS absent
        FROM events
        ORDER BY event_id
    """,
)
def q_h6_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    parsed = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getItem("k").alias("k_num"),
        F.get_json_object("props", "$.missing").alias("absent"),
    ).orderBy("event_id")


@register(
    "q_h7_array_funcs",
    family="H",
    doc="Array functions over embeddings: size/min/max/first element "
    "(float elements cast to double — exact — before rounding).",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INT)                            AS dim,
               ROUND(CAST(list_min(embedding) AS DOUBLE), 4)          AS elem_min,
               ROUND(CAST(list_max(embedding) AS DOUBLE), 4)          AS elem_max,
               ROUND(CAST(embedding[1] AS DOUBLE), 4)                 AS first_elem
        FROM embeddings
        ORDER BY vec_id
    """,
)
def q_h7_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_min("embedding").cast("double"), 4).alias("elem_min"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("elem_max"),
        F.round(F.col("embedding").getItem(0).cast("double"), 4).alias("first_elem"),
    ).orderBy("vec_id")


@register(
    "q_h8_explode_embeddings",
    family="H",
    doc="posexplode / UNNEST: first 20 vectors to (vec_id, pos, val).",
    oracle="""
        SELECT vec_id, CAST(i - 1 AS INT) AS pos,
               ROUND(CAST(embedding[i] AS DOUBLE), 4) AS val
        FROM embeddings
        CROSS JOIN generate_series(1, 64) g(i)
        WHERE vec_id < 20 AND i <= len(embedding)
        ORDER BY vec_id, pos
    """,
)
def q_h8_explode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select("vec_id", "pos", F.round(F.col("val").cast("double"), 4).alias("val"))
        .orderBy("vec_id", "pos")
    )


@register(
    "q_h9_array_agg_sorted",
    family="H",
    doc="Ordered array aggregation per group (collect_list with sort "
    "guard — collect order is nondeterministic, sort_array fixes it). "
    "The array is emitted as a comma-joined string so list cells stay "
    "hashable through pandas-based canonicalizers (driver harness sorts "
    "cells; numpy arrays are unhashable).",
    oracle="""
        SELECT label,
               array_to_string(list_sort(list(vec_id)), ',') AS vec_ids,
               COUNT(*) AS n
        FROM embeddings
        WHERE vec_id < 100
        GROUP BY label
        ORDER BY label
    """,
)
def q_h9_array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return (
        e.groupBy("label")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("vec_id"))).alias("vec_ids"),
            F.count("*").alias("n"),
        )
        .orderBy("label")
    )


@register(
    "q_h10_map_funcs",
    family="H",
    doc="Map functions over parsed JSON: map_keys / map_entries "
    "(oracle via DuckDB json_keys, which lacks a native map from JSON).",
    oracle="""
        SELECT event_id,
               array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
               array_to_string(
                   list_transform(list_sort(json_keys(props)),
                                  k -> k || '=' || json_extract_string(props, '$.' || k)),
                   ',') AS entries_csv
        FROM events
        ORDER BY event_id
    """,
)
def q_h10_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    keys_sorted = F.array_sort(F.map_keys(m))
    return ev.select(
        "event_id",
        F.concat_ws(",", keys_sorted).alias("keys_csv"),
        F.concat_ws(
            ",",
            F.transform(keys_sorted, lambda k: F.concat(k, F.lit("="), F.element_at(m, k))),
        ).alias("entries_csv"),
    ).orderBy("event_id")


@register(
    "q_h11_array_predicates",
    family="H",
    doc="array_contains / sort_array / array_distinct over tokenized "
    "documents (string arrays; the numeric-array ops are q_h7/q_h8).",
    oracle="""
        SELECT doc_id,
               list_contains(string_split(text, ' '), 'spark')      AS has_spark,
               list_sort(list_distinct(string_split(text, ' ')))[1] AS first_word,
               CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct
        FROM documents
        ORDER BY doc_id
    """,
)
def q_h11_array_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), r"\s+")
    staged = docs.select("doc_id", ws.alias("ws"))
    return staged.select(
        "doc_id",
        F.array_contains("ws", "spark").alias("has_spark"),
        F.sort_array(F.array_distinct("ws")).getItem(0).alias("first_word"),
        F.size(F.array_distinct("ws")).alias("n_distinct"),
    ).orderBy("doc_id")


@register(
    "q_h12_string_extras",
    family="H",
    doc="initcap/reverse/repeat/left/right/strpos over part.",
    oracle="""
        SELECT p_partkey,
               CAST(strpos(p_name, ' ') AS INT)  AS space_at,
               reverse(p_brand)                  AS brand_rev,
               repeat(p_type, 2)                 AS type_x2,
               left(p_name, 4)                   AS name_l4,
               right(p_name, 4)                  AS name_r4,
               upper(p_name[1]) || substr(p_name, 2) AS name_cap
        FROM part
        ORDER BY p_partkey
    """,
)
def q_h12_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.instr("p_name", " ").alias("space_at"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_type", 2).alias("type_x2"),
        F.substring("p_name", 1, 4).alias("name_l4"),
        F.substring(F.col("p_name"), -4, 4).alias("name_r4"),
        F.concat(
            F.upper(F.substring("p_name", 1, 1)), F.expr("substring(p_name, 2)")
        ).alias("name_cap"),
    ).orderBy("p_partkey")


@register(
    "q_h13_hash_funcs",
    family="H",
    doc="Cryptographic digests (md5 / sha256) — content-addressing "
    "primitives for dedup keys.",
    oracle="""
        SELECT doc_id,
               md5(text)    AS h_md5,
               sha256(text) AS h_sha256
        FROM documents
        ORDER BY doc_id
    """,
)
def q_h13_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
    ).orderBy("doc_id")


@register(
    "q_h14_bitwise",
    family="H",
    doc="Bitwise ops (&, |, xor, shifts, bit_count) over keys.",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_orderkey & 255                        AS low_byte,
               l_orderkey | 1                          AS odd_key,
               xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS x,
               l_orderkey << 2                         AS shl2,
               l_orderkey >> 3                         AS shr3,
               CAST(bit_count(l_orderkey) AS INT)      AS pop
        FROM lineitem
        WHERE l_orderkey < 500
        ORDER BY l_orderkey, l_linenumber
    """,
)
def q_h14_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    key = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        key.bitwiseAND(F.lit(255)).alias("low_byte"),
        key.bitwiseOR(F.lit(1)).alias("odd_key"),
        key.bitwiseXOR(F.col("l_linenumber").cast("bigint")).alias("x"),
        F.shiftleft(key, 2).alias("shl2"),
        F.shiftright(key, 3).alias("shr3"),
        F.bit_count(key).alias("pop"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q_h15_try_and_nullsafe",
    family="H",
    doc="ANSI-safe variants: try_cast / try_divide (NULL instead of "
    "throwing under ANSI mode) and null-safe equality (<=> / IS NOT "
    "DISTINCT FROM).",
    oracle="""
        SELECT doc_id,
               TRY_CAST(lang AS INTEGER)                       AS lang_as_int,
               TRY_CAST(CAST(n_chars AS VARCHAR) AS BIGINT)    AS chars_roundtrip,
               n_chars / NULLIF(CAST(doc_id % 3 AS BIGINT), 0) AS risky_div,
               (NULLIF(lang, 'en') IS NOT DISTINCT FROM NULLIF(source, 'src0')) AS ns_eq
        FROM documents
        ORDER BY doc_id
    """,
)
def q_h15_try_and_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").try_cast("int").alias("lang_as_int"),
        F.col("n_chars").cast("string").try_cast("bigint").alias("chars_roundtrip"),
        F.try_divide(F.col("n_chars"), (F.col("doc_id") % 3).cast("bigint")).alias("risky_div"),
        F.nullif(F.col("lang"), F.lit("en"))
        .eqNullSafe(F.nullif(F.col("source"), F.lit("src0")))
        .alias("ns_eq"),
    ).orderBy("doc_id")
