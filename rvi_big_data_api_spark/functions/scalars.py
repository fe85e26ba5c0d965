"""Scalar function suites (SURVEY.md §2.8) — one query per family.

The reference did its VIN/channel munging and timestamp bucketing in JVM
controller code (SURVEY.md §2.8 [P:med]); here every scalar stays a Catalyst
expression inside whole-stage codegen — no Python round trips. Each query
exercises a family end-to-end and is oracle-checked in the Spark∩DuckDB
dialect subset (SURVEY.md §1 gotcha 5: shared regex subset; gotcha 2: libm
results rounded).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load
from ..registry import query


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                               AS brand_uc,
           lower(p_type)                                AS type_lc,
           substr(p_name, 1, 8)                         AS name_prefix,
           length(p_name)                               AS name_len,
           lpad(p_size::VARCHAR, 4, '0')                AS size_padded,
           string_split(p_name, ' ')[1]                 AS first_word,
           regexp_extract(p_brand, '#([0-9]+)', 1)      AS brand_num,
           regexp_replace(p_brand, '#', '-')            AS brand_dashed,
           trim(concat(p_brand, ' ', p_type))           AS brand_type,
           (p_type LIKE 'PROMO%')                       AS is_promo
    FROM part
    """,
    tags=("function",),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family over part (VIN/channel munging analogue)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.lower("p_type").alias("type_lc"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_brand", "#", "-").alias("brand_dashed"),
        F.trim(F.concat("p_brand", F.lit(" "), "p_type")).alias("brand_type"),
        F.col("p_type").like("PROMO%").alias("is_promo"),
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)::INT                                  AS yr,
           month(o_orderdate)::INT                                 AS mo,
           dayofmonth(o_orderdate)::INT                            AS dom,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')  AS month_start,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01')::INT AS days_to_y2k,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d')    AS plus_3mo,
           epoch(o_orderdate)::BIGINT                              AS epoch_s,
           strftime(o_orderdate, '%Y-%m-%d')                       AS order_date
    FROM orders
    """,
    tags=("function",),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family over orders (ts bucketing is everywhere in the
    reference's rollups). Week-based fields avoided: week-start differs
    between engines (§1 note)."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), d).alias("days_to_y2k"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3mo"),
        F.unix_timestamp(d).alias("epoch_s"),
        F.date_format(d, "yyyy-MM-dd").alias("order_date"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT event_id,
           round(abs(value - 100), 6)            AS abs_centered,
           ceil(value)::BIGINT                   AS value_ceil,
           floor(value)::BIGINT                  AS value_floor,
           round(power(value, 2), 6)             AS value_sq,
           round(sqrt(value), 6)                 AS value_sqrt,
           round(ln(value + 1), 6)               AS value_ln,
           round(log10(value + 1), 6)            AS value_log10,
           round(radians(value), 6)              AS value_rad,
           round(sin(value), 6)                  AS value_sin,
           round(atan2(value, 100.0), 6)         AS value_atan2
    FROM events
    """,
    tags=("function",),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family over event values (distance math in the reference uses
    exactly these: sqrt/sin/cos/atan2 → haversine, SURVEY.md §2.9).
    Transcendentals rounded to 6: JVM libm vs DuckDB libm differ in the last
    ulp."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.round(F.abs(v - 100), 6).alias("abs_centered"),
        F.ceil(v).alias("value_ceil"),
        F.floor(v).alias("value_floor"),
        F.round(F.pow(v, 2), 6).alias("value_sq"),
        F.round(F.sqrt(v), 6).alias("value_sqrt"),
        F.round(F.log(v + 1), 6).alias("value_ln"),
        F.round(F.log10(v + 1), 6).alias("value_log10"),
        F.round(F.radians(v), 6).alias("value_rad"),
        F.round(F.sin(v), 6).alias("value_sin"),
        F.round(F.atan2(v, F.lit(100.0)), 6).alias("value_atan2"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity >= 40 THEN 'bulk'
                WHEN l_quantity >= 15 THEN 'standard'
                ELSE 'small' END                              AS qty_class,
           coalesce(nullif(l_returnflag, 'N'), 'none')        AS return_state,
           greatest(l_discount, l_tax)                        AS max_rate,
           least(l_discount, l_tax)                           AS min_rate,
           l_extendedprice / nullif(l_quantity, 0)            AS unit_price
    FROM lineitem
    """,
    tags=("function",),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE chains, coalesce/nullif, greatest/least, and
    the §1-gotcha-4 guarded division (status classification in the
    reference)."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(q >= 40, "bulk").when(q >= 15, "standard").otherwise("small").alias("qty_class"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias("return_state"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        (F.col("l_extendedprice") / F.nullif(q, F.lit(0))).alias("unit_price"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding)                                        AS dim,
           round(embedding[1], 6)                                AS first_dim,
           round(list_aggregate(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE),
                                'sum'), 4)                       AS norm_sq,
           round(list_aggregate(list_transform(
                     list_filter(embedding, x -> x > 0), x -> x::DOUBLE), 'sum'), 4)
                                                                 AS positive_mass,
           len(list_filter(embedding, x -> x > 0))               AS n_positive,
           round(list_sort(list_transform(embedding, x -> x::DOUBLE))[1], 6) AS min_dim
    FROM embeddings
    """,
    tags=("function", "llm"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family with higher-order functions over the embedding column —
    NO UDF: transform/filter/aggregate run JVM-side (the multimodal-column
    hot path at 100 TB). norm_sq ≈ 1.0 since vectors are L2-normalized [F]."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    dbl = lambda x: x.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(emb, 1), 6).alias("first_dim"),
        F.round(
            F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + dbl(x) * dbl(x)), 4
        ).alias("norm_sq"),
        F.round(
            F.aggregate(F.filter(emb, lambda x: x > 0), F.lit(0.0), lambda acc, x: acc + dbl(x)), 4
        ).alias("positive_mass"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        F.round(F.element_at(F.sort_array(F.transform(emb, dbl)), 1), 6).alias("min_dim"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')::INT AS k_value,
           'k'                                    AS first_key,
           1                                      AS n_keys
    FROM events
    """,
    tags=("function",),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: JSON payload → MapType, then key/value access (the RVI
    payload-map pattern). DuckDB twin reads the same field via json_extract;
    the map-shape columns are constants there because the fixture payload has
    exactly one key [F]."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_value"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.size(m).alias("n_keys"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')::INT    AS k_int,
           json_extract_string(props, '$.k')         AS k_str,
           json_extract_string(props, '$.missing')   AS k_missing
    FROM events
    """,
    tags=("function",),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: get_json_object + typed from_json extraction + missing-key
    NULL semantics (RVI JSON payload ingest, SURVEY.md §2.8 [P:high])."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k_int"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.missing").alias("k_missing"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text)          AS text_md5,
           sha256(text)       AS text_sha256,
           md5(lang || '|' || source) AS bucket_md5
    FROM documents
    """,
    tags=("function", "llm"),
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family — the dedup building block (SURVEY.md §2.10). md5/sha256
    agree across engines; xxhash64 is Spark-specific and is exercised in the
    rows-only dedup_near pipeline instead."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5(F.concat("lang", F.lit("|"), "source")).alias("bucket_md5"),
    )


@query(
    "fn_cast",
    oracle="""
    SELECT event_id,
           trunc(value)::BIGINT                          AS value_int,
           value::VARCHAR                                AS value_str,
           TRY_CAST(event_type AS INT)                   AS bad_int,
           TRY_CAST('2024-06-01' AS DATE)::VARCHAR       AS parsed_date,
           (event_id % 2 = 0)::INT                       AS even_flag,
           user_id::DOUBLE                               AS user_double
    FROM events
    """,
    tags=("function",),
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family. Failing casts use try_cast explicitly so parse failures →
    NULL regardless of the session's ANSI mode — the engine pins ANSI off
    (session.py), but the driver may hand queries an ANSI-on session, and
    every query must be total under both. double→int truncates toward zero in
    Spark but ROUNDS in DuckDB cast, so the twin trunc()s first."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("value").cast("long").alias("value_int"),
        F.col("value").cast("string").alias("value_str"),
        F.col("event_type").try_cast("int").alias("bad_int"),
        F.lit("2024-06-01").cast("date").cast("string").alias("parsed_date"),
        (F.col("event_id") % 2 == 0).cast("int").alias("even_flag"),
        F.col("user_id").cast("double").alias("user_double"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT event_id,
           (event_id & 255)                  AS low_byte,
           (event_id | 4096)                 AS with_flag,
           xor(event_id, user_id)            AS xored,
           (event_id << 2)                   AS shifted_l,
           (event_id >> 3)                   AS shifted_r,
           bit_count(event_id)::INT          AS popcount
    FROM events
    """,
    tags=("function",),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family — the building blocks behind SimHash/bucketing
    (and/or/xor, shifts, popcount), exercised as a standalone suite."""
    ev = load(spark, sf_dir, "events")
    e = F.col("event_id")
    return ev.select(
        "event_id",
        e.bitwiseAND(F.lit(255)).alias("low_byte"),
        e.bitwiseOR(F.lit(4096)).alias("with_flag"),
        e.bitwiseXOR(F.col("user_id")).alias("xored"),
        F.shiftleft(e, 2).alias("shifted_l"),
        F.shiftright(e, 3).alias("shifted_r"),
        F.bit_count(e).alias("popcount"),
    )


@query(
    "fn_regexp",
    oracle=r"""
    SELECT p_partkey,
           regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
           len(regexp_extract_all(p_name, '[aeiou]'))::BIGINT AS n_vowels,
           regexp_matches(p_type, '^PROMO') AS is_promo,
           regexp_replace(p_name, '\s+', '-', 'g') AS slug,
           regexp_extract(p_name, '(\w+)$', 1) AS last_word,
           regexp_matches(p_name, '(?i)[bcdfghjklmnpqrstvwxz]{3}') AS has_consonant_run
    FROM part
    """,
    tags=("scalar",),
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family — extract with capture groups, global match counting,
    anchored boolean match, global replace, end-anchored extraction, and an
    inline-flag case-insensitive class quantifier. Backreferences are
    deliberately ABSENT: Spark's java.util.regex supports them but DuckDB's
    RE2 rejects them ("invalid escape sequence: \\1") — the suite pins the
    portable common core both engines implement identically. All map-only
    codegen expressions."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.regexp_count("p_name", F.lit("[aeiou]")).cast("long").alias("n_vowels"),
        F.col("p_type").rlike("^PROMO").alias("is_promo"),
        F.regexp_replace("p_name", r"\s+", "-").alias("slug"),
        F.regexp_extract("p_name", r"(\w+)$", 1).alias("last_word"),
        F.col("p_name").rlike("(?i)[bcdfghjklmnpqrstvwxz]{3}").alias("has_consonant_run"),
    )


@query(
    "fn_variant",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS n,
           sum(json_extract_string(props, '$.k')::INT)::BIGINT AS sum_k,
           max(json_extract_string(props, '$.k')::INT) AS max_k,
           sum(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                    THEN 1 ELSE 0 END)::BIGINT AS n_missing
    FROM events
    GROUP BY 1
    """,
    tags=("scalar", "variant"),
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads via Spark 4's VariantType — the modern
    replacement for string-JSON hot paths: `parse_json` builds the binary
    variant ONCE, then typed `try_variant_get` extractions are
    O(field-access) instead of re-parsing the JSON text per expression
    (the reference's loosely-typed RVI payload column, upgraded).

    Missing paths return NULL under try_variant_get (counted here), exactly
    mirroring the twin's json_extract semantics; the variant never leaves
    the plan — outputs are ordinary typed columns, so the oracle needs no
    variant support."""
    ev = load(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "int")
    missing = F.try_variant_get("v", "$.missing", "string")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.sum(F.when(missing.isNull(), 1).otherwise(0)).alias("n_missing"),
    )


@query(
    "fn_variant_explode",
    oracle="""
    SELECT event_id, 0::INT AS pos, 'k' AS key,
           (event_id % 100)::VARCHAR AS value_json
    FROM events WHERE event_id < 500
    UNION ALL
    SELECT event_id, 1::INT, 'm',
           '[' || (event_id % 3) || ',' || (event_id % 5) || ']'
    FROM events WHERE event_id < 500
    UNION ALL
    SELECT event_id, 2::INT, 't', '"' || event_type || '"'
    FROM events WHERE event_id < 500
    """,
    tags=("scalar", "variant"),
)
def fn_variant_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`variant_explode` table-valued generator over VariantType (round-6
    surface probe, VERDICT r5 item 9): un-nest a semi-structured payload
    into (pos, key, value) rows with a LATERAL correlated TVF — the
    schema-on-read fan-out fn_variant's typed point-gets leave out, and
    the shape a payload-auditing pipeline needs ("what keys exist, with
    what values, across the fleet?").

    The variant is built from row arithmetic (same discipline as
    fn_map_hof), so the twin reconstructs every output from raw columns.
    Two contracts this pins: (1) variant OBJECT keys canonicalize SORTED
    (probed: parse_json('{"t":..,"m":..,"k":..}') explodes k,m,t — pos is
    the sorted-key rank, which the oracle hard-codes), and (2) to_json
    renders values compactly (ints bare, arrays no spaces, strings
    quoted). Codegen-side generator, no Python; the lateral join is a
    per-row fan-out of exactly 3, so cost is O(rows·keys) with no
    shuffle."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    js = F.concat(
        F.lit('{"k":'), (F.col("event_id") % 100).cast("string"),
        F.lit(',"m":['), (F.col("event_id") % 3).cast("string"),
        F.lit(","), (F.col("event_id") % 5).cast("string"),
        F.lit('],"t":"'), F.col("event_type"), F.lit('"}'),
    )
    ev.select("event_id", js.alias("js")).createOrReplaceTempView("ve_src")
    return spark.sql(
        """
        SELECT s.event_id, v.pos, v.key, to_json(v.value) AS value_json
        FROM ve_src s, LATERAL variant_explode(parse_json(s.js)) v
        """
    )


@query(
    "sql_parameterized",
    oracle="""
    SELECT event_type, count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    WHERE value > 50.0
    GROUP BY event_type
    """,
    tags=("scalar", "sql"),
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL entry point (SURVEY.md §3.3 hardened): named
    parameters (`:threshold`) bind VALUES injection-safely, and the
    IDENTIFIER() clause binds a COLUMN NAME from a parameter without string
    concatenation — the two pieces a query service needs before exposing
    SQL templates to callers. The DataFrame is passed positionally into the
    query via a {df} template slot, so no temp-view state leaks between
    calls."""
    ev = load(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp) AS event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM {ev}
        WHERE value > :threshold
        GROUP BY IDENTIFIER(:grp)
        """,
        args={"grp": "event_type", "threshold": 50.0},
        ev=ev,
    )


@query(
    "pandas_api_pipeline",
    oracle="""
    SELECT c_mktsegment,
           count(*)::BIGINT AS n_customers,
           round(sum(c_acctbal), 2) AS total_bal,
           round(avg(c_acctbal), 4) AS avg_bal
    FROM customer
    WHERE c_acctbal > 0
    GROUP BY 1
    """,
    tags=("scalar", "pandas-api"),
)
def pandas_api_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third API surface — pandas-on-Spark (`pyspark.pandas`): the same
    filter → groupby → agg pipeline a pandas user writes verbatim, planned
    by Catalyst underneath (one partial-agg shuffle, identical to the
    DataFrame form — NOT driver-side pandas). `to_spark()` hands the result
    back as an ordinary DataFrame, so pandas-idiom code slots into the same
    registry/oracle contract as everything else.

    Scale note: pandas-on-Spark is a planning veneer; operations that would
    need a global row order (iloc, shift without window) inject sorts — the
    pipeline here uses only order-free idioms, which is the discipline that
    keeps the veneer scale-safe."""
    import pyspark.pandas as ps

    from ..io import table_path

    psdf = ps.read_parquet(table_path(sf_dir, "customer"))
    pos = psdf[psdf["c_acctbal"] > 0]
    g = pos.groupby("c_mktsegment").agg({"c_acctbal": ["count", "sum", "mean"]})
    g.columns = ["n_customers", "total_bal", "avg_bal"]
    out = g.reset_index().to_spark()
    return out.select(
        "c_mktsegment",
        F.col("n_customers").cast("long").alias("n_customers"),
        F.round("total_bal", 2).alias("total_bal"),
        F.round("avg_bal", 4).alias("avg_bal"),
    )


@query(
    "fn_collation",
    oracle="""
    WITH cased AS (
        SELECT doc_id, n_chars,
               CASE WHEN doc_id % 3 = 0 THEN upper(source)
                    WHEN doc_id % 3 = 1 THEN concat(upper(source[1:1]), source[2:])
                    ELSE source END AS src_cased
        FROM documents
    )
    SELECT lower(src_cased) AS source_key,
           count(*)::BIGINT AS n_docs,
           count(DISTINCT src_cased)::BIGINT AS n_case_variants,
           sum(n_chars)::BIGINT AS total_chars
    FROM cased GROUP BY 1
    """,
    tags=("function", "collation"),
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 COLLATE): grouping under
    UTF8_LCASE treats case variants of one source label as ONE group —
    comparison semantics as a COLUMN TYPE property rather than scattered
    lower() calls (which break pushdown into collation-aware sources and
    get forgotten on one side of a join).

    The fixture's labels are single-case, so case variance is derived
    deterministically (doc_id mod 3 → upper / initcap / as-is), then the
    group key is `collate(src, 'UTF8_LCASE')`. The emitted key is
    normalized via lower() — a collated group's representative value is
    whichever variant an executor saw first, the classic nondeterminism a
    driver hash would catch. n_case_variants proves the group really
    contains distinct binary strings (binary DISTINCT inside a
    case-insensitive group). The twin lowers explicitly — identical for
    ASCII; the operator's point is that Spark carries the semantics in the
    type where DuckDB needs it re-stated per expression."""
    d = load(spark, sf_dir, "documents")
    cased = d.select(
        "doc_id",
        "n_chars",
        F.when(F.col("doc_id") % 3 == 0, F.upper("source"))
        .when(F.col("doc_id") % 3 == 1, F.initcap("source"))
        .otherwise(F.col("source"))
        .alias("src_cased"),
    )
    return (
        cased.groupBy(F.expr("collate(src_cased, 'UTF8_LCASE')").alias("_ci_key"))
        .agg(
            F.lower(F.min("src_cased")).alias("source_key"),
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.expr("collate(src_cased, 'UTF8_BINARY')")).alias(
                "n_case_variants"
            ),
            F.sum("n_chars").alias("total_chars"),
        )
        .select("source_key", "n_docs", "n_case_variants", "total_chars")
    )


@query(
    "fn_interval",
    oracle="""
    SELECT event_id,
           strftime(ts + INTERVAL '3 days 4 hours', '%Y-%m-%d %H:%M:%S') AS plus_3d4h,
           strftime(ts - INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S')        AS minus_90m,
           strftime(ts + INTERVAL 2 MONTH, '%Y-%m-%d %H:%M:%S')          AS plus_2mo,
           strftime(last_day(ts::DATE), '%Y-%m-%d')                      AS month_end,
           date_diff('day', ts::DATE, DATE '2030-01-01')::INT            AS days_to_2030,
           (epoch(date_trunc('second', ts))::BIGINT
            - epoch(date_trunc('day', ts))::BIGINT)                      AS secs_into_day
    FROM events
    """,
    tags=("function",),
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-arithmetic family: mixed day-time interval shift, minute
    subtraction, calendar-month addition (month-end clamping matches DuckDB's
    INTERVAL MONTH semantics), last_day, whole-day difference, and
    seconds-into-day via epoch subtraction.

    Dialect note (the §1-gotcha discipline): elapsed-unit differences are
    computed by epoch subtraction, NOT timestampdiff/date_diff('hour'),
    because Spark's timestampdiff counts COMPLETE elapsed units while
    DuckDB's date_diff counts BOUNDARY CROSSINGS — they disagree on any
    pair that spans a boundary mid-unit. Day differences on pure DATEs are
    safe (both count calendar days). All interval math is columnar and
    pushdown-transparent."""
    ev = load(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return ev.select(
        "event_id",
        F.date_format(F.expr("ts + INTERVAL 3 DAYS 4 HOURS"), fmt).alias("plus_3d4h"),
        F.date_format(F.expr("ts - INTERVAL 90 MINUTES"), fmt).alias("minus_90m"),
        F.date_format(F.expr("ts + INTERVAL 2 MONTHS"), fmt).alias("plus_2mo"),
        F.date_format(F.last_day(F.to_date("ts")), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.lit("2030-01-01").cast("date"), F.to_date("ts"))
        .cast("int")
        .alias("days_to_2030"),
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.date_trunc("day", F.col("ts")))
        ).alias("secs_into_day"),
    )


@query(
    "fn_url",
    oracle="""
    SELECT doc_id,
           'https' AS proto,
           source || '.example.org' AS host,
           '/' || lang || '/doc/' || cast(doc_id AS VARCHAR) AS path,
           'ref=' || lang || '&id=' || cast(doc_id AS VARCHAR) AS query,
           cast(doc_id AS VARCHAR) AS id_param
    FROM documents
    """,
    tags=("scalar", "url"),
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing suite — `parse_url` over a synthesized crawl URL (the
    corpus-provenance shape every web-scale dataset carries): PROTOCOL /
    HOST / PATH / QUERY extraction plus keyed query-parameter lookup
    (`parse_url(url, 'QUERY', 'id')`). The twin RECONSTRUCTS each component
    from the same fields the URL was built from, so the check verifies
    Spark's parser returns exactly the components that went in — a
    round-trip proof, not a parser-vs-parser comparison.

    All JVM-side string expressions inside one codegen stage; no shuffle."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/"),
        F.col("lang"), F.lit("/doc/"), F.col("doc_id").cast("string"),
        F.lit("?ref="), F.col("lang"), F.lit("&id="), F.col("doc_id").cast("string"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("id_param"),
    )


@query(
    "fn_timezone",
    oracle="""
    SELECT hour((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/Los_Angeles') AS la_hour,
           hour((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Tokyo') AS tokyo_hour,
           count(*)::BIGINT AS n_events,
           round(avg(value), 4) AS avg_value
    FROM events GROUP BY 1, 2
    """,
    tags=("scalar", "datetime", "timezone"),
)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion suite — `convert_timezone` (Spark 4), the
    fleet-local-time primitive: vehicles report in UTC (the session pins
    spark.sql.session.timeZone=UTC), but rush-hour/driver-behavior
    analysis wants WALL-CLOCK local hours. Converts each event into a
    DST-aware zone (America/Los_Angeles) and a fixed-offset zone
    (Asia/Tokyo) and rolls up activity by the local-hour pair.

    Dialect mapping (both ICU-backed, IANA zone names): Spark
    `convert_timezone('UTC', tz, ts)` ≡ DuckDB
    `(ts AT TIME ZONE 'UTC') AT TIME ZONE tz` — interpret-then-render,
    returning a naive local timestamp. The fixture's event window
    (Jan 2024) sits inside one DST regime; the LA path still exercises
    the ICU rules engine rather than a constant offset.

    Scale shape: per-row JVM datetime arithmetic inside codegen, one
    partial-agg shuffle on the 24 (la, tokyo) hour pairs."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            F.hour(
                F.expr("convert_timezone('UTC', 'America/Los_Angeles', ts)")
            ).alias("la_hour"),
            F.hour(F.expr("convert_timezone('UTC', 'Asia/Tokyo', ts)")).alias(
                "tokyo_hour"
            ),
            "value",
        )
        .groupBy("la_hour", "tokyo_hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


@query(
    "fn_try",
    oracle="""
    SELECT event_id,
           round(value / nullif((user_id % 3)::DOUBLE, 0.0), 6) AS safe_ratio,
           CASE WHEN user_id > 7 THEN NULL
                ELSE user_id + 9223372036854775800 END AS overflow_guard,
           string_split(event_type, '')[100] AS oob_char,
           TRY_CAST(event_type AS TIMESTAMP) AS bad_ts,
           CASE WHEN user_id > 1 OR user_id < 0 THEN NULL
                ELSE user_id * 9223372036854775800 END AS overflow_mul
    FROM events WHERE event_id < 200
    """,
    tags=("scalar", "error-handling"),
)
def fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `try_*` error-safe expression family — ANSI semantics with NULL
    instead of runtime failure, per EXPRESSION rather than per session:
    division by zero (try_divide), 64-bit overflow (try_add /
    try_multiply — with ANSI off a plain `+` would silently WRAP, which is
    worse than either NULL or an error), out-of-bounds array access
    (try_element_at), and unparseable timestamps (try_to_timestamp). This
    is the migration path to running ANSI mode at scale: hot paths opt
    into NULL-on-error explicitly while everything else keeps strict
    failure — a 100 TB job that dies at hour three on one malformed row
    is the alternative.

    The twin expresses each guard structurally (nullif divisor, CASE on
    the overflow boundary, TRY_CAST) — the oracle states WHEN each value
    is undefined, so the hash check verifies the try_ functions' exact
    NULL contract, not merely that some rows are null. Pure codegen
    expressions; the only plan node is the pruned scan."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return ev.selectExpr(
        "event_id",
        "round(try_divide(value, cast(user_id % 3 as double)), 6) as safe_ratio",
        "try_add(user_id, 9223372036854775800L) as overflow_guard",
        "try_element_at(split(event_type, ''), 100) as oob_char",
        "try_to_timestamp(event_type) as bad_ts",
        "try_multiply(user_id, 9223372036854775800L) as overflow_mul",
    )


AES_KEY = "0123456789abcdef"  # 16-byte demo key; a real deployment pulls from a KMS
AES_WRONG_KEY = "fedcba9876543210"


@query(
    "fn_crypto",
    oracle="""
    SELECT c_custkey,
           c_name AS name_roundtrip,
           ((octet_length(c_name::BLOB) // 16 + 1) * 16)::BIGINT AS ct_len,
           true AS wrong_key_is_null
    FROM customer WHERE c_custkey <= 100
    """,
    tags=("fn", "crypto", "pii"),
)
def fn_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption (`aes_encrypt` / `aes_decrypt` /
    `try_aes_decrypt`) — the PII-protection primitive for data that must
    leave the trust boundary encrypted but re-identify inside it (the
    text_pii_mask stage destroys; this stage protects reversibly). The op
    proves three contracts the oracle can check without being able to run
    AES itself: (1) decrypt∘encrypt is the identity (round-tripped name
    equals the original), (2) the ciphertext length is the PKCS#7-padded
    block size ((len/16 + 1)·16 — plaintext length leaks only to block
    granularity), and (3) `try_aes_decrypt` under a WRONG key yields NULL,
    not an exception — the row-level-recovery posture (fn_try) applied to
    key rotation mishaps.

    ECB mode keeps the demo deterministic (same plaintext → same
    ciphertext, required for the driver's re-run hash); production uses
    GCM, whose random IV is exactly the property determinism tests can't
    hold — documented trade, not an oversight. All JVM-side codegen."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    key = F.lit(AES_KEY).cast("binary")
    wrong = F.lit(AES_WRONG_KEY).cast("binary")
    ct = F.aes_encrypt(F.col("c_name").cast("binary"), key, F.lit("ECB"))
    return c.select(
        "c_custkey",
        F.aes_decrypt(ct, key, F.lit("ECB")).cast("string").alias("name_roundtrip"),
        F.octet_length(ct).cast("long").alias("ct_len"),
        F.try_aes_decrypt(ct, wrong, F.lit("ECB")).isNull().alias("wrong_key_is_null"),
    )


@query(
    "fn_map_hof",
    oracle="""
    WITH base AS (
        SELECT event_id,
               floor(value * 100 + 0.5)::BIGINT AS vc,
               event_id % 7 AS m7
        FROM events
    )
    SELECT event_id,
           vc + 1 AS v_plus1,
           ((vc % 2 = 0)::INT + (2 * vc % 2 = 0)::INT + (m7 % 2 = 0)::INT)::BIGINT
               AS n_even,
           vc + m7 AS zipped_vm,
           'm7=' || m7 || ',v2=' || (2 * vc) || ',vc=' || vc AS entries_str
    FROM base
    """,
    tags=("function", "map"),
)
def fn_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map HIGHER-ORDER functions — the lambda surface fn_map's access
    family leaves out: transform_values (per-entry rewrite), map_filter
    (per-entry predicate), map_zip_with (two-map align+combine), and the
    map_entries → sort → render pipeline that makes a map hashable
    deterministically (map iteration order is NOT part of either engine's
    contract — always sort entries before emitting).

    All four lambdas run inside whole-stage codegen on the JVM (no Python),
    so the hot-path rule holds: HOFs are the way to avoid a UDF when the
    logic is per-entry. The map is constructed from row arithmetic
    (integer cents), so the DuckDB twin reproduces every output from the
    raw columns — the oracle checks the HOF SEMANTICS, not map rendering
    quirks."""
    ev = load(spark, sf_dir, "events")
    vc = F.floor(F.col("value") * 100 + 0.5).cast("long")
    m7 = (F.col("event_id") % 7).cast("long")
    base = ev.select("event_id", vc.alias("vc"), m7.alias("m7"))
    m = F.create_map(
        F.lit("vc"), F.col("vc"),
        F.lit("v2"), F.col("vc") * 2,
        F.lit("m7"), F.col("m7"),
    )
    plus1 = F.transform_values(m, lambda k, v: v + 1)
    evens = F.map_filter(m, lambda k, v: v % 2 == 0)
    zipped = F.map_zip_with(
        F.create_map(F.lit("x"), F.col("vc")),
        F.create_map(F.lit("x"), F.col("m7")),
        lambda k, v1, v2: v1 + v2,
    )
    entries = F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(m),
                lambda e: F.concat_ws("=", e["key"], e["value"].cast("string")),
            )
        ),
        ",",
    )
    return base.select(
        "event_id",
        F.element_at(plus1, "vc").alias("v_plus1"),
        F.size(evens).cast("long").alias("n_even"),
        F.element_at(zipped, "x").alias("zipped_vm"),
        entries.alias("entries_str"),
    )


ARRAY_SET_STOPWORDS = ("the", "a", "of", "and", "to")


@query(
    "fn_array_set",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               string_split(text, ' ')[1:6] AS toks,
               {list(ARRAY_SET_STOPWORDS)!r}::VARCHAR[] AS stops
        FROM documents
    )
    SELECT doc_id,
           len(list_distinct(toks))::BIGINT AS n_distinct,
           coalesce(array_to_string(list_sort(list_distinct(list_intersect(toks, stops))), ','), '')
               AS stop_hits,
           len(list_distinct(list_filter(toks, x -> NOT list_contains(stops, x))))::BIGINT
               AS n_content,
           list_has_any(toks, stops) AS any_stop,
           len(list_filter(toks, x -> length(x) > 2)) = len(toks) AS all_long
    FROM base
    """,
    tags=("function", "array"),
)
def fn_array_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array SET algebra + quantifiers — the half of the array family
    fn_array's fold/transform suite leaves out: array_distinct,
    array_intersect, array_except, arrays_overlap (∃), and forall (∀)
    — over the first six tokens of each document against a
    constant stopword set (token-set algebra is the shape of every
    allowlist/blocklist filter in a corpus pipeline).

    Determinism rule the op exists to pin: set-operation RESULT ORDER is
    not contractual in either engine (Spark preserves first-array
    encounter order, DuckDB hash order) — any set result that leaves the
    query must be sorted-then-rendered (array_join(array_sort(…)))
    before it can be hash-compared or stored. Sizes and booleans are
    order-free. All JVM-side HOFs, no UDF."""
    docs = load(spark, sf_dir, "documents")
    stops = F.array(*[F.lit(w) for w in ARRAY_SET_STOPWORDS])
    toks = F.slice(F.split(F.col("text"), " "), 1, 6)
    base = docs.select("doc_id", toks.alias("toks"), stops.alias("stops"))
    inter = F.array_intersect(F.col("toks"), F.col("stops"))
    return base.select(
        "doc_id",
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        F.array_join(F.array_sort(F.array_distinct(inter)), ",").alias("stop_hits"),
        F.size(F.array_distinct(F.array_except("toks", "stops")))
        .cast("long")
        .alias("n_content"),
        F.arrays_overlap("toks", "stops").alias("any_stop"),
        F.forall(F.col("toks"), lambda x: F.length(x) > 2).alias("all_long"),
    )


@query(
    "fn_xpath",
    oracle="""
    SELECT event_id,
           event_type AS x_type,
           (event_id % 100)::BIGINT AS x_code,
           (event_id % 2 = 0) AS x_even,
           ('v' || user_id) || ',' || ('v' || user_id * 2) AS x_tags
    FROM events
    """,
    tags=("function", "xml"),
)
def fn_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath extraction family (xpath_string / xpath_long / xpath_boolean /
    xpath list form) over per-row XML — the row-level sibling of scan_xml's
    file-level ingest, and the shape legacy feeds (SOAP payloads, config
    blobs) arrive in. The XML is CONSTRUCTED from fixture columns
    (format_string), so the DuckDB twin reproduces every extraction from
    the raw columns — the oracle pins Spark's XPath semantics (text()
    extraction, boolean predicates, node-list → array) without needing an
    XPath engine on the oracle side.

    XPath evaluation is JVM-side (no Python), but it re-parses the XML per
    expression — at 100 TB parse ONCE with from_xml into a struct and
    extract fields from that (scan_xml's documented rule); these
    functions are for one-off extractions."""
    ev = load(spark, sf_dir, "events")
    xml = F.format_string(
        '<ev code="%s"><type>%s</type><tag>v%s</tag><tag>v%s</tag></ev>',
        (F.col("event_id") % 100).cast("string"),
        F.col("event_type"),
        F.col("user_id").cast("string"),
        (F.col("user_id") * 2).cast("string"),
    )
    return ev.select(
        "event_id",
        F.xpath_string(xml, F.lit("/ev/type")).alias("x_type"),
        F.xpath_long(xml, F.lit("/ev/@code")).alias("x_code"),
        F.xpath_boolean(xml, F.lit("/ev/@code mod 2 = 0")).alias("x_even"),
        F.array_join(F.xpath(xml, F.lit("/ev/tag/text()")), ",").alias("x_tags"),
    )


@query(
    "fn_csv_inline",
    oracle="""
    SELECT event_id,
           event_type AS c_type,
           (event_id % 1000)::BIGINT AS c_code,
           round(floor(value * 100 + 0.5) / 100.0, 2) AS c_val
    FROM events
    """,
    tags=("function", "csv"),
)
def fn_csv_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline CSV round trip (to_csv → from_csv) on a struct column — the
    row-level sibling of scan_csv: embedded CSV lines (log fields, legacy
    message bodies) parsed WITHOUT a file source, schema-on-read per row.
    The struct is built from fixture columns and the value is cents-
    quantized BEFORE the round trip, so the re-parsed double is exact and
    the DuckDB twin reproduces everything from the raw columns.

    Both directions are JVM-side codegen. The at-scale note mirrors
    fn_xpath's: from_csv parses per call — parse once into a struct, then
    prune columns (Catalyst pushes the needed-fields list into the parse
    via the csv expression's required schema)."""
    ev = load(spark, sf_dir, "events")
    cents_val = F.round(F.floor(F.col("value") * 100 + 0.5) / 100.0, 2)
    line = F.to_csv(
        F.struct(
            F.col("event_type").alias("t"),
            (F.col("event_id") % 1000).alias("code"),
            cents_val.alias("v"),
        )
    )
    parsed = F.from_csv(line, "t string, code bigint, v double")
    return ev.select(
        "event_id",
        parsed["t"].alias("c_type"),
        parsed["code"].alias("c_code"),
        parsed["v"].alias("c_val"),
    )


# WKB POINT literals (little-endian, type 1) for the geospatial round trip:
# POINT(1 10), POINT(2 20), POINT(3 30), POINT(4 40) — precomputed so the
# fixture needs no IEEE-double packing at query time.
GEO_WKB_POINTS = (
    "0101000000000000000000F03F0000000000002440",
    "010100000000000000000000400000000000003440",
    "010100000000000000000008400000000000003E40",
    "010100000000000000000010400000000000004440",
)


@query(
    "fn_geospatial",
    oracle=f"""
    SELECT event_id,
           CASE event_id % 4
                WHEN 0 THEN '{GEO_WKB_POINTS[0]}' WHEN 1 THEN '{GEO_WKB_POINTS[1]}'
                WHEN 2 THEN '{GEO_WKB_POINTS[2]}' ELSE '{GEO_WKB_POINTS[3]}'
           END AS wkb_roundtrip,
           0 AS srid_geom,
           4326 AS srid_geog,
           (CASE WHEN event_id % 2 = 0 THEN 4326 ELSE 0 END)::INT AS srid_set
    FROM events WHERE event_id < 1000
    """,
    tags=("function", "geospatial"),
)
def fn_geospatial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.1's GEOSPATIAL type surface — the complete set this build
    exposes (st_geomfromwkb / st_geogfromwkb / st_asbinary / st_srid /
    st_setsrid; no WKT constructors or measurement functions yet): WKB
    parse → binary round trip (must be byte-identical — the storage
    contract), the GEOMETRY(0)-vs-GEOGRAPHY(4326) default-SRID split, and
    per-row st_setsrid re-tagging (this build accepts SRIDs 0 and 4326
    only — 3857 raises ST_INVALID_SRID_VALUE, recorded here). Gated behind
    `spark.sql.geospatial.enabled`, which get_spark() pins SESSION-wide AND
    this op sets STICKY (no restore) on whatever session it is handed: the
    driver's harness builds a bare SparkSession where the flag is off, which
    errored CORRECTNESS_r07 (the only failure in 349 sampled queries). A
    per-query set/RESTORE is not safe for a lazy surface — any downstream
    re-analysis (e.g. the bench's count() over the returned frame)
    re-resolves the ST expressions after the restore and fails — but a
    sticky set is: `spark.conf.set` of this flag is runtime-settable and ST
    expressions resolve afterward (verified on a bare session, VERDICT r7
    item 2). The oracle reconstructs every output arithmetically since
    DuckDB's spatial extension is not installable offline.

    The fixture's real geo analytics (haversine, geofence, tile grids, OD
    matrices) stay on the arithmetic columns — this op pins the TYPE
    plumbing a future measurement-function surface would build on.

    Round-6 probe (2026-08-15, VERDICT r5 item 6): re-checked whether any
    COMPUTATIONAL ST_ routine executes under the flag — st_point,
    st_distance (geom+geog), st_distancesphere/-spheroid, st_contains,
    st_intersects, st_area, st_length, st_x/st_y, st_buffer,
    st_geomfromtext, st_astext, st_envelope, st_centroid, st_union,
    st_makeline ALL raise UNRESOLVED_ROUTINE; `SHOW FUNCTIONS` confirms the
    build registers exactly {st_asbinary, st_geogfromwkb, st_geomfromwkb,
    st_setsrid, st_srid}. No computational geospatial op is registrable in
    this environment; negative probe recorded."""
    # Sticky (never restored) so the ST expressions survive lazy re-analysis
    # on ANY session — including the driver's bare one (CORRECTNESS_r07 fix).
    spark.conf.set("spark.sql.geospatial.enabled", "true")
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    wkb_hex = (
        F.when(F.col("event_id") % 4 == 0, GEO_WKB_POINTS[0])
        .when(F.col("event_id") % 4 == 1, GEO_WKB_POINTS[1])
        .when(F.col("event_id") % 4 == 2, GEO_WKB_POINTS[2])
        .otherwise(GEO_WKB_POINTS[3])
    )
    ev = ev.withColumn("wkb_hex", wkb_hex)
    return ev.select(
        "event_id",
        F.expr(
            "hex(st_asbinary(st_geomfromwkb(unhex(wkb_hex))))"
        ).alias("wkb_roundtrip"),
        F.expr("st_srid(st_geomfromwkb(unhex(wkb_hex)))").alias("srid_geom"),
        F.expr("st_srid(st_geogfromwkb(unhex(wkb_hex)))").alias("srid_geog"),
        F.expr(
            "st_srid(st_setsrid(st_geomfromwkb(unhex(wkb_hex)),"
            " cast(CASE WHEN event_id % 2 = 0 THEN 4326 ELSE 0 END AS int)))"
        ).alias("srid_set"),
    )
