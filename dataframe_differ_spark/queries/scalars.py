"""Layer H scalar function surface: strings, dates, math, JSON (SURVEY §2.H).

Per-row expression queries — embarrassingly parallel, no shuffle (except
the small final aggregates) — these exist to pin down cross-engine function
semantics: day-of-week numbering, month-arithmetic clamping, sign types,
regexp dialects, JSON extraction. Each mismatch hazard is normalized inside
BOTH query texts, never patched up in the comparator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataframe_differ_spark.queries import register
from dataframe_differ_spark.tables import load_table


@register(
    "str_funcs",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS uname,
       substr(c_name, 1, 8) AS prefix,
       CAST(length(c_name) AS INTEGER) AS name_len,
       c_name LIKE 'Customer%' AS is_customer,
       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
       CAST(levenshtein(c_name, 'Customer#000000000') AS INTEGER) AS edit_dist,
       concat(c_mktsegment, ':', c_name) AS tagged,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
       replace(c_name, 'Customer', 'Cust') AS shortname
FROM customer
""",
)
def q_str_funcs(spark, sf_dir):
    """H7: string functions — substr/concat/like/regexp/levenshtein/pad."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").alias("name_len"),
        F.col("c_name").like("Customer%").alias("is_customer"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.levenshtein("c_name", F.lit("Customer#000000000")).alias("edit_dist"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("tagged"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.replace("c_name", F.lit("Customer"), F.lit("Cust")).alias("shortname"),
    )


@register(
    "date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_95,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m
FROM orders
""",
)
def q_date_funcs(spark, sf_dir):
    """H8: date/time functions.

    Dialect normalizations baked into both texts: DuckDB dayofweek is
    0=Sunday (Spark is 1=Sunday) → +1 on the oracle side; month arithmetic
    clamps end-of-month identically (verified); all derived dates cast to
    DATE in both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        F.dayofweek(d).alias("dow"),
        # Date-typed outputs travel as ISO strings in both engines: DATE
        # surfaces as python objects from Spark but datetime64 from DuckDB,
        # which would flap any value-hash.
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus3m"),
    )


@register(
    "math_funcs",
    oracle="""
SELECT o_orderkey,
       ROUND(o_totalprice, 1) AS rounded,
       ABS(o_totalprice - 250000.0) AS dist_from_mid,
       CAST(CEIL(o_totalprice) AS BIGINT) AS ceiled,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS floored,
       CAST(SIGN(o_totalprice - 250000.0) AS INTEGER) AS above_mid,
       ROUND(SQRT(o_totalprice), 9) AS sqrt_price,
       ROUND(LN(o_totalprice), 9) AS ln_price,
       ROUND(LOG10(o_totalprice), 9) AS log10_price,
       o_totalprice * o_totalprice AS squared,
       GREATEST(o_totalprice, 100000.0) AS floored_at_100k,
       CAST(FLOOR(o_totalprice) AS BIGINT) % 1000 AS mod_1k
FROM orders
""",
)
def q_math_funcs(spark, sf_dir):
    """H9: math functions; transcendentals rounded to 9 dp (libm ulp)."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(p, 1).alias("rounded"),
        F.abs(p - 250000.0).alias("dist_from_mid"),
        F.ceil(p).alias("ceiled"),
        F.floor(p).alias("floored"),
        F.signum(p - 250000.0).cast("int").alias("above_mid"),
        F.round(F.sqrt(p), 9).alias("sqrt_price"),
        F.round(F.log(p), 9).alias("ln_price"),
        F.round(F.log10(p), 9).alias("log10_price"),
        (p * p).alias("squared"),
        F.greatest(p, F.lit(100000.0)).alias("floored_at_100k"),
        # floor() in both engines: DuckDB's double→bigint cast rounds while
        # Spark's truncates.
        (F.floor(p) % 1000).alias("mod_1k"),
    )


@register(
    "json_props",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
         AS sum_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE)
         / COUNT(*) AS avg_k,
       MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events
GROUP BY event_type
""",
)
def q_json_props(spark, sf_dir):
    """H11/B3: JSON-in-string column — schema-on-read with from_json.

    from_json is a codegen'd expression (Jackson parse per row, no Python);
    integer sum is exact so avg is a single deterministic double division.
    """
    e = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k INT")["k"]
    ek = e.select("event_type", k.alias("k"))
    return ek.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


@register(
    "multimodal_meta",
    oracle="""
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
       md5(text) AS content_hash,
       CAST(64 + octet_length(CAST(text AS BLOB)) % 512 AS INTEGER) AS fake_width,
       64 + ascii(text) % 64 AS fake_height
FROM documents
""",
)
def q_multimodal_meta(spark, sf_dir):
    """Multimodal plumbing: opaque binary payload column + typed metadata.

    Models image/audio blobs as a `binary` column (here derived from text
    since the corpus ships none): byte length, content hash, and
    deterministic fake decode metadata. The real decode path (pillow/ffmpeg
    not in this container) lives in `multimodal_features` as a mapInPandas
    stub with the same schema contract.
    """
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("content_hash"),
        (F.lit(64) + F.octet_length(payload) % 512).alias("fake_width"),
        (F.lit(64) + F.ascii("text") % 64).alias("fake_height"),
    )


@register(
    "map_funcs",
    oracle="""
SELECT event_id,
       array_to_string(json_keys(props), ',') AS prop_keys,
       CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
FROM events
""",
)
def q_map_funcs(spark, sf_dir):
    """MapType surface: JSON string → MAP<STRING,INT> → key/value access.

    The map stays an expression (no UDF); keys are canonicalized to a
    sorted joined string for engine-order-independent comparison.
    """
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("prop_keys"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").alias("k_value"),
    )


@register(
    "cond_funcs",
    oracle="""
SELECT o_orderkey,
       CASE o_orderstatus WHEN 'F' THEN 'finished'
            WHEN 'O' THEN 'open' ELSE 'pending' END AS status_label,
       IF(o_totalprice > 250000, 'big', 'small') AS size_label,
       NULLIF(o_orderstatus, 'P') AS status_or_null,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'was_pending') AS coalesced
FROM orders
""",
)
def q_cond_funcs(spark, sf_dir):
    """Conditional expressions: CASE/IF/NULLIF/COALESCE."""
    o = load_table(spark, sf_dir, "orders")
    st = F.col("o_orderstatus")
    return o.select(
        "o_orderkey",
        F.when(st == "F", "finished")
        .when(st == "O", "open")
        .otherwise("pending")
        .alias("status_label"),
        F.when(F.col("o_totalprice") > 250000, "big")
        .otherwise("small")
        .alias("size_label"),
        F.nullif(st, F.lit("P")).alias("status_or_null"),
        F.coalesce(F.nullif(st, F.lit("P")), F.lit("was_pending")).alias(
            "coalesced"
        ),
    )


@register(
    "dim_date_generate",
    oracle="""
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(EXTRACT(year FROM d) AS INT) AS year,
       CAST(EXTRACT(quarter FROM d) AS INT) AS quarter,
       CAST(EXTRACT(month FROM d) AS INT) AS month,
       CAST(EXTRACT(day FROM d) AS INT) AS day_of_month,
       CAST(dayofweek(d) AS INT) AS dow_sun0,
       CAST(weekofyear(d) AS INT) AS iso_week,
       dayofweek(d) IN (0, 6) AS is_weekend
FROM (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-12-31',
                                    INTERVAL 1 DAY))::DATE AS d)
""",
)
def q_dim_date_generate(spark, sf_dir):
    """Generated calendar dimension (no source table): one row per 2024 day.

    The standard warehouse date-spine build: sequence() generates the
    year relationally (366 rows — generation is driver-free and the
    result broadcasts everywhere it's joined). Engine-convention trap
    pinned here: Spark dayofweek() is 1=Sunday..7, DuckDB's is
    0=Sunday..6 — normalized to Sunday=0; weekofyear is ISO in both.
    """
    days = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(date '2024-01-01', date '2024-12-31', interval 1 day)"
            )
        ).alias("d")
    )
    dow0 = F.dayofweek("d") - 1
    return days.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.year("d").alias("year"),
        F.quarter("d").alias("quarter"),
        F.month("d").alias("month"),
        F.dayofmonth("d").alias("day_of_month"),
        dow0.alias("dow_sun0"),
        F.weekofyear("d").alias("iso_week"),
        dow0.isin(0, 6).alias("is_weekend"),
    )


@register(
    "json_variant_extract",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
       CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_double,
       json_extract_string(props, '$.k') AS k_str,
       json_extract_string(props, '$.missing') IS NULL AS missing_is_null
FROM events
WHERE event_id % 11 = 0
""",
)
def q_json_variant_extract(spark, sf_dir):
    """Spark 4 VARIANT path: parse_json -> binary variant -> typed gets.

    The open-schema semi-structured column type (SPARK-45891): unlike
    `json_props`' from_json (fixed schema declared up front), VARIANT
    stores the parsed document in a binary-encoded form and extracts
    fields lazily with variant_get, so schema drift in `props` never
    breaks the scan — the data-lake pattern for event payloads. At 100 TB
    variant columns shred into parquet typed subcolumns (no re-parse per
    query); here the parse is one Jackson call per row, JVM-side, and
    every typed get is a codegen'd expression. try_variant_get returns
    NULL on absent paths instead of failing, which is what the
    missing-path audit column demonstrates.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    v = e.withColumn("v", F.parse_json("props"))
    return v.select(
        "event_id",
        F.expr("variant_get(v, '$.k', 'int')").alias("k_int"),
        F.expr("variant_get(v, '$.k', 'double')").alias("k_double"),
        F.expr("variant_get(v, '$.k', 'string')").alias("k_str"),
        F.expr("try_variant_get(v, '$.missing', 'string')").isNull().alias(
            "missing_is_null"
        ),
    )


@register(
    "str_collation_group",
    oracle="""
WITH mixed AS (
  SELECT event_id,
         CASE WHEN event_id % 3 = 0 THEN upper(event_type)
              WHEN event_id % 3 = 1 THEN
                upper(substr(event_type, 1, 1)) || substr(event_type, 2)
              ELSE event_type END AS s
  FROM events)
SELECT lower(MIN(s)) AS event_type_ci,
       COUNT(*) AS n_events,
       COUNT(DISTINCT s) AS n_case_variants
FROM mixed GROUP BY lower(s)
""",
)
def q_str_collation_group(spark, sf_dir):
    """Spark 4 collation surface: case-insensitive grouping WITHOUT lower().

    Collated string types (SPARK-46830): the column is declared
    UTF8_LCASE-collated and the groupBy itself hashes/compares under the
    collation — no normalization expression in the plan, and at 100 TB
    the collation survives into shuffle exchange keys and joins (lower()
    rewrites do not compose with range partitioning or statistics).
    Mixed-case inputs are derived deterministically (upper / first-letter
    cap by event_id residue) so both engines see identical strings; the
    oracle states the classic GROUP BY lower() rewrite, and outputs are
    anchored on lower(MIN(raw)) because the collated group's
    representative key is engine-arbitrary — the one portability hazard
    collation introduces.
    """
    e = load_table(spark, sf_dir, "events")
    mixed = e.select(
        "event_id",
        F.when(
            F.col("event_id") % 3 == 0, F.upper("event_type")
        )
        .when(
            F.col("event_id") % 3 == 1,
            F.concat(
                F.upper(F.substring("event_type", 1, 1)),
                F.expr("substr(event_type, 2)"),
            ),
        )
        .otherwise(F.col("event_type"))
        .alias("s"),
    )
    return (
        mixed.withColumn("s_ci", F.expr("collate(s, 'UTF8_LCASE')"))
        .groupBy("s_ci")
        .agg(
            F.lower(F.min("s")).alias("event_type_ci"),
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("s").alias("n_case_variants"),
        )
        .drop("s_ci")
        .select("event_type_ci", "n_events", "n_case_variants")
    )
