"""Scalar function coverage: string, date/time, math, array-lambda,
and JSON functions (SURVEY.md §2.2 scalar rows).

Everything here is a built-in `pyspark.sql.functions` expression —
JVM-side, inside whole-stage codegen, zero Python in the hot path.
This is the engine's answer to the reference's row-at-a-time Python
record munging (opendotaapi.py:105-112): the same transforms as
vectorized columnar expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dataextractor_spark.catalog import load_table
from dataextractor_spark.registry import query


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT
        p_partkey,
        upper(p_brand)                                   AS brand_u,
        lower(substring(p_type, 1, 6))                   AS type_prefix,
        CAST(length(p_name) AS BIGINT)                   AS name_len,
        CAST(len(string_split(p_name, ' ')) AS BIGINT)   AS n_words,
        string_split(p_name, ' ')[1]                     AS first_word,
        regexp_extract(p_name, '([a-z]+)', 1)            AS first_alpha,
        concat_ws('|', p_brand, trim(p_type))            AS brand_type,
        replace(p_brand, '#', '_')                       AS brand_clean
    FROM part
    WHERE p_partkey <= 500
    ORDER BY p_partkey
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar battery: case, substring, split, regexp_extract,
    concat_ws, replace — the name-cleanup/key-parsing tier (A11 keys
    are strings, SURVEY.md §2.2)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_partkey") <= 500)
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.lower(F.substring("p_type", 1, 6)).alias("type_prefix"),
            F.length("p_name").cast("long").alias("name_len"),
            F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
            F.split("p_name", " ").getItem(0).alias("first_word"),
            F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_alpha"),
            F.concat_ws("|", F.col("p_brand"), F.trim(F.col("p_type"))).alias(
                "brand_type"
            ),
            F.replace(F.col("p_brand"), F.lit("#"), F.lit("_")).alias("brand_clean"),
        )
        .orderBy("p_partkey")
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT
        CAST(year(o_orderdate) AS BIGINT)    AS yr,
        CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        strftime(date_trunc('month', min(o_orderdate)), '%Y-%m-%d') AS first_month,
        CAST(max(datediff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00')) AS BIGINT) AS max_age_days,
        count(*) AS n
    FROM orders
    GROUP BY yr, qtr
    ORDER BY yr, qtr
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery: year/quarter extraction, date_trunc,
    datediff, date_format — the A7/A8 timestamp tier on relational
    data."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
        )
        .agg(
            F.date_format(
                F.date_trunc("month", F.min("o_orderdate")), "yyyy-MM-dd"
            ).alias("first_month"),
            F.max(
                F.datediff(
                    F.lit("2002-01-01 00:00:00").cast("timestamp"),
                    F.col("o_orderdate"),
                ).cast("long")
            ).alias("max_age_days"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("yr", "qtr")
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT
        l_returnflag,
        round(sum(l_extendedprice * (1 - l_discount)), 2)      AS revenue,
        round(sum(abs(l_discount - 0.05)), 4)                  AS tot_disc_dev,
        round(avg(sqrt(l_quantity)), 6)                        AS avg_sqrt_qty,
        round(avg(ln(l_extendedprice)), 6)                     AS avg_ln_price,
        round(sum(pow(l_tax, 2)), 6)                           AS sum_tax_sq,
        CAST(sum(CAST(l_linenumber AS BIGINT) % 2) AS BIGINT)  AS n_odd_lines,
        round(max(greatest(l_discount, l_tax)), 2)             AS max_rate,
        round(avg(CASE WHEN l_tax > 0.04 THEN 1.0 ELSE 0.0 END), 6)
                                                               AS high_tax_rate
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery: abs/sqrt/ln/pow/mod/greatest under aggregation,
    plus the rate-of-an-indicator pattern (avg of a 0/1 CASE — the
    win-rate-per-hero arithmetic the reference's README promises,
    README.md:23; the broadcast-dim-chain form of the same rate is
    join_star_revenue, driver-green)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.round(F.sum(F.abs(F.col("l_discount") - 0.05)), 4).alias("tot_disc_dev"),
            F.round(F.avg(F.sqrt("l_quantity")), 6).alias("avg_sqrt_qty"),
            F.round(F.avg(F.log("l_extendedprice")), 6).alias("avg_ln_price"),
            F.round(F.sum(F.pow("l_tax", F.lit(2))), 6).alias("sum_tax_sq"),
            F.sum(F.col("l_linenumber").cast("long") % 2)
            .cast("long")
            .alias("n_odd_lines"),
            F.round(F.max(F.greatest("l_discount", "l_tax")), 2).alias("max_rate"),
            F.round(
                F.avg(F.when(F.col("l_tax") > 0.04, 1.0).otherwise(0.0)), 6
            ).alias("high_tax_rate"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT
        label,
        count(*)                                                          AS n_vecs,
        CAST(min(len(embedding)) AS BIGINT)                               AS min_dim,
        round(avg(embedding[1]::DOUBLE), 6)                               AS avg_first,
        round(avg(len(list_filter(embedding, x -> x > 0))), 6)            AS avg_n_pos,
        round(avg(list_sum(list_transform(embedding, x -> x::DOUBLE))), 6) AS avg_sum
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array lambda battery over the embedding column: element_at,
    size, filter, transform, aggregate (the A5 array tier generalized
    to higher-order functions)."""
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return (
        e.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min(F.size("embedding")).cast("long").alias("min_dim"),
            F.round(F.avg(F.element_at("embedding", 1).cast("double")), 6).alias(
                "avg_first"
            ),
            F.round(
                F.avg(F.size(F.filter(F.col("embedding"), lambda x: x > 0))), 6
            ).alias("avg_n_pos"),
            F.round(
                F.avg(F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x)), 6
            ).alias("avg_sum"),
        )
        .orderBy("label")
    )


@query(
    "scalar_json_funcs",
    oracle="""
    SELECT
        event_type,
        count(*)                                              AS n,
        round(avg(CAST(props->>'$.k' AS BIGINT)), 6)          AS avg_k,
        CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT)    AS max_k,
        CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT)    AS variant_min_k,
        CAST(sum(CASE WHEN CAST(props->>'$.k' AS BIGINT) > 50
                 THEN 1 ELSE 0 END) AS BIGINT)                AS variant_n_big_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON + Variant scalar extraction from the semi-structured props
    column (A13's raw-JSON payload tier), both engine paths in one
    query: get_json_object string-path lookup (n/avg_k/max_k) AND the
    Spark 4 VariantType path — parse_json → variant_get with a typed
    path (variant_min_k/variant_n_big_k), the open-ended-schema
    alternative to from_json for payloads whose shape isn't known up
    front (the reference's 22 raw-passthrough getters, A13). One oracle
    proves both paths agree with ANSI JSON semantics."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    kv = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(k), 6).alias("avg_k"),
            F.max(k).cast("long").alias("max_k"),
            F.min(kv).cast("long").alias("variant_min_k"),
            F.sum(F.when(kv > 50, 1).otherwise(0))
            .cast("long")
            .alias("variant_n_big_k"),
        )
        .orderBy("event_type")
    )


@query(
    "scalar_bitwise_funcs",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)                          AS n,
           CAST(bit_and(o_orderkey | 4095) AS BIGINT)        AS keys_and,
           CAST(bit_or(o_orderkey & 255) AS BIGINT)          AS keys_or,
           CAST(bit_xor(o_orderkey) AS BIGINT)               AS keys_xor,
           CAST(sum(bit_count(o_orderkey)) AS BIGINT)        AS total_bits,
           CAST(sum(o_orderkey & 1023) AS BIGINT)            AS sum_masked,
           CAST(sum((o_custkey << 2) >> 1) AS BIGINT)        AS sum_shifted
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar + aggregate surface: masks, shifts, popcount and
    the bit_and/bit_or/bit_xor aggregates — the tier under the bitmap
    distinct-count operator (agg_bitmap_distinct) and the simhash/
    phash banding, registered on its own so the primitive layer has
    direct oracle evidence. All codegen integer expressions; the
    aggregates combine map-side like any sum. (DuckDB's ``^`` is
    power, not xor — the oracle uses the aggregate spellings and
    infix &, |, <<, >> which the engines share.)"""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.bit_and(F.expr("o_orderkey | 4095")).cast("long").alias(
                "keys_and"
            ),
            F.bit_or(F.expr("o_orderkey & 255")).cast("long").alias(
                "keys_or"
            ),
            F.bit_xor("o_orderkey").cast("long").alias("keys_xor"),
            F.sum(F.bit_count("o_orderkey")).cast("long").alias(
                "total_bits"
            ),
            F.sum(F.expr("o_orderkey & 1023")).cast("long").alias(
                "sum_masked"
            ),
            F.sum(F.expr("(o_custkey << 2) >> 1")).cast("long").alias(
                "sum_shifted"
            ),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "scalar_conditional_funcs",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN nullif(o_custkey % 10, 0) IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT)        AS n_zero_bucket,
           round(sum(coalesce(o_totalprice / nullif(o_custkey % 10, 0),
                              0.0)), 2)                  AS guarded_sum,
           round(sum(o_totalprice / nullif(o_custkey % 10, 0)), 2)
                                                         AS try_div_sum,
           round(sum(greatest(o_totalprice, 100000.0)
                     - least(o_totalprice, 100000.0)), 2) AS spread_vs_100k
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling scalar surface: nullif as the divide-by-zero
    guard, try_divide (Spark's ANSI-safe division — NULL on zero,
    which SQL spells ``x / nullif(d, 0)``), coalesce defaults, and
    greatest/least clamping — the defensive expressions every
    null-guarded reference dataset check (A19's ``if x:``) compiles
    to. guarded_sum (zeros substituted) and try_div_sum (NULLs
    skipped by sum) land on the same value by different NULL routes —
    both routes oracled. All codegen; the aggregate just makes the
    results hashable."""
    o = load_table(spark, sf_dir, "orders")
    guard = F.nullif(F.col("o_custkey") % 10, F.lit(0))
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(guard.isNull().cast("long")).alias("n_zero_bucket"),
            F.round(
                F.sum(F.coalesce(F.col("o_totalprice") / guard, F.lit(0.0))),
                2,
            ).alias("guarded_sum"),
            F.round(
                F.sum(F.expr("try_divide(o_totalprice, o_custkey % 10)")), 2
            ).alias("try_div_sum"),
            F.round(
                F.sum(
                    F.greatest(F.col("o_totalprice"), F.lit(100000.0))
                    - F.least(F.col("o_totalprice"), F.lit(100000.0))
                ),
                2,
            ).alias("spread_vs_100k"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "scalar_variant_funcs",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k,
           CAST(sum(CASE WHEN json_extract(props, '$.absent') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_path
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def scalar_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT semi-structured type (Spark 4.0, SPARK-45891):
    ``parse_json`` turns the raw ``props`` JSON string into Spark's
    binary variant encoding ONCE, and ``variant_get`` path lookups
    read that encoding directly — on a real lake the parse cost is
    paid at ingest and every downstream query skips string re-parsing
    entirely, which is the whole point of the type at 100 TB (get_json
    _object re-tokenizes the string per call). ``try_variant_get`` on
    an absent path returns NULL instead of erroring — the audit column
    proves the total-path behavior. The oracle reads the same numbers
    through DuckDB's JSON extractor, so the variant encode/decode is
    value-checked end-to-end. One events scan, one hash aggregate."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json(F.col("props")).alias("vp")
    )
    k = F.expr("variant_get(vp, '$.k', 'long')")
    missing = F.expr("try_variant_get(vp, '$.absent', 'long')")
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(k).cast("long").alias("sum_k"),
            F.min(k).cast("long").alias("min_k"),
            F.max(k).cast("long").alias("max_k"),
            F.sum(F.when(missing.isNull(), F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_missing_path"),
        )
        .orderBy("event_type")
    )
