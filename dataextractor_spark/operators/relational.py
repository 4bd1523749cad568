"""Core relational spine: scan → filter → project → hash-agg → sort.

Flagship (SURVEY.md §7 minimum slice): the reference's one real
dataflow is scan→normalize→aggregate-shaped (get_matches,
opendotaapi.py:95-123); its README promises "average match time" style
aggregates (README.md:23-24). We express that spine as a TPC-H-Q1-style
pricing summary over ``lineitem``.

Scale notes: the plan is narrow-scan → partial (map-side) hash
aggregate → single shuffle on the 6-value group key → final aggregate.
At 100 TB this is the optimal shape — the shuffle moves only
|groups|×|partitions| pre-aggregated rows, and the date filter is
pushed into the Parquet scan (verify via .explain: PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dataextractor_spark.catalog import load_table
from dataextractor_spark.registry import query


@query(
    "flagship_pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        round(sum(l_quantity), 2)                                        AS sum_qty,
        round(sum(l_extendedprice), 2)                                   AS sum_base_price,
        round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
        round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
        round(avg(l_quantity), 6)                                        AS avg_qty,
        round(avg(l_extendedprice), 6)                                   AS avg_price,
        round(avg(l_discount), 6)                                        AS avg_disc,
        count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: filter → groupBy → multi-agg → sort (TPC-H Q1 shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT
        o_orderpriority,
        count(*)                    AS n_orders,
        round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 1000 AND 200000
      AND o_orderpriority LIKE '%URGENT%'
      AND o_custkey IS NOT NULL
      AND (o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           OR o_totalprice > 150000)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate coverage: IN / BETWEEN / LIKE / IS NOT NULL / OR.

    All predicates are Catalyst-native so the conjunctive parts reach
    the Parquet scan as pushed filters (cf. reference: fetches whole
    endpoints, never filters — SURVEY.md §4.1).
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus").isin("O", "F"))
        .filter(F.col("o_totalprice").between(1000, 200000))
        .filter(F.col("o_orderpriority").like("%URGENT%"))
        .filter(F.col("o_custkey").isNotNull())
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            | (F.col("o_totalprice") > 150000)
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by price. Spark compiles orderBy().limit(k) to
    TakeOrderedAndProject — per-partition heaps + driver merge, no full
    sort, no shuffle of the full table. The deterministic o_orderkey
    tiebreak keeps the oracle hash stable."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "union_except_intersect",
    oracle="""
    WITH big_spenders AS (
        SELECT o_custkey AS custkey FROM orders GROUP BY o_custkey
        HAVING sum(o_totalprice) > 300000
    ),
    machinery AS (
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    )
    SELECT 'union' AS set_op, count(*) AS n FROM
        (SELECT custkey FROM big_spenders UNION SELECT custkey FROM machinery)
    UNION ALL
    SELECT 'intersect' AS set_op, count(*) AS n FROM
        (SELECT custkey FROM big_spenders INTERSECT SELECT custkey FROM machinery)
    UNION ALL
    SELECT 'except' AS set_op, count(*) AS n FROM
        (SELECT custkey FROM big_spenders EXCEPT SELECT custkey FROM machinery)
    UNION ALL
    SELECT 'distinct_li_status' AS set_op, count(*) AS n FROM
        (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
    ORDER BY set_op
    """,
)
def union_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra over two customer segments (union/intersect/except)
    plus row-level distinct (dropDuplicates on lineitem status flags —
    partial de-dup map-side, then a shuffle only of the surviving
    distinct keys). Each set op is a shuffle on the key; counts keep
    the result tiny."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.sum("o_totalprice").alias("spend"))
        .filter(F.col("spend") > 300000)
        .select("custkey")
    )
    mach = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("custkey")
    )
    u = big.union(mach).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("union").alias("set_op"), "n"
    )
    i = big.intersect(mach).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect").alias("set_op"), "n"
    )
    e = big.exceptAll(mach).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except").alias("set_op"), "n"
    )
    d = (
        li.select("l_returnflag", "l_linestatus")
        .dropDuplicates()
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("distinct_li_status").alias("set_op"), "n")
    )
    return u.unionByName(i).unionByName(e).unionByName(d).orderBy("set_op")


@query(
    "set_ops_all_multiplicity",
    oracle="""
    WITH a AS (SELECT l_partkey FROM lineitem WHERE l_quantity > 45),
         b AS (SELECT l_partkey FROM lineitem WHERE l_discount > 0.08)
    SELECT 'a_bag' AS set_op, count(*) AS n FROM a
    UNION ALL
    SELECT 'intersect_all', count(*) FROM
        (SELECT l_partkey FROM a INTERSECT ALL SELECT l_partkey FROM b)
    UNION ALL
    SELECT 'intersect_distinct', count(*) FROM
        (SELECT l_partkey FROM a INTERSECT SELECT l_partkey FROM b)
    UNION ALL
    SELECT 'except_all', count(*) FROM
        (SELECT l_partkey FROM a EXCEPT ALL SELECT l_partkey FROM b)
    UNION ALL
    SELECT 'except_distinct', count(*) FROM
        (SELECT l_partkey FROM a EXCEPT SELECT l_partkey FROM b)
    ORDER BY set_op
    """,
)
def set_ops_all_multiplicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG-semantics set operations (INTERSECT ALL / EXCEPT ALL) next
    to their DISTINCT forms over two multisets of part keys — the
    multiplicity rules (ALL keeps min(m,n) copies in intersect,
    max(m−n,0) in except) that silently change row counts when a
    migration swaps one for the other. Spark's intersectAll/exceptAll
    implement exactly the SQL-standard bag semantics; counting all
    five variants side by side makes the distinction hash-verifiable.

    Plan: each ALL variant compiles to a single hash aggregate over
    (value, side-count) pairs — one shuffle on the key, multiplicity
    arithmetic in the aggregate, never a join of duplicated rows —
    and the DISTINCT forms are partial-dedup shuffles; all five
    branches reuse the same two pushed-filter scans."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 45).select("l_partkey")
    b = li.filter(F.col("l_discount") > 0.08).select("l_partkey")

    def one(tag: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(tag).alias("set_op"), "n"
        )

    return (
        one("a_bag", a)
        .unionByName(one("intersect_all", a.intersectAll(b)))
        .unionByName(one("intersect_distinct", a.intersect(b)))
        .unionByName(one("except_all", a.exceptAll(b)))
        .unionByName(one("except_distinct", a.subtract(b)))
        .orderBy("set_op")
    )
