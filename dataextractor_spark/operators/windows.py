"""Window functions: ranking, analytic frames, distribution ranks
(SURVEY.md §2.2 window rows; top-N-items / running-gold analogues,
README.md:25,32).

Window execution = one shuffle on partitionBy keys + per-partition
sort. Scale discipline: every window here partitions by a
high-cardinality key (brand, customer, user) so no single partition
exceeds executor memory; an unpartitioned window (global ORDER BY
over 100 TB) is the anti-pattern and appears only in top-k form, which
Spark rewrites to TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from dataextractor_spark.catalog import load_table
from dataextractor_spark.registry import query


@query(
    "window_rank_topn",
    oracle="""
    SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               row_number() OVER (
                   PARTITION BY p_brand
                   ORDER BY p_retailprice DESC, p_partkey
               ) AS rk
        FROM part
    )
    WHERE rk <= 3
    ORDER BY p_brand, rk
    """,
)
def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 priciest parts per brand (top-N-per-group). row_number
    with a key tiebreak keeps it deterministic for the oracle hash."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            F.round("p_retailprice", 2).alias("price"),
            "rk",
        )
        .orderBy("p_brand", "rk")
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend over order history (running-gold
    analogue). ROWS frame + orderkey tiebreak → deterministic prefix
    sums."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           round(avg(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 6) AS mov_avg3,
           round(value - lag(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ), 2) AS delta,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS next_type
    FROM events
    ORDER BY user_id, event_id
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-frame battery per user event stream, one window shuffle:
    3-row trailing moving average (bounded ROWS frame), lag value delta,
    and lead next-event-type. All three functions share the same
    (partition, order) spec so Catalyst computes them in a single
    Window node — one shuffle on user_id, one partition-local sort."""
    e = load_table(spark, sf_dir, "events")
    spec = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w3 = spec.rowsBetween(-2, Window.currentRow)
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w3), 6).alias("mov_avg3"),
        F.round(F.col("value") - F.lag("value").over(spec), 2).alias("delta"),
        F.lead("event_type").over(spec).alias("next_type"),
    ).orderBy("user_id", "event_id")


@query(
    "window_deciles",
    oracle="""
    SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM (
        SELECT o_totalprice,
               ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders
    )
    GROUP BY decile
    ORDER BY decile
    """,
)
def window_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bucketing of order prices (distribution analysis,
    README.md:32) — EXACT ntile semantics without the global
    single-partition sort a bare ``ntile(10) OVER (ORDER BY …)``
    compiles to.

    Scale shape (the classic two-pass distributed ranking):
    1. ``repartitionByRange`` on the sort key — sampled range
       boundaries, every partition holds a contiguous key range;
    2. per-partition ``row_number`` (window PARTITIONed by the range
       partition id — bounded, parallel sorts);
    3. per-partition counts → exclusive prefix offsets via a tiny
       triangular self-join on the ≤n_partitions-row count table
       (broadcast; no unpartitioned window anywhere in the plan);
    4. global rank = offset + local row_number, folded through the
       exact ntile formula: with n rows, the first n mod 10 tiles get
       ceil(n/10) rows, the rest floor(n/10).
    Identical result to the oracle's ntile, but the heavy data only
    ever sees a range exchange + partition-local sorts — the plan
    survives a fact table 1000× this size. tests/test_scale_paths.py
    pins equivalence against the naive global-ntile form."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    k = 10
    # r13 scale-knob sweep: range fan-out from the session conf (was a
    # hardcoded 32). Global rank = offset + local row_number is
    # partition-count-invariant, so the result is unchanged.
    n_range = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = o.repartitionByRange(
        n_range, "o_totalprice", "o_orderkey"
    ).withColumn("pid", F.spark_partition_id())
    counts = parts.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    rhs = counts.select(F.col("pid").alias("pid_b"), F.col("cnt").alias("cnt_b"))
    offsets = (
        counts.join(F.broadcast(rhs), F.col("pid_b") < F.col("pid"), "left")
        .groupBy("pid")
        .agg(F.coalesce(F.sum("cnt_b"), F.lit(0)).alias("off"))
    )
    total = counts.agg(F.sum("cnt").alias("n_total"))
    lw = Window.partitionBy("pid").orderBy("o_totalprice", "o_orderkey")
    ranked = (
        parts.withColumn("lrn", F.row_number().over(lw))
        .join(F.broadcast(offsets), "pid")
        .crossJoin(F.broadcast(total))
        .withColumn("rnk", F.col("off") + F.col("lrn"))
    )
    q = F.floor(F.col("n_total") / k)
    r = F.col("n_total") % k
    big = (q + 1) * r  # rows held by the ceil-sized tiles
    decile = (
        F.when(F.col("rnk") <= big, F.ceil(F.col("rnk") / (q + 1)))
        .otherwise(r + F.ceil((F.col("rnk") - big) / F.greatest(q, F.lit(1))))
        .cast("long")
    )
    return (
        ranked.select("o_totalprice", decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("decile")
    )


@query(
    "window_percent_rank_cume",
    oracle="""
    SELECT s_suppkey,
           round(s_acctbal, 2) AS acctbal,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal)
    ORDER BY s_suppkey
    """,
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranks — percent_rank and cume_dist of supplier
    balance WITHIN nation (skill-percentile analogue). Partitioning by
    nation keeps each sort partition-local and bounded; both functions
    are tie-stable (equal values share a rank) so the result is
    deterministic without a tiebreaker."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal")
    return (
        s.select(
            "s_suppkey",
            F.round("s_acctbal", 2).alias("acctbal"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "window_first_last_nth",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               first_value(o_totalprice) OVER w AS first_price,
               last_value(o_totalprice)  OVER w AS last_price,
               nth_value(o_totalprice, 2) OVER w AS second_price,
               row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS rn
        FROM orders
        WINDOW w AS (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    )
    SELECT c_mktsegment,
           count(*) AS n_customers,
           round(avg(last_price - first_price), 6) AS avg_drift,
           count(second_price) AS n_with_second
    FROM per_cust JOIN customer ON o_custkey = c_custkey
    WHERE rn = 1
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over the full-partition
    frame (ROWS UNBOUNDED..UNBOUNDED — last_value under the DEFAULT
    frame would see only rows up to CURRENT, the classic frame trap),
    with a deterministic (date, key) tiebreak; reduced to per-segment
    lifetime price drift. One window shuffle on the customer key, one
    dimension join, one small aggregate."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wn = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    per_cust = o.select(
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.row_number().over(wn).alias("rn"),
    ).filter(F.col("rn") == 1)
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg(F.col("last_price") - F.col("first_price")), 6).alias(
                "avg_drift"
            ),
            F.count("second_price").alias("n_with_second"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "window_value_range_frame",
    oracle="""
    WITH sim AS (
        SELECT o_custkey,
               CAST(count(*) OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice
                   RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING
               ) - 1 AS BIGINT) AS n_similar
        FROM orders
    )
    SELECT n_similar, CAST(count(*) AS BIGINT) AS n_orders
    FROM sim
    GROUP BY n_similar
    ORDER BY n_similar
    """,
)
def window_value_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-range window frame (RANGE BETWEEN 500 PRECEDING AND 500
    FOLLOWING over a numeric ordering) — the frame type the window
    family lacked: row frames count neighbors by position, interval
    frames by time; this one gathers rows within a numeric DISTANCE of
    the current row's value. Per order: how many of the same
    customer's OTHER orders are priced within ±500 — self-similarity
    of a customer's basket — then the per-order counts roll up to a
    bounded distribution (n_similar → order count). The window
    partitions on the customer key, and orders-per-customer is
    schema-bounded, so the per-partition sort stays flat as the fact
    table grows."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-500, 500)
    )
    sim = o.select(
        (F.count(F.lit(1)).over(w) - 1).cast("long").alias("n_similar")
    )
    return (
        sim.groupBy("n_similar")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy("n_similar")
    )
