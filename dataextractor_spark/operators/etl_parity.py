"""Tier-A parity operators — the reference's actual ETL transforms
re-expressed as declarative Spark plans (SURVEY.md §2.1).

Each query cites the reference behavior it reproduces. The reusable
implementations live in dataextractor_spark.etl.normalize; these
registry entries demonstrate them on the driver tables.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from dataextractor_spark.catalog import load_table
from dataextractor_spark.etl.normalize import flatten_array_column, unpivot_dict
from dataextractor_spark.registry import query

# The reference's constants dicts (opendotaapi.py:125-183) are {id: name}
# maps unpivoted to 2-column dims (FIXTURES.md §2b). Same shape, inline:
LOBBY_TYPES: dict[str, str] = {
    "0": "lobby_type_unranked",
    "1": "lobby_type_practice",
    "2": "lobby_type_tournament",
    "4": "lobby_type_coop_bots",
    "5": "lobby_type_ranked_team",
    "6": "lobby_type_ranked_solo",
    "7": "lobby_type_ranked",
    "8": "lobby_type_1v1_mid",
}


@query(
    "etl_flatten_array",
    oracle="""
    SELECT
        vec_id,
        round(embedding[1]::DOUBLE, 5) AS emb_1,
        round(embedding[2]::DOUBLE, 5) AS emb_2,
        round(embedding[3]::DOUBLE, 5) AS emb_3,
        round(embedding[4]::DOUBLE, 5) AS emb_4,
        round(embedding[5]::DOUBLE, 5) AS emb_5,
        label
    FROM embeddings
    ORDER BY vec_id
    """,
)
def etl_flatten_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6 parity: fixed-width array → positional columns, source
    array dropped (radiant_team[i] → radiant_hero_{i+1},
    opendotaapi.py:105-112). Pure projection — narrow, no shuffle."""
    e = load_table(spark, sf_dir, "embeddings")
    flat = flatten_array_column(e, "embedding", "emb", 5, cast="double", round_to=5)
    return flat.select("vec_id", *[f"emb_{i}" for i in range(1, 6)], "label").orderBy(
        "vec_id"
    )


@query(
    "etl_dict_unpivot",
    oracle="""
    SELECT * FROM (VALUES
        ('0', 'lobby_type_unranked'),
        ('1', 'lobby_type_practice'),
        ('2', 'lobby_type_tournament'),
        ('4', 'lobby_type_coop_bots'),
        ('5', 'lobby_type_ranked_team'),
        ('6', 'lobby_type_ranked_solo'),
        ('7', 'lobby_type_ranked'),
        ('8', 'lobby_type_1v1_mid')
    ) AS t(lobby_id, name)
    ORDER BY lobby_id
    """,
)
def etl_dict_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 parity: {id: name} constants map → 2-column dimension table
    with string keys (opendotaapi.py:136; FIXTURES.md §2b). Dimension
    is driver-built and broadcast-able — exactly how a 100 TB job
    should treat a bounded domain table."""
    return unpivot_dict(spark, LOBBY_TYPES, key_col="lobby_id", value_col="name").orderBy(
        "lobby_id"
    )


@query(
    "etl_epoch_tz",
    oracle="""
    SELECT
        strftime(ts - INTERVAL 3 HOUR, '%Y-%m-%d') AS dt_local,
        count(*)             AS n,
        round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY dt_local
    ORDER BY dt_local
    """,
)
def etl_epoch_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/A8 parity: UTC event time → America/Sao_Paulo local date,
    used as the partition key (opendotaapi.py:114-116 converts epoch →
    São Paulo and date-stamps the output file).

    Spark side uses the real timezone conversion
    (from_utc_timestamp); the oracle uses the fixed -3h offset, which
    is exact for 2024 data (Brazil abolished DST in 2019)."""
    e = load_table(spark, sf_dir, "events")
    local = F.from_utc_timestamp(F.col("ts"), "America/Sao_Paulo")
    return (
        e.groupBy(F.date_format(local, "yyyy-MM-dd").alias("dt_local"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("dt_local")
    )


@query(
    "etl_epoch_roundtrip",
    oracle="""
    SELECT
        CAST(floor(epoch(ts)) AS BIGINT)                             AS epoch_s,
        strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)) AT TIME ZONE 'UTC',
                 '%Y-%m-%d %H:%M:%S')                         AS ts_rt,
        event_id
    FROM events
    WHERE event_id < 200
    ORDER BY event_id
    """,
)
def etl_epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 parity (inverse direction): timestamp → unix epoch seconds →
    timestamp, the datetime.fromtimestamp round-trip
    (opendotaapi.py:115) as vectorized expressions."""
    e = load_table(spark, sf_dir, "events")
    epoch_s = F.unix_timestamp("ts").alias("epoch_s")
    return (
        e.filter(F.col("event_id") < 200)
        .select(
            epoch_s,
            F.date_format(
                F.timestamp_seconds(F.unix_timestamp("ts")), "yyyy-MM-dd HH:mm:ss"
            ).alias("ts_rt"),
            "event_id",
        )
        .orderBy("event_id")
    )


@query(
    "etl_json_normalize",
    oracle="""
    SELECT
        CAST(CAST(props->>'$.k' AS BIGINT) % 10 AS BIGINT) AS k_bucket,
        count(*)                                           AS n,
        count(DISTINCT event_type)                         AS n_types
    FROM events
    GROUP BY k_bucket
    ORDER BY k_bucket
    """,
)
def etl_json_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 parity: semi-structured JSON string → typed columns via an
    explicit schema (from_json), not sampled inference — fixing the
    reference's infer_schema_length=1000 hazard
    (extract-data-dota.py:85-110; SURVEY.md §1.3)."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.withColumn("props_s", F.from_json("props", "k BIGINT"))
    return (
        parsed.groupBy((F.col("props_s.k") % 10).cast("long").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .orderBy("k_bucket")
    )


@query(
    "etl_partitioned_sink",
    oracle="""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           count(*)                         AS n,
           round(sum(l_quantity), 2)        AS sum_qty
    FROM lineitem
    WHERE year(l_shipdate) IN (1996, 1997)
    GROUP BY ship_year
    ORDER BY ship_year
    """,
)
def etl_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A16/A17/A18 parity: date-derived partitioned Parquet sink +
    partition-pruned read-back.

    The reference encodes the date into a filename and then overwrites
    a fixed S3 key anyway (opendotaapi.py:116 vs
    extract-data-dota.py:131 — the partitioning is lost); we do it
    properly: write.partitionBy(ship_year) in overwrite mode (the
    idempotent full-load semantics of A18), then read back with a
    partition filter which prunes directories, never touching other
    years' files. Same plan shape works on s3a:// unchanged.
    """
    li = load_table(spark, sf_dir, "lineitem")
    out = os.path.join(tempfile.gettempdir(), "dataextractor_spark_partsink")
    (
        li.withColumn("ship_year", F.year("l_shipdate").cast("long"))
        .write.mode("overwrite")
        .partitionBy("ship_year")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(F.col("ship_year").isin(1996, 1997))
    return (
        back.groupBy("ship_year")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("ship_year")
        # partition column comes back as the partition's inferred type;
        # normalize to long to match the oracle schema exactly
        .select(F.col("ship_year").cast("long").alias("ship_year"), "n", "sum_qty")
    )


@query(
    "source_json_roundtrip",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON line-delimited source/sink roundtrip: documents → .json
    files → read back with the EXPLICIT catalog schema (never sampled
    inference — the reference's bounded-sample inference at
    extract-data-dota.py:153 is its main correctness hazard) →
    aggregate. The oracle aggregates the original parquet, so any
    encode/decode loss (escaping, unicode, nulls) breaks the hash.
    JSONL is splittable, so the read parallelizes per-file/per-split
    at any scale; one file per input partition on the write."""
    d = load_table(spark, sf_dir, "documents")
    out = os.path.join(
        tempfile.gettempdir(), "spark_graft_json_roundtrip"
    )
    d.write.mode("overwrite").json(out)
    back = spark.read.schema(d.schema).json(out)
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


@query(
    "source_csv_roundtrip",
    oracle="""
    SELECT source, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(strlen(text)) AS BIGINT) AS total_len
    FROM documents GROUP BY source ORDER BY source
    """,
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink roundtrip with quoting/escaping proven by the
    oracle hash (free text goes through quoted fields intact; header
    carries names, catalog schema carries types — CSV itself is
    typeless). multiLine=false stays splittable: embedded newlines
    don't occur in this corpus, and the writer would quote them if
    they did — at scale, prefer JSONL/Parquet for free text exactly
    because multiLine CSV forfeits split parallelism."""
    d = load_table(spark, sf_dir, "documents")
    out = os.path.join(tempfile.gettempdir(), "spark_graft_csv_roundtrip")
    d.write.mode("overwrite").option("header", True).option(
        "escape", '"'
    ).csv(out)
    back = (
        spark.read.schema(d.schema)
        .option("header", True)
        .option("escape", '"')
        .csv(out)
    )
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.length("text")).cast("long").alias("total_len"),
        )
        .orderBy("source")
    )


@query(
    "etl_schema_evolution",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_old_schema,
           CAST(sum(CASE WHEN o_orderkey % 2 = 1
                          AND o_orderpriority = '1-URGENT'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           round(sum(CASE WHEN o_orderkey % 2 = 1
                     THEN o_totalprice ELSE 0 END), 2) AS new_rev
    FROM orders
    """,
)
def etl_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on the storage layer: an old-schema batch
    (no status column) and a new-schema batch (adds an urgent-flag
    column) land in the same dataset directory; `mergeSchema=true`
    reconciles them at read time — old rows surface NULL for columns
    they predate, exactly the drift the reference's bounded-sample
    inference (extract-data-dota.py:153) silently mistypes. The oracle
    recomputes the per-batch facts from the source table, so both the
    write split and the merged read are value-checked.

    Scale note: merged-footer reconciliation costs one extra footer
    read per file at planning time; production tables pin the contract
    in a catalog (catalog.py) and use mergeSchema only during
    migrations."""
    o = load_table(spark, sf_dir, "orders")
    out = os.path.join(tempfile.gettempdir(), "spark_graft_schema_evo")
    old_batch = o.filter(F.col("o_orderkey") % 2 == 0).drop("o_orderstatus")
    new_batch = o.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "o_urgent_flag", F.col("o_orderpriority") == "1-URGENT"
    )
    old_batch.write.mode("overwrite").parquet(os.path.join(out, "batch=1"))
    new_batch.write.mode("overwrite").parquet(os.path.join(out, "batch=2"))
    merged = spark.read.option("mergeSchema", True).parquet(out)
    return merged.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.when(F.col("o_orderstatus").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_old_schema"),
        F.sum(F.when(F.col("o_urgent_flag"), 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        F.round(
            F.sum(
                F.when(
                    F.col("o_urgent_flag").isNotNull(), F.col("o_totalprice")
                ).otherwise(0.0)
            ),
            2,
        ).alias("new_rev"),
    )


@query(
    "source_corrupt_records",
    oracle="""
    SELECT CAST(3 AS BIGINT) AS n_good,
           CAST(2 AS BIGINT) AS n_corrupt,
           CAST(60 AS BIGINT) AS good_value_sum
    """,
)
def source_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input isolation on a JSONL scan — what the reference's
    silent `except → None` (A23, opendotaapi.py:121-123) SHOULD be: a
    known fraction of bad lines must neither kill the batch (FAILFAST)
    nor vanish (DROPMALFORMED); PERMISSIVE mode + columnNameOfCorrupt-
    Record quarantines them as rows so the pipeline can count, alert
    on, and replay them. The VALUES oracle pins the exact good/corrupt
    split and that good-row values survive parsing intact. Same plan
    at 100 TB: per-record isolation is scan-local, no extra pass."""
    lines = [
        '{"id": 1, "value": 10}',
        '{"id": 2, "value": 20}',
        "{not json at all",
        '{"id": 3, "value": 30}',
        '{"id": "not-a-number", "value": 5}',
    ]
    path = os.path.join(tempfile.gettempdir(), "spark_graft_corrupt_jsonl")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    with open(os.path.join(path, "part-0.jsonl"), "w") as f:
        f.write("\n".join(lines))
    df = spark.read.schema("id BIGINT, value BIGINT, _bad STRING").option(
        "mode", "PERMISSIVE"
    ).option("columnNameOfCorruptRecord", "_bad").json(path)
    # PERMISSIVE keeps whatever fields of a bad record DID parse (the
    # type-mismatch line yields value=5 with _bad set) — downstream
    # aggregates must gate on the quarantine column, not per-field nulls
    return df.agg(
        F.count("id").alias("n_good"),
        F.count("_bad").alias("n_corrupt"),
        F.coalesce(
            F.sum(F.when(F.col("_bad").isNull(), F.col("value"))), F.lit(0)
        ).alias("good_value_sum"),
    )


@query(
    "etl_merge_upsert",
    oracle="""
    WITH base AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    updates AS (
        SELECT o_orderkey, (cents * 11 + 5) // 10 AS new_cents
        FROM base WHERE o_orderkey % 10 = 0
    ),
    inserts AS (
        SELECT o_orderkey + 100000000 AS o_orderkey,
               (cents + 1) // 2 AS cents
        FROM base WHERE o_orderkey % 97 = 0
    ),
    merged AS (
        SELECT b.o_orderkey,
               COALESCE(u.new_cents, b.cents) AS cents,
               CASE WHEN u.o_orderkey IS NOT NULL
                    THEN 'updated' ELSE 'unchanged' END AS action
        FROM base b LEFT JOIN updates u ON b.o_orderkey = u.o_orderkey
        UNION ALL
        SELECT o_orderkey, cents, 'inserted' FROM inserts
    )
    SELECT action,
           CAST(count(*) AS BIGINT)           AS n_rows,
           CAST(sum(cents) AS BIGINT) / 100.0 AS total_price,
           min(o_orderkey)                    AS min_key,
           max(o_orderkey)                    AS max_key
    FROM merged
    GROUP BY action
    ORDER BY action
    """,
)
def etl_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / upsert semantics — the lakehouse step up from the
    reference's idempotent full overwrite (A18, fixed S3 keys at
    extract-data-dota.py:131-199): apply an update batch + an insert
    batch to a base table in one declarative plan (MATCHED → update,
    NOT MATCHED → insert), with per-action accounting. The batches
    are derived deterministically from the base so the oracle can
    replay the identical merge.

    Money math is integer CENTS end-to-end: ``round(x*1.1, 2)`` on
    doubles is engine-divergent on half-cent values (Spark BigDecimal
    HALF_UP on the shortest repr vs DuckDB — the round-3 driver FAIL:
    155–1500 per-row half-cent disagreements summed into a 3–5 cent
    hash mismatch). ``(cents*11+5) div 10`` / ``(cents+1) div 2`` are
    the exact HALF_UP equivalents in BIGINT, identical everywhere, and
    the aggregate stays exact (sum of cents < 2^53) until ONE final
    division by 100.0.

    Plan shape (what Delta/Iceberg MERGE compiles to, minus the file
    rewrite): one equi-join of base↔updates on the key + a union of
    the insert set. At 100 TB the join shuffles only the UPDATE KEYS
    (tiny side broadcast when small; AQE decides), never rewrites
    untouched rows, and the whole thing stays one lazy plan — in a
    real lake sink this feeds foreachBatch dynamic-partition
    overwrite (streaming/sinks.py)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    updates = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", F.expr("(cents * 11 + 5) div 10").alias("new_cents")
    )
    inserts = o.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.expr("(cents + 1) div 2").alias("cents"),
        F.lit("inserted").alias("action"),
    )
    merged = (
        o.join(updates, "o_orderkey", "left")
        .select(
            "o_orderkey",
            F.coalesce("new_cents", "cents").alias("cents"),
            F.when(F.col("new_cents").isNotNull(), F.lit("updated"))
            .otherwise(F.lit("unchanged"))
            .alias("action"),
        )
        .unionByName(inserts)
    )
    return (
        merged.groupBy("action")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum("cents") / F.lit(100.0)).alias("total_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("action")
    )


def _interleave_sql(xcol: str, ycol: str, bits: int = 8) -> str:
    """Morton/z-order code for two pre-scaled integer columns in
    [0, 2^bits): bit i of x lands at position 2i+1, bit i of y at 2i.
    Pure integer arithmetic (floor-divide by power-of-two literals —
    exact in doubles at these magnitudes, then % 2), so the SAME text
    evaluates identically as a Spark expression and as DuckDB SQL —
    no engine-specific bit operators."""
    # NB: divisors are written CAST(k AS DOUBLE), not "k.0" — Spark
    # parses bare decimal literals as DECIMAL, and a DECIMAL divide
    # chain ran this projection ~50x slower than double math (measured
    # 4.6 s -> <0.5 s at sf0.1). Power-of-two double division is exact
    # at these magnitudes, and the text stays valid DuckDB.
    terms = []
    for i in range(bits):
        terms.append(
            f"(cast(floor({xcol} / cast({2 ** i} as double)) as bigint) % 2)"
            f" * {2 ** (2 * i + 1)}"
        )
        terms.append(
            f"(cast(floor({ycol} / cast({2 ** i} as double)) as bigint) % 2)"
            f" * {2 ** (2 * i)}"
        )
    return "(" + " + ".join(terms) + ")"


_Z_EXPR = _interleave_sql("px", "sx")

_ZORDER_ORACLE = f"""
    WITH mx AS (
        SELECT max(l_partkey) AS pmax, max(l_suppkey) AS smax FROM lineitem
    ),
    scaled AS (
        SELECT cast(floor(l_partkey * 256.0 / (pmax + 1)) as bigint) AS px,
               cast(floor(l_suppkey * 256.0 / (smax + 1)) as bigint) AS sx,
               l_partkey, l_suppkey
        FROM lineitem CROSS JOIN mx
    ),
    coded AS (
        SELECT l_partkey, l_suppkey,
               cast(floor({_Z_EXPR} / 4096.0) as bigint) AS zbucket
        FROM scaled
    )
    SELECT zbucket,
           count(*)        AS n_rows,
           min(l_partkey)  AS p_min,
           max(l_partkey)  AS p_max,
           min(l_suppkey)  AS s_min,
           max(l_suppkey)  AS s_max
    FROM coded
    GROUP BY zbucket
    ORDER BY zbucket
"""


@query("etl_zorder_layout", oracle=_ZORDER_ORACLE)
def etl_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering for multi-dimensional data
    skipping — the lakehouse layout trick (Delta/Iceberg OPTIMIZE
    ZORDER BY) expressed as plain Spark: interleave the bits of two
    scaled join/filter keys into one sort key, lay files out along it,
    and every file's (min, max) footer range is narrow on BOTH
    dimensions at once — a predicate on EITHER key prunes ~√B of B
    files, where a single-key sort only ever prunes on its one key.

    The query materializes the audit a layout manager would check:
    per z-bucket (the file surrogate — top 4 z-bits → 16 buckets) the
    row count and both per-dimension min/max ranges. Each dimension's
    per-bucket span is ~¼ of its domain at 16 buckets (√16 = 4
    distinct quarter-ranges per dim), which is the data-skipping
    property. The z-code is one narrow integer expression (generated
    arithmetic, identical text in both engines — no UDF, no bit ops);
    key scaling uses one broadcast 1-row max; the only shuffle is the
    16-group aggregate. At 100 TB the same expression feeds
    repartitionByRange(zcode) + sortWithinPartitions before the
    parquet sink — layout cost is one range shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    mx = li.agg(
        F.max("l_partkey").alias("pmax"), F.max("l_suppkey").alias("smax")
    )
    scaled = li.crossJoin(F.broadcast(mx)).select(
        "l_partkey",
        "l_suppkey",
        F.expr(
            "cast(floor(l_partkey * cast(256 as double) / (pmax + 1)) as bigint)"
        ).alias("px"),
        F.expr(
            "cast(floor(l_suppkey * cast(256 as double) / (smax + 1)) as bigint)"
        ).alias("sx"),
    )
    return (
        scaled.select(
            "l_partkey",
            "l_suppkey",
            F.expr(f"cast(floor({_Z_EXPR} / cast(4096 as double)) as bigint)").alias("zbucket"),
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("p_min"),
            F.max("l_partkey").alias("p_max"),
            F.min("l_suppkey").alias("s_min"),
            F.max("l_suppkey").alias("s_max"),
        )
        .orderBy("zbucket")
    )


@query(
    "source_orc_roundtrip",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_chars) AS BIGINT)   AS total_chars,
           CAST(min(doc_id) AS BIGINT)    AS min_doc,
           CAST(max(doc_id) AS BIGINT)    AS max_doc
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink roundtrip — the third columnar lake format
    (after Parquet everywhere and the JSONL/CSV text roundtrips),
    using Spark's built-in vectorized ORC reader/writer. The oracle
    aggregates the ORIGINAL parquet table, so any type or value loss
    through the ORC encode/decode (string/long columns, dictionary
    encoding, stripe boundaries) breaks the hash. Like Parquet, ORC is
    splittable with stripe-level predicate pushdown and column
    projection, so the scan side scales identically; snappy
    compression is the default on both."""
    d = load_table(spark, sf_dir, "documents")
    out = os.path.join(tempfile.gettempdir(), "spark_graft_orc_roundtrip")
    d.write.mode("overwrite").orc(out)
    back = spark.read.schema(d.schema).orc(out)
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
        .orderBy("lang")
    )


@query(
    "etl_incremental_agg_merge",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           CAST(count(*) AS BIGINT)                AS n_orders,
           round(sum(o_totalprice), 2)             AS revenue,
           round(sum(o_totalprice) / count(*), 6)  AS avg_price
    FROM orders
    GROUP BY month
    ORDER BY month
    """,
)
def etl_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MATERIALIZED-AGGREGATE maintenance — the pattern
    that lets a 100 TB pipeline keep a dashboard aggregate fresh
    without ever rescanning history: the standing STATE (per-day sum +
    count over everything before the 2000-01-01 cutoff) is merged with
    a NEW BATCH's partial aggregate (same shape, after the cutoff) by
    re-aggregation — union the two state tables and sum the sums.
    This works because sum/count are COMMUTATIVE MONOIDS; the state
    deliberately stores (sum, count), never avg, and the final
    avg_price is derived at read time — storing averages would make
    the merge wrong, which is the classic incremental-view bug. The
    oracle computes the same monthly rollup directly over ALL orders,
    so the hash match proves merge(state, batch) ≡ full recompute.
    Each side is one partial-aggregated scan of its slice; at scale
    the state side is a tiny table read, not a scan at all."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("2000-01-01").cast("timestamp")

    def daily_state(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("day", "o_orderdate").alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("total"),
        )

    state = daily_state(o.filter(F.col("o_orderdate") < cut))
    batch = daily_state(o.filter(F.col("o_orderdate") >= cut))
    merged = (
        state.unionByName(batch)
        .groupBy("day")
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
    )
    return (
        merged.groupBy(
            F.date_format("day", "yyyy-MM").alias("month")
        )
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            F.round(F.sum("total"), 2).alias("revenue"),
            F.round(F.sum("total") / F.sum("n"), 6).alias("avg_price"),
        )
        .orderBy("month")
    )


@query(
    "etl_snapshot_diff",
    oracle="""
    WITH v1 AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM customer
        WHERE substring(md5(CAST(c_custkey AS VARCHAR)), 1, 2) >= '08'
    ),
    v2 AS (
        SELECT c_custkey, c_name, c_nationkey,
               CASE WHEN substring(md5(CAST(c_custkey AS VARCHAR)), 1, 2)
                         BETWEEN '08' AND '0f'
                    THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
               c_mktsegment
        FROM customer
        WHERE substring(md5(CAST(c_custkey AS VARCHAR)), 1, 2) < 'f8'
    ),
    d AS (
        SELECT CASE
                 WHEN v1.c_custkey IS NULL THEN 'added'
                 WHEN v2.c_custkey IS NULL THEN 'removed'
                 WHEN v1.c_acctbal <> v2.c_acctbal
                      OR v1.c_name <> v2.c_name
                      OR v1.c_nationkey <> v2.c_nationkey
                      OR v1.c_mktsegment <> v2.c_mktsegment THEN 'changed'
                 ELSE 'unchanged'
               END AS change_type,
               coalesce(v2.c_acctbal, 0) - coalesce(v1.c_acctbal, 0) AS delta
        FROM v1 FULL OUTER JOIN v2 USING (c_custkey)
    )
    SELECT change_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(delta), 2) AS acctbal_delta
    FROM d
    GROUP BY change_type
    ORDER BY change_type
    """,
)
def etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the lakehouse change-detection primitive
    (Delta/Iceberg table_changes between two versions, or any
    yesterday-vs-today full-load comparison, the exact situation the
    reference's monthly overwrite pipeline creates,
    extract-data-dota.py:131): classify every key as
    added/removed/changed/unchanged between two snapshot states and
    report counts plus the net numeric drift per class. The two
    snapshots here are derived deterministically from the customer
    table with the md5 hex-band idiom (v1 missing one band, v2
    missing another + one band's balances shifted), so both engines
    diff IDENTICAL inputs without any fixture mutation.

    Plan: ONE full-outer sort-merge join on the key — the canonical
    diff shape — followed by a 4-group aggregate. Change detection
    compares typed columns directly (never stringified row-hashes:
    float→string formatting is engine-specific, and a md5-of-concat
    row digest would also force recomputing every column's string
    form; at 100 TB you'd precompute and STORE a binary row hash at
    write time instead, turning the diff's compare into one binary
    equality). Both snapshot scans push their hex-band filter to
    parquet; the join shuffles each side once on the key; counts are
    map-side partial. Output is 4 rows at any scale."""
    c = load_table(spark, sf_dir, "customer")
    hx = F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 2)
    v1 = c.filter(hx >= "08").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    v2 = (
        c.filter(hx < "f8")
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.when(
                hx.between("08", "0f"), F.col("c_acctbal") + 100.0
            )
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
            "c_mktsegment",
        )
    )
    a, b = v1.alias("a"), v2.alias("b")
    d = a.join(b, F.col("a.c_custkey") == F.col("b.c_custkey"), "full_outer")
    change = (
        F.when(F.col("a.c_custkey").isNull(), "added")
        .when(F.col("b.c_custkey").isNull(), "removed")
        .when(
            (F.col("a.c_acctbal") != F.col("b.c_acctbal"))
            | (F.col("a.c_name") != F.col("b.c_name"))
            | (F.col("a.c_nationkey") != F.col("b.c_nationkey"))
            | (F.col("a.c_mktsegment") != F.col("b.c_mktsegment")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        d.select(
            change.alias("change_type"),
            (
                F.coalesce(F.col("b.c_acctbal"), F.lit(0.0))
                - F.coalesce(F.col("a.c_acctbal"), F.lit(0.0))
            ).alias("delta"),
        )
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(F.sum("delta"), 2).alias("acctbal_delta"),
        )
        .orderBy("change_type")
    )


@query(
    "etl_compaction_binpack",
    oracle="""
    WITH files AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m')
                   AS part_month,
               o_orderpriority AS part_prio,
               CAST(count(*) * 100 AS BIGINT) AS size_bytes
        FROM orders
        GROUP BY 1, 2
    ),
    planned AS (
        SELECT *,
               -- CAST: DuckDB's windowed sum is HUGEINT and HUGEINT //
               -- materializes as float64 in pandas; Spark side is int64
               CAST(COALESCE(sum(size_bytes) OVER (
                   ORDER BY part_month, part_prio
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) // 262144 AS BIGINT) AS grp
        FROM files
    )
    SELECT grp,
           CAST(count(*) AS BIGINT)        AS n_files,
           CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
           min(part_month || '/' || part_prio) AS first_file,
           max(part_month || '/' || part_prio) AS last_file
    FROM planned
    GROUP BY grp
    ORDER BY grp
    """,
)
def etl_compaction_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction PLANNING — the metadata pass that decides
    which files merge into which rewrite task (the complement to
    etl/compaction.py's staged executor: that module rewrites, this
    query plans). Files are listed in layout order (partition key
    order, the order a partitioned writer produced them) and packed
    greedily by cumulative size: file f joins group
    ⌊cumulative_bytes_before(f) / target⌋ — the streaming first-fit
    that keeps every group within one file of the target size while
    PRESERVING locality (a group always holds neighboring partitions,
    so the rewrite reads contiguous key ranges and the compacted
    files stay range-prunable).

    The "file listing" is derived from the fixture (one file per
    (month, priority) partition, size ∝ rows) so the oracle can
    replay it; in production the input is the transaction-log /
    listing table. Scale shape: everything here is METADATA-sized —
    one fact-scan aggregate builds the listing, the cumulative window
    orders file entries (thousands, not billions), and the group
    rollup is bounded by the file count. Integer sizes end-to-end."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    files = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "part_month"
        ),
        F.col("o_orderpriority").alias("part_prio"),
    ).agg((F.count(F.lit(1)) * 100).alias("size_bytes"))
    # deliberately unpartitioned window: the FILE LISTING is
    # metadata-bounded (one row per partition-file, not per data row)
    w = (
        Window.orderBy("part_month", "part_prio")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("size_bytes").over(w), F.lit(0))
    planned = files.withColumn(
        "grp", F.floor(cum_before / F.lit(262144)).cast("long")
    )
    fname = F.concat_ws("/", "part_month", "part_prio")
    return (
        planned.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("size_bytes").alias("total_bytes"),
            F.min(fname).alias("first_file"),
            F.max(fname).alias("last_file"),
        )
        .orderBy("grp")
    )


@query(
    "etl_vacuum_retention_plan",
    oracle="""
    WITH files AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(count(*) * 100 AS BIGINT) AS size_bytes
        FROM events GROUP BY 1, 2
    ),
    horizon AS (
        SELECT max(day) - INTERVAL 7 DAY AS h FROM files
    ),
    anchored AS (
        SELECT f.*, h.h,
               max(CASE WHEN f.day < h.h THEN f.day END) OVER (
                   PARTITION BY f.event_type
               ) AS anchor_day
        FROM files f CROSS JOIN horizon h
    ),
    classified AS (
        SELECT event_type, size_bytes,
               CASE WHEN day >= h THEN 'retain'
                    WHEN day = anchor_day THEN 'anchor'
                    ELSE 'expire' END AS fate
        FROM anchored
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(CASE WHEN fate = 'retain' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
           CAST(sum(CASE WHEN fate = 'anchor' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anchor,
           CAST(sum(CASE WHEN fate = 'expire' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_expired,
           CAST(sum(CASE WHEN fate = 'expire' THEN size_bytes ELSE 0 END)
                AS BIGINT) AS bytes_reclaimed,
           round(sum(CASE WHEN fate = 'expire' THEN size_bytes
                          ELSE 0 END)::DOUBLE
                 / sum(size_bytes), 6) AS pct_reclaimed
    FROM classified
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def etl_vacuum_retention_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM dry-run PLANNING — the retention pass that decides which
    dated files are reclaimable: files inside the 7-day time-travel
    window are RETAINED, the newest file OLDER than the horizon is
    the per-partition ANCHOR (it materializes the state readers see
    when they query exactly at the horizon — deleting it would break
    horizon reads, the same rule that keeps a lakehouse's last
    pre-horizon checkpoint), and everything older is EXPIRED with its
    reclaimable bytes totalled. Completes the lakehouse-maintenance
    trio: etl_compaction_binpack plans rewrites, etl_snapshot_diff
    classifies changes, this plans deletion.

    The "file listing" derives from the fixture (one file per
    (event_type, day), size ∝ rows) so the oracle replays it; in
    production the input is the transaction log. Scale shape:
    METADATA-sized after the first aggregate — the horizon is a
    broadcast 1-row bound, the anchor is a partitioned window max
    over the calendar-bounded listing, and the rollup is per
    partition key. Only the listing aggregate touches data."""
    e = load_table(spark, sf_dir, "events")
    files = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg((F.count(F.lit(1)) * 100).cast("long").alias("size_bytes"))
    horizon = F.broadcast(
        files.agg(
            (F.max("day") - F.expr("INTERVAL 7 DAYS")).alias("h")
        )
    )
    from pyspark.sql import Window as _W

    anchored = files.crossJoin(horizon).withColumn(
        "anchor_day",
        F.max(F.when(F.col("day") < F.col("h"), F.col("day"))).over(
            _W.partitionBy("event_type")
        ),
    )
    fate = (
        F.when(F.col("day") >= F.col("h"), "retain")
        .when(F.col("day") == F.col("anchor_day"), "anchor")
        .otherwise("expire")
    )
    expired_bytes = F.sum(
        F.when(F.col("fate") == "expire", F.col("size_bytes")).otherwise(0)
    )
    return (
        anchored.withColumn("fate", fate)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(F.when(F.col("fate") == "retain", 1).otherwise(0))
            .cast("long")
            .alias("n_retained"),
            F.sum(F.when(F.col("fate") == "anchor", 1).otherwise(0))
            .cast("long")
            .alias("n_anchor"),
            F.sum(F.when(F.col("fate") == "expire", 1).otherwise(0))
            .cast("long")
            .alias("n_expired"),
            expired_bytes.cast("long").alias("bytes_reclaimed"),
            F.round(
                expired_bytes.cast("double") / F.sum("size_bytes"), 6
            ).alias("pct_reclaimed"),
        )
        .orderBy("event_type")
    )


# --- lakehouse: partition skew audit ----------------------------------

#: assumed on-disk bytes per lineitem row for the sizing estimate —
#: a declared planning constant (real file sizes are a storage-layer
#:  metric the SQL surface cannot see), matching ~Parquet encoding of
#: this 16-column schema.
_SKEW_ROW_BYTES = 112
#: target output file size for the compaction recommendation.
_SKEW_TARGET_BYTES = 128 * 1024 * 1024


@query(
    "etl_partition_skew_audit",
    oracle=f"""
    WITH p AS (
        SELECT date_trunc('month', l_shipdate) AS mon,
               CAST(count(*) AS BIGINT) AS rows_
        FROM lineitem GROUP BY 1
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_partitions,
               CAST(sum(rows_) AS BIGINT) AS total_rows,
               CAST(max(rows_) AS BIGINT) AS max_rows,
               CAST(min(rows_) AS BIGINT) AS min_rows,
               quantile_cont(rows_, 0.5) AS median_rows,
               CAST(sum(CASE WHEN rows_ * (SELECT count(*) FROM p) * 2
                                  < (SELECT sum(rows_) FROM p)
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_small_partitions,
               CAST(sum(CAST(ceil(rows_ * {_SKEW_ROW_BYTES}
                              / {_SKEW_TARGET_BYTES}.0) AS BIGINT))
                    AS BIGINT) AS recommended_files
        FROM p
    )
    SELECT n_partitions, total_rows, max_rows, min_rows,
           round(median_rows, 1) AS median_rows,
           round(CAST(total_rows AS DOUBLE) / n_partitions, 2) AS avg_rows,
           round(CAST(max_rows AS DOUBLE) * n_partitions / total_rows, 6)
               AS skew_factor,
           n_small_partitions,
           CAST(total_rows * {_SKEW_ROW_BYTES} AS BIGINT) AS est_bytes,
           recommended_files
    FROM s
    """,
)
def etl_partition_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-layout health check for a ship-month-partitioned
    lineitem lake table: per-partition row counts rolled into the
    skew diagnostics every table-maintenance job starts from —
    max/avg skew factor (>1 means the biggest partition dominates;
    the number that predicts straggler tasks), the count of
    partitions under half the average (the small-file problem
    feeding etl_compaction_binpack), and a 128 MiB-target file-count
    recommendation from a declared bytes/row planning constant.

    The small-partition test is the integer-cleared inequality
    ``rows * n_partitions * 2 < total_rows`` (never a float
    threshold); the median uses percentile ≡ quantile_cont (linear
    interpolation, identical doubles). One scan, one bounded
    per-month aggregate (~84 rows at any SF), one summary row."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy(F.date_trunc("month", "l_shipdate").alias("mon"))
        .agg(F.count(F.lit(1)).cast("long").alias("rows_"))
        .localCheckpoint(eager=False)  # one scan: feeds the summary twice
    )
    totals = p.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum("rows_").cast("long").alias("tot"),
    )
    return (
        p.crossJoin(F.broadcast(totals))
        .agg(
            F.first("np").alias("n_partitions"),
            F.first("tot").alias("total_rows"),
            F.max("rows_").cast("long").alias("max_rows"),
            F.min("rows_").cast("long").alias("min_rows"),
            F.round(F.percentile("rows_", F.lit(0.5)), 1).alias(
                "median_rows"
            ),
            F.sum(
                F.when(
                    F.col("rows_") * F.col("np") * 2 < F.col("tot"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_small_partitions"),
            F.sum(
                F.ceil(
                    F.col("rows_")
                    * _SKEW_ROW_BYTES
                    / F.lit(float(_SKEW_TARGET_BYTES))
                ).cast("long")
            )
            .cast("long")
            .alias("recommended_files"),
        )
        .select(
            "n_partitions",
            "total_rows",
            "max_rows",
            "min_rows",
            "median_rows",
            F.round(
                F.col("total_rows").cast("double") / F.col("n_partitions"), 2
            ).alias("avg_rows"),
            F.round(
                F.col("max_rows").cast("double")
                * F.col("n_partitions")
                / F.col("total_rows"),
                6,
            ).alias("skew_factor"),
            "n_small_partitions",
            (F.col("total_rows") * _SKEW_ROW_BYTES)
            .cast("long")
            .alias("est_bytes"),
            "recommended_files",
        )
    )


@query(
    "source_xml_roundtrip",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT)     AS n,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT)  AS min_doc,
           CAST(max(doc_id) AS BIGINT)  AS max_doc,
           CAST(sum(length(text)) AS BIGINT) AS text_len_sum,
           CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT))
                AS BIGINT) AS text_md5_sum
    FROM documents GROUP BY source ORDER BY source
    """,
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink roundtrip — Spark 4's NATIVE XML data source
    (built into the distribution since 4.0; formerly spark-xml),
    covering the enterprise feed format the lake formats don't. The
    documents table is written as one XML archive (<rows><row>…)
    and read back with an explicit schema; the oracle aggregates the
    ORIGINAL parquet, so any loss through XML entity escaping,
    whitespace handling, or type re-parsing breaks the hash — the
    text column is pinned by BOTH total length and a summed md5
    32-bit prefix, which catches even a single-character change in
    one document. Fixture texts carry no leading/trailing whitespace
    (measured), so the reader's surrounding-space trim is inert; a
    production feed would set ignoreSurroundingSpaces=false. XML is
    row-splittable on the rowTag, so the scan parallelizes like any
    text format; mkdtemp isolates concurrent invocations (same
    rationale as source_binaryfile_scan)."""
    d = load_table(spark, sf_dir, "documents")
    out = os.path.join(
        tempfile.mkdtemp(prefix="dataextractor_spark_xml_"), "docs_xml"
    )
    d.write.format("xml").option("rowTag", "doc").mode("overwrite").save(out)
    back = spark.read.format("xml").option("rowTag", "doc").schema(
        d.schema
    ).load(out)
    md5_prefix = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast(
        "long"
    )
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
            F.sum(F.length("text")).cast("long").alias("text_len_sum"),
            F.sum(md5_prefix).cast("long").alias("text_md5_sum"),
        )
        .orderBy("source")
    )


#: the audit predicate: one quarter of ship dates
_ZM_LO = "1998-01-01"
_ZM_HI = "1998-03-31"
#: files per simulated table layout
_ZM_FILES = 16


@query(
    "etl_zonemap_prune_audit",
    oracle=f"""
    WITH mx AS (
        SELECT max(l_orderkey) AS mok FROM lineitem
    ),
    rows_tagged AS (
        SELECT CAST(l_shipdate AS DATE) AS sd,
               CAST(floor(l_orderkey * {_ZM_FILES}.0 / (mok + 1))
                    AS BIGINT) AS f_ins,
               strftime(date_trunc('month', l_shipdate), '%Y-%m')
                   AS f_srt
        FROM lineitem CROSS JOIN mx
    ),
    layouts AS (
        SELECT 'insertion' AS layout, CAST(f_ins AS VARCHAR) AS file_id,
               sd FROM rows_tagged
        UNION ALL
        SELECT 'shipdate', f_srt, sd FROM rows_tagged
    ),
    zones AS (
        SELECT layout, file_id,
               CAST(count(*) AS BIGINT) AS n_rows,
               min(sd) AS zmin, max(sd) AS zmax,
               CAST(sum(CASE WHEN sd BETWEEN DATE '{_ZM_LO}'
                                         AND DATE '{_ZM_HI}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_match
        FROM layouts GROUP BY layout, file_id
    )
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(CASE WHEN zmin <= DATE '{_ZM_HI}'
                          AND zmax >= DATE '{_ZM_LO}'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_files_read,
           CAST(sum(CASE WHEN zmin <= DATE '{_ZM_HI}'
                          AND zmax >= DATE '{_ZM_LO}'
                         THEN n_rows ELSE 0 END) AS BIGINT)
               AS rows_scanned,
           CAST(sum(n_match) AS BIGINT) AS rows_matching,
           round(CAST(sum(n_match) AS DOUBLE)
                 / sum(CASE WHEN zmin <= DATE '{_ZM_HI}'
                             AND zmax >= DATE '{_ZM_LO}'
                            THEN n_rows ELSE 0 END), 6)
               AS scan_efficiency
    FROM zones
    GROUP BY layout
    ORDER BY layout
    """,
)
def etl_zonemap_prune_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max statistics) pruning audit — the data-skipping
    arithmetic behind every parquet footer, Delta file-stats, and
    Iceberg manifest prune, made explicit: simulate the SAME lineitem
    rows under two file layouts (insertion-ordered: 16 equal orderkey
    ranges, i.e. "files in arrival order"; shipdate-clustered: one
    file per calendar month), compute each file's [min,max] shipdate
    zone, and report how many files/rows a one-quarter predicate must
    read under each. scan_efficiency = matching/scanned is the number
    a table-layout service optimizes: insertion order leaves date
    ranges wide (every file overlaps the quarter → efficiency ≈
    selectivity), clustering tightens zones so scanned ≈ matching.
    etl_zorder_layout shows multi-column clustering; this is the
    single-column prune ledger that justifies it. All counts exact
    integers; one lineitem scan, one (layout,file)-keyed aggregate
    (the insertion bucketing needs one broadcast 1-row max first)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    mx = li.agg(F.max("l_orderkey").alias("mok"))
    tagged = li.crossJoin(F.broadcast(mx)).select(
        "sd",
        F.floor(
            F.col("l_orderkey") * float(_ZM_FILES) / (F.col("mok") + 1)
        )
        .cast("long")
        .cast("string")
        .alias("f_ins"),
        F.date_format(F.date_trunc("month", "sd"), "yyyy-MM").alias(
            "f_srt"
        ),
    )
    layouts = tagged.select(
        F.lit("insertion").alias("layout"),
        F.col("f_ins").alias("file_id"),
        "sd",
    ).unionAll(
        tagged.select(F.lit("shipdate"), F.col("f_srt"), "sd")
    )
    lo, hi = F.lit(_ZM_LO).cast("date"), F.lit(_ZM_HI).cast("date")
    zones = layouts.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("sd").alias("zmin"),
        F.max("sd").alias("zmax"),
        F.sum(
            F.when(F.col("sd").between(lo, hi), F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("n_match"),
    )
    read = (F.col("zmin") <= hi) & (F.col("zmax") >= lo)
    return (
        zones.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(read.cast("long")).cast("long").alias("n_files_read"),
            F.sum(F.when(read, F.col("n_rows")).otherwise(F.lit(0)))
            .cast("long")
            .alias("rows_scanned"),
            F.sum("n_match").cast("long").alias("rows_matching"),
            F.round(
                F.sum("n_match")
                / F.sum(F.when(read, F.col("n_rows")).otherwise(F.lit(0))),
                6,
            ).alias("scan_efficiency"),
        )
        .orderBy("layout")
    )


#: GDPR-style deletion: customers whose salted hash lands under 2%
_DEL_THRESHOLD = int(0.02 * (1 << 32))


@query(
    "etl_delete_rewrite_plan",
    oracle=f"""
    WITH del AS (
        SELECT c_custkey FROM customer
        WHERE CAST('0x' || substr(md5('del:'
              || CAST(c_custkey AS VARCHAR)), 1, 8) AS BIGINT)
              < {_DEL_THRESHOLD}
    ),
    parts AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m')
                   AS part_month,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN d.c_custkey IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted
        FROM orders o LEFT JOIN del d ON d.c_custkey = o.o_custkey
        GROUP BY part_month
    )
    SELECT CAST(count(*) AS BIGINT) AS n_partitions,
           CAST(sum(CASE WHEN n_deleted > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS partitions_touched,
           CAST(sum(n_rows) AS BIGINT) AS total_rows,
           CAST(sum(n_deleted) AS BIGINT) AS rows_deleted,
           CAST(sum(CASE WHEN n_deleted > 0 THEN n_rows ELSE 0 END)
                AS BIGINT) AS rows_rewritten,
           round(CAST(sum(CASE WHEN n_deleted > 0 THEN n_rows ELSE 0 END)
                      AS DOUBLE)
                 / nullif(sum(n_deleted), 0), 6) AS write_amplification
    FROM parts
    """,
)
def etl_delete_rewrite_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten DELETE planning on a copy-on-write
    month-partitioned table: given a deletion list (customers whose
    salted hash lands under 2% — the deterministic stand-in for a
    GDPR request batch), report how many partitions the delete
    touches, how many rows actually disappear, how many rows must be
    REWRITTEN (copy-on-write rewrites every touched file), and the
    write amplification ratio — the number that decides between
    eager rewrite, deletion vectors, or batching requests (at 34×
    amplification you batch; at 1.2× you just rewrite).

    The deletion list never materializes to the driver: it is one
    hash-filtered dimension scan, LEFT-joined (broadcast — the list
    is a filtered dim) onto the fact, with per-partition counts from
    one month-keyed aggregate. All counts exact BIGINT; the ratio is
    one guarded division (nullif for the zero-deletion edge), 6dp."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("del:"), F.col("c_custkey").cast("string"))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    del_list = c.where(u < _DEL_THRESHOLD).select(
        F.col("c_custkey").alias("dk"), F.lit(1).alias("hit")
    )
    parts = (
        o.join(
            F.broadcast(del_list),
            o.o_custkey == del_list.dk,
            "left",
        )
        .groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM")
            .alias("part_month")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("n_deleted"),
        )
    )
    touched = F.col("n_deleted") > 0
    return parts.agg(
        F.count(F.lit(1)).cast("long").alias("n_partitions"),
        F.sum(touched.cast("long")).cast("long").alias("partitions_touched"),
        F.sum("n_rows").cast("long").alias("total_rows"),
        F.sum("n_deleted").cast("long").alias("rows_deleted"),
        F.sum(F.when(touched, F.col("n_rows")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_rewritten"),
        F.round(
            F.sum(F.when(touched, F.col("n_rows")).otherwise(F.lit(0)))
            / F.nullif(F.sum("n_deleted"), F.lit(0)),
            6,
        ).alias("write_amplification"),
    )


@query(
    "source_text_lines_scan",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT))
                AS BIGINT) AS line_md5_sum
    FROM documents
    """,
)
def source_text_lines_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text source/sink roundtrip — ``df.write.text`` /
    ``spark.read.text``, the lowest-common-denominator line format
    (log shipping, WET extracts, token dumps). Document bodies carry
    no newlines (measured — the WARC/XML operators rely on the same
    fixture property), so one document is one line, and the scan-back
    is pinned by line count, total characters, and the summed 32-bit
    md5 prefix — a single flipped byte anywhere in the write→read
    cycle breaks the hash. Text files split on line boundaries, so
    the read parallelizes like any other splittable format; mkdtemp
    isolates concurrent invocations."""
    d = load_table(spark, sf_dir, "documents")
    out = os.path.join(
        tempfile.mkdtemp(prefix="dataextractor_spark_text_"), "docs_txt"
    )
    d.select("text").write.mode("overwrite").text(out)
    back = spark.read.text(out)
    md5_prefix = F.conv(
        F.substring(F.md5(F.col("value")), 1, 8), 16, 10
    ).cast("long")
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.length("value")).cast("long").alias("total_chars"),
        F.sum(md5_prefix).cast("long").alias("line_md5_sum"),
    )


@query(
    "etl_calendar_coverage_audit",
    oracle="""
    WITH days AS (
        SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders
    ),
    yearly AS (
        SELECT CAST(EXTRACT(year FROM d) AS BIGINT) AS yr,
               CAST(count(*) AS BIGINT) AS observed_days,
               min(d) AS first_day, max(d) AS last_day
        FROM days GROUP BY yr
    )
    SELECT yr,
           CAST(date_diff('day', first_day, last_day) + 1 AS BIGINT)
               AS span_days,
           observed_days,
           CAST(date_diff('day', first_day, last_day) + 1
                - observed_days AS BIGINT) AS missing_days,
           strftime(first_day, '%Y-%m-%d') AS first_day_s,
           strftime(last_day, '%Y-%m-%d') AS last_day_s
    FROM yearly
    ORDER BY yr
    """,
)
def etl_calendar_coverage_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Calendar coverage audit: per year, the span between the first
    and last active order day versus the days actually OBSERVED —
    missing_days > 0 inside a year is the classic silent-ingestion-
    gap smell (a dropped partition, a dead upstream day) that row
    counts alone never show, and the audit every SLA'd pipeline runs
    before publishing a daily mart. The span-based expectation (not
    365) keeps partial first/last years honest.

    One orders scan → distinct-day set (calendar-bounded) → per-year
    min/max/count; all values exact integers/dates; the date strings
    use the established yyyy-MM-dd cross-engine format."""
    o = load_table(spark, sf_dir, "orders")
    days = o.select(
        F.col("o_orderdate").cast("date").alias("d")
    ).distinct()
    yearly = days.groupBy(
        F.year("d").cast("long").alias("yr")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("observed_days"),
        F.min("d").alias("first_day"),
        F.max("d").alias("last_day"),
    )
    span = F.datediff(F.col("last_day"), F.col("first_day")) + 1
    return yearly.select(
        "yr",
        span.cast("long").alias("span_days"),
        "observed_days",
        (span - F.col("observed_days")).cast("long").alias("missing_days"),
        F.date_format("first_day", "yyyy-MM-dd").alias("first_day_s"),
        F.date_format("last_day", "yyyy-MM-dd").alias("last_day_s"),
    ).orderBy("yr")
