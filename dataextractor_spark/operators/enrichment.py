"""Coverage completions: MapType functions, keyed point lookups (A13),
stream-dim enrichment, vector normalization, and the composite
training-data curation pipeline that ties the Tier-C operators
together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dataextractor_spark.catalog import load_table
from dataextractor_spark.functions.vector import l2_norm
from dataextractor_spark.registry import query


@query(
    "scalar_map_funcs",
    oracle="""
    WITH counts AS (
        SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    )
    SELECT event_type AS map_key, n AS map_value,
           (SELECT count(*) FROM counts) AS n_keys
    FROM counts
    ORDER BY map_key
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round trip (A11's data model as a first-class type):
    aggregate event counts → map_from_entries → map_keys/size →
    explode(map_entries) back to rows. Proves map construction,
    inspection, and unnesting agree with the relational definition."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    as_map = counts.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return (
        as_map.select(F.size("m").alias("n_keys"), F.explode(F.map_entries("m")).alias("e"))
        .select(
            F.col("e.key").alias("map_key"),
            F.col("e.value").alias("map_value"),
            F.col("n_keys").cast("long").alias("n_keys"),
        )
        .orderBy("map_key")
    )


@query(
    "point_lookup_by_key",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(props->>'$.k' AS BIGINT) AS k,
           round(value, 2) AS value
    FROM events
    WHERE event_id IN (42, 123, 999)
    ORDER BY event_id
    """,
)
def point_lookup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 parity: keyed point lookup (get_match_details(match_id)
    shape, opendotaapi.py:204-221) = predicate-pushed scan + JSON
    projection. At rest the table would be partitioned/z-ordered on
    the key so the lookup prunes to a handful of files."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_id").isin(42, 123, 999))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
            F.round("value", 2).alias("value"),
        )
        .orderBy("event_id")
    )


@query(
    "join_stream_dim_enrich",
    oracle="""
    SELECT c_mktsegment,
           event_type,
           count(*)             AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    ORDER BY c_mktsegment, event_type
    """,
)
def join_stream_dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-dim enrichment (events.user_id → customer, FIXTURES.md
    §1): the batch form of the stream-static join the streaming layer
    runs (tests/test_streaming.py::test_stream_static_join). Dim side
    broadcasts; the event stream never shuffles."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("c_mktsegment", "event_type")
    )


@query(
    "embedding_normalize",
    oracle="""
    SELECT label,
           round(avg(sqrt(list_sum(list_transform(embedding,
                 x -> (x::DOUBLE) * (x::DOUBLE))))), 6)  AS avg_norm,
           round(max(abs(1.0 - sqrt(list_sum(list_transform(
                 list_transform(embedding, x -> x::DOUBLE / sqrt(list_sum(
                     list_transform(embedding, y -> (y::DOUBLE)*(y::DOUBLE))))),
                 z -> z*z))))), 6)                       AS max_unit_err
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
)
def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector normalization (the preprocessing step before cosine/LSH
    at scale: store unit vectors, similarity = plain dot product).
    Emits per-label average raw norm and the max deviation of
    normalized vectors from unit length (≈0) — both engines compute
    the same higher-order-lambda pipeline."""
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = l2_norm("embedding")
    unit = F.transform(emb_d, lambda x: x / norm)
    unit_norm = F.sqrt(
        F.aggregate(unit, F.lit(0.0), lambda acc, z: acc + z * z)
    )
    return (
        e.groupBy("label")
        .agg(
            F.round(F.avg(norm), 6).alias("avg_norm"),
            F.round(F.max(F.abs(F.lit(1.0) - unit_norm)), 6).alias("max_unit_err"),
        )
        .orderBy("label")
    )


@query(
    "curation_pipeline",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang, source, text,
               len(string_split(text, ' ')) AS n_words,
               len(list_distinct(string_split(text, ' ')))::DOUBLE
                   / len(string_split(text, ' ')) AS ttr
        FROM documents
    ),
    quality AS (
        SELECT * FROM scored WHERE n_words >= 40 AND ttr >= 0.15
    ),
    deduped AS (
        SELECT lang,
               md5(array_to_string(list_sort(list_distinct(
                   string_split(text, ' '))), ' ')) AS fp,
               min(doc_id) AS keep_doc,
               count(*) AS group_size
        FROM quality
        GROUP BY lang, fp
    )
    SELECT lang,
           count(*)                       AS kept_docs,
           CAST(sum(group_size) AS BIGINT) AS before_dedup,
           CAST(sum(group_size) - count(*) AS BIGINT) AS removed_dups
    FROM deduped
    GROUP BY lang
    ORDER BY lang
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite LLM-training-data shape (BASELINE.json north
    star): quality-filter → fingerprint dedup (keep lowest doc_id) →
    per-language yield accounting. One narrow scoring pass, one
    shuffle on (lang, fingerprint), one tiny rollup — the whole
    curation funnel in three exchanges regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    scored = d.select(
        "doc_id",
        "lang",
        "text",
        F.size(words).alias("n_words"),
        (F.size(F.array_distinct(words)).cast("double") / F.size(words)).alias("ttr"),
    )
    quality = scored.filter((F.col("n_words") >= 40) & (F.col("ttr") >= 0.15))
    fp = F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct(F.split("text", " ")))))
    deduped = quality.groupBy("lang", fp.alias("fp")).agg(
        F.min("doc_id").alias("keep_doc"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        deduped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("group_size").alias("before_dedup"),
            (F.sum("group_size") - F.count(F.lit(1))).alias("removed_dups"),
        )
        .orderBy("lang")
    )


@query(
    "pretrain_corpus_recipe",
    oracle="""
    WITH base AS (
        SELECT doc_id, lang, text,
               string_split(text, ' ') AS w,
               len(string_split(text, ' ')) AS nw
        FROM documents
    ),
    scored AS (
        SELECT *,
               (length(text) - (nw - 1))::DOUBLE / nw AS mwl,
               len(list_distinct(w))::DOUBLE / nw     AS ttr,
               len(list_filter(w,
                   x -> x IN ('the','a','of','and','to'))) AS stops
        FROM base
    ),
    s1 AS (
        SELECT * FROM scored
        WHERE nw BETWEEN 30 AND 80 AND mwl BETWEEN 3.0 AND 10.0
              AND ttr >= 0.35 AND stops >= 1
    ),
    s2 AS (
        SELECT * FROM s1
        WHERE doc_id IN (
            SELECT min(doc_id) FROM s1
            GROUP BY md5(array_to_string(list_sort(list_distinct(w)), ' '))
        )
    ),
    s3 AS (SELECT * FROM s2 WHERE doc_id % 17 <> 0),
    eval_h AS (
        SELECT DISTINCT md5(array_to_string(w[pos:pos+7], ' ')) AS h
        FROM base, unnest(range(1, len(w) - 6)) AS t(pos)
        WHERE len(w) >= 8 AND doc_id % 17 = 0
    ),
    contaminated AS (
        SELECT DISTINCT s.doc_id
        FROM (SELECT doc_id, md5(array_to_string(w[pos:pos+7], ' ')) AS h
              FROM s3, unnest(range(1, len(w) - 6)) AS t(pos)
              WHERE len(w) >= 8) s
        JOIN eval_h e ON s.h = e.h
    ),
    s4 AS (
        SELECT * FROM s3
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    s5 AS (
        SELECT * FROM s4
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
              CASE WHEN lang = 'en' THEN 'c0'
                   WHEN lang = 'de' THEN '80' ELSE '40' END
    )
    SELECT * FROM (
        SELECT CAST(0 AS BIGINT) AS stage, 'ingest' AS name,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nw) AS BIGINT) AS n_tokens FROM scored
        UNION ALL SELECT 1, 'quality_gate',
               CAST(count(*) AS BIGINT), CAST(sum(nw) AS BIGINT) FROM s1
        UNION ALL SELECT 2, 'exact_dedup',
               CAST(count(*) AS BIGINT), CAST(sum(nw) AS BIGINT) FROM s2
        UNION ALL SELECT 3, 'eval_holdout',
               CAST(count(*) AS BIGINT), CAST(sum(nw) AS BIGINT) FROM s3
        UNION ALL SELECT 4, 'decontaminate',
               CAST(count(*) AS BIGINT), CAST(sum(nw) AS BIGINT) FROM s4
        UNION ALL SELECT 5, 'mixture_sample',
               CAST(count(*) AS BIGINT), CAST(sum(nw) AS BIGINT) FROM s5
    ) ORDER BY stage
    """,
)
def pretrain_corpus_recipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED pretraining-corpus build — the north-star pipeline
    every Tier-C operator exists to serve, as ONE lazy plan with
    per-stage yield accounting (docs AND tokens): Gopher-style quality
    gate → bag-of-words exact dedup (keep lowest doc_id) → eval
    holdout (md5-free modulo split, matching text_decontaminate's
    convention) → 8-gram decontamination against the held-out set →
    per-language mixture quota via the engine-portable md5 sampler.

    Execution shape — the part that matters at 100 TB: the oracle
    spells the funnel as six stage CTEs re-scanned per stage; the
    Spark plan instead computes CUMULATIVE SURVIVAL FLAGS in one pass
    (gate predicate → window-min over the fingerprint for the dedup
    keeper → broadcast contamination flag → sample predicate) and
    derives all six (n_docs, n_tokens) pairs from a single aggregate,
    unstacked to rows with ``stack`` — one corpus scan + one
    fingerprint window shuffle + one shingle semi-join, instead of six
    pipeline replays. The hash match against the stage-by-stage oracle
    IS the equivalence proof. Yield accounting doubles as the audit
    trail: every stage's document AND token losses are visible, which
    is how a recipe change is reviewed before a 100 TB rebuild."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    base = d.select(
        "doc_id",
        "lang",
        "text",
        w.alias("w"),
        F.size(w).alias("nw"),
    )
    scored = base.select(
        "*",
        ((F.length("text") - (F.col("nw") - 1)) / F.col("nw")).alias("mwl"),
        (F.size(F.array_distinct("w")) / F.col("nw")).alias("ttr"),
        F.size(
            F.filter(
                "w",
                lambda x: x.isin("the", "a", "of", "and", "to"),
            )
        ).alias("stops"),
    )
    p1 = (
        F.col("nw").between(30, 80)
        & (F.col("mwl") >= 3.0)
        & (F.col("mwl") <= 10.0)
        & (F.col("ttr") >= 0.35)
        & (F.col("stops") >= 1)
    )
    fp = F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct("w"))))
    flagged = scored.select("*", p1.alias("p1"), fp.alias("fp"))
    keeper = F.min(F.when(F.col("p1"), F.col("doc_id"))).over(
        Window.partitionBy("fp")
    )
    flagged = flagged.select(
        "*", (F.col("p1") & (F.col("doc_id") == keeper)).alias("p2")
    ).withColumn("p3", F.col("p2") & (F.col("doc_id") % 17 != 0))

    shingles = F.when(
        F.col("nw") >= 8,
        F.transform(
            F.sequence(F.lit(1), F.col("nw") - 7),
            lambda i: F.md5(F.concat_ws(" ", F.slice("w", i, 8))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = base.select("doc_id", F.explode(shingles).alias("h"))
    eval_h = sh.filter(F.col("doc_id") % 17 == 0).select("h").distinct()
    contam = (
        sh.filter(F.col("doc_id") % 17 != 0)
        .join(eval_h, "h", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_contam", F.lit(True))
    )
    flagged = flagged.join(F.broadcast(contam), "doc_id", "left").withColumn(
        "p4", F.col("p3") & ~F.coalesce("is_contam", F.lit(False))
    )
    cut = (
        F.when(F.col("lang") == "en", F.lit("c0"))
        .when(F.col("lang") == "de", F.lit("80"))
        .otherwise(F.lit("40"))
    )
    flagged = flagged.withColumn(
        "p5",
        F.col("p4")
        & (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < cut),
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum("nw").alias("t0"),
        *[
            x
            for i in range(1, 6)
            for x in (
                F.sum(F.col(f"p{i}").cast("long")).alias(f"n{i}"),
                F.sum(F.when(F.col(f"p{i}"), F.col("nw"))).alias(f"t{i}"),
            )
        ],
    )
    names = [
        "ingest",
        "quality_gate",
        "exact_dedup",
        "eval_holdout",
        "decontaminate",
        "mixture_sample",
    ]
    stack_args = ", ".join(
        f"cast({i} as bigint), '{names[i]}', cast(n{i} as bigint), "
        f"cast(t{i} as bigint)"
        for i in range(6)
    )
    return agg.select(
        F.expr(
            f"stack(6, {stack_args}) as (stage, name, n_docs, n_tokens)"
        )
    ).orderBy("stage")
