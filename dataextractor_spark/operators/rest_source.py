"""Registry entries for the REST source + full-load pipeline
(Tier-A parity A1-A8 end-to-end), fixture-fed so the driver's
correctness runner exercises the complete fetch→normalize→flatten→
tz-convert dataflow deterministically with no network.

The oracle is a VALUES literal computed from the same deterministic
payload generator — proving the distributed pipeline reproduces the
reference's E2 output (opendotaapi.py:95-123) record-for-record.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession, functions as F

from dataextractor_spark.etl.pipeline import (
    MATCH_SCHEMA,
    demo_match_payload,
    matches_transform,
)
from dataextractor_spark.registry import query
from dataextractor_spark.sources.rest import (
    FixtureTransport,
    RestRequest,
    fetch,
)

_N_MATCHES = 8
_BASE_TS = 1750000000


def _expected_rows() -> list[tuple]:
    """Reference semantics computed independently (plain Python):
    epoch UTC → América/Sao_Paulo (fixed UTC-3 since 2019)."""
    rows = []
    for i in range(_N_MATCHES):
        st = _BASE_TS + i * 3600
        local = datetime.utcfromtimestamp(st) - timedelta(hours=3)
        rows.append(
            (
                8_000_000_000 + i,
                i % 2 == 0,
                1 + i,  # radiant_hero_1
                42 + i,  # dire_hero_5
                1800 + 60 * i,
                local.strftime("%Y-%m-%d %H:%M:%S"),
                local.strftime("%Y-%m-%d"),
            )
        )
    return rows


def _values_sql() -> str:
    vals = ",\n        ".join(
        f"({m}, {str(w).upper()}, {h1}, {d5}, {dur}, '{ts}', '{dt}')"
        for (m, w, h1, d5, dur, ts, dt) in _expected_rows()
    )
    return f"""
    SELECT CAST(match_id AS BIGINT) AS match_id,
           radiant_win,
           radiant_hero_1,
           dire_hero_5,
           CAST(duration AS BIGINT) AS duration,
           start_local,
           dt
    FROM (VALUES
        {vals}
    ) AS t(match_id, radiant_win, radiant_hero_1, dire_hero_5, duration,
           start_local, dt)
    ORDER BY match_id
    """


@query("rest_publicmatches_pipeline", oracle=_values_sql())
def rest_publicmatches_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 end-to-end on the distributed REST source: fixture transport
    → mapInPandas fetch → explicit-schema JSON normalize → array
    flatten (A5/A6) → epoch→São Paulo (A7) → date key (A8)."""
    transport = FixtureTransport(
        {"/publicMatches": (200, demo_match_payload(_N_MATCHES, _BASE_TS))}
    )
    raw = fetch(
        spark,
        [RestRequest(endpoint="/publicMatches", request_id="page0")],
        lambda: transport,
    )
    from dataextractor_spark.etl.pipeline import normalize_payloads, DatasetSpec

    records = normalize_payloads(
        raw,
        DatasetSpec(name="matches", requests=(), schema=MATCH_SCHEMA),
    )
    shaped = matches_transform(records)
    return shaped.select(
        "match_id",
        "radiant_win",
        "radiant_hero_1",
        "dire_hero_5",
        "duration",
        F.date_format("ts_local", "yyyy-MM-dd HH:mm:ss").alias("start_local"),
        "dt",
    ).orderBy("match_id")


@query(
    "rest_datasource_scan",
    oracle="""
    SELECT CAST(200 AS INT) AS status,
           CAST(13 AS BIGINT) AS n_endpoints,
           CAST(13 AS BIGINT) AS total_attempts
    """,
)
def rest_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 Python DataSource face of the REST connector:
    spark.read.format("rest_fixture") plans one input partition per
    endpoint (13-way concurrent fetch of the reference's full-load
    set, vs its sequential loop extract-data-dota.py:126-199) and the
    fixture transport makes the result exact: 13 endpoints, all HTTP
    200, one attempt each — which the VALUES oracle pins."""
    from dataextractor_spark.etl.pipeline import reference_fixtures
    from dataextractor_spark.sources.rest_datasource import register

    register(spark)
    eps = ",".join(sorted(reference_fixtures()))
    df = spark.read.format("rest_fixture").option("endpoints", eps).load()
    return df.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_endpoints"),
        F.sum("attempts").cast("long").alias("total_attempts"),
    )
