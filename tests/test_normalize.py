"""Normalizer unit tests: the A5/A11/A15 edge cases from SURVEY.md §5
(missing array keys, single-dict promotion, JSON-string input, empty
payloads, sparse-field inference)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dataextractor_spark.etl.normalize import (
    flatten_array_column,
    normalize_json_records,
    unpivot_dict,
    with_local_date,
)


def test_flatten_missing_and_short_arrays(spark):
    """Records without the array (opendotaapi.py:106 guard) and short
    arrays produce NULL slots, not errors."""
    df = spark.createDataFrame(
        [(1, [10, 20, 30, 40, 50]), (2, None), (3, [7])],
        "id int, team array<int>",
    )
    out = flatten_array_column(df, "team", "hero", 5)
    rows = {r.id: r for r in out.collect()}
    assert rows[1].hero_1 == 10 and rows[1].hero_5 == 50
    assert rows[2].hero_1 is None
    assert rows[3].hero_1 == 7 and rows[3].hero_2 is None
    assert "team" not in out.columns


def test_unpivot_dict_string_keys(spark):
    out = unpivot_dict(
        spark, {"0": "unranked", "7": "ranked"}, key_col="lobby_id", value_col="name"
    )
    rows = sorted(out.collect())
    assert [tuple(r) for r in rows] == [("0", "unranked"), ("7", "ranked")]
    assert dict(out.dtypes) == {"lobby_id": "string", "name": "string"}


def test_normalize_single_dict_promotion(spark):
    """Single dict → 1-row table (extract-data-dota.py:100-101)."""
    out = normalize_json_records(spark, {"a": 1, "b": "x"}, schema="a BIGINT, b STRING")
    [r] = out.collect()
    assert (r.a, r.b) == (1, "x")


def test_normalize_json_string_input(spark):
    """JSON string input (extract-data-dota.py:97-98)."""
    payload = json.dumps([{"a": 1}, {"a": 2}])
    out = normalize_json_records(spark, payload, schema="a BIGINT")
    assert sorted(r.a for r in out.collect()) == [1, 2]


def test_normalize_empty_payload_typed(spark):
    out = normalize_json_records(spark, [], schema="a BIGINT")
    assert out.count() == 0 and out.columns == ["a"]
    with pytest.raises(ValueError):
        normalize_json_records(spark, [])


def test_normalize_rejects_garbage(spark):
    with pytest.raises(TypeError):
        normalize_json_records(spark, 42)  # type: ignore[arg-type]


def test_normalize_sparse_field_not_mistyped(spark):
    """The reference's inference hazard (SURVEY.md §1.3): a field null
    in the early records. With an explicit schema it's typed correctly
    regardless of position."""
    recs = [{"id": i, "rating": None} for i in range(50)] + [
        {"id": 99, "rating": 1420.5}
    ]
    out = normalize_json_records(spark, recs, schema="id BIGINT, rating DOUBLE")
    assert dict(out.dtypes)["rating"] == "double"
    assert out.filter(F.col("rating").isNotNull()).count() == 1


def test_with_local_date_derives_partition_key(spark):
    df = spark.createDataFrame(
        [(1750000000,)], "epoch long"
    ).withColumn("ts", F.timestamp_seconds("epoch"))
    out = with_local_date(df, "ts")
    [r] = out.collect()
    # 2025-06-15 15:06:40 UTC → 12:06:40 São Paulo (UTC-3)
    assert r.dt == "2025-06-15"
    assert r.ts_local.hour == 12


def test_normalize_helpers_reject_output_collisions(spark):
    """Same contract class as the salted_join/asof guards: helpers that
    append named columns must refuse inputs already carrying those
    names instead of silently duplicating or replacing them."""
    import pytest

    from dataextractor_spark.etl.normalize import (
        flatten_array_column,
        unpivot_dict,
        with_local_date,
    )

    df = spark.createDataFrame([(1, [1, 2], "x")], "id long, arr array<int>, x_1 string")
    with pytest.raises(ValueError, match="already exist"):
        flatten_array_column(df, "arr", "x", 2)
    with pytest.raises(ValueError, match="must differ"):
        unpivot_dict(spark, {"a": "b"}, key_col="k", value_col="k")
    ts = spark.createDataFrame([(1,)], "id long").select(
        "id", F.current_timestamp().alias("ts"), F.lit("d").alias("dt")
    )
    with pytest.raises(ValueError, match="already exist"):
        with_local_date(ts, "ts")
