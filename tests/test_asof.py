"""As-of join: the scalable union+last formulation must agree with the
oracled range-join definition, including NULL (no-match) rows and
simultaneous-timestamp visibility."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataextractor_spark.catalog import load_table
from dataextractor_spark.functions.asof import asof_join
from dataextractor_spark.registry import load_all
from tests.conftest import SF_SMALL


def test_asof_union_last_equals_range_join(spark):
    e = load_table(spark, SF_SMALL, "events")
    o = load_table(spark, SF_SMALL, "orders")
    merged = asof_join(
        e,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["o_orderdate"],
    ).select("event_id", "user_id", F.col("asof_o_orderdate").alias("asof_orderdate"))
    oracle_form = load_all()["join_asof_latest_order"].fn(spark, SF_SMALL)
    a = sorted(tuple(r) for r in merged.collect())
    b = sorted(tuple(r) for r in oracle_form.collect())
    assert len(a) == e.count()
    assert a == b


def test_asof_handles_no_match_and_simultaneity(spark):
    left = spark.createDataFrame(
        [(1, 100, "e1"), (1, 50, "e0"), (2, 10, "lonely")],
        "k long, t long, name string",
    )
    right = spark.createDataFrame(
        [(1, 100, 7.0), (1, 60, 5.0), (1, 20, 3.0), (3, 1, 9.9)],
        "k long, t long, v double",
    )
    out = {
        r.name: r.asof_v
        for r in asof_join(
            left, right, left_key="k", right_key="k",
            left_ts="t", right_ts="t", value_cols=["v"],
        ).collect()
    }
    assert out["e1"] == 7.0  # simultaneous right row IS visible
    assert out["e0"] == 3.0  # latest earlier row
    assert out["lonely"] is None  # key with no right rows → NULL


def test_asof_input_contract_guards(spark):
    """Fail loudly instead of producing ambiguous/wrong columns: inputs
    carrying the reserved merge-plumbing names, value_cols absent from
    the right side, and asof_-prefixed output collisions all raise."""
    import pytest

    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame([(1, 5, 2.0)], "k long, t long, v double")
    kw = dict(left_key="k", right_key="k", left_ts="t", right_ts="t")
    with pytest.raises(ValueError, match="reserves column names"):
        asof_join(left.withColumn("_side", F.lit(0)), right,
                  value_cols=["v"], **kw)
    with pytest.raises(ValueError, match="reserves column names"):
        asof_join(left, right.withColumn("_rrow", F.lit(0)),
                  value_cols=["v"], **kw)
    with pytest.raises(ValueError, match="not in right columns"):
        asof_join(left, right, value_cols=["nope"], **kw)
    with pytest.raises(ValueError, match="already exist on the left"):
        asof_join(left.withColumn("asof_v", F.lit(0)), right,
                  value_cols=["v"], **kw)
