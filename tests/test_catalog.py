"""Catalog contract tests: schema drift fails fast (the reference
would silently mistype — SURVEY.md §1.3), unknown tables fail early,
broadcast hints attach."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataextractor_spark.catalog import (
    SCHEMAS,
    SchemaDriftError,
    check_schema,
    load_table,
)
from dataextractor_spark.plans.inspect import physical_plan
from tests.conftest import SF_SMALL


def test_unknown_table_rejected(spark):
    with pytest.raises(KeyError, match="unknown table"):
        load_table(spark, SF_SMALL, "nonexistent")


def test_drift_missing_column(spark):
    df = load_table(spark, SF_SMALL, "orders").drop("o_orderpriority")
    with pytest.raises(SchemaDriftError, match="o_orderpriority"):
        check_schema("orders", df)


def test_drift_mistyped_column(spark):
    df = load_table(spark, SF_SMALL, "orders").withColumn(
        "o_totalprice", F.col("o_totalprice").cast("string")
    )
    with pytest.raises(SchemaDriftError, match="o_totalprice"):
        check_schema("orders", df)


def test_drift_extra_column(spark):
    df = load_table(spark, SF_SMALL, "orders").withColumn("surprise", F.lit(1))
    with pytest.raises(SchemaDriftError, match="surprise"):
        check_schema("orders", df)


def test_all_tables_load_and_validate(spark):
    for name in SCHEMAS:
        df = load_table(spark, SF_SMALL, name)
        assert df.count() > 0


def test_dim_broadcast_hint_attached(spark):
    n = load_table(spark, SF_SMALL, "nation")
    c = load_table(spark, SF_SMALL, "customer")
    plan = physical_plan(c.join(n, c.c_nationkey == n.n_nationkey), "simple")
    assert "BroadcastHashJoin" in plan
