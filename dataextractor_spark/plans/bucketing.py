"""Bucketed table layout: pre-shuffle data ONCE at write time so every
subsequent join/aggregation on the bucket key is exchange-free.

At 100 TB this is the difference between re-shuffling a fact table on
every query and never shuffling it again: lineitem bucketed by
l_orderkey joins orders bucketed by o_orderkey with ZERO runtime
exchanges (tests/test_plans.py asserts this on the actual plan).
The same layout serves repeated aggregations on the bucket key.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int,
    *,
    sort_key: str | None = None,
) -> None:
    """Persist as a bucketed (+ optionally sorted) managed table.
    Sorting within buckets additionally lets sort-merge joins skip
    their sort step."""
    import re

    # the name is spliced into SQL AND into a filesystem path that is
    # rmtree'd — restrict to a plain identifier so a hostile/typo'd
    # name (backticks, '../..') can't escape either context
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table):
        raise ValueError(
            f"table must be a plain SQL identifier, got {table!r}"
        )
    spark = df.sparkSession
    # overwrite of a managed table can't adopt an orphaned location
    # (e.g. a warehouse dir left by a previous session) — clear both
    # the catalog entry and the directory first.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_key is not None:
        w = w.sortBy(sort_key)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back with bucket metadata intact (spark.table, not a raw
    path read — the path read would lose bucketing info)."""
    return spark.table(table)
