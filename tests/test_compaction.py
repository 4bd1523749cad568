"""Small-file compaction: file-count collapse + exact row preservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataextractor_spark.catalog import load_table
from dataextractor_spark.etl.compaction import CompactionReport, compact, data_files
from tests.conftest import SF_SMALL


def _content_hash(df):
    """Order-insensitive multiset hash of every row."""
    return (
        df.select(
            F.sum(
                F.xxhash64(F.to_json(F.struct(*sorted(df.columns)))).cast(
                    "decimal(38,0)"
                )
            ).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).first()
    )


def _fragmented_copy(spark, tmp_path):
    """Write orders partitioned by month with deliberately many tiny
    files per partition (the post-ingest state compaction exists for)."""
    path = str(tmp_path / "orders_lake")
    o = load_table(spark, SF_SMALL, "orders").withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    )
    o.repartition(8).write.partitionBy("month").parquet(path)
    return path


def test_compact_collapses_files_and_preserves_rows(spark, tmp_path):
    path = _fragmented_copy(spark, tmp_path)
    months = spark.read.parquet(path).select("month").distinct().count()
    before_hash = _content_hash(spark.read.parquet(path))
    n_before = len(data_files(path))
    assert n_before > months  # genuinely fragmented

    report = compact(spark, path, ["month"], files_per_partition=1)

    assert isinstance(report, CompactionReport)
    assert report.files_before == n_before
    # exactly one file per partition directory
    assert report.files_after == months
    after_hash = _content_hash(spark.read.parquet(path))
    assert after_hash == before_hash


def test_compact_file_cap_respected(spark, tmp_path):
    path = _fragmented_copy(spark, tmp_path)
    months = spark.read.parquet(path).select("month").distinct().count()
    report = compact(spark, path, ["month"], files_per_partition=2)
    # "at most" cap: salt values may collide onto one reducer
    assert months <= report.files_after <= 2 * months
    assert report.rows == spark.read.parquet(path).count()


def test_compact_idempotent(spark, tmp_path):
    path = _fragmented_copy(spark, tmp_path)
    compact(spark, path, ["month"])
    h1 = _content_hash(spark.read.parquet(path))
    r2 = compact(spark, path, ["month"])
    assert r2.files_before == r2.files_after
    assert _content_hash(spark.read.parquet(path)) == h1


def test_compact_input_contract_guards(spark, tmp_path):
    """compact() validates up front: a non-positive file cap, a
    pre-existing salt column (withColumn would silently replace it),
    and partition_cols absent from the dataset all raise before any
    directory is touched."""
    import pytest

    from dataextractor_spark.etl.compaction import _SALT, compact

    p = str(tmp_path / "ds")
    spark.range(10).selectExpr("id", "id % 2 as part").write.partitionBy(
        "part"
    ).parquet(p)
    with pytest.raises(ValueError, match="files_per_partition"):
        compact(spark, p, ["part"], files_per_partition=0)
    with pytest.raises(ValueError, match="not in dataset columns"):
        compact(spark, p, ["nope"])
    p2 = str(tmp_path / "ds2")
    spark.range(4).selectExpr("id", f"id as {_SALT}", "id % 2 as part").write.partitionBy(
        "part"
    ).parquet(p2)
    with pytest.raises(ValueError, match="silently replace"):
        compact(spark, p2, ["part"])
    # the guarded failures must not have moved/removed the dataset
    assert spark.read.parquet(p).count() == 10
