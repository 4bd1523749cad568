"""Sampling determinism + rate tracking, and late-data watermark
semantics (the drop-vs-keep contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataextractor_spark.catalog import load_table
from dataextractor_spark.operators.sampling import hash_bucket, stratified_sample
from dataextractor_spark.registry import load_all
from tests.conftest import SF_SMALL


def test_sample_reproducible_across_partitionings(spark):
    """Hash sampling must return IDENTICAL rows regardless of input
    partitioning — the property rand(seed) sampling lacks."""
    d = load_table(spark, SF_SMALL, "documents")
    s1 = stratified_sample(d, "doc_id", "lang", {"en": 0.5, "de": 0.2})
    s2 = stratified_sample(
        d.repartition(17, "source"), "doc_id", "lang", {"en": 0.5, "de": 0.2}
    )
    ids1 = sorted(r.doc_id for r in s1.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in s2.select("doc_id").collect())
    assert ids1 == ids2 and len(ids1) > 0


def test_sample_rates_track_targets(spark):
    d = load_table(spark, SF_SMALL, "documents")
    en_total = d.filter(F.col("lang") == "en").count()
    en_kept = (
        stratified_sample(d, "doc_id", "lang", {"en": 0.5})
        .filter(F.col("lang") == "en")
        .count()
    )
    # 50% target; hash buckets give binomial noise — allow wide band
    assert 0.3 <= en_kept / en_total <= 0.7


def test_hash_bucket_uniform(spark):
    d = load_table(spark, SF_SMALL, "documents")
    buckets = d.select(hash_bucket("doc_id", 10).alias("b"))
    counts = {r.b: r.n for r in buckets.groupBy("b").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(10))
    n = sum(counts.values())
    assert all(abs(c - n / 10) < n * 0.06 for c in counts.values())


def test_sample_query_registered_and_stable(spark):
    spec = load_all()["sample_stratified"]
    a = [tuple(r) for r in spec.fn(spark, SF_SMALL).collect()]
    b = [tuple(r) for r in spec.fn(spark, SF_SMALL).collect()]
    assert a == b and len(a) > 0


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data contract: an event arriving AFTER the watermark has
    passed its window is dropped from an append-mode aggregation.
    Staged: one big in-order chunk, then a far-future sentinel (pushes
    the watermark), THEN a straggler event back in January — the
    straggler's window total must NOT include it."""
    import time as _t

    from dataextractor_spark.streaming import (
        events_stream,
        run_available_now,
        tumbling_aggregate,
    )

    d = str(tmp_path / "in")
    events = load_table(spark, SF_SMALL, "events")
    events.coalesce(1).write.mode("append").parquet(d)
    _t.sleep(0.05)
    from dataextractor_spark.streaming.windows import sentinel_ts_for

    sentinel = spark.createDataFrame(
        [(-1, sentinel_ts_for(events), -1, "sentinel", 0.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value", "props")
    sentinel.coalesce(1).write.mode("append").parquet(d)
    _t.sleep(0.05)
    straggler = spark.createDataFrame(
        [(-2, "2024-01-05 12:00:00", 7, "purchase", 1000000.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value", "props")
    straggler.coalesce(1).write.mode("append").parquet(d)

    out = run_available_now(
        tumbling_aggregate(events_stream(spark, d), watermark="1 hour"),
        query_name="t_late",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    jan5 = out.filter(
        (F.col("window_start") == "2024-01-05 00:00:00")
        & (F.col("event_type") == "purchase")
    ).collect()
    batch = load_all()["time_tumbling_window"].fn(spark, SF_SMALL)
    jan5_batch = batch.filter(
        (F.col("window_start") == "2024-01-05 00:00:00")
        & (F.col("event_type") == "purchase")
    ).collect()
    # batch (which sees everything) would count the straggler; the
    # stream must match the ORIGINAL data only
    assert len(jan5) == 1 and len(jan5_batch) == 1
    assert jan5[0].n == jan5_batch[0].n
    assert jan5[0].sum_value == jan5_batch[0].sum_value  # 1e6 not included


def test_groupsafe_split_never_straddles_sources(spark):
    """Every source must land wholly on one side of the split (the
    leakage-safety property), and both splits must be non-empty at
    this source count."""
    from pyspark.sql import functions as F

    from dataextractor_spark.catalog import load_table
    from tests.conftest import SF_SMALL

    d = load_table(spark, SF_SMALL, "documents")
    split = F.when(F.md5("source") < "2", F.lit("eval")).otherwise(F.lit("train"))
    per_source = (
        d.select("source", split.alias("split"))
        .groupBy("source")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r.n_splits == 1 for r in per_source)
    sides = {
        r.split
        for r in d.select(split.alias("split")).distinct().collect()
    }
    assert sides == {"train", "eval"}


def test_uniform_k_sample_is_engine_portable(spark):
    """The md5-ranked k-sample must be identical across engines: Spark
    result == DuckDB running the same ranking on the same parquet."""
    import duckdb

    from dataextractor_spark.registry import load_all
    from tests.conftest import SF_SMALL

    spec = load_all()["sample_uniform_k"]
    got = sorted(tuple(r) for r in spec.fn(spark, SF_SMALL).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert got == want and len(got) == 25
