"""Driver-visible oracles for the STREAMING watermark semantics
(VERDICT.md r5 item 3): the watermark / late-data layer in
``streaming/windows.py`` was pytest-only because a streaming query
can't run under the external DuckDB-oracle harness — so these two
queries re-express the exact micro-batch watermark accounting as
BATCH dataframes over a deterministic replay model, and the SQL
oracles replay the identical construction. ``tests/test_streaming.py``
closes the loop by running the REAL structured-streaming pipeline over
the same replay (file source staged per micro-batch, append mode,
Trigger.AvailableNow) and asserting its emitted windows match this
batch audit's kept set — so the oracle rows ARE evidence about the
streaming layer, not just about a parallel batch reimplementation.

Replay model (all closed-form, engine-portable):
- every event's ARRIVAL is its event time plus a deterministic
  transport delay: ``h % 7200`` seconds (0..2 h, twice the 1 h
  watermark budget) where ``h = hex(md5(event_id))[:4]``, plus a
  straggler tail — events with ``h % 97 = 0`` (~1%) arrive a further
  2 DAYS late (the crashed-consumer redelivery case). The 2 h jitter
  exercises the late-but-aggregated path; only the stragglers can
  outrun window-length + watermark and be DROPPED (a ≤2 h delay
  arithmetically cannot: the watermark entering any batch is at most
  batch_start − 1 h, and a window that old is unreachable by a 2 h
  delay — so without the tail the discard path would be vacuously
  untested);
- micro-batches are 6-hour arrival buckets
  (``floor(epoch(arrival)/21600)``) — data-independent boundaries,
  matching a clock-triggered source, and crucially NO global sort is
  needed to assign them (a per-row expression, scan-parallel);
- the watermark entering batch ``b`` is Spark's:
  ``max(event time over batches < b) − 1 hour`` (watermarks advance
  on batch COMMIT, so a batch's own data never gates itself);
- an event is DROPPED as too-late iff its tumbling 1-day window has
  already been finalized when it arrives: ``window_end <= watermark``
  (the boundary the equivalence test pins against Spark's stateful
  aggregation eviction).

Scale notes: the per-event classification is one scan + a broadcast
join against the tiny per-batch watermark table (one row per 6-hour
bucket of the corpus' time range); the only window function runs over
that bounded table, never over events. Two fact scans total (one to
build batch maxima, one to classify) — the same shape as
time_seasonal_anomaly's baseline-and-score plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from dataextractor_spark.catalog import load_table
from dataextractor_spark.registry import query

#: micro-batch width (seconds) of the deterministic replay model.
BATCH_S = 21600
#: watermark delay (seconds) — mirrors streaming/windows.py defaults.
WM_DELAY_S = 3600

#: shared oracle CTE prefix: arrival model + per-batch watermark.
_ARRIVAL_SQL = f"""
    WITH h AS (
        SELECT event_id, user_id, event_type, value, ts,
               CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4)
                    AS BIGINT) AS hx
        FROM events
    ),
    arr AS (
        SELECT event_id, user_id, event_type, value, ts,
               ts + INTERVAL (hx % 7200
                              + CASE WHEN hx % 97 = 0
                                     THEN 172800 ELSE 0 END)
                    SECOND AS arrival_ts
        FROM h
    ),
    b AS (
        SELECT *, CAST(floor(epoch(arrival_ts)) AS BIGINT) // {BATCH_S}
                      AS batch_id
        FROM arr
    ),
    bm AS (
        SELECT batch_id, max(ts) AS bmax,
               CAST(count(*) AS BIGINT) AS n_events
        FROM b GROUP BY batch_id
    ),
    wm AS (
        SELECT batch_id, bmax, n_events,
               max(bmax) OVER (ORDER BY batch_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING)
                   - INTERVAL {WM_DELAY_S} SECOND AS wm_ts
        FROM bm
    )
"""


def _with_arrival(e: DataFrame) -> DataFrame:
    """Annotate events with deterministic arrival time + micro-batch id
    (per-row expressions only — no shuffle, no sort)."""
    hx = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    return (
        e.withColumn(
            "delay_s",
            hx % 7200
            + F.when(hx % 97 == 0, F.lit(172800)).otherwise(F.lit(0)),
        )
        .withColumn(
            "arrival_ts", F.expr("timestampadd(SECOND, delay_s, ts)")
        )
        .withColumn(
            "batch_id", F.expr(f"unix_timestamp(arrival_ts) div {BATCH_S}")
        )
    )


def _batch_watermarks(arr: DataFrame) -> DataFrame:
    """Per-batch watermark table: batch_id, bmax (batch's max event
    time), n_events, wm_ts (watermark ENTERING the batch = running max
    of prior bmax − delay; NULL for the first batch). Bounded: one row
    per 6-hour bucket of the corpus' span — the ordering-only window
    runs over THIS table, never over events."""
    bm = arr.groupBy("batch_id").agg(
        F.max("ts").alias("bmax"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    w = (
        Window.orderBy("batch_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return bm.withColumn(
        "wm_ts",
        F.timestamp_add("SECOND", F.lit(-WM_DELAY_S), F.max("bmax").over(w)),
    )


def stage_arrival_replay(
    spark: SparkSession, events: DataFrame, out_dir: str
) -> list[int]:
    """Materialize the replay model as a REAL file stream: one parquet
    file per arrival micro-batch, mtimes set explicitly in batch order
    (no sleeps) so the file source's oldest-first listing delivers
    exactly one arrival bucket per trigger with maxFilesPerTrigger=1.
    A far-future sentinel file lands last to push the watermark past
    every real window (append mode then emits them all). Test/demo
    infrastructure: the per-batch driver loop is O(#buckets), fine for
    a bounded replay, not a production write path."""
    import glob
    import os
    import shutil
    import tempfile

    from dataextractor_spark.streaming.windows import sentinel_ts_for

    arr = _with_arrival(events)
    cols = events.columns
    batch_ids = [
        r[0]
        for r in arr.select("batch_id").distinct().orderBy("batch_id").collect()
    ]
    os.makedirs(out_dir, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        for i, b in enumerate(batch_ids):
            d = os.path.join(td, str(i))
            (
                arr.filter(F.col("batch_id") == b)
                .select(*cols)
                .coalesce(1)
                .write.parquet(d)
            )
            (part,) = glob.glob(os.path.join(d, "part-*.parquet"))
            dst = os.path.join(out_dir, f"batch_{i:05d}.parquet")
            shutil.copyfile(part, dst)
            os.utime(dst, (1_000_000 + i, 1_000_000 + i))
        sd = os.path.join(td, "sentinel")
        sentinel = spark.createDataFrame(
            [(-1, -1, "sentinel", 0.0, "{}")],
            "event_id long, user_id long, event_type string, "
            "value double, props string",
        ).select(
            "event_id",
            F.lit(sentinel_ts_for(events)).cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        ).select(*cols)
        sentinel.coalesce(1).write.parquet(sd)
        (part,) = glob.glob(os.path.join(sd, "part-*.parquet"))
        dst = os.path.join(out_dir, "zz_sentinel.parquet")
        shutil.copyfile(part, dst)
        os.utime(dst, (2_000_000, 2_000_000))
    return batch_ids


@query(
    "streaming_late_discard_audit",
    oracle=_ARRIVAL_SQL
    + """
    , ev AS (
        SELECT b.*, w.wm_ts,
               date_trunc('day', b.ts) AS win_start,
               date_trunc('day', b.ts) + INTERVAL 1 DAY AS win_end
        FROM b JOIN wm w ON b.batch_id = w.batch_id
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(count(*) FILTER (WHERE wm_ts IS NULL OR win_end > wm_ts)
                AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (WHERE wm_ts IS NOT NULL
                                   AND win_end <= wm_ts)
                AS BIGINT) AS n_dropped_late,
           CAST(count(DISTINCT CASE WHEN wm_ts IS NULL OR win_end > wm_ts
                                    THEN user_id END)
                AS BIGINT) AS n_kept_users,
           CAST(sum(CASE WHEN wm_ts IS NULL OR win_end > wm_ts
                         THEN CAST(round(value * 100) AS BIGINT)
                         ELSE 0 END)
                AS BIGINT) AS kept_value_cents
    FROM ev
    GROUP BY win_start
    ORDER BY window_start
    """,
)
def streaming_late_discard_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kept-vs-dropped accounting for a watermarked tumbling 1-day
    aggregation under the deterministic replay model (module
    docstring): per event-time window, how many events the streaming
    engine aggregates vs discards as too-late, plus the kept distinct
    users and value mass — the audit every production watermark needs
    (is the delay budget actually covering the transport tail?).

    An event is dropped iff its window was finalized before it
    arrived: ``window_end <= watermark(batch)``. The companion
    equivalence test replays the SAME model through a real
    ``readStream`` + watermark + append-mode aggregation and asserts
    the emitted per-window counts equal ``n_kept`` here."""
    e = load_table(spark, sf_dir, "events")
    arr = _with_arrival(e)
    wm = _batch_watermarks(arr).select("batch_id", "wm_ts")
    ev = (
        arr.join(F.broadcast(wm), "batch_id")
        .withColumn("win_start", F.date_trunc("day", F.col("ts")))
        .withColumn(
            "win_end", F.expr("timestampadd(DAY, 1, win_start)")
        )
    )
    kept = F.col("wm_ts").isNull() | (F.col("win_end") > F.col("wm_ts"))
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.groupBy("win_start")
        .agg(
            F.sum(kept.cast("long")).cast("long").alias("n_kept"),
            F.sum((~kept).cast("long")).cast("long").alias(
                "n_dropped_late"
            ),
            F.countDistinct(
                F.when(kept, F.col("user_id"))
            ).cast("long").alias("n_kept_users"),
            F.sum(F.when(kept, cents).otherwise(F.lit(0)))
            .cast("long")
            .alias("kept_value_cents"),
        )
        .select(
            F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_kept",
            "n_dropped_late",
            "n_kept_users",
            "kept_value_cents",
        )
        .orderBy("window_start")
    )


@query(
    "streaming_watermark_frontier",
    oracle=_ARRIVAL_SQL
    + """
    , cls AS (
        SELECT b.batch_id,
               CASE WHEN w.wm_ts IS NOT NULL
                     AND date_trunc('day', b.ts) + INTERVAL 1 DAY
                         <= w.wm_ts
                    THEN 'dropped'
                    WHEN w.wm_ts IS NOT NULL AND b.ts <= w.wm_ts
                    THEN 'late_within'
                    ELSE 'on_time' END AS cls
        FROM b JOIN wm w ON b.batch_id = w.batch_id
    )
    SELECT w.batch_id,
           strftime(to_timestamp(w.batch_id * 21600) AT TIME ZONE 'UTC',
                    '%Y-%m-%d %H:%M:%S') AS batch_start,
           w.n_events,
           strftime(w.bmax, '%Y-%m-%d %H:%M:%S') AS batch_max_ts,
           strftime(w.wm_ts, '%Y-%m-%d %H:%M:%S') AS watermark,
           CAST(coalesce(sum(CASE WHEN c.cls = 'on_time' THEN 1 END), 0)
                AS BIGINT) AS n_on_time,
           CAST(coalesce(sum(CASE WHEN c.cls = 'late_within' THEN 1 END), 0)
                AS BIGINT) AS n_late_within,
           CAST(coalesce(sum(CASE WHEN c.cls = 'dropped' THEN 1 END), 0)
                AS BIGINT) AS n_dropped
    FROM wm w JOIN cls c ON w.batch_id = c.batch_id
    GROUP BY w.batch_id, w.n_events, w.bmax, w.wm_ts
    ORDER BY w.batch_id
    """,
)
def streaming_watermark_frontier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermark-frontier progression per micro-batch under the replay
    model: each 6-hour arrival bucket's event count, max event time,
    the watermark it entered with, and its arrivals split into
    on-time / late-but-aggregated (event time behind the watermark but
    window still open — the rows the 1 h delay budget SAVED) /
    dropped (window already finalized). This is the ops dashboard that
    decides whether a watermark delay is too tight or wastefully
    loose, expressed as a driver-checkable batch query."""
    e = load_table(spark, sf_dir, "events")
    arr = _with_arrival(e)
    wm = _batch_watermarks(arr)
    win_end = F.expr("timestampadd(DAY, 1, date_trunc('DAY', ts))")
    cls = (
        arr.join(
            F.broadcast(wm.select("batch_id", "wm_ts")), "batch_id"
        )
        .withColumn(
            "cls",
            F.when(
                F.col("wm_ts").isNotNull()
                & (win_end <= F.col("wm_ts")),
                F.lit("dropped"),
            )
            .when(
                F.col("wm_ts").isNotNull()
                & (F.col("ts") <= F.col("wm_ts")),
                F.lit("late_within"),
            )
            .otherwise(F.lit("on_time")),
        )
        .groupBy("batch_id")
        .agg(
            F.sum((F.col("cls") == "on_time").cast("long"))
            .cast("long")
            .alias("n_on_time"),
            F.sum((F.col("cls") == "late_within").cast("long"))
            .cast("long")
            .alias("n_late_within"),
            F.sum((F.col("cls") == "dropped").cast("long"))
            .cast("long")
            .alias("n_dropped"),
        )
    )
    return (
        wm.join(cls, "batch_id")
        .select(
            "batch_id",
            F.date_format(
                F.timestamp_seconds(F.col("batch_id") * BATCH_S),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("batch_start"),
            "n_events",
            F.date_format("bmax", "yyyy-MM-dd HH:mm:ss").alias(
                "batch_max_ts"
            ),
            F.date_format("wm_ts", "yyyy-MM-dd HH:mm:ss").alias(
                "watermark"
            ),
            "n_on_time",
            "n_late_within",
            "n_dropped",
        )
        .orderBy("batch_id")
    )
