"""Spark 4 Python streaming DataSource: deterministic micro-batch
replay of the events fixture.

The streaming module (streaming/windows.py) replays events by staging
parquet chunks into a watched directory — the file-source pattern.
This source is the API-level alternative: a custom
``spark.readStream.format("events_replay")`` whose offsets are plain
row positions, so a run is exactly reproducible batch-for-batch
(offset n → rows [n, n+batch_rows)). That determinism is what the
stream-batch equivalence tests need; it is also the shape of any
cursor-paged upstream (the reference's OpenDota API pages the same
way — opendotaapi.py:103 fetches one such page).

Scale honesty: the *simple* stream reader API reads on the driver and
ships rows to executors — right for a demo/fixture source and for
low-volume control streams, wrong for a firehose. A production
implementation promotes to DataSourceStreamReader with
per-partition offset ranges (same offset model, partitioned reads);
the offset/commit contract here carries over unchanged.

Timestamps are emitted as int64 epoch-nanoseconds (``ts_ns``) so the
source is timezone-inert; consumers convert with timestamp_micros
(catalog.load_table does the same for the batch table).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

SCHEMA = (
    "event_id long, ts_ns long, user_id long, event_type string, value double"
)


class EventsReplayDataSource(DataSource):
    """Options: ``path`` (events parquet file/dir, required),
    ``batch_rows`` (rows per micro-batch, default 1000)."""

    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema) -> "EventsReplayStreamReader":
        return EventsReplayStreamReader(self.options)


class EventsReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self._path = options.get("path", "")
        if not self._path:
            raise ValueError("events_replay requires a 'path' option")
        self._batch = int(options.get("batch_rows", "1000"))
        self._rows: list[tuple] | None = None

    def _load(self) -> list[tuple]:
        # Lazy: the reader is constructed at plan time; the (driver-
        # side) file read happens on first poll only. Sorted by
        # event_id so offsets are stable across restarts.
        if self._rows is None:
            import pyarrow as pa
            import pyarrow.parquet as pq

            t = pq.read_table(self._path).sort_by("event_id")
            # normalize to epoch-NANOS regardless of the file's unit
            # (the fixture has shipped as both timestamp[ns] and
            # timestamp[us]); a bare cast("int64") would silently keep
            # whatever unit the file used.
            ts_ns = t["ts"].cast(pa.timestamp("ns")).cast("int64")
            self._rows = list(
                zip(
                    t["event_id"].to_pylist(),
                    ts_ns.to_pylist(),
                    t["user_id"].to_pylist(),
                    t["event_type"].to_pylist(),
                    t["value"].to_pylist(),
                )
            )
        return self._rows

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        rows = self._load()
        lo = int(start["row"])
        hi = min(lo + self._batch, len(rows))
        return iter(rows[lo:hi]), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # Replay for recovery: offsets are row positions, so the
        # batch is reproduced exactly.
        rows = self._load()
        return iter(rows[int(start["row"]) : int(end["row"])])

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up; offsets are positions in a file


def register(spark) -> None:
    spark.dataSource.register(EventsReplayDataSource)
