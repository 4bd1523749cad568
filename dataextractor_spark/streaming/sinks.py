"""Streaming sinks beyond the built-ins: idempotent foreachBatch
partition overwrite — the exactly-once lake-sink pattern when the
target isn't a transactional table format.

The file sink's exactly-once guarantee covers its own output log; when
a stream must maintain a PARTITIONED lake layout (the A8/A18 shape —
date-partitioned, rerun-idempotent), foreachBatch + dynamic partition
overwrite gives replay-safety: a re-processed micro-batch rewrites
exactly the partitions it touches, so duplicates cannot accumulate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def partition_overwrite_sink(out_path: str, partition_cols: list[str]):
    """Build a foreachBatch function that dynamically overwrites only
    the partitions present in each micro-batch.

    Requires spark.sql.sources.partitionOverwriteMode=dynamic (set
    per-write below so the session default is untouched). Replaying a
    micro-batch after a failure rewrites the same partitions with the
    same rows — idempotent, no dedup bookkeeping needed as long as
    batch contents are deterministic (file source + availableNow).
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(out_path)
        )

    return write_batch
