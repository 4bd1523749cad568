"""As-of join via the union + last(ignorenulls) window trick
(SURVEY.md §7 hard part c) — the merge-based formulation.

The range-join form (operators/joins.py join_asof_latest_order) pairs
every left row with ALL earlier right rows of its key before
aggregating — fine when each key has few right rows, quadratic-ish
when keys have long histories. This formulation instead UNIONS both
sides into one event stream, sorts within key by time, and carries the
latest right-side values forward with last(ignorenulls) — one shuffle,
one sort, O(n log n) per key regardless of history length. This is how
a 100 TB as-of (every event vs a billion-row slowly-changing table)
stays tractable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For every left row, attach the value_cols of the LATEST right
    row with the same key and right_ts <= left_ts (NULLs where no such
    row exists). Ties on timestamp resolve to the greatest value_cols
    tuple, matching `max(...)` aggregation semantics.

    Plan: tag both sides, unionByName with missing columns nulled,
    window last(ignorenulls) ordered by (ts, side) — right rows sort
    BEFORE left rows at equal timestamps so an exactly-simultaneous
    right row is visible to the left row.
    """
    reserved = {"_key", "_ts", "_side", "_rrow", "_asof"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"asof_join reserves column names {sorted(reserved)} for its "
            f"merge plumbing; input already has {sorted(clash)} — rename "
            "or drop them first"
        )
    missing = [c for c in value_cols if c not in right.columns]
    if missing:
        raise ValueError(
            f"value_cols {missing} not in right columns {right.columns}"
        )
    out_clash = {f"asof_{c}" for c in value_cols} & set(left.columns)
    if out_clash:
        raise ValueError(
            f"output columns {sorted(out_clash)} already exist on the left "
            "side — the carried values would be ambiguous"
        )
    # the right side travels as ONE struct so every asof_ column comes
    # from the SAME right row — per-column last(ignorenulls) could mix
    # rows when a right column is NULL.
    r_struct = F.struct(*[F.col(c).alias(c) for c in value_cols])
    l_tagged = left.select(
        F.col(left_key).alias("_key"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left after right at equal ts
        "*",
        F.lit(None).cast(
            "struct<"
            + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in value_cols)
            + ">"
        ).alias("_rrow"),
    )
    r_tagged = right.select(
        F.col(right_key).alias("_key"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        r_struct.alias("_rrow"),
    )
    for c in left.columns:
        r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy("_key")
        .orderBy("_ts", "_side", "_rrow")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("_rrow", ignorenulls=True).over(w).alias("_asof")
    )
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            "*",
            *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in value_cols],
        )
        .drop("_key", "_ts", "_side", "_rrow", "_asof")
    )
