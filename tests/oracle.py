"""DuckDB-oracle comparison harness mirroring the driver's check:
row-count + column names + order-insensitive value comparison
(with float tolerance so legitimate accumulation-order noise below the
rounding grain can't flake the suite — the registry convention rounds
on both sides anyway).
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

from dataextractor_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:  # Decimal and numpy scalars
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except ImportError:  # pragma: no cover
        pass
    return v


def _sort_cell_key(x):
    # Floats are rounded to the comparison tolerance grain (1e-6)
    # INSIDE the sort key: two cells that differ below tolerance (but
    # survive _norm_cell's 9-dp rounding) must not sort rows into
    # different positions on the Spark vs oracle side, or the pairwise
    # zip below would compare misaligned rows.
    if isinstance(x, float):
        x = round(x, 6)
    elif isinstance(x, tuple):
        return (x is None, str(type(x)), tuple(_sort_cell_key(y) for y in x))
    return (x is None, str(type(x)), str(x))


def _normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple(_sort_cell_key(x) for x in r))
    return sorted_cols, out


def _close(a, b, rtol=1e-6, atol=1e-6) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=rtol, abs_tol=atol)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_close(x, y) for x, y in zip(a, b))
    return a == b


def compare_to_oracle(spark_df, sql: str, sf_dir: str) -> None:
    """Assert the Spark result and DuckDB oracle agree on column names,
    row count, and (order-insensitively) every value."""
    con = duck_connection(sf_dir)
    try:
        cur = con.execute(sql)
        oracle_cols = [d[0] for d in cur.description]
        oracle_rows = cur.fetchall()
    finally:
        con.close()
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
    )
    assert len(spark_rows) == len(oracle_rows), (
        f"row count mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    _, s_norm = _normalize(spark_cols, spark_rows)
    _, o_norm = _normalize(oracle_cols, oracle_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, o_norm)) if not _close(a, b)
    ]
    assert not mismatches, (
        f"{len(mismatches)} value mismatches; first 3: {mismatches[:3]}"
    )
