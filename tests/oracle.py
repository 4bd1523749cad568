"""DuckDB-oracle comparison harness mirroring the driver's check:
row-count + column names + order-insensitive value comparison.

Two passes over ONE materialization of each side:

1. *Tolerant* pass (float rel/abs 1e-6) — good diagnostics, immune to
   legitimate accumulation-order noise below the rounding grain.
2. *Strict driver-mode* pass — the external driver canonicalizes both
   results through pandas (``cursor.df()`` / ``DataFrame.toPandas()``),
   sorts columns by name, sorts rows, and hashes the VALUES INCLUDING
   their type class. That is why a DuckDB HUGEINT ``sum()`` (pandas
   float64 ``14892.0``) hash-mismatches a Spark BIGINT (int64
   ``14892``) even when every value is equal (round-3 verdict,
   ``pretrain_corpus_recipe``). To surface those artifacts locally, the
   oracle side is fetched VIA PANDAS here too, and the strict pass
   compares typed canonical cell reprs exactly.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import numpy as np
import pandas as pd

from dataextractor_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _to_python(v):
    """Collapse numpy/pandas scalar wrappers to plain Python values,
    PRESERVING the int/float/bool/str/datetime type class — the class
    is part of the driver's hash, so it must survive normalization."""
    if v is None:
        return None
    # NaT FIRST: pd.NaT is NOT an instance of pd.Timestamp, so inside
    # the isinstance chain the check was dead code and NaT only
    # compared equal by accidental repr symmetry.
    if v is pd.NaT:
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (np.bool_,)):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, np.datetime64):
        return pd.Timestamp(v).to_pydatetime()
    if isinstance(v, float) and math.isnan(v):
        return v  # NaN handled downstream
    return v


def _rows_from_pandas(pdf: pd.DataFrame) -> list[tuple]:
    return [tuple(_to_python(v) for v in row) for row in pdf.itertuples(index=False)]


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


def _strict_cell(v) -> str:
    """Typed canonical repr — the unit the driver's value hash is built
    from. ``i:5`` vs ``f:5.0`` MUST differ (that exact divergence broke
    pretrain_corpus_recipe in round 3); NaN and None are distinct."""
    if v is None:
        return "none"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        return "f:nan" if math.isnan(v) else f"f:{v!r}"
    if isinstance(v, datetime):
        return f"t:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, date):
        return f"d:{v.isoformat()}"
    if isinstance(v, str):
        return f"s:{v}"
    import decimal

    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    return f"{type(v).__name__}:{v!r}"


def _strict_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_strict_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_to_oracle(spark_df, sql: str, sf_dir: str) -> tuple[int, int]:
    """Assert the Spark result and DuckDB oracle agree on column names,
    row count, every value (tolerantly), AND on the strict typed
    canonical form the driver hashes. Returns (spark_rows, oracle_rows)
    so record-writing callers (tools/driver_sim.py) get the counts from
    the same materialization they just verified."""
    con = duck_connection(sf_dir)
    try:
        # .df() — NOT fetchall() — so DuckDB's pandas type mapping
        # (HUGEINT→float64, DECIMAL→float64) is visible exactly as the
        # driver sees it.
        oracle_pdf = con.execute(sql).df()
    finally:
        con.close()
    oracle_cols = list(oracle_pdf.columns)
    oracle_rows = _rows_from_pandas(oracle_pdf)

    spark_pdf = spark_df.toPandas()
    spark_cols = list(spark_pdf.columns)
    spark_rows = _rows_from_pandas(spark_pdf)

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

    # strict driver-mode pass: typed canonical rows must be identical
    s_strict = _strict_rows(spark_cols, spark_rows)
    o_strict = _strict_rows(oracle_cols, oracle_rows)
    diff = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_strict, o_strict)) if a != b
    ]
    assert not diff, (
        "STRICT driver-mode mismatch (values may be equal but typed "
        f"canonical form differs — e.g. i:5 vs f:5.0); first 3: {diff[:3]}"
    )
    return len(spark_rows), len(oracle_rows)
