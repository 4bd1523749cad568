"""Vector math over array<float|double> columns as pure Catalyst
expressions (zip_with + aggregate) — no UDFs, so similarity math stays
inside whole-stage codegen and scales with the JVM, not the Python
bridge (Tier C, SURVEY.md §2.3).

All helpers fold left-to-right in double precision, matching the
DuckDB oracle's list_* functions bit-for-bit closely enough that
results rounded to 5-6 decimals hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ a_i·b_i in double precision."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂ in double precision."""
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = a·b / (‖a‖‖b‖); NULL if either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot_product(a, b) / denom)
