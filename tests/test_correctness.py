"""The gate: every registered query with an oracle must hash-match
DuckDB on the same parquet (mirrors the driver's sf0.01 check; runs at
sf0.001 by default for speed — set SPARK_GRAFT_ORACLE_SF to override).

Queries without an oracle must at least execute and return a stable
schema (the driver's rows-only check).
"""

from __future__ import annotations

import pytest

from dataextractor_spark.registry import load_all
from tests.conftest import SF_ORACLE
from tests.oracle import compare_to_oracle

SPECS = load_all()
ORACLED = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if not s.oracle)


def test_registry_nonempty():
    assert len(SPECS) >= 10


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_ORACLE)
    compare_to_oracle(df, spec.oracle, SF_ORACLE)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_ORACLE)
    # must execute and expose a stable, named schema
    n = df.count()
    assert n >= 0
    assert all(c for c in df.columns)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_comparator_rejects_each_divergence_class(spark):
    """Meta-test of the gate itself: every green row in the ledger is
    only as strong as compare_to_oracle's willingness to fail. Each
    divergence class the driver hashes — value, column name, row
    count, and int-vs-float type class (the round-3
    pretrain_corpus_recipe artifact) — must raise, and the matching
    result must pass."""
    df = spark.createDataFrame([(1, 1.5, "x")], "a int, b double, c string")
    compare_to_oracle(
        df, "SELECT 1 AS a, 1.5 AS b, 'x' AS c", SF_ORACLE
    )  # sanity: identical result is green
    for bad_sql, cls in [
        ("SELECT 2 AS a, 1.5 AS b, 'x' AS c", "value"),
        ("SELECT 1 AS wrong, 1.5 AS b, 'x' AS c", "column name"),
        (
            "SELECT 1 AS a, 1.5 AS b, 'x' AS c "
            "UNION ALL SELECT 1, 1.5, 'x'",
            "row count",
        ),
        ("SELECT CAST(1 AS DOUBLE) AS a, 1.5 AS b, 'x' AS c", "type class"),
        ("SELECT 1 AS a, 1.5000013 AS b, 'x' AS c", "above-tolerance float"),
        ("SELECT 1 AS a, 1.5 AS b, 'X' AS c", "string case"),
    ]:
        with pytest.raises(AssertionError):
            compare_to_oracle(df, bad_sql, SF_ORACLE)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_output_is_canonicalizer_safe(spark, name):
    """Round-2 regression guard: the external harness canonicalizes
    results with pandas sort_values, which dies on unhashable cells
    (list/dict) — agg_approx_percentile's array column was the only
    red row that round. No registered query, oracled OR rows-only,
    may emit array/map/struct/binary output columns."""
    df = SPECS[name].fn(spark, SF_ORACLE)
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        assert not t.startswith(("array", "map", "struct", "binary")), (
            name,
            f.name,
            t,
        )
