"""Central query registry — the bridge to the driver contract.

Every operator the engine implements registers here as a named
``QuerySpec``: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus
(where SQL-expressible) the equivalent ANSI SQL that DuckDB runs as the
correctness oracle. ``__spark_entry__.py`` exposes the registry to the
driver verbatim.

Conventions (enforced by tests/test_correctness.py):
- every computed column is aliased IDENTICALLY in Spark and SQL;
- double-typed aggregates are rounded (2 dp for sums, 6 dp for
  rates/averages) on BOTH sides so order-of-accumulation float noise
  can't flip the driver's value hash;
- results are small (aggregated / top-k), never unbounded row dumps.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``name`` with an optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and
    return the full registry.

    Import order IS registration order, and downstream consumers
    (including the external correctness runner) may evaluate a prefix
    of the registry per run — so modules register in verification-
    priority order: families whose queries have not yet been checked
    against the external oracle come first, already-proven families
    (aggregates/dedup/enrichment/etl/joins, all green in round 1)
    re-register at the back. Rotate as coverage fills in.
    """
    # Imports live here (not module top) so importing the registry stays
    # cheap and cycles are impossible.
    from dataextractor_spark.operators import similarity  # noqa: F401
    from dataextractor_spark.operators import text  # noqa: F401
    from dataextractor_spark.operators import windows  # noqa: F401
    from dataextractor_spark.operators import windows_time  # noqa: F401
    from dataextractor_spark.operators import rest_source  # noqa: F401
    from dataextractor_spark.operators import sql_surface  # noqa: F401
    from dataextractor_spark.operators import scalars  # noqa: F401
    from dataextractor_spark.operators import multimodal  # noqa: F401
    from dataextractor_spark.operators import relational  # noqa: F401
    from dataextractor_spark.operators import sampling  # noqa: F401
    from dataextractor_spark.operators import aggregates  # noqa: F401
    from dataextractor_spark.operators import dedup  # noqa: F401
    from dataextractor_spark.operators import enrichment  # noqa: F401
    from dataextractor_spark.operators import etl_parity  # noqa: F401
    from dataextractor_spark.operators import joins  # noqa: F401

    return dict(_REGISTRY)
