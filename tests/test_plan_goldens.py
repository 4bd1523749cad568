"""Golden-plan regression net (round-12, r11 verdict item 3).

Plan quality used to be protected by per-round manual audits plus the
anti-pattern gates; the host's ~±18% bench noise means a lost
broadcast or an added shuffle would otherwise surface only as a bench
mystery. Each query in GOLDEN_QUERIES has its expression-id-normalized
formatted physical plan committed under tests/goldens/plans/; any
change to tree shape, join strategy, exchange placement, pushed
filters, or read schemas fails here with a unified diff.

Mutation-checked (COVERAGE.md round-12 section): dropping the
broadcast() hint from join_broadcast_dim flips its plan to a
sort-merge join and this gate reports exactly that diff.

Refresh deliberately with `python tools/capture_plan_goldens.py`
after a plan change is understood and wanted.
"""

from __future__ import annotations

import difflib
import pathlib

import pytest

from dataextractor_spark.plans.golden import GOLDEN_QUERIES, normalized_plan
from dataextractor_spark.registry import load_all

from .conftest import SF_SMALL

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "goldens" / "plans"


def test_golden_set_matches_committed_files():
    """The golden dir and GOLDEN_QUERIES must agree exactly — a golden
    without a gate entry (or vice versa) is a silent coverage hole."""
    on_disk = {p.stem for p in GOLDEN_DIR.glob("*.txt")}
    assert on_disk == set(GOLDEN_QUERIES), (
        f"only on disk: {sorted(on_disk - set(GOLDEN_QUERIES))}; "
        f"only in GOLDEN_QUERIES: {sorted(set(GOLDEN_QUERIES) - on_disk)}"
    )


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_golden_plan_matches(spark, name):
    golden = (GOLDEN_DIR / f"{name}.txt").read_text()
    actual = normalized_plan(load_all()[name].fn(spark, SF_SMALL))
    if actual != golden:
        diff = "\n".join(difflib.unified_diff(
            golden.splitlines(), actual.splitlines(),
            f"goldens/plans/{name}.txt", "current plan", lineterm=""))
        raise AssertionError(
            f"physical plan for {name} drifted from its golden.\n"
            f"If the change is intended, refresh with\n"
            f"  python tools/capture_plan_goldens.py {name}\n"
            f"and justify it in the commit message.\n{diff}")


def test_triangle_closing_join_merge_fallback(spark, monkeypatch):
    """The round-12 weak-scaling finding (SLOPES_r12.json): the
    triangle kernels' no-spill SHUFFLE_HASH closing build OOMs once
    per-task build mass outgrows the heap, and the documented remedy
    is yielding to sort-merge (which spills). That remedy is now a
    knob — SPARK_GRAFT_GRAPH_CLOSING_JOIN=merge — and this test pins
    all three contracts: the default plan keeps the hash build (also
    golden-pinned), the fallback really flips BOTH kernels' closing
    semi-join to SortMergeJoin, and an invalid value refuses loudly
    rather than silently hashing."""
    specs = load_all()
    for name in ("graph_triangle_count", "graph_local_clustering"):
        dflt = normalized_plan(specs[name].fn(spark, SF_SMALL))
        assert "ShuffledHashJoin" in dflt and "LeftSemi" in dflt, name

        monkeypatch.setenv("SPARK_GRAFT_GRAPH_CLOSING_JOIN", "merge")
        merged = normalized_plan(specs[name].fn(spark, SF_SMALL))
        monkeypatch.delenv("SPARK_GRAFT_GRAPH_CLOSING_JOIN")
        assert "SortMergeJoin LeftSemi" in merged, name
        assert "ShuffledHashJoin" not in merged, name

    monkeypatch.setenv("SPARK_GRAFT_GRAPH_CLOSING_JOIN", "bogus")
    with pytest.raises(ValueError, match="SPARK_GRAFT_GRAPH_CLOSING_JOIN"):
        specs["graph_triangle_count"].fn(spark, SF_SMALL)
