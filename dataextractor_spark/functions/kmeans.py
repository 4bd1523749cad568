"""Distributed k-means (Lloyd's algorithm) for IVF-style vector
indexing — the unsupervised codebook behind `sim_ann_ivf_kmeans`.

Spark-first formulation (no MLlib dependency, no driver-side vectors
beyond the k×d codebook itself):

- INIT: deterministic — the k seed vectors are the rows whose
  ``xxhash64(id)`` ranks smallest (a reproducible uniform sample; no
  rand(), so the fit is identical across runs, partitionings, and
  cluster sizes).
- ASSIGN: the codebook is k×d doubles (a few KB even at k=256, d=64) —
  small enough to inline as a LITERAL array-of-arrays column, so
  nearest-centroid assignment is ONE narrow codegen pass over the
  corpus: transform over the centroid array computing squared L2, then
  array_position of the min. No crossJoin, no shuffle, no UDF.
- UPDATE: posexplode to (cell, pos, value) and hash-aggregate the per-
  dimension means — one shuffle whose width is k·d regardless of
  corpus size, re-assembled with sort+collect_list per cell.
- Convergence: fixed ``max_iter`` sweeps (IVF codebooks don't need
  exact convergence; each sweep is provably non-increasing in inertia,
  asserted in tests).

At 100 TB the per-iteration cost is one corpus scan + one k·d-wide
shuffle — the textbook map-side-combine shape. The only driver-side
state is the codebook collect between iterations, which is O(k·d) and
independent of corpus size (same contract as a broadcast dim).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

#: target vectors per IVF cell: a probe scans ~this many candidates.
IVF_TARGET_CELL_ROWS = 64


def ivf_cell_count(n_vectors: int, target_rows: int = IVF_TARGET_CELL_ROWS) -> int:
    """Cell count k derived from the corpus size: k = n/target clamped
    to [4, 256] and to n (can't have more cells than vectors). The
    classic IVF sizing k ≈ √n also works; n/target keeps probe cost
    flat, which is the property the tests pin."""
    k = math.ceil(max(n_vectors, 1) / target_rows)
    return max(4, min(256, k, max(n_vectors, 1)))


def _centroid_sql(centroids: list[list[float]]) -> str:
    """The k×d codebook as a SQL array-of-arrays literal. Built as
    TEXT, not nested Column objects: constructing the k·d-node Column
    tree through py4j cost ~0.9 s of driver time PER SWEEP (the
    dominant cost of a fixture-scale fit); one expression string
    parses JVM-side in milliseconds and produces the identical plan."""
    return (
        "array("
        + ",".join(
            "array(" + ",".join(f"{float(v)!r}D" for v in c) + ")"
            for c in centroids
        )
        + ")"
    )


def _d2_sql(centroids: list[list[float]], vec_col: str) -> str:
    """Squared-L2 distances to every centroid, as one SQL expression
    (transform over the codebook literal; aggregate+zip_with inside —
    all Catalyst, no Python in the scan)."""
    return (
        f"transform({_centroid_sql(centroids)}, c -> aggregate("
        f"zip_with(transform({vec_col}, x -> cast(x as double)), c, "
        f"(x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x))"
    )


def assign_cells(
    vectors: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Append a ``cell`` column: index (0-based) of the nearest
    centroid by L2 distance, ties to the lowest index. One narrow
    codegen pass — the codebook rides along as a literal.
    array_position returns the FIRST index of the min → deterministic
    low-index tiebreak; 1-based, hence the -1."""
    d2 = _d2_sql(centroids, vec_col)
    return vectors.withColumn(
        "cell", F.expr(f"cast(array_position({d2}, array_min({d2})) - 1 as int)")
    )


def kmeans_fit(
    vectors: DataFrame,
    k: int,
    *,
    max_iter: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    wide_agg_max_dim: int = 128,
) -> list[list[float]]:
    """Fit k centroids over an array-typed vector column; returns the
    codebook as a plain k×d list (driver-side O(k·d), like any
    broadcast dim). Deterministic: hash-ranked seeding + mean updates.
    Empty cells (possible when k is near n) keep their previous
    centroid rather than being dropped, so the codebook size is stable.

    Mean update has two physical forms, same result (equivalence
    pinned in tests/test_scale_paths.py):
    - d ≤ ``wide_agg_max_dim``: ONE groupBy(cell) with d avg(vec[i])
      aggregate expressions — single shuffle of k×d partials, no row
      explosion (the posexplode form multiplies scan rows ×d before
      the partial agg collapses them);
    - larger d: posexplode to (cell, pos, v) + per-(cell,pos) avg —
      expression count stays O(1) however wide the vectors get.
    """
    seeds = (
        vectors.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(k)
        .collect()
    )
    centroids = [[float(v) for v in r[vec_col]] for r in seeds]
    d_dim = len(centroids[0]) if centroids else 0
    # constant across sweeps — build the wide agg expressions once
    wide_aggs = [
        F.avg(F.col(vec_col)[i].cast("double")).alias(f"m{i}")
        for i in range(d_dim if d_dim <= wide_agg_max_dim else 0)
    ]
    for _ in range(max_iter):
        assigned = assign_cells(vectors.select(id_col, vec_col), centroids, vec_col)
        new = list(centroids)  # empty cells keep previous centroid
        if wide_aggs:
            for r in assigned.groupBy("cell").agg(*wide_aggs).collect():
                new[r["cell"]] = [float(r[f"m{i}"]) for i in range(d_dim)]
        else:
            flat = assigned.select(
                "cell", F.posexplode(F.col(vec_col)).alias("pos", "v")
            )
            means = (
                flat.groupBy("cell", "pos")
                .agg(F.avg("v").alias("m"))
                .groupBy("cell")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "m"))),
                        lambda s: s.m,
                    ).alias("centroid")
                )
                .collect()
            )
            for r in means:
                new[r["cell"]] = [float(v) for v in r["centroid"]]
        centroids = new
    return centroids


def inertia(
    vectors: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> float:
    """Σ over vectors of squared L2 distance to the assigned centroid
    (the quantity Lloyd's sweeps never increase)."""
    d2 = _d2_sql(centroids, vec_col)
    return float(
        vectors.select(F.expr(f"array_min({d2})").alias("d2"))
        .agg(F.sum("d2"))
        .first()[0]
    )
