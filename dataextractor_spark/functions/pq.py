"""Product quantization (PQ) — the compression layer of a
billion-scale vector index (Jégou et al. 2011, the IVF+PQ pairing
FAISS popularized): split each d-dim vector into m subspaces, learn a
small k-means codebook per subspace (functions/kmeans.py), and store
each vector as m small codes instead of d floats. With m=4, ksub=16
over d=64 float32, that is 4 bytes per vector against 256 — the
difference between an index that fits in executor memory at 10⁹
vectors and one that doesn't.

Spark shape, same discipline as the k-means module it builds on:
- FIT runs the m independent sub-problems FUSED: the corpus explodes
  once into (subspace, segment) rows and every Lloyd sweep is ONE job
  — one joint assignment expression (per-subspace d2 literals behind
  a CASE on the subspace id) and one groupBy(j, cell) mean update —
  instead of m separate kmeans_fit job chains. Same seeds and the
  same argmin assignment as the per-subspace form; the mean update
  aggregates the same rows but in a different partial-sum order
  (groupBy(j, cell) vs per-subspace groupBy(cell)), so the learned
  codebooks agree up to float-summation reassociation — equal in
  exact arithmetic, ulp-level on doubles. The job count drops from
  m·(sweeps+1) to
  sweeps+1 (measured ~2× on the sf0.1 IVF+PQ build, where
  driver-scheduled job overhead, not data volume, dominates).
  Driver state is still m·ksub·(d/m) = ksub·d floats.
- ASSIGN + reconstruction error are ONE narrow codegen pass: every
  sub-codebook rides along as a SQL literal, the per-subspace squared
  distances are transform/aggregate expressions, the code is
  array_position of the min, and the reconstruction error of a vector
  is exactly the sum of its per-subspace minima — no second pass, no
  UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dataextractor_spark.functions.kmeans import _d2_sql, no_aqe


def pq_fit(
    vectors: DataFrame,
    *,
    m: int = 4,
    ksub: int = 16,
    dim: int,
    max_iter: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Learn m sub-codebooks of ksub centroids each. ``dim`` must be
    divisible by m; subspace j covers elements [j·d/m, (j+1)·d/m).
    Deterministic (the same hash-ranked seeding as kmeans_fit — the
    seed ids are slice-independent, so one collect seeds all m books);
    returns [m][ksub][dim/m] floats. The per-subspace Lloyd fit
    executed fused — same seeds/assignments, means equal up to float
    partial-sum order (module docstring)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    ds = dim // m
    # r13: seed collect + every fused sweep with AQE off (kmeans.no_aqe
    # — one driver-scheduled job per sweep instead of two, centroids
    # bit-identical); restored before the caller's query plans run.
    with no_aqe(vectors.sparkSession):
        return _pq_fit_jobs(
            vectors, m=m, ksub=ksub, ds=ds, max_iter=max_iter,
            id_col=id_col, vec_col=vec_col,
        )


def _pq_fit_jobs(
    vectors: DataFrame,
    *,
    m: int,
    ksub: int,
    ds: int,
    max_iter: int,
    id_col: str,
    vec_col: str,
) -> list[list[list[float]]]:
    seeds = (
        vectors.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(ksub)
        .collect()
    )
    books = [
        [
            [float(v) for v in r[vec_col][j * ds : (j + 1) * ds]]
            for r in seeds
        ]
        for j in range(m)
    ]
    if max_iter <= 0:
        return books
    segs = (
        vectors.select(
            id_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            F.slice(vec_col, j * ds + 1, ds).alias("sub"),
                        )
                        for j in range(m)
                    ]
                )
            ).alias("e"),
        )
        .select("e.j", "e.sub")
        .localCheckpoint(eager=False)
    )
    aggs = [
        F.avg(F.col("sub")[i].cast("double")).alias(f"m{i}")
        for i in range(ds)
    ]
    for _ in range(max_iter):
        d2_case = (
            "CASE j "
            + " ".join(
                f"WHEN {j} THEN {_d2_sql(books[j], 'sub')}"
                for j in range(m)
            )
            + " END"
        )
        assigned = segs.withColumn("_d2", F.expr(d2_case)).withColumn(
            "cell",
            F.expr("cast(array_position(_d2, array_min(_d2)) - 1 as int)"),
        )
        new = [list(b) for b in books]  # empty cells keep previous
        for r in assigned.groupBy("j", "cell").agg(*aggs).collect():
            new[r["j"]][r["cell"]] = [
                float(r[f"m{i}"]) for i in range(ds)
            ]
        books = new
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Append ``code`` (array<int>, length m, each in [0, ksub)) and
    ``recon_err`` (double: squared L2 between the vector and its
    PQ reconstruction = Σ per-subspace minima). One codegen pass."""
    m = len(codebooks)
    ds = len(codebooks[0][0])
    codes, errs = [], []
    for j, book in enumerate(codebooks):
        d2 = _d2_sql(book, f"slice({vec_col}, {j * ds + 1}, {ds})")
        codes.append(f"cast(array_position({d2}, array_min({d2})) - 1 as int)")
        errs.append(f"array_min({d2})")
    return vectors.withColumn(
        "code", F.expr("array(" + ",".join(codes) + ")")
    ).withColumn("recon_err", F.expr(" + ".join(errs)))
