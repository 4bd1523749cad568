"""Product quantization (PQ) — the compression layer of a
billion-scale vector index (Jégou et al. 2011, the IVF+PQ pairing
FAISS popularized): split each d-dim vector into m subspaces, learn a
small k-means codebook per subspace (functions/kmeans.py), and store
each vector as m small codes instead of d floats. With m=4, ksub=16
over d=64 float32, that is 4 bytes per vector against 256 — the
difference between an index that fits in executor memory at 10⁹
vectors and one that doesn't.

Spark shape, same discipline as the k-means module it builds on:
- FIT is m independent kmeans_fit calls on SLICED vectors — driver
  state is m·ksub·(d/m) = ksub·d floats total, broadcast-dim-sized;
- ASSIGN + reconstruction error are ONE narrow codegen pass: every
  sub-codebook rides along as a SQL literal, the per-subspace squared
  distances are transform/aggregate expressions, the code is
  array_position of the min, and the reconstruction error of a vector
  is exactly the sum of its per-subspace minima — no second pass, no
  UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dataextractor_spark.functions.kmeans import _d2_sql, kmeans_fit


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
    Deterministic (hash-ranked seeding per kmeans_fit); returns
    [m][ksub][dim/m] floats."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    ds = dim // m
    books = []
    for j in range(m):
        sub = vectors.select(
            id_col, F.slice(vec_col, j * ds + 1, ds).alias("sub")
        )
        books.append(
            kmeans_fit(
                sub, ksub, max_iter=max_iter, id_col=id_col, vec_col="sub"
            )
        )
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
