"""K-means clustering over the embedding column — fixed-point Lloyd's.

The curation primitive behind diversity sampling, per-cluster quotas, and
IVF list training. Engine-exact by construction: vectors quantize to int64
on the 2^20 grid (floor(val * 2^20) — the same convention as the ANN/LSH
operators in similarity.py), distances are integer sums of squared deltas
(associative: no float order-dependence), and centroid updates snap back to
the grid via floor(sum / count). Every quantity the assignment depends on
is therefore bit-identical in numpy and in the DuckDB oracle, which makes
k-means hash-gateable — normally impossible for float Lloyd's, where a
last-ulp difference in an averaged centroid can flip a near-tie assignment.

Iteration t: assign each vector to the nearest centroid of round t-1
(squared L2 on the quantized grid, ties to the lowest cluster id), then
centroid_t = floor(elementwise sum / count) over the assigned vectors;
empty clusters keep their previous centroid. Seeds: the k smallest vec_ids
(the IVF convention, sources/similarity.py:330).

Scale design: each iteration is ONE zero-shuffle mapInPandas pass that
computes per-batch assignments with an int64 GEMM and emits one partial
(cluster, count, sum-vector) row per cluster per batch — k*dim*P numbers
cross to the driver per iteration (the Pregel-carry pattern), never n*dim.
No groupBy explode, no per-row Python. int64 bounds: |q| <= 2^21 per
component, so squared-delta sums over dim <= 2^13 stay under 2^56; the
driver-side fold uses Python ints via numpy int64 partials (cluster sums
<= n * 2^21 — overflow needs n > 2^42 rows per cluster).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 2**20


def _quantize(mat: np.ndarray) -> np.ndarray:
    """float -> int64 on the 2^20 grid; same expression as the SQL oracle's
    CAST(floor(val * 1048576.0) AS BIGINT)."""
    return np.floor(mat.astype(np.float64) * QUANT).astype(np.int64)


def _assign(Q: np.ndarray, C: np.ndarray) -> np.ndarray:
    """argmin_c ||q - c||^2 with ties to the lowest cluster id — computed in
    exact int64 (||q||^2 - 2qC^T + ||c||^2; identical to the direct sum of
    squared deltas because integer arithmetic is associative)."""
    qn = np.einsum("ij,ij->i", Q, Q)[:, None]
    cn = np.einsum("ij,ij->i", C, C)[None, :]
    d = qn - 2 * (Q @ C.T) + cn
    return np.argmin(d, axis=1).astype(np.int32), d


def kmeans(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray, int]:
    """-> ((id, cluster int) DataFrame, final int64 centroid matrix (k x dim),
    inertia = total squared quantized distance of the LAST assignment)."""
    if k < 1 or iters < 1:
        raise ValueError("kmeans needs k >= 1 and iters >= 1")
    src = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    seeds = src.orderBy("vec_id").limit(k).collect()
    if len(seeds) < k:
        raise ValueError(f"k={k} but only {len(seeds)} vectors")
    C = _quantize(np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in seeds]))
    dim = C.shape[1]
    spark = emb.sparkSession
    partial_schema = "cluster int, n long, sums array<long>, inertia long"

    def make_partials(C_iter: np.ndarray):
        def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                if len(pdf) == 0:
                    continue
                Q = _quantize(np.vstack(pdf["embedding"].values))
                a, d = _assign(Q, C_iter)
                best = d[np.arange(len(a)), a]
                rows = []
                for c in np.unique(a):
                    m = a == c
                    rows.append(
                        (
                            int(c),
                            int(m.sum()),
                            Q[m].sum(axis=0).tolist(),
                            int(best[m].sum()),
                        )
                    )
                yield pd.DataFrame(rows, columns=["cluster", "n", "sums", "inertia"])

        return partials

    inertia = 0
    for _ in range(iters):
        parts = src.mapInPandas(make_partials(C), partial_schema).collect()
        S = np.zeros((k, dim), dtype=np.int64)
        n = np.zeros(k, dtype=np.int64)
        inertia = 0
        for r in parts:
            S[r["cluster"]] += np.asarray(r["sums"], dtype=np.int64)
            n[r["cluster"]] += r["n"]
            inertia += r["inertia"]
        nonempty = n > 0
        # floor(sum / count) snaps centroids back onto the quantized grid;
        # empty clusters keep their previous centroid
        C = np.where(nonempty[:, None], S // np.maximum(n, 1)[:, None], C)

    Cf = C

    def assign_rows(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            Q = _quantize(np.vstack(pdf["embedding"].values))
            a, _ = _assign(Q, Cf)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].values, "cluster": a})

    # output = argmin against the FINAL centroids (fit-then-predict), one
    # extra zero-shuffle pass; the SQL oracle unrolls the same extra step.
    # `inertia` reports the LAST Lloyd pass (against C_{iters-1}).
    assigned = src.mapInPandas(assign_rows, "vec_id long, cluster int")
    return assigned, C, int(inertia)
