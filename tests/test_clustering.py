"""Fixed-point k-means vs a pure-python oracle: exactness of the quantized
Lloyd rounds is the whole point (a last-ulp float difference would flip
near-tie assignments — the int64 grid makes that impossible)."""

import numpy as np
import pytest

from subgraph_isomorphism_pregel_spark.operators.clustering import QUANT, kmeans


def kmeans_oracle(vectors, k, iters):
    """Same semantics, plain python: quantize, k smallest ids seed, Lloyd
    with floor-mean centroids, empty clusters frozen, final predict pass."""
    ids = sorted(vectors)
    Q = {i: np.floor(np.asarray(vectors[i], dtype=np.float64) * QUANT).astype(np.int64) for i in ids}
    C = [Q[i].copy() for i in ids[:k]]

    def assign():
        out = {}
        for i in ids:
            d = [int(((Q[i] - c) ** 2).sum()) for c in C]
            out[i] = int(np.argmin(d))  # ties -> lowest cid
        return out

    for _ in range(iters):
        a = assign()
        for c in range(k):
            members = [Q[i] for i in ids if a[i] == c]
            if members:
                S = np.sum(members, axis=0, dtype=np.int64)
                C[c] = S // len(members)
    return assign(), np.vstack(C)


def to_df(spark, vectors):
    rows = [(i, [float(x) for x in v]) for i, v in sorted(vectors.items())]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def blobs():
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 16)) * 3
    vectors = {}
    for i in range(120):
        vectors[i] = (centers[i % 4] + rng.normal(size=16) * 0.4).astype(np.float32)
    return vectors


def test_kmeans_matches_oracle(spark, blobs):
    got_df, C, inertia = kmeans(to_df(spark, blobs), k=4, iters=3)
    got = {r["vec_id"]: r["cluster"] for r in got_df.collect()}
    want, C_want = kmeans_oracle(blobs, k=4, iters=3)
    assert got == want
    assert np.array_equal(C, C_want)
    assert inertia > 0
    # 4 well-separated blobs: every cluster non-trivial
    sizes = {c: sum(1 for v in got.values() if v == c) for c in set(got.values())}
    assert len(sizes) == 4 and min(sizes.values()) >= 10


def test_kmeans_partition_invariance(spark, blobs):
    df = to_df(spark, blobs)
    a, Ca, _ = kmeans(df.repartition(1), k=4, iters=2)
    b, Cb, _ = kmeans(df.repartition(11), k=4, iters=2)
    assert np.array_equal(Ca, Cb)
    assert {r["vec_id"]: r["cluster"] for r in a.collect()} == {
        r["vec_id"]: r["cluster"] for r in b.collect()
    }


def test_kmeans_duplicate_seed_keeps_empty_cluster(spark):
    """Seeds 0 and 1 are identical vectors -> cluster 1 is empty from round
    one (ties go to cluster 0) and must keep its frozen centroid."""
    vectors = {
        0: np.array([0.0, 0.0], dtype=np.float32),
        1: np.array([0.0, 0.0], dtype=np.float32),
        2: np.array([5.0, 5.0], dtype=np.float32),
        3: np.array([5.1, 5.0], dtype=np.float32),
    }
    got_df, C, _ = kmeans(to_df(spark, vectors), k=3, iters=2)
    got = {r["vec_id"]: r["cluster"] for r in got_df.collect()}
    want, C_want = kmeans_oracle(vectors, k=3, iters=2)
    assert got == want
    assert np.array_equal(C, C_want)
    assert got[0] == got[1] == 0
    assert got[2] == got[3] == 2
    assert 1 not in set(got.values())


def test_kmeans_bad_inputs(spark):
    df = to_df(spark, {0: np.zeros(4, dtype=np.float32)})
    with pytest.raises(ValueError):
        kmeans(df, k=0)
    with pytest.raises(ValueError):
        kmeans(df, k=2)  # more clusters than vectors
