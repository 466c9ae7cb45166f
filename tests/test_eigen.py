import numpy as np
import pytest

from subgraph_isomorphism_pregel_spark.operators.eigen import eigencentrality


def ref_eigen(n, edges, steps):
    """The eigen_program recurrence in dense numpy."""
    A = np.zeros((n, n))
    for s, d in edges:
        A[s, d] = 1.0
    x = np.ones(n)
    for _ in range(steps):
        x = A.T @ (x / np.linalg.norm(x))
    nrm = np.linalg.norm(x)
    return x / (nrm if nrm > 0 else 1.0)


def _graph(spark, n, edges):
    v = spark.createDataFrame(
        [(i, i % 3) for i in range(n)], "id long, label int"
    )
    e = spark.createDataFrame(edges, "src long, dst long")
    return v, e


def test_eigen_matches_numpy_random(spark):
    import random

    rng = random.Random(11)
    n = 30
    edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(150)})
    edges = [(a, b) for a, b in edges if a != b]
    v, e = _graph(spark, n, edges)
    got, _ = eigencentrality(spark, v, e, steps=4, num_partitions=3)
    gv = {r["id"]: r["score"] for r in got.collect()}
    want = ref_eigen(n, edges, 4)
    assert len(gv) == n
    for i in range(n):
        assert gv[i] == pytest.approx(want[i], abs=1e-9)


def test_eigen_star_center_dominates(spark):
    # undirected star: center 0 <-> leaves; center carries the mass
    edges = [(0, i) for i in range(1, 8)] + [(i, 0) for i in range(1, 8)]
    v, e = _graph(spark, 8, edges)
    got, _ = eigencentrality(spark, v, e, steps=6, num_partitions=2)
    gv = {r["id"]: r["score"] for r in got.collect()}
    assert gv[0] > max(gv[i] for i in range(1, 8))
    leaf_vals = {round(gv[i], 12) for i in range(1, 8)}
    assert len(leaf_vals) == 1  # symmetric leaves identical
    # unit L2 norm
    assert sum(s * s for s in gv.values()) == pytest.approx(1.0, abs=1e-9)


def test_eigen_no_inedge_vertex_scores_zero(spark):
    v, e = _graph(spark, 3, [(0, 1), (1, 2)])
    got, _ = eigencentrality(spark, v, e, steps=3, num_partitions=2)
    gv = {r["id"]: r["score"] for r in got.collect()}
    assert gv[0] == 0.0


def test_eigen_rejects_bad_steps(spark):
    v, e = _graph(spark, 2, [(0, 1)])
    with pytest.raises(ValueError):
        eigencentrality(spark, v, e, steps=0)
