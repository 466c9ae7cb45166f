"""k-truss edge peeling vs a pure-Python support peel."""

import random

from subgraph_isomorphism_pregel_spark.operators.triangles import ktruss


def py_ktruss(und, k, rounds=None):
    e = {tuple(sorted(p)) for p in und}
    it = 0
    while True:
        adj = {}
        for a, b in e:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        nxt = {(a, b) for a, b in e if len(adj[a] & adj[b]) >= k - 2}
        it += 1
        if nxt == e or (rounds and it >= rounds):
            return nxt
        e = nxt


def run(spark, und, k, rounds):
    edges = spark.createDataFrame(
        sorted(set(und) | {(b, a) for a, b in und}), "src long, dst long"
    )
    return {(r["u"], r["v"]) for r in ktruss(spark, edges, k=k, rounds=rounds).collect()}


def test_ktruss_known_shape(spark):
    # K4 (a 4-truss) + pendant triangle (3-truss only) + a tail edge
    und = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (3, 5), (5, 6)]
    assert run(spark, und, k=4, rounds=4) == py_ktruss(und, 4) == {
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)
    }
    assert run(spark, und, k=3, rounds=4) == py_ktruss(und, 3)


def test_ktruss_random_matches_python(spark):
    rng = random.Random(17)
    n = 18
    und = {(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.3}
    # generous round bound: idempotent past the fixed point
    got = run(spark, und, k=4, rounds=6)
    assert got == py_ktruss(und, 4)


def test_ktruss_early_exit_matches_full_unroll(spark):
    # a huge round bound must return the same set as the fixed point —
    # and must not pay for the unused waves (the zero-removal early exit)
    import time

    und = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (3, 5)]
    t0 = time.monotonic()
    got = run(spark, und, k=4, rounds=200)
    wall = time.monotonic() - t0
    assert got == py_ktruss(und, 4)
    # 200 recompute waves at ~0.5s each would take minutes; the early
    # exit stops after the first idempotent wave
    assert wall < 60


def test_ktruss_bounded_rounds_contract(spark):
    # a long chain of triangles peels one wave at a time: after exactly r
    # waves the result equals the python peel bounded at r rounds
    und = []
    for i in range(6):
        und += [(2 * i, 2 * i + 1), (2 * i, 2 * i + 2), (2 * i + 1, 2 * i + 2)]
    got = run(spark, und, k=4, rounds=2)
    assert got == py_ktruss(und, 4, rounds=2)
