import hashlib
import math

import pytest

from subgraph_isomorphism_pregel_spark.operators.hyperball import hyperball
from subgraph_isomorphism_pregel_spark.operators.sketches import hll_params


def ref_hyperball(n, edges, radius, p):
    """Exact replay: BFS balls + HLL registers + the estimate formula."""
    m, W, R, num = hll_params(p)
    adj = {i: set() for i in range(n)}
    for s, d in edges:
        adj[s].add(d)
    out = {}
    for v in range(n):
        ball = {v}
        frontier = {v}
        for _ in range(radius):
            frontier = {w for u in frontier for w in adj[u]} - ball
            ball |= frontier
        regs = [0] * m
        for u in ball:
            h32 = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
            b, w = h32 >> W, h32 & ((1 << W) - 1)
            rank = W - w.bit_length() + 1
            regs[b] = max(regs[b], rank)
        v_empty = regs.count(0)
        s = sum(2.0 ** (R - M) for M in regs)
        e_raw = num / s
        if e_raw <= 2.5 * m and v_empty > 0:
            est = float(m) * math.log(float(m) / v_empty)
        else:
            est = e_raw
        out[v] = round(est, 6)
    return out


def _graph(spark, n, edges):
    v = spark.createDataFrame([(i, 0) for i in range(n)], "id long, label int")
    e = spark.createDataFrame(edges, "src long, dst long")
    return v, e


def test_hyperball_matches_exact_replay(spark):
    import random

    rng = random.Random(5)
    n = 40
    edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(160)})
    edges = [(a, b) for a, b in edges if a != b]
    v, e = _graph(spark, n, edges)
    got, _ = hyperball(spark, v, e, radius=3, p=4, num_partitions=3)
    gv = {r["id"]: r["est_ball_r"] for r in got.collect()}
    want = ref_hyperball(n, edges, 3, 4)
    assert gv == pytest.approx(want, abs=1e-9)


def test_hyperball_estimates_track_ball_size(spark):
    # directed chain: B(v, 2) = {v, v+1, v+2} clipped at the end
    n = 12
    edges = [(i, i + 1) for i in range(n - 1)]
    v, e = _graph(spark, n, edges)
    got, _ = hyperball(spark, v, e, radius=2, p=4, num_partitions=2)
    gv = {r["id"]: r["est_ball_r"] for r in got.collect()}
    want = ref_hyperball(n, edges, 2, 4)
    assert gv == pytest.approx(want, abs=1e-9)
    # the chain end sees a strictly smaller ball than a singleton-free
    # prefix vertex — compare through the replay (estimates are NOT
    # monotone in ball size at tiny cardinalities: md5 buckets collide)
    assert gv[n - 1] == pytest.approx(want[n - 1], abs=1e-9)
    assert min(gv.values()) > 0.0


def test_hyperball_rejects_bad_radius(spark):
    v, e = _graph(spark, 2, [(0, 1)])
    with pytest.raises(ValueError):
        hyperball(spark, v, e, radius=0)


def test_neighborhood_function_matches_replay(spark):
    from subgraph_isomorphism_pregel_spark.operators.hyperball import (
        neighborhood_function,
    )

    import random

    rng = random.Random(9)
    n = 30
    edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(120)})
    edges = [(a, b) for a, b in edges if a != b]
    v, e = _graph(spark, n, edges)
    nf, _ = neighborhood_function(spark, v, e, radius=3, p=4, num_partitions=3)
    got = {r["r"]: r["n_est_micro"] for r in nf.collect()}
    for radius in (1, 2, 3):
        want = ref_hyperball(n, edges, radius, 4)
        # the kernel quantizes the RAW estimate; the replay rounds to 6dp
        # first — identical integers either way at 1e-6 resolution
        total = sum(int(math.floor(x * 1e6 + 0.5)) for x in want.values())
        assert got[radius] == total
    assert got[1] <= got[2] <= got[3]  # balls only grow


def test_effective_diameter_interpolation(spark):
    from subgraph_isomorphism_pregel_spark.operators.hyperball import (
        effective_diameter,
        neighborhood_function,
    )

    # undirected 14-cycle: balls grow linearly, so the interpolation lands
    # strictly between rounds
    n = 14
    edges = [(i, (i + 1) % n) for i in range(n)] + [((i + 1) % n, i) for i in range(n)]
    v, e = _graph(spark, n, edges)
    out, _ = effective_diameter(spark, v, e, radius=3, p=4, num_partitions=2)
    d = out.collect()[0]["eff_diameter"]
    nf, _ = neighborhood_function(spark, v, e, radius=3, p=4, num_partitions=2)
    ns = {r["r"]: float(r["n_est_micro"]) for r in nf.collect()}
    target = 0.9 * ns[3]
    if ns[1] >= target:
        want = 1.0
    elif ns[2] >= target:
        want = 1.0 + (target - ns[1]) / (ns[2] - ns[1])
    else:
        want = 2.0 + (target - ns[2]) / (ns[3] - ns[2])
    assert d == pytest.approx(round(want, 6), abs=1e-9)
    assert 1.0 <= d <= 3.0


def test_effective_diameter_early_convergence(spark):
    """A graph whose balls saturate before `radius` rounds: the kernel
    halts early and the neighborhood function must pad to the converged
    value instead of crashing (N(r) is constant once every ball stops
    growing)."""
    from subgraph_isomorphism_pregel_spark.operators.hyperball import (
        effective_diameter,
        neighborhood_function,
    )

    # undirected star: diameter 2, so radius=4 converges after round 2
    n = 6
    edges = [(0, i) for i in range(1, n)] + [(i, 0) for i in range(1, n)]
    v, e = _graph(spark, n, edges)
    nf, _ = neighborhood_function(spark, v, e, radius=4, p=4, num_partitions=2)
    rows = {r["r"]: r["n_est_micro"] for r in nf.collect()}
    assert sorted(rows) == [1, 2, 3, 4]  # full 1..radius contract
    assert rows[2] == rows[3] == rows[4]  # constant past convergence
    out, _ = effective_diameter(spark, v, e, radius=4, p=4, num_partitions=2)
    d = out.collect()[0]["eff_diameter"]
    assert 1.0 <= d <= 2.0  # the star's mass arrives by round 2
