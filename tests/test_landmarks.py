"""Multi-source landmark BFS vs a pure-Python BFS oracle."""

import random
from collections import deque

from subgraph_isomorphism_pregel_spark.operators.sssp import landmark_distances


def bfs(n, adj, src, max_hops):
    dist = {src: 0}
    q = deque([src])
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for w in adj.get(u, ()):
            if w not in dist:
                dist[w] = dist[u] + 1
                q.append(w)
    return dist


def run(spark, n, edges, landmarks, max_hops=32, P=3):
    verts = spark.createDataFrame([(i, 0) for i in range(n)], "id long, label int")
    e = spark.createDataFrame(sorted(edges), "src long, dst long")
    out, _ = landmark_distances(
        spark, verts, e, landmarks, max_hops=max_hops, num_partitions=P
    )
    return {r["id"]: tuple(r[f"d{b}"] for b in range(len(landmarks))) for r in out.collect()}


def test_landmarks_random_matches_bfs(spark):
    rng = random.Random(5)
    n = 40
    edges = {(a, b) for a in range(n) for b in range(n) if a != b and rng.random() < 0.06}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    lms = [0, 13, 37]
    got = run(spark, n, edges, lms)
    for v in range(n):
        want = tuple(bfs(n, adj, lm, 32).get(v, -1) for lm in lms)
        assert got[v] == want, (v, got[v], want)


def test_landmarks_hop_bound(spark):
    # path graph, bound 3: vertices beyond hop 3 read -1
    n = 8
    edges = [(i, i + 1) for i in range(n - 1)]
    got = run(spark, n, edges, [0], max_hops=3, P=2)
    assert got == {i: ((i,) if i <= 3 else (-1,)) for i in range(n)}


def test_landmarks_every_vertex_has_a_row(spark):
    # feature-matrix contract: isolated vertices still carry a row of -1s
    got = run(spark, 5, [(0, 1), (1, 0)], [0, 3], P=2)
    assert got[4] == (-1, -1) and got[3] == (-1, 0) and len(got) == 5


def test_closeness_matches_python(spark):
    """Landmark-sampled closeness == python BFS replay (reached/dist_sum),
    including unreached (0.0) and self-landmark exclusion."""
    from subgraph_isomorphism_pregel_spark.operators.sssp import (
        closeness_centrality,
    )

    rng = random.Random(23)
    n = 30
    pairs = {(u, v) for u in range(n) for v in range(u + 1, n) if rng.random() < 0.1}
    edges = set()
    for u, v in pairs:
        edges.add((u, v))
        edges.add((v, u))
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    lms = [0, 7, 19]
    verts = spark.createDataFrame([(i, 0) for i in range(n)], "id long, label int")
    e = spark.createDataFrame(sorted(edges), "src long, dst long")
    out, _ = closeness_centrality(spark, verts, e, lms, max_hops=32, num_partitions=3)
    got = {
        r["id"]: (r["reached"], r["dist_sum"], r["closeness"])
        for r in out.collect()
    }
    dists = [bfs(n, adj, s, 32) for s in lms]
    for v in range(n):
        ds = [d[v] for d in dists if d.get(v, 0) > 0]
        want = (len(ds), sum(ds), (len(ds) / sum(ds)) if ds else 0.0)
        assert got[v] == want, v
