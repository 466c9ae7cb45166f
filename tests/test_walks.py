"""Deterministic random walks vs a pure-python replay of the hash-argmin
rule, plus dead-end and stability properties."""

import hashlib
from collections import defaultdict

import pytest

from subgraph_isomorphism_pregel_spark.operators.walks import random_walks


def walk_oracle(es, walk_len, walks_per_vertex, salt=""):
    out_nbrs = defaultdict(set)
    for s, t in es:
        out_nbrs[s].add(t)
    rows = []
    for o in sorted(out_nbrs):
        for w in range(walks_per_vertex):
            cur = o
            rows.append((o, w, 0, o))
            for t in range(1, walk_len + 1):
                nbrs = sorted(out_nbrs.get(cur, ()))
                if not nbrs:
                    break
                cur = min(
                    nbrs,
                    key=lambda v: (
                        hashlib.md5(f"{o}:{w}:{t}:{v}:{salt}".encode()).hexdigest(),
                        v,
                    ),
                )
                rows.append((o, w, t, cur))
    return sorted(rows)


@pytest.fixture(scope="module")
def graph(spark):
    es = [(i, (i + 1) % 20) for i in range(20)] + [(i, (i + 7) % 20) for i in range(20)]
    es += [(b, a) for a, b in es]
    es = sorted(set(es))
    return spark.createDataFrame(es, "src long, dst long"), es


def test_walks_match_python_replay(spark, graph):
    e, es = graph
    got = sorted(
        (r["origin"], r["walk_no"], r["step"], r["node"])
        for r in random_walks(e, walk_len=5, walks_per_vertex=3, salt="s").collect()
    )
    assert got == walk_oracle(es, 5, 3, salt="s")
    # every (origin, walk) has exactly walk_len+1 positions (no dead ends here)
    from collections import Counter

    c = Counter((o, w) for o, w, _, _ in got)
    assert set(c.values()) == {6}


def test_walks_stable_under_repartition_and_salted(spark, graph):
    e, es = graph
    a = sorted(map(tuple, random_walks(e, 3, 2, salt="x").collect()))
    b = sorted(map(tuple, random_walks(e.repartition(9), 3, 2, salt="x").collect()))
    assert a == b
    c = sorted(map(tuple, random_walks(e, 3, 2, salt="y").collect()))
    assert a != c


def test_walks_dead_end_stops_early(spark):
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = sorted(
        (r["origin"], r["step"], r["node"])
        for r in random_walks(e, walk_len=5, walks_per_vertex=1).collect()
    )
    # origin 0 walks 0->1->2 then stops (2 has no out-edges); origin 1: 1->2
    assert got == [(0, 0, 0), (0, 1, 1), (0, 2, 2), (1, 0, 1), (1, 1, 2)]


def test_walks_bad_inputs(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        random_walks(e, walk_len=0)


def test_node2vec_matches_python_replay(spark):
    import hashlib

    from subgraph_isomorphism_pregel_spark.operators.walks import node2vec_walks

    import random as _random

    rng = _random.Random(3)
    n = 25
    edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(120)})
    edges = [(a, b) for a, b in edges if a != b]
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    for s in adj:
        adj[s].sort()
    eset = set(edges)
    p, q, T, salt = 4.0, 0.25, 4, "nv"

    def replay(origin, walk_no):
        path = [origin]
        cur, prev = origin, None
        for t in range(1, T + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            ws = []
            for d in nbrs:
                if prev is None:
                    ws.append(1.0)
                elif d == prev:
                    ws.append(1.0 / p)
                elif (prev, d) in eset:
                    ws.append(1.0)
                else:
                    ws.append(1.0 / q)
            u = int(
                hashlib.md5(f"{origin}:{walk_no}:{t}:{salt}".encode()).hexdigest()[:8],
                16,
            ) / float(16**8)
            tot = sum(ws)
            cw = 0.0
            pick = nbrs[-1]
            for d, w in zip(nbrs, ws):
                cw += w
                if cw >= u * tot:
                    pick = d
                    break
            path.append(pick)
            prev, cur = cur, pick
        return path

    e = spark.createDataFrame(edges, "src long, dst long")
    got = node2vec_walks(e, walk_len=T, p=p, q=q, walks_per_vertex=2, salt=salt)
    rows = got.collect()
    walks = {}
    for r in rows:
        walks.setdefault((r["origin"], r["walk_no"]), {})[r["step"]] = r["node"]
    assert walks
    for (o, w), steps in walks.items():
        path = [steps[i] for i in sorted(steps)]
        assert path == replay(o, w), (o, w, path, replay(o, w))


def test_node2vec_rejects_bad_params(spark):
    from subgraph_isomorphism_pregel_spark.operators.walks import node2vec_walks

    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        node2vec_walks(e, walk_len=0)
    with _pytest.raises(ValueError):
        node2vec_walks(e, p=0.0)
