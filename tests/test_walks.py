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
