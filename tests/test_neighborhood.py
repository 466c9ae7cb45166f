"""K-hop ego-nets and sampled neighborhoods vs pure-python replays."""

import hashlib
from collections import defaultdict

import pytest

from subgraph_isomorphism_pregel_spark.operators.neighborhood import khop_neighbors


def khop_oracle(es, k, starts, fanout=None, salt=""):
    out_nbrs = defaultdict(set)
    for s, t in es:
        out_nbrs[s].add(t)
    rows = []
    for o in starts:
        seen = {o}
        frontier = {o}
        rows.append((o, o, 0))
        for t in range(1, k + 1):
            cand = set()
            for cur in frontier:
                nbrs = sorted(out_nbrs.get(cur, ()))
                if fanout is not None:
                    nbrs = sorted(
                        nbrs,
                        key=lambda v: (
                            hashlib.md5(f"{o}:{t}:{cur}:{v}:{salt}".encode()).hexdigest(),
                            v,
                        ),
                    )[:fanout]
                cand.update(nbrs)
            new = cand - seen
            rows.extend((o, v, t) for v in sorted(new))
            seen |= new
            frontier = new
    return sorted(rows)


@pytest.fixture(scope="module")
def graph(spark):
    es = [(i, (i + 1) % 30) for i in range(30)] + [(i, (i + 11) % 30) for i in range(30)]
    es += [(b, a) for a, b in es]
    es = sorted(set(es))
    return spark.createDataFrame(es, "src long, dst long"), es


def starts_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_khop_exact_matches_bfs(spark, graph):
    e, es = graph
    got = sorted(
        (r["origin"], r["node"], r["dist"])
        for r in khop_neighbors(e, k=3, starts=starts_df(spark, [0, 7])).collect()
    )
    assert got == khop_oracle(es, 3, [0, 7])
    # dist is the BFS shortest distance: dist 1 nodes are exactly N(origin)
    n0 = {v for o, v, d in got if o == 0 and d == 1}
    assert n0 == {1, 11, 29, 19}


def test_khop_sampled_matches_replay_and_bounds(spark, graph):
    e, es = graph
    got = sorted(
        (r["origin"], r["node"], r["dist"])
        for r in khop_neighbors(
            e, k=2, starts=starts_df(spark, [0, 5, 9]), fanout=2, salt="z"
        ).collect()
    )
    assert got == khop_oracle(es, 2, [0, 5, 9], fanout=2, salt="z")
    # sampled volume bounded by 1 + 2 + 2*2 per origin
    from collections import Counter

    per_origin = Counter(o for o, _, _ in got)
    assert all(n <= 7 for n in per_origin.values())
    # per-hop fanout list form agrees with the scalar form
    same = sorted(
        (r["origin"], r["node"], r["dist"])
        for r in khop_neighbors(
            e, k=2, starts=starts_df(spark, [0, 5, 9]), fanout=[2, 2], salt="z"
        ).collect()
    )
    assert same == got


def test_khop_stable_under_repartition(spark, graph):
    e, es = graph
    a = sorted(
        map(tuple, khop_neighbors(e, 2, starts_df(spark, [3]), fanout=2, salt="q").collect())
    )
    b = sorted(
        map(
            tuple,
            khop_neighbors(
                e.repartition(9), 2, starts_df(spark, [3]), fanout=2, salt="q"
            ).collect(),
        )
    )
    assert a == b


def test_khop_bad_inputs(spark, graph):
    e, _ = graph
    with pytest.raises(ValueError):
        khop_neighbors(e, k=0)
    with pytest.raises(ValueError):
        khop_neighbors(e, k=2, fanout=[1])
