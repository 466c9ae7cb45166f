"""Louvain local moves — oracle is a Python replay of the same
synchronous bucket-scheduled gain rule (integer-exact scores), which the
DataFrame rounds must reproduce exactly; full louvain() adds contraction
parity and planted-community recovery."""

import hashlib
import random

import pytest

from subgraph_isomorphism_pregel_spark.operators.louvain import (
    louvain,
    louvain_local_moves,
)


def _bucket(v, buckets, salt):
    return ord(hashlib.md5(f"{v}:{salt}".encode()).hexdigest()[0]) % buckets


def _sym(edges):
    """{v: {u: w}} from canonical (a, b, w) rows, both directions."""
    adj = {}
    for a, b, w in edges:
        adj.setdefault(a, {})[b] = adj.get(a, {}).get(b, 0) + w
        adj.setdefault(b, {})[a] = adj.get(b, {}).get(a, 0) + w
    return adj


def _moves_oracle(edges, rounds, buckets, salt, selfw=None):
    adj = _sym(edges)
    sw = selfw or {}
    for v in sw:  # a fully-merged supervertex may carry only a self weight
        adj.setdefault(v, {})
    deg = {v: sum(nb.values()) + 2 * sw.get(v, 0) for v, nb in adj.items()}
    m2 = sum(deg.values())
    comm = {v: v for v in adj}
    for r in range(1, rounds + 1):
        tot = {}
        for v in adj:
            tot[comm[v]] = tot.get(comm[v], 0) + deg[v]
        new = dict(comm)
        for v in adj:
            if _bucket(v, buckets, salt) != (r - 1) % buckets:
                continue
            cur = comm[v]
            kvc = {}
            for u, w in adj[v].items():
                kvc[comm[u]] = kvc.get(comm[u], 0) + w
            stay = m2 * kvc.get(cur, 0) - deg[v] * (tot[cur] - deg[v])
            best = None
            for c, k in sorted(kvc.items()):
                s = m2 * k - deg[v] * (tot[c] - (deg[v] if c == cur else 0))
                if best is None or s > best[0]:
                    best = (s, c)
            if best is not None and best[0] > stay:
                new[v] = best[1]
        comm = new
    return comm


def _full_oracle(edges, levels, rounds, buckets, salt):
    e = {}
    for a, b, w in edges:
        if a != b:
            key = (min(a, b), max(a, b))
            e[key] = e.get(key, 0) + w
    cur = [(a, b, w) for (a, b), w in e.items()]
    sw = None
    mapping = None
    for lv in range(levels):
        comm = _moves_oracle(cur, rounds, buckets, f"{salt}:{lv}", selfw=sw)
        mapping = (
            dict(comm)
            if mapping is None
            else {v: comm[c] for v, c in mapping.items()}
        )
        if lv == levels - 1:
            break
        agg = {}
        for a, b, w in cur:
            ca, cb = comm[a], comm[b]
            key = (min(ca, cb), max(ca, cb))
            agg[key] = agg.get(key, 0) + w
        new_sw = {a: w for (a, b), w in agg.items() if a == b}
        # carry the self weights the merging supervertices already held —
        # internal mass is invisible to the inter-vertex edge aggregation
        for v, s in (sw or {}).items():
            c = comm[v]
            new_sw[c] = new_sw.get(c, 0) + s
        sw = new_sw
        cur = [(a, b, w) for (a, b), w in agg.items() if a != b]
    return mapping


def _random_wgraph(seed, n, m, wmax=5):
    rng = random.Random(seed)
    edges = {}
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges[(min(a, b), max(a, b))] = 1 + rng.randrange(wmax)
    return [(a, b, w) for (a, b), w in sorted(edges.items())]


def _sym_df(spark, edges):
    rows = [(a, b, w) for a, b, w in edges] + [(b, a, w) for a, b, w in edges]
    return spark.createDataFrame(rows, "src long, dst long, w long")


@pytest.mark.parametrize(
    "seed,n,m,rounds,buckets,salt",
    [(1, 40, 100, 4, 2, "a"), (2, 70, 200, 6, 3, "b")],
)
def test_local_moves_match_python_replay(spark, seed, n, m, rounds, buckets, salt):
    edges = _random_wgraph(seed, n, m)
    got = {
        r.id: r.comm
        for r in louvain_local_moves(
            _sym_df(spark, edges), rounds, buckets=buckets, salt=salt
        ).collect()
    }
    assert got == _moves_oracle(edges, rounds, buckets, salt)


def test_full_louvain_matches_python_replay(spark):
    edges = _random_wgraph(5, 60, 160)
    got = {
        r.id: r.comm
        for r in louvain(
            _sym_df(spark, edges), levels=2, rounds_per_level=4, salt="f"
        ).collect()
    }
    assert got == _full_oracle(edges, 2, 4, 2, "f")


def test_planted_cliques_recovered_and_modularity_improves(spark):
    # 4 cliques of 8, chained by single weak bridges
    edges = []
    for c in range(4):
        base = c * 8
        for i in range(8):
            for j in range(i + 1, 8):
                edges.append((base + i, base + j, 1))
        if c:
            edges.append((base - 1, base, 1))
    df = _sym_df(spark, edges)
    comm = louvain(df, levels=2, rounds_per_level=8, salt="pc")
    got = {r.id: r.comm for r in comm.collect()}
    # every clique ends up in exactly one community, distinct per clique
    labels = [{got[c * 8 + i] for i in range(8)} for c in range(4)]
    assert all(len(s) == 1 for s in labels)
    assert len({next(iter(s)) for s in labels}) == 4
    from subgraph_isomorphism_pregel_spark.operators.stats import modularity

    q = modularity(comm, df).collect()[0]
    assert q.n_communities == 4
    assert q.q_modularity > 0.6  # singleton labeling scores < 0


def test_partitioning_invariance(spark):
    edges = _random_wgraph(9, 50, 140)
    df = _sym_df(spark, edges)
    a = {r.id: r.comm for r in louvain_local_moves(df, 5, salt="p").collect()}
    b = {
        r.id: r.comm
        for r in louvain_local_moves(df.repartition(13), 5, salt="p").collect()
    }
    assert a == b


def test_unweighted_default_weight_is_one(spark):
    edges = [(a, b, 1) for a, b, _ in _random_wgraph(11, 30, 60)]
    rows = [(a, b) for a, b, _ in edges] + [(b, a) for a, b, _ in edges]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = {r.id: r.comm for r in louvain_local_moves(df, 4, salt="u").collect()}
    assert got == _moves_oracle(edges, 4, 2, "u")


def test_three_level_louvain_carries_self_weights(spark):
    """levels=3 on a graph that fully merges cliques at level 1: the
    contracted supervertices carry internal mass as self weights, which
    must ACCUMULATE through the next contraction (dropping them skews
    every k from level 3 on). Spark vs the corrected python replay."""
    # 6 cliques of 5, chained in a cycle by weak bridges
    edges = []
    for c in range(6):
        base = c * 5
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j, 4))
        edges.append((base + 4, ((c + 1) % 6) * 5, 1))
    got = {
        r.id: r.comm
        for r in louvain(
            _sym_df(spark, edges), levels=3, rounds_per_level=6, salt="l3"
        ).collect()
    }
    assert got == _full_oracle(edges, 3, 6, 2, "l3")
