"""Link-graph algorithms vs independent oracles on the toy graph and a seeded
random graph (SURVEY.md §5 items 1-3)."""

import random

import numpy as np
import pytest

from subgraph_isomorphism_pregel_spark.operators.components import connected_components
from subgraph_isomorphism_pregel_spark.operators.hits import hits
from subgraph_isomorphism_pregel_spark.operators.labelprop import label_propagation
from subgraph_isomorphism_pregel_spark.operators.linkpred import adamic_adar_topk
from subgraph_isomorphism_pregel_spark.operators.pagerank import (
    pagerank,
    personalized_pagerank,
)
from subgraph_isomorphism_pregel_spark.operators.triangles import (
    clustering_coefficient,
    triangle_count,
    triangles_per_vertex,
)
from subgraph_isomorphism_pregel_spark.sources.graph import toy_graph

from .oracles import (
    components_oracle,
    hits_oracle,
    lp_oracle,
    pagerank_oracle,
    ppr_oracle,
    triangles_oracle,
)


def random_graph(n=60, p=0.08, seed=0, extra_isolated=2):
    rng = random.Random(seed)
    vs = list(range(n + extra_isolated))
    es = set()
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < p:
                es.add((i, j))
                es.add((j, i))
    return vs, sorted(es)


def to_dfs(spark, vs, es):
    vertices = spark.createDataFrame([(v, v % 4) for v in vs], "id long, label int")
    edges = spark.createDataFrame(es, "src long, dst long")
    return vertices, edges


@pytest.fixture(scope="module", params=["toy", "random"])
def graph(request, spark):
    if request.param == "toy":
        v, e = toy_graph(spark)
        vs = [r["id"] for r in v.collect()]
        es = [(r["src"], r["dst"]) for r in e.collect()]
        return v, e, vs, es
    vs, es = random_graph()
    v, e = to_dfs(spark, vs, es)
    return v, e, vs, es


def test_pagerank_matches_oracle(spark, graph):
    v, e, vs, es = graph
    scores, metrics = pagerank(spark, v, e, num_partitions=8, tol=1e-9)
    got = {r["id"]: r["score"] for r in scores.collect()}
    want = pagerank_oracle(vs, es, tol=1e-9)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, k
    # ranks are a probability distribution
    assert abs(sum(got.values()) - 1.0) < 1e-6
    assert len(metrics) > 0
    assert {m["superstep"] for m in metrics}  # metrics rows per superstep/partition


def test_ppr_matches_oracle(spark, graph):
    """Personalized PageRank vs the numpy oracle; the random graph's seed set
    includes an ISOLATED vertex so the dangling-seed carry0 path (initial
    dangling mass = |dangling seeds|/|S|) is exercised, and isolated
    non-seed vertices stay at exactly 0."""
    v, e, vs, es = graph
    srcs = {s for s, _ in es}
    isolated = [x for x in sorted(vs) if x not in srcs]
    seeds = sorted(vs)[:3] + isolated[:1]
    scores, metrics = personalized_pagerank(
        spark, v, e, seeds, num_partitions=8, tol=1e-9
    )
    got = {r["id"]: r["score"] for r in scores.collect()}
    want = ppr_oracle(vs, es, seeds, tol=1e-9)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, k
    # PPR mass is a probability distribution concentrated near the seeds
    assert abs(sum(got.values()) - 1.0) < 1e-6
    for x in isolated[1:]:
        assert got[x] == 0.0
    assert len(metrics) > 0


def test_ppr_empty_seeds_raises(spark):
    v, e = to_dfs(spark, [0, 1], [(0, 1), (1, 0)])
    with pytest.raises(ValueError):
        personalized_pagerank(spark, v, e, [])


def test_hits_matches_oracle(spark, graph):
    """HITS on the DIRECTED edge list (roles are asymmetric even though the
    fixture is symmetrized — every vertex carries both) vs the numpy oracle."""
    v, e, vs, es = graph
    scored, metrics = hits(spark, e, steps=4, num_partitions=8)
    got = {(r["id"], r["role"]): r["score"] for r in scored.collect()}
    want = hits_oracle(es, steps=4)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    # each role is a unit vector
    for role in ("hub", "auth"):
        ss = sum(s * s for (i, r), s in got.items() if r == role)
        assert abs(ss - 1.0) < 1e-9
    assert len(metrics) > 0


def test_hits_bipartite_asymmetric(spark):
    """On a truly directed bipartite graph the hub and auth supports are
    disjoint and the strongest authority is the most-cited one."""
    es = [(1, 10), (1, 11), (2, 10), (3, 10), (3, 12)]
    e = spark.createDataFrame(es, "src long, dst long")
    scored, _ = hits(spark, e, steps=5, num_partitions=4)
    got = {(r["id"], r["role"]): r["score"] for r in scored.collect()}
    want = hits_oracle(es, steps=5)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    auths = {i: s for (i, r), s in got.items() if r == "auth"}
    assert max(auths, key=auths.get) == 10
    hubs = {i for (i, r) in got if r == "hub"}
    assert hubs == {1, 2, 3}


def adamic_adar_brute(es, k):
    import math
    from collections import defaultdict

    nbrs = defaultdict(set)
    for s, t in es:
        if s != t:
            nbrs[s].add(t)
            nbrs[t].add(s)
    rows = []
    ids = sorted(nbrs)
    for i, u in enumerate(ids):
        for v in ids[i + 1 :]:
            if v in nbrs[u]:
                continue
            common = nbrs[u] & nbrs[v]
            if not common:
                continue
            aa = round(sum(1.0 / math.log(len(nbrs[z])) for z in common), 6)
            rows.append((u, v, len(common), aa))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return [(u, v, cn, aa, i + 1) for i, (u, v, cn, aa) in enumerate(rows[:k])]


def test_adamic_adar_matches_brute_force(spark, graph):
    v, e, vs, es = graph
    got = [
        (r["u"], r["v"], r["cn"], r["aa_r"], r["rank"])
        for r in adamic_adar_topk(e, k=15).orderBy("rank").collect()
    ]
    assert got == adamic_adar_brute(es, 15)


def test_adamic_adar_hub_filter(spark):
    """A hub center above max_center_degree contributes no wedges."""
    es = [(0, i) for i in range(1, 8)] + [(1, 9), (2, 9)]
    sym = es + [(b, a) for a, b in es]
    e = spark.createDataFrame(sym, "src long, dst long")
    full = adamic_adar_topk(e, k=100).collect()
    filt = adamic_adar_topk(e, k=100, max_center_degree=5).orderBy("rank").collect()
    # unfiltered: the 21 pairs among 1..7 scored through hub 0 (plus more);
    # filtered: hub 0 is excluded as a center, leaving (0,9) through the
    # deg-2 centers 1 and 2, and (1,2) through center 9
    assert len(full) > 21
    assert [(r["u"], r["v"], r["cn"]) for r in filt] == [(0, 9, 2), (1, 2, 1)]


def jaccard_brute(es, k):
    from collections import defaultdict

    nbrs = defaultdict(set)
    for s, t in es:
        if s != t:
            nbrs[s].add(t)
            nbrs[t].add(s)
    rows = []
    ids = sorted(nbrs)
    for i, u in enumerate(ids):
        for v in ids[i + 1 :]:
            if v in nbrs[u]:
                continue
            cn = len(nbrs[u] & nbrs[v])
            if not cn:
                continue
            jac = round(cn / len(nbrs[u] | nbrs[v]), 6)
            rows.append((u, v, cn, jac))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return [(u, v, cn, j, i + 1) for i, (u, v, cn, j) in enumerate(rows[:k])]


def test_jaccard_topk_matches_brute_force(spark, graph):
    from subgraph_isomorphism_pregel_spark.operators.linkpred import jaccard_topk

    v, e, vs, es = graph
    got = [
        (r["u"], r["v"], r["cn"], r["jac_r"], r["rank"])
        for r in jaccard_topk(e, k=15).orderBy("rank").collect()
    ]
    assert got == jaccard_brute(es, 15)


def test_jaccard_topk_hub_filter_and_contracts(spark):
    """Pruning a hub CENTER shrinks cn but never the endpoint degrees —
    pruned Jaccard is a lower bound on the exact score."""
    import pytest as _pytest

    from subgraph_isomorphism_pregel_spark.operators.linkpred import jaccard_topk

    es = [(0, i) for i in range(1, 8)] + [(1, 9), (2, 9)]
    sym = es + [(b, a) for a, b in es]
    e = spark.createDataFrame(sym, "src long, dst long")
    full = {(r["u"], r["v"]): r["jac_r"] for r in jaccard_topk(e, k=100).collect()}
    filt = {
        (r["u"], r["v"]): r["jac_r"]
        for r in jaccard_topk(e, k=100, max_center_degree=5).collect()
    }
    assert set(filt) <= set(full)
    for p, jac in filt.items():
        assert jac <= full[p] + 1e-12, p
    # exact spot value on the unfiltered graph: u=1 (nbrs {0,9}),
    # v=2 (nbrs {0,9}) share both neighbors -> jac = 2/2 = 1.0
    assert full[(1, 2)] == 1.0
    with _pytest.raises(ValueError):
        jaccard_topk(e, k=0)


def test_connected_components_matches_oracle(spark, graph):
    v, e, vs, es = graph
    comp, _ = connected_components(spark, v, e, num_partitions=8)
    got = {r["id"]: r["component"] for r in comp.collect()}
    want = components_oracle(vs, es)
    assert got == want


def test_label_propagation_matches_oracle(spark, graph):
    v, e, vs, es = graph
    lp, _ = label_propagation(spark, v, e, rounds=3, num_partitions=8)
    got = {r["id"]: r["lp_label"] for r in lp.collect()}
    want = lp_oracle(vs, es, rounds=3)
    assert got == want


def test_triangles_match_oracle(spark, graph):
    v, e, vs, es = graph
    total, per = triangles_oracle(vs, es)
    assert triangle_count(spark, e) == total
    got = {r["id"]: r["tri"] for r in triangles_per_vertex(spark, v, e).collect()}
    assert got == per
    # triangle identity: 3 * triangles == closed wedges
    assert sum(got.values()) == 3 * total


def test_kclique_count_matches_brute_force(spark, graph):
    """Ordered-extension k-clique counting vs itertools enumeration for
    k in {3, 4, 5}; k=3 must equal the dedicated triangle plan."""
    from itertools import combinations

    from subgraph_isomorphism_pregel_spark.operators.triangles import kclique_count

    v, e, vs, es = graph
    eset = {(s, t) for s, t in es if s != t}
    nbrs = {}
    for s, t in eset:
        nbrs.setdefault(s, set()).add(t)

    def brute(k):
        cnt = 0
        for combo in combinations(sorted(nbrs), k):
            if all((a, b) in eset for a, b in combinations(combo, 2)):
                cnt += 1
        return cnt

    for k in (3, 4, 5):
        assert kclique_count(spark, e, k=k) == brute(k), k
    assert kclique_count(spark, e, k=3) == triangle_count(spark, e)


def test_kclique_count_planted_clique(spark):
    """A planted 7-clique plus a disjoint path: counts are the exact
    binomials C(7,k); the path contributes nothing for k >= 3."""
    from math import comb

    from subgraph_isomorphism_pregel_spark.operators.triangles import kclique_count

    es = set()
    for i in range(7):
        for j in range(7):
            if i != j:
                es.add((i, j))
    for i in range(100, 110):  # disjoint path, no cliques beyond edges
        es.add((i, i + 1))
        es.add((i + 1, i))
    e = spark.createDataFrame(sorted(es), "src long, dst long")
    for k in (3, 4, 5, 6, 7):
        assert kclique_count(spark, e, k=k) == comb(7, k), k
    assert kclique_count(spark, e, k=8) == 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        kclique_count(spark, e, k=2)


def test_clustering_coefficient(spark, graph):
    """coeff = tri / C(deg,2) against a brute-force recomputation; isolated
    vertices (deg < 2) report exactly 0.0."""
    from collections import defaultdict

    v, e, vs, es = graph
    _, per = triangles_oracle(vs, es)
    nbrs = defaultdict(set)
    for s, t in es:
        if s != t:
            nbrs[s].add(t)
    got = {
        r["id"]: (r["deg"], r["tri"], r["coeff_r"])
        for r in clustering_coefficient(spark, v, e).collect()
    }
    assert set(got) == set(vs)
    for x in vs:
        d = len(nbrs.get(x, ()))
        want = round(per[x] / (d * (d - 1) / 2.0), 6) if d >= 2 else 0.0
        assert got[x] == (d, per[x], want), x
    # coefficients live in [0, 1]
    assert all(0.0 <= c <= 1.0 for _, _, c in got.values())


def test_partitioning_invariance(spark):
    """Same results at 1, 4, 8 partitions — the most important property
    (SURVEY.md §5.3)."""
    vs, es = random_graph(n=40, seed=3)
    v, e = to_dfs(spark, vs, es)
    results = []
    for P in (1, 4, 8):
        scores, _ = pagerank(spark, v, e, num_partitions=P, fixed_steps=20)
        results.append({r["id"]: r["score"] for r in scores.collect()})
    for other in results[1:]:
        assert set(other) == set(results[0])
        assert all(abs(other[k] - results[0][k]) < 1e-9 for k in other)


def test_sssp_matches_bfs_oracle(spark, graph):
    from collections import deque

    from subgraph_isomorphism_pregel_spark.operators.sssp import sssp

    v, e, vs, es = graph
    src = min(vs)
    dist_df, metrics = sssp(spark, v, e, source=src, max_hops=64, num_partitions=8)
    got = {r["id"]: r["dist"] for r in dist_df.collect()}

    adj = {u: [] for u in vs}
    for a, b in es:
        adj[a].append(b)
    want = {src: 0}
    dq = deque([src])
    while dq:
        u = dq.popleft()
        for w in adj[u]:
            if w not in want:
                want[w] = want[u] + 1
                dq.append(w)
    assert got == want  # unreached vertices carry no row on either side
    # converged (frontier emptied) well before the 64-step bound
    assert max(m["superstep"] for m in metrics) <= max(want.values()) + 1


def test_kcore_matches_peeling_oracle(spark, graph):
    from subgraph_isomorphism_pregel_spark.operators.kcore import kcore

    from .oracles import kcore_oracle

    v, e, vs, es = graph
    for k in (2, 3, 4):
        core_df, metrics = kcore(spark, v, e, k=k, num_partitions=8)
        got = {r["id"] for r in core_df.collect()}
        want = kcore_oracle(vs, es, k)
        assert got == want, (k, sorted(got ^ want))
    # a large k empties every fixture graph
    core_df, _ = kcore(spark, v, e, k=10**6, num_partitions=8)
    assert core_df.count() == 0


def test_kcore_partitioning_invariance(spark):
    from subgraph_isomorphism_pregel_spark.operators.kcore import kcore

    vs, es = random_graph(n=40, seed=3)
    v, e = to_dfs(spark, vs, es)
    results = []
    for P in (1, 4, 8):
        core_df, _ = kcore(spark, v, e, k=3, num_partitions=P)
        results.append({r["id"] for r in core_df.collect()})
    assert results[0] == results[1] == results[2]


def test_weighted_sssp_matches_dijkstra(spark, graph):
    from subgraph_isomorphism_pregel_spark.operators.sssp import weighted_sssp

    from .oracles import weighted_sssp_oracle

    v, e, vs, es = graph
    src = min(vs)
    d, metrics = weighted_sssp(spark, v, e, source=src, num_partitions=8)
    got = {r["id"]: r["dist"] for r in d.collect()}
    assert got == weighted_sssp_oracle(vs, es, src)
    assert got[src] == 0
    assert len(metrics) > 0


def test_weighted_sssp_custom_weights_and_bound(spark):
    from subgraph_isomorphism_pregel_spark.operators.sssp import weighted_sssp

    # line graph 0-1-2-3 with heavy custom weight; 2-round bound stops at 2 edges
    es = [(0, 1), (1, 2), (2, 3)]
    v = spark.createDataFrame([(i, 0) for i in range(4)], "id long, label int")
    e = spark.createDataFrame(es, "src long, dst long")
    wf = lambda s, d: (d - s) * 0 + 10  # constant 10
    full, _ = weighted_sssp(spark, v, e, source=0, weight_fn=wf, num_partitions=4)
    assert {r["id"]: r["dist"] for r in full.collect()} == {0: 0, 1: 10, 2: 20, 3: 30}
    bounded, _ = weighted_sssp(
        spark, v, e, source=0, max_rounds=2, weight_fn=wf, num_partitions=4
    )
    assert {r["id"]: r["dist"] for r in bounded.collect()} == {0: 0, 1: 10, 2: 20}


def test_weighted_pagerank_matches_python(spark, graph):
    from subgraph_isomorphism_pregel_spark.operators.pagerank import weighted_pagerank

    v, e, vs, es = graph
    scores, _ = weighted_pagerank(spark, v, e, num_partitions=8, fixed_steps=6)
    got = {r["id"]: r["score"] for r in scores.collect()}
    # python replay of the weighted recurrence
    ids = sorted(vs)
    idx = {x: i for i, x in enumerate(ids)}
    n = len(ids)
    import numpy as _np

    w = {(s, t): (s + t) % 7 + 1 for s, t in es}
    wsum = {x: 0.0 for x in ids}
    for (s, t), ww in w.items():
        wsum[s] += ww
    rank = _np.full(n, 1.0 / n)
    for _ in range(6):
        contrib = _np.zeros(n)
        dangling = 0.0
        for x in ids:
            if wsum[x] == 0:
                dangling += rank[idx[x]]
        for (s, t), ww in w.items():
            contrib[idx[t]] += rank[idx[s]] / wsum[s] * ww
        rank = (1 - 0.85) / n + 0.85 * (contrib + dangling / n)
    assert set(got) == set(ids)
    for x in ids:
        assert abs(got[x] - rank[idx[x]]) < 1e-9, x
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_cooccurrence_projection(spark):
    """Hand-built membership table: exact pair weights, item_a < item_b
    orientation, min_weight pruning, and the max_group_size skew guard."""
    from subgraph_isomorphism_pregel_spark.operators.linkpred import (
        cooccurrence_projection,
    )

    rows = [
        # group 1: items 10, 20, 30  -> pairs (10,20) (10,30) (20,30)
        (1, 10), (1, 20), (1, 30),
        # group 2: items 10, 20 (20 duplicated -> distinct collapses it)
        (2, 10), (2, 20), (2, 20),
        # group 3: singleton -> no pairs
        (3, 40),
        # group 4: 5 items -> dropped by max_group_size=4
        (4, 10), (4, 20), (4, 30), (4, 40), (4, 50),
    ]
    m = spark.createDataFrame(rows, ["group_id", "item_id"])
    got = {(r["item_a"], r["item_b"]): r["weight"]
           for r in cooccurrence_projection(m, max_group_size=4).collect()}
    assert got == {(10, 20): 2, (10, 30): 1, (20, 30): 1}
    # min_weight prunes the weight-1 tail
    got2 = {(r["item_a"], r["item_b"]): r["weight"]
            for r in cooccurrence_projection(
                m, max_group_size=4, min_weight=2).collect()}
    assert got2 == {(10, 20): 2}
    # without the guard, group 4 contributes its 10 pairs
    got3 = cooccurrence_projection(m).collect()
    assert {(r["item_a"], r["item_b"]) for r in got3} >= {(40, 50), (30, 40)}
    with pytest.raises(ValueError, match="max_group_size"):
        cooccurrence_projection(m, max_group_size=1)


def test_cooccurrence_projection_random_parity(spark):
    """Seeded random bipartite membership tables: projection == a brute-force
    itertools recomputation, across group-size caps and weight floors."""
    from itertools import combinations

    from subgraph_isomorphism_pregel_spark.operators.linkpred import (
        cooccurrence_projection,
    )

    rng = random.Random(20260819)
    for trial in range(3):
        rows = [(rng.randrange(12), rng.randrange(15)) for _ in range(120)]
        cap = rng.choice([2, 4, 1024])
        floor = rng.choice([1, 2])
        groups = {}
        for g, i in set(rows):
            groups.setdefault(g, set()).add(i)
        want = {}
        for members in groups.values():
            if len(members) > cap:
                continue
            for a, b in combinations(sorted(members), 2):
                want[(a, b)] = want.get((a, b), 0) + 1
        want = {p: w for p, w in want.items() if w >= floor}
        m = spark.createDataFrame(rows, ["group_id", "item_id"])
        got = {(r["item_a"], r["item_b"]): r["weight"]
               for r in cooccurrence_projection(
                   m, max_group_size=cap, min_weight=floor).collect()}
        assert got == want, (trial, cap, floor)


def katz_oracle(vs, es, alpha, steps):
    ids = sorted(vs)
    idx = {x: i for i, x in enumerate(ids)}
    cnt = np.ones(len(ids), dtype=np.int64)
    acc = np.zeros(len(ids))
    for t in range(1, steps + 1):
        new = np.zeros(len(ids), dtype=np.int64)
        for s, d in es:
            new[idx[d]] += cnt[idx[s]]
        cnt = new
        acc = acc + (alpha**t) * cnt.astype(np.float64)
    return {x: acc[idx[x]] for x in ids}


def test_katz_matches_oracle_bit_exact(spark, graph):
    """Truncated Katz == a numpy integer-path-count + fixed-order-fold
    replay, EXACTLY (no tolerance): counts are integers and the float fold
    order is deterministic."""
    from subgraph_isomorphism_pregel_spark.operators.eigen import katz_centrality

    v, e, vs, es = graph
    scores, metrics = katz_centrality(spark, v, e, alpha=0.1, steps=4,
                                      num_partitions=8)
    got = {r["id"]: r["score"] for r in scores.collect()}
    want = katz_oracle(vs, es, alpha=0.1, steps=4)
    assert got == want
    assert len(metrics) > 0


def test_katz_partition_invariance_and_contracts(spark):
    from subgraph_isomorphism_pregel_spark.operators.eigen import katz_centrality

    v, e = toy_graph(spark)
    a = {r["id"]: r["score"]
         for r in katz_centrality(spark, v, e, alpha=0.05, steps=3,
                                  num_partitions=2)[0].collect()}
    b = {r["id"]: r["score"]
         for r in katz_centrality(spark, v, e, alpha=0.05, steps=3,
                                  num_partitions=7)[0].collect()}
    assert a == b  # bit-exact across partitionings (integer scatter sums)
    with pytest.raises(ValueError, match="steps"):
        katz_centrality(spark, v, e, steps=0)
    with pytest.raises(ValueError, match="alpha"):
        katz_centrality(spark, v, e, alpha=1.5)


def test_negative_edges(spark):
    """Negatives are real NON-edges, no self loops, <= k per source, kept in
    candidate-j order, deduplicated per (src, neg_dst), and exactly equal to
    a pure-Python md5 replay; repartitioning does not change the table."""
    import hashlib

    from subgraph_isomorphism_pregel_spark.operators.linkpred import negative_edges

    v, e = toy_graph(spark)
    es = {(r["src"], r["dst"]) for r in e.collect()}
    ids = sorted({x for p in es for x in p})
    n = len(ids)
    k, m, salt = 2, 14, "v1"
    want = []
    for u in sorted({s for s, _ in es}):
        seen, kept = set(), 0
        for j in range(m):
            h = hashlib.md5(f"{u}:{j}:{salt}".encode()).hexdigest()
            t = ids[int(h[:8], 16) % n]
            if t == u or t in seen:
                continue
            seen.add(t)
            if (u, t) in es:
                continue
            want.append((u, t, j))
            kept += 1
            if kept == k:
                break
    got = [tuple(r) for r in negative_edges(e, k=k, salt=salt).collect()]
    assert got == want
    assert all((s, d) not in es and s != d for s, d, _ in got)
    got2 = [tuple(r) for r in negative_edges(e.repartition(13), k=k,
                                             salt=salt).collect()]
    assert got2 == got
    with pytest.raises(ValueError, match="k must"):
        negative_edges(e, k=0)
    with pytest.raises(ValueError, match="oversample"):
        negative_edges(e, k=5, oversample=3)


def bipartite_brute(vs, es):
    """component-min -> (size, is_bipartite) via BFS 2-coloring."""
    from collections import defaultdict, deque

    nbrs = defaultdict(set)
    for s, t in es:
        if s != t:
            nbrs[s].add(t)
            nbrs[t].add(s)
    color, out = {}, {}
    for v0 in sorted(vs):
        if v0 in color:
            continue
        comp, ok, color[v0] = [v0], True, 0
        q = deque([v0])
        while q:
            x = q.popleft()
            for y in nbrs[x]:
                if y not in color:
                    color[y] = 1 - color[x]
                    comp.append(y)
                    q.append(y)
                elif color[y] == color[x]:
                    ok = False
        out[min(comp)] = (len(comp), ok)
    return out


def test_bipartite_components_matches_brute_force(spark, graph):
    from subgraph_isomorphism_pregel_spark.operators.components import (
        bipartite_components,
    )

    v, e, vs, es = graph
    out, metrics = bipartite_components(spark, v, e, num_partitions=8)
    got = {
        r["component"]: (r["n_vertices"], r["is_bipartite"]) for r in out.collect()
    }
    assert got == bipartite_brute(vs, es)
    assert len(metrics) > 0  # both CC runs report superstep metrics


def test_bipartite_negative_ids_and_range_guard(spark):
    """Signed id spaces (xxhash64-derived graphs): a NEGATIVE odd cover id
    (2v+1 for v<0) must not drop out of the parity split — pmod, not %.
    An odd 5-cycle and an even 4-cycle, both entirely on negative ids,
    plus one positive-id edge pair crossing zero. Ids near ±2^62 raise."""
    from subgraph_isomorphism_pregel_spark.operators.components import (
        bipartite_components,
    )

    cyc5 = [(-10, -9), (-9, -8), (-8, -7), (-7, -6), (-6, -10)]
    cyc4 = [(-20, -19), (-19, -18), (-18, -17), (-17, -20)]
    bridge = [(-1, 2)]
    und = cyc5 + cyc4 + bridge
    es = und + [(b, a) for a, b in und]
    vs = sorted({x for t in und for x in t})
    v = spark.createDataFrame([(i, 0) for i in vs], "id long, label int")
    e = spark.createDataFrame(es, "src long, dst long")
    out, _ = bipartite_components(spark, v, e, num_partitions=4)
    got = {
        r["component"]: (r["n_vertices"], r["is_bipartite"]) for r in out.collect()
    }
    assert got == bipartite_brute(vs, es)
    assert got[-10] == (5, False) and got[-20] == (4, True) and got[-1] == (2, True)

    vbig = spark.createDataFrame([(1 << 62, 0), (5, 0)], "id long, label int")
    ebig = spark.createDataFrame([(1 << 62, 5), (5, 1 << 62)], "src long, dst long")
    with pytest.raises(ValueError, match="2\\^62"):
        bipartite_components(spark, vbig, ebig, num_partitions=2)


def test_bipartite_multi_ring_closed_form(spark):
    """The disjoint-cycles fixture: ring r has (n-1-r)//17 + 1 members and
    is bipartite iff that is even — the formula the DuckDB oracle uses."""
    from subgraph_isomorphism_pregel_spark.operators.components import (
        bipartite_components,
    )
    from subgraph_isomorphism_pregel_spark.sources.graph import multi_ring_graph

    v, e = multi_ring_graph(spark, "/root/testdata/sf0.001")
    n = v.count()
    out, _ = bipartite_components(spark, v, e, num_partitions=4)
    got = {
        r["component"]: (r["n_vertices"], r["is_bipartite"]) for r in out.collect()
    }
    want = {
        r: ((n - 1 - r) // 17 + 1, ((n - 1 - r) // 17 + 1) % 2 == 0)
        for r in range(17)
    }
    assert got == want
    assert len({b for _, b in got.values()}) == 2  # both verdicts present


def test_bipartite_even_cycle_and_odd_chord(spark):
    """A 6-cycle is bipartite; adding one chord that creates an odd cycle
    flips the verdict for the whole component."""
    from subgraph_isomorphism_pregel_spark.operators.components import (
        bipartite_components,
    )
    from subgraph_isomorphism_pregel_spark.sources.graph import symmetrize

    cyc = [(i, (i + 1) % 6) for i in range(6)]
    v = spark.createDataFrame(
        [(i, 0) for i in range(6)], "id long, label int"
    )
    e = symmetrize(spark.createDataFrame(cyc, "src long, dst long"))
    (row,) = bipartite_components(spark, v, e, num_partitions=2)[0].collect()
    assert (row["component"], row["n_vertices"], row["is_bipartite"]) == (0, 6, True)
    e2 = symmetrize(spark.createDataFrame(cyc + [(0, 2)], "src long, dst long"))
    (row,) = bipartite_components(spark, v, e2, num_partitions=2)[0].collect()
    assert (row["component"], row["n_vertices"], row["is_bipartite"]) == (0, 6, False)
