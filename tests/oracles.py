"""Pure-numpy/python oracles for the link-graph algorithms and the matcher.

Independent implementations (no Spark) used to cross-check the engine, per
SURVEY.md §5. Semantics definitions live with each engine operator's
docstring; these mirror them exactly.
"""

from __future__ import annotations

import itertools
from collections import Counter, defaultdict

import numpy as np


def pagerank_oracle(vertices, edges, d=0.85, tol=1e-6, max_steps=100, fixed_steps=None):
    """vertices: list[int], edges: list[(src, dst)] directed. -> dict id->score."""
    ids = sorted(vertices)
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    out = defaultdict(list)
    for s, t in edges:
        out[s].append(t)
    rank = np.full(n, 1.0 / n)
    steps = fixed_steps if fixed_steps is not None else max_steps
    for _ in range(steps):
        contrib = np.zeros(n)
        dangling = 0.0
        for v in ids:
            i = idx[v]
            nbrs = out.get(v)
            if nbrs:
                share = rank[i] / len(nbrs)
                for t in nbrs:
                    contrib[idx[t]] += share
            else:
                dangling += rank[i]
        new = (1 - d) / n + d * (contrib + dangling / n)
        delta = np.abs(new - rank).max()
        rank = new
        if fixed_steps is None and delta < tol:
            break
    return {v: rank[idx[v]] for v in ids}


def ppr_oracle(vertices, edges, seeds, d=0.85, tol=1e-6, max_steps=100, fixed_steps=None):
    """Personalized PageRank: teleport uniform over the seed set, dangling
    mass returned to the seeds. -> dict id->score."""
    ids = sorted(vertices)
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    out = defaultdict(list)
    for s, t in edges:
        out[s].append(t)
    seed_set = sorted(set(seeds))
    tele = np.zeros(n)
    for s in seed_set:
        tele[idx[s]] = 1.0 / len(seed_set)
    rank = tele.copy()
    steps = fixed_steps if fixed_steps is not None else max_steps
    for _ in range(steps):
        contrib = np.zeros(n)
        dangling = 0.0
        for v in ids:
            i = idx[v]
            nbrs = out.get(v)
            if nbrs:
                share = rank[i] / len(nbrs)
                for t in nbrs:
                    contrib[idx[t]] += share
            else:
                dangling += rank[i]
        new = (1 - d) * tele + d * (contrib + dangling * tele)
        delta = np.abs(new - rank).max()
        rank = new
        if fixed_steps is None and delta < tol:
            break
    return {v: rank[idx[v]] for v in ids}


def hits_oracle(edges, steps=5):
    """HITS, simultaneous normalized power iteration (see operators/hits.py).
    -> dict (id, role)->score with role in {'hub','auth'}, each role
    L2-normalized at the end."""
    edges = sorted(set(edges))
    out = defaultdict(list)
    inn = defaultdict(list)
    for s, t in edges:
        out[s].append(t)
        inn[t].append(s)
    h = {u: 1.0 for u in out}
    a = {v: 1.0 for v in inn}
    for _ in range(steps):
        hn = np.sqrt(sum(x * x for x in h.values()))
        an = np.sqrt(sum(x * x for x in a.values()))
        na = {v: sum(h[u] / hn for u in inn[v]) for v in a}
        nh = {u: sum(a[v] / an for v in out[u]) for u in h}
        h, a = nh, na
    hn = np.sqrt(sum(x * x for x in h.values())) or 1.0
    an = np.sqrt(sum(x * x for x in a.values())) or 1.0
    res = {(u, "hub"): x / hn for u, x in h.items()}
    res.update({(v, "auth"): x / an for v, x in a.items()})
    return res


def components_oracle(vertices, edges):
    """Min-id connected components via union-find. -> dict id->component(min id)."""
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, t in edges:
        rs, rt = find(s), find(t)
        if rs != rt:
            parent[max(rs, rt)] = min(rs, rt)
    return {v: find(v) for v in vertices}


def lp_oracle(vertices, edges, rounds=3):
    """Synchronous LP, init=id, argmax count w/ min-label tie-break."""
    adj = defaultdict(list)
    for s, t in edges:
        adj[s].append(t)
    lab = {v: v for v in vertices}
    for _ in range(rounds):
        new = {}
        for v in vertices:
            nbrs = adj.get(v)
            if not nbrs:
                new[v] = lab[v]
                continue
            cnt = Counter(lab[u] for u in nbrs)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lab = new
    return lab


def triangles_oracle(vertices, edges):
    """-> (global count, dict id->per-vertex count). edges both directions."""
    adj = defaultdict(set)
    for s, t in edges:
        if s != t:
            adj[s].add(t)
            adj[t].add(s)
    per = {v: 0 for v in vertices}
    total = 0
    vs = sorted(vertices)
    for u in vs:
        for v in adj[u]:
            if v <= u:
                continue
            common = adj[u] & adj[v]
            for w in common:
                if w > v:
                    total += 1
                    per[u] += 1
                    per[v] += 1
                    per[w] += 1
    return total, per


def match_count_oracle(data_v, data_e, query_v, query_e):
    """Brute-force labeled subgraph-isomorphism count (injective mappings).

    data_v/query_v: dict id->label; data_e/query_e: set of (u,v) both dirs.
    Counts mappings f: V(Q)->V(G), injective, label-preserving, such that
    every query edge maps to a data edge. This is the quantity the reference
    prints as "Mapping count" (/root/reference/README.md:83)."""
    qv = sorted(query_v)
    de = set(data_e)
    by_label = defaultdict(list)
    for v, l in data_v.items():
        by_label[l].append(v)
    count = 0

    def extend(i, mapping):
        nonlocal count
        if i == len(qv):
            count += 1
            return
        u = qv[i]
        for v in by_label[query_v[u]]:
            if v in mapping.values():
                continue
            ok = True
            for (a, b) in query_e:
                if a == u and b in mapping and (v, mapping[b]) not in de:
                    ok = False
                    break
                if b == u and a in mapping and (mapping[a], v) not in de:
                    ok = False
                    break
            if ok:
                mapping[u] = v
                extend(i + 1, mapping)
                del mapping[u]

    extend(0, {})
    return count


def kcore_oracle(vertices, edges, k):
    """Pure-Python peeling: the set of vertex ids in the k-core."""
    nbrs = {v: set() for v in vertices}
    for a, b in edges:
        nbrs[a].add(b)
    alive = set(vertices)
    while True:
        drop = {v for v in alive if sum(1 for w in nbrs[v] if w in alive) < k}
        if not drop:
            return alive
        alive -= drop


def weighted_sssp_oracle(vertices, edges, source, weight=lambda s, d: (s + d) % 7 + 1):
    """Dijkstra (heap) — independent of the engine's Bellman-Ford shape."""
    import heapq

    adj = defaultdict(list)
    for s, t in edges:
        adj[s].append((t, weight(s, t)))
    dist = {source: 0}
    pq = [(0, source)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj[u]:
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist
