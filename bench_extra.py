"""Standalone per-query measurement harness (optimization rounds).

bench.py is FROZEN for driver measurement; this file exists so individual
queries can be timed in isolation (guide §1.4: noop-sink isolation, cold
JVM per invocation), with optional .explain("formatted") capture for the
plans/ evidence directory. Never used by the driver.

Usage:
    python bench_extra.py pagerank_convergence match_twin_paths_pipeline
    python bench_extra.py --repeats 2 corpus_derive_graph
    python bench_extra.py --explain plans/r06 --tag before match_twin_paths_pipeline

Prints one JSON line {"queries": {name: min_sec}, "runs": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from subgraph_isomorphism_pregel_spark.session import get_spark  # noqa: E402
from subgraph_isomorphism_pregel_spark.sources.graph import (  # noqa: E402
    SUPPLIER_ID_OFFSET,
    ring_graph,
    supply_graph,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))

_m = re.search(r"sf([\d.]+)$", os.path.basename(SF_DIR.rstrip("/")))
SF = _m.group(1) if _m else "0.1"

FACT_QV = {1: 0, 2: 1, 3: 2, 4: 1, 5: 2}
FACT_QE = {(1, 2), (2, 1), (2, 3), (3, 2), (1, 4), (4, 1), (4, 5), (5, 4)}
DEEP_QV = {0: 0, 1: 1, 9: 1, 11: 2, 12: 3, 13: 4, 21: 2, 22: 3, 23: 5}
DEEP_QE = set()
for _a, _b in ((0, 1), (0, 9), (1, 11), (11, 12), (12, 13), (1, 21), (21, 22), (22, 23)):
    DEEP_QE |= {(_a, _b), (_b, _a)}


class Ctx:
    """Lazily built shared inputs (mirrors bench.py's persisted graphs)."""

    def __init__(self, spark):
        self.spark = spark
        self._cache = {}

    def supply(self):
        if "supply" not in self._cache:
            sv, se = supply_graph(self.spark, SF_DIR)
            sv, se = sv.persist(), se.persist()
            n = se.count()
            sv.count()
            self._cache["supply"] = (sv, se, n)
        return self._cache["supply"]

    def ring(self):
        if "ring" not in self._cache:
            rv, re_ = ring_graph(self.spark, SF_DIR)
            rv, re_ = rv.persist(), re_.persist()
            re_.count()
            rv.count()
            self._cache["ring"] = (rv, re_)
        return self._cache["ring"]

    def docs(self):
        if "docs" not in self._cache:
            self._cache["docs"] = self.spark.read.parquet(f"{SF_DIR}/documents.parquet")
        return self._cache["docs"]

    def hub(self):
        if "hub" not in self._cache:
            spark = self.spark
            hub_mid = spark.range(1, 301).selectExpr("0 as src", "id as dst")
            hub_leaf = spark.range(1, 301).selectExpr(
                "id as src", "explode(sequence(0, 99)) as j"
            ).selectExpr("src", "100000 + (src * 37 + j * 13) % 2000 as dst")
            hub_t = spark.range(100000, 102000).selectExpr(
                "id as src", "explode(sequence(0, 57)) as k"
            ).selectExpr("src", "200000 + (src * 7 + k * 3) % 500 as dst")
            hub_u4 = spark.range(200000, 200500).selectExpr(
                "id as src", "explode(sequence(0, 4)) as k"
            ).selectExpr("src", "300000 + (src * 3 + k) % 100 as dst")
            hub_u5 = spark.range(200000, 200500).selectExpr(
                "id as src", "explode(sequence(0, 4)) as k"
            ).selectExpr("src", "310000 + (src * 5 + k) % 100 as dst")
            hub_fwd = hub_mid.union(hub_leaf).union(hub_t).union(hub_u4).union(hub_u5)
            hub_e = (
                hub_fwd.union(hub_fwd.selectExpr("dst as src", "src as dst"))
                .distinct()
                .persist()
            )
            hub_v = (
                spark.range(0, 1).selectExpr("id", "0 as label")
                .union(spark.range(1, 301).selectExpr("id", "1 as label"))
                .union(spark.range(100000, 102000).selectExpr("id", "2 as label"))
                .union(spark.range(200000, 200500).selectExpr("id", "3 as label"))
                .union(spark.range(300000, 300100).selectExpr("id", "4 as label"))
                .union(spark.range(310000, 310100).selectExpr("id", "5 as label"))
                .persist()
            )
            hub_e.count(), hub_v.count()
            self._cache["hub"] = (hub_v, hub_e)
        return self._cache["hub"]


def q_build_supply_graph(ctx):
    sv, se = supply_graph(ctx.spark, SF_DIR)
    return se.count() + sv.count()


def q_pagerank_convergence(ctx):
    from subgraph_isomorphism_pregel_spark.operators.pagerank import pagerank

    sv, se, _ = ctx.supply()
    scores, metrics = pagerank(ctx.spark, sv, se, num_partitions=None, tol=1e-6)
    scores.agg(F.sum("score")).collect()
    return max(m["superstep"] for m in metrics)


def q_pagerank_incremental(ctx):
    from subgraph_isomorphism_pregel_spark.operators.pagerank import (
        build_parts,
        pagerank,
        pagerank_warm,
    )
    from subgraph_isomorphism_pregel_spark.operators.pregel import (
        add_vertices,
        auto_partitions,
    )

    sv, se, n_edges = ctx.supply()
    if "pr_scores" not in ctx._cache:
        scores, _ = pagerank(ctx.spark, sv, se, num_partitions=None, tol=1e-6)
        ctx._cache["pr_scores"] = scores
    pr_scores = ctx._cache["pr_scores"]
    P = auto_partitions(n_edges)
    prior = pr_scores.persist()
    n_v = prior.count()
    ex = [int(r["id"]) for r in sv.orderBy("id").limit(8).collect()]
    base = 10**12
    nv = ctx.spark.createDataFrame(
        [(base + i, 0) for i in range(8)], "id long, label int"
    )
    ne = ctx.spark.createDataFrame(
        [(base + i, x) for i, x in enumerate(ex)]
        + [(x, base + i) for i, x in enumerate(ex)],
        "src long, dst long",
    )
    parts = build_parts(ctx.spark, sv, se, P)
    grown = add_vertices(ctx.spark, parts, nv, ne, P)
    scores, mw = pagerank_warm(
        ctx.spark, grown, prior, n_vertices=n_v + 8, num_partitions=P, tol=1e-6
    )
    scores.agg(F.sum("score")).collect()
    prior.unpersist()
    return max(m["superstep"] for m in mw)


def q_connected_components(ctx):
    from subgraph_isomorphism_pregel_spark.operators.components import (
        connected_components,
    )

    sv, se, _ = ctx.supply()
    comp, _ = connected_components(ctx.spark, sv, se, num_partitions=None)
    return comp.agg(F.countDistinct("component")).collect()


def q_label_propagation_k3(ctx):
    from subgraph_isomorphism_pregel_spark.operators.labelprop import label_propagation

    sv, se, _ = ctx.supply()
    lab, _ = label_propagation(ctx.spark, sv, se, rounds=3, num_partitions=None)
    return lab.agg(F.countDistinct("lp_label")).collect()


def q_coreness(ctx):
    from subgraph_isomorphism_pregel_spark.operators.coreness import coreness

    sv, se, _ = ctx.supply()
    core, _ = coreness(ctx.spark, sv, se, num_partitions=None)
    return core.agg(F.max("coreness")).collect()[0][0]


def q_match_twin_paths_pipeline(ctx):
    from subgraph_isomorphism_pregel_spark.operators.match import SubgraphMatcher

    rv, re_ = ctx.ring()
    m = SubgraphMatcher(ctx.spark, rv, re_)
    try:
        return m.count(FACT_QV, FACT_QE, pseudo=True, prune=True)
    finally:
        m.unpersist()


def q_match_factorized_twin_paths(ctx):
    from subgraph_isomorphism_pregel_spark.operators.match import SubgraphMatcher

    rv, re_ = ctx.ring()
    m = SubgraphMatcher(ctx.spark, rv, re_)
    try:
        return m.count_tree_factorized(FACT_QV, FACT_QE)
    finally:
        m.unpersist()


def q_match_query_set(ctx):
    from subgraph_isomorphism_pregel_spark.operators.match import SubgraphMatcher

    rv, re_ = ctx.ring()
    m = SubgraphMatcher(ctx.spark, rv, re_)
    try:
        return [
            m.count({1: 0, 2: 1, 3: 2}, {(1, 2), (2, 1), (2, 3), (3, 2)}, pseudo=False),
            m.count(
                {1: 0, 2: 1, 3: 2},
                {(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)},
                pseudo=False,
            ),
            m.count(
                {1: 0, 2: 1, 3: 2, 4: 3},
                {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (4, 1), (1, 4)},
                pseudo=False,
            ),
            m.count({1: 0, 2: 1, 3: 2}, {(1, 2), (2, 1), (1, 3), (3, 1)}, pseudo=True),
        ]
    finally:
        m.unpersist()


def q_match_deferred_triple(ctx):
    from subgraph_isomorphism_pregel_spark.operators.match import SubgraphMatcher

    rv, re_ = ctx.ring()
    m = SubgraphMatcher(ctx.spark, rv, re_)
    try:
        return m.count(
            {1: 0, 2: 1, 3: 2, 4: 3, 5: 3, 6: 3},
            {(1, 2), (2, 1), (2, 3), (3, 2),
             (1, 4), (4, 1), (2, 5), (5, 2), (3, 6), (6, 3)},
            pseudo=True,
            prune=True,
        )
    finally:
        m.unpersist()


def q_match_factorized_hub(ctx):
    from subgraph_isomorphism_pregel_spark.operators.match import SubgraphMatcher

    hub_v, hub_e = ctx.hub()
    m = SubgraphMatcher(ctx.spark, hub_v, hub_e)
    try:
        return m.count_tree_factorized(FACT_QV, FACT_QE)
    finally:
        m.unpersist()


def q_match_hub_pipeline(ctx):
    from subgraph_isomorphism_pregel_spark.operators.match import SubgraphMatcher

    hub_v, hub_e = ctx.hub()
    m = SubgraphMatcher(ctx.spark, hub_v, hub_e)
    try:
        return m.count(FACT_QV, FACT_QE, pseudo=True, prune=True)
    finally:
        m.unpersist()


def q_match_deep_chain_auto(ctx):
    from subgraph_isomorphism_pregel_spark.operators.match import SubgraphMatcher

    hub_v, hub_e = ctx.hub()
    m = SubgraphMatcher(ctx.spark, hub_v, hub_e)
    try:
        return m.count_tree_factorized(DEEP_QV, DEEP_QE, nested="auto")
    finally:
        m.unpersist()


def q_match_deep_chain_nested_forced(ctx):
    from subgraph_isomorphism_pregel_spark.operators.match import SubgraphMatcher

    hub_v, hub_e = ctx.hub()
    m = SubgraphMatcher(ctx.spark, hub_v, hub_e)
    try:
        return m.count_tree_factorized(DEEP_QV, DEEP_QE, nested=True)
    finally:
        m.unpersist()


def q_corpus_derive_graph(ctx):
    from subgraph_isomorphism_pregel_spark.sources.corpus import corpus_graph

    n_repos = max(20, int(3000 * float(SF)))
    cv, ce = corpus_graph(ctx.spark, n_repos=n_repos, files_per_repo=60, seed=11)
    cv, ce = cv.persist(), ce.persist()
    n = ce.count()
    cv.count()
    ctx._cache["corpus"] = (cv, ce, n)
    return n


def q_corpus_pagerank_8steps(ctx):
    from subgraph_isomorphism_pregel_spark.operators.pagerank import pagerank

    if "corpus" not in ctx._cache:
        q_corpus_derive_graph(ctx)
    cv, ce, _ = ctx._cache["corpus"]
    cscores, _ = pagerank(ctx.spark, cv, ce, num_partitions=None, fixed_steps=8)
    return cscores.agg(F.sum("score")).collect()


def q_greedy_coloring_ring(ctx):
    from subgraph_isomorphism_pregel_spark.operators.coloring import greedy_coloring

    rv, re_ = ctx.ring()
    col, rounds = greedy_coloring(rv, re_, salt="jp1")
    return [col.agg(F.max("color")).collect()[0][0] + 1, rounds]


def q_louvain_ring(ctx):
    from subgraph_isomorphism_pregel_spark.operators.louvain import louvain
    from subgraph_isomorphism_pregel_spark.operators.stats import modularity

    rv, re_ = ctx.ring()
    comm = louvain(re_, levels=2, rounds_per_level=6, salt="lv1")
    q = modularity(comm, re_).collect()[0]
    return [q.n_communities, round(float(q.q_modularity), 6)]


def q_hits_4steps(ctx):
    from subgraph_isomorphism_pregel_spark.operators.hits import hits

    li = ctx.spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    pairs = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + SUPPLIER_ID_OFFSET).alias("dst"),
    ).distinct()
    scored, _ = hits(ctx.spark, pairs, steps=4, num_partitions=None)
    return scored.count()


def q_eigencentrality_4steps(ctx):
    from subgraph_isomorphism_pregel_spark.operators.eigen import eigencentrality

    ev_, ee_ = ring_graph(ctx.spark, SF_DIR)
    scored, _ = eigencentrality(ctx.spark, ev_, ee_, steps=4, num_partitions=None)
    return scored.count()


def q_katz_4steps(ctx):
    from subgraph_isomorphism_pregel_spark.operators.eigen import katz_centrality

    kv_, ke_ = ring_graph(ctx.spark, SF_DIR)
    scored, _ = katz_centrality(ctx.spark, kv_, ke_, alpha=0.05, steps=4, num_partitions=None)
    return scored.count()


def q_hyperball_r3(ctx):
    from subgraph_isomorphism_pregel_spark.operators.hyperball import hyperball

    hv, he = ring_graph(ctx.spark, SF_DIR)
    est, _ = hyperball(ctx.spark, hv, he, radius=3, p=4, num_partitions=None)
    return est.count()


def q_bpe_train_16(ctx):
    from subgraph_isomorphism_pregel_spark.operators.bpe import bpe_train

    mdf, _ = bpe_train(ctx.docs(), 16)
    rows = mdf.orderBy("rank").collect()
    return [len(rows), rows[-1].left + rows[-1].right if rows else ""]


def q_minhash_lsh_dedup(ctx):
    from subgraph_isomorphism_pregel_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(ctx.docs(), num_hashes=12, bands=4, threshold=0.2).count()


def q_pipeline_docs(ctx):
    import __spark_entry__ as entrymod

    return entrymod.q_pipeline_docs(ctx.spark, SF_DIR).count()


def q_maximal_matching_ring(ctx):
    from subgraph_isomorphism_pregel_spark.operators.matching import maximal_matching

    _, re_ = ctx.ring()
    m, rounds = maximal_matching(re_, salt="mm1")
    return [m.count(), rounds]


def q_boruvka_msf_ring(ctx):
    from subgraph_isomorphism_pregel_spark.operators.mst import boruvka_msf
    from subgraph_isomorphism_pregel_spark.sources.graph import weighted_ring_graph

    forest, rounds = boruvka_msf(weighted_ring_graph(ctx.spark, SF_DIR))
    return [forest.count(), rounds]


def q_ktruss_k4_r3(ctx):
    from subgraph_isomorphism_pregel_spark.operators.triangles import ktruss

    _, ke = ring_graph(ctx.spark, SF_DIR)
    return ktruss(ctx.spark, ke, k=4, rounds=3).count()


def q_walks_len4_x2(ctx):
    from subgraph_isomorphism_pregel_spark.operators.walks import random_walks

    wv, we = ring_graph(ctx.spark, SF_DIR)
    return random_walks(
        we, walk_len=4, walks_per_vertex=2, starts=wv.select("id"), salt="w1"
    ).count()


def q_kcore_32(ctx):
    from subgraph_isomorphism_pregel_spark.operators.kcore import kcore

    sv, se, _ = ctx.supply()
    core, _ = kcore(ctx.spark, sv, se, k=32, num_partitions=None)
    return core.count()


def q_triangle_count(ctx):
    from subgraph_isomorphism_pregel_spark.operators.triangles import triangle_count

    _, re_ = ctx.ring()
    return triangle_count(ctx.spark, re_)


def q_corpus_compliance(ctx):
    from subgraph_isomorphism_pregel_spark.operators.codescan import (
        license_detect,
        redact_secrets,
        repo_clone_pairs,
        secret_scan,
        with_license_headers,
    )
    from subgraph_isomorphism_pregel_spark.sources.corpus import synth_corpus

    n_repos = max(20, int(3000 * float(SF)))
    c = with_license_headers(
        synth_corpus(ctx.spark, n_repos=n_repos, files_per_repo=60, seed=11)
    )
    license_detect(c).groupBy("license").count().count()
    assert secret_scan(redact_secrets(c)).where(F.col("n_secrets") > 0).count() == 0
    return repo_clone_pairs(c).count()


QUERIES = {
    name[2:]: fn
    for name, fn in sorted(globals().items())
    if name.startswith("q_") and callable(fn)
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: list)")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()
    if not args.names and not args.all:
        print("\n".join(QUERIES))
        return
    names = list(QUERIES) if args.all else args.names
    spark = get_spark("sip-bench-extra", cores=CPUS, shuffle_partitions=CPUS)
    ctx = Ctx(spark)
    timings, runs, results = {}, {}, {}
    for name in names:
        fn = QUERIES[name]
        ts = []
        for _ in range(args.repeats):
            t0 = time.time()
            results[name] = fn(ctx)
            ts.append(round(time.time() - t0, 3))
        timings[name] = min(ts)
        runs[name] = ts
        print(f"## {name}: {ts}", file=sys.stderr, flush=True)
    print(json.dumps({"queries": timings, "runs": runs, "results": {k: str(v)[:80] for k, v in results.items()}}))


if __name__ == "__main__":
    main()
