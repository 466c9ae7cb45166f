"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec (min over repeats)...},
   "runs": {...per-query raw repeat times...}, "sf": ...,
   "throughput": {...edges/sec, supersteps/sec...}}

Headlines: PageRank to 1e-6 convergence on the supply graph (the north-star
metric: supersteps/sec, edges/sec), connected components, label propagation,
triangle counting, subgraph-match query set on the ring graph, and the
training-data-pipeline ops (MinHash LSH dedup, cosine top-k).

Variance: short queries (<20 s) run SPARK_GRAFT_BENCH_REPEATS times
(default 2) and report the MIN — at 1-7 s scale single-JVM runs carry
15-20% GC/JIT noise, which round 2's n=1-per-process numbers could not
distinguish from regressions; the raw repeat times are kept in "runs" so
the spread is visible. Long convergence runs (PageRank) amortize that
noise over ~40 supersteps and run once.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from subgraph_isomorphism_pregel_spark.operators.components import connected_components  # noqa: E402
from subgraph_isomorphism_pregel_spark.operators.dedup import minhash_lsh_pairs, simhash  # noqa: E402
from subgraph_isomorphism_pregel_spark.operators.labelprop import label_propagation  # noqa: E402
from subgraph_isomorphism_pregel_spark.operators.match import SubgraphMatcher  # noqa: E402
from subgraph_isomorphism_pregel_spark.operators.pagerank import pagerank  # noqa: E402
from subgraph_isomorphism_pregel_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    embedding_dup_pairs_lsh,
)
from subgraph_isomorphism_pregel_spark.operators.triangles import triangle_count  # noqa: E402
from subgraph_isomorphism_pregel_spark.session import get_spark  # noqa: E402
from subgraph_isomorphism_pregel_spark.sources.graph import ring_graph, supply_graph  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("sip-bench", cores=cpus, shuffle_partitions=cpus)

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", 2))
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    throughput: dict[str, float] = {}

    def timed(name):
        """One-shot timing (graph builds with persisted side effects, long
        convergence runs)."""

        class _T:
            def __enter__(self):
                self.t0 = time.time()
                return self

            def __exit__(self, *a):
                t = round(time.time() - self.t0, 3)
                timings[name] = t
                runs[name] = [t]

        return _T()

    def bench(name, fn):
        """Repeat fn while it stays short; record min (and the raw spread)."""
        ts = []
        for i in range(max(repeats, 1)):
            t0 = time.time()
            out = fn()
            ts.append(round(time.time() - t0, 3))
            if ts[-1] >= 20:
                break
        timings[name] = min(ts)
        runs[name] = ts
        return out

    # graph construction (shared, measured separately)
    with timed("build_supply_graph"):
        sv, se = supply_graph(spark, sf_dir)
        sv = sv.persist()
        se = se.persist()
        n_edges = se.count()
        sv.count()

    # num_partitions=None: CSR blocks sized by edge volume (auto_partitions)
    # — at sf0.1 that is P=8, ~25% fewer seconds/superstep than P=cpus=32
    # (per-superstep cost is task-scheduling-bound at this graph size)
    with timed("pagerank_convergence"):
        scores, metrics = pagerank(spark, sv, se, num_partitions=None, tol=1e-6)
        scores.agg(F.sum("score")).collect()
    steps = max(m["superstep"] for m in metrics)
    pr_sec = timings["pagerank_convergence"]
    throughput["pagerank_supersteps_per_sec"] = round(steps / pr_sec, 3)
    throughput["pagerank_edges_per_sec"] = round(steps * n_edges / pr_sec, 1)
    throughput["pagerank_supersteps"] = steps
    throughput["n_edges_supply"] = n_edges

    def run_cc():
        comp, _ = connected_components(spark, sv, se, num_partitions=None)
        return comp.agg(F.countDistinct("component")).collect()

    bench("connected_components", run_cc)

    def run_lp():
        lab, _ = label_propagation(spark, sv, se, rounds=3, num_partitions=None)
        return lab.agg(F.countDistinct("lp_label")).collect()

    bench("label_propagation_k3", run_lp)

    with timed("build_ring_graph"):
        rv, re_ = ring_graph(spark, sf_dir)
        rv = rv.persist()
        re_ = re_.persist()
        ring_edges = re_.count()
    throughput["n_edges_ring"] = ring_edges

    throughput["triangles"] = bench("triangle_count", lambda: triangle_count(spark, re_))

    def run_match_set():
        m = SubgraphMatcher(spark, rv, re_)
        try:
            return [
                m.count(
                    {1: 0, 2: 1, 3: 2}, {(1, 2), (2, 1), (2, 3), (3, 2)}, pseudo=False
                ),
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
                m.count(
                    {1: 0, 2: 1, 3: 2}, {(1, 2), (2, 1), (1, 3), (3, 1)}, pseudo=True
                ),
            ]
        finally:
            m.unpersist()

    throughput["match_counts"] = bench("match_query_set", run_match_set)

    def run_acbc():
        m = SubgraphMatcher(spark, rv, re_)
        try:
            return m.count(
                {1: 0, 2: 1, 3: 2, 4: 1},
                {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)},
                pseudo=True,
                prune=True,
            )
        finally:
            m.unpersist()

    throughput["match_deferred_acbc"] = bench("match_deferred_acbc", run_acbc)

    def run_triple():
        # three same-label leaves under three different parents — the
        # general Venn-atom deferred path (round 3); enumerating these
        # would cube the frontier
        m = SubgraphMatcher(spark, rv, re_)
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

    throughput["match_deferred_triple"] = bench("match_deferred_triple", run_triple)

    # branch-factorized counting (round 4): two 2-node branches with BOTH
    # levels conflicting cross-branch — enumerated independently and
    # assembled by inclusion-exclusion (4 signed join-aggregate terms)
    # instead of materializing the branch cross product; the same query
    # through the join pipeline is the baseline twin
    fact_qv = {1: 0, 2: 1, 3: 2, 4: 1, 5: 2}
    fact_qe = {(1, 2), (2, 1), (2, 3), (3, 2), (1, 4), (4, 1), (4, 5), (5, 4)}

    def run_fact():
        m = SubgraphMatcher(spark, rv, re_)
        try:
            n = m.count_tree_factorized(fact_qv, fact_qe)
            assert n is not None
            return n
        finally:
            m.unpersist()

    def run_fact_pipeline():
        m = SubgraphMatcher(spark, rv, re_)
        try:
            return m.count(fact_qv, fact_qe, pseudo=True, prune=True)
        finally:
            m.unpersist()

    throughput["match_factorized_twin_paths"] = bench(
        "match_factorized_twin_paths", run_fact
    )
    # on the uniform low-degree ring the join pipeline is FASTER (its
    # frontier never blows up; the assembly's extra jobs dominate) — both
    # are measured so the tradeoff stays visible
    assert (
        bench("match_twin_paths_pipeline", run_fact_pipeline)
        == throughput["match_factorized_twin_paths"]
    )

    # where factorization wins: a hub graph where the pipeline frontier is
    # the PRODUCT of the branch counts. 1 anchor (label 0) - 300 mids
    # (label 1) - 100 leaves each from a 2000-leaf shared pool (label 2):
    # per-branch embeddings 30k, pipeline cross product ~9x10^8 rows
    # (measured ~23s at 32 cores), factorized 2x30k branch tables + a
    # 4-term assembly (~4s). Built with spark.range only.
    hub_mid = spark.range(1, 301).selectExpr("0 as src", "id as dst")
    hub_leaf = spark.range(1, 301).selectExpr(
        "id as src", "explode(sequence(0, 99)) as j"
    ).selectExpr("src", "100000 + (src * 37 + j * 13) % 2000 as dst")
    hub_e = (
        hub_mid.union(hub_leaf)
        .union(hub_mid.selectExpr("dst as src", "src as dst"))
        .union(hub_leaf.selectExpr("dst as src", "src as dst"))
        .persist()
    )
    hub_v = (
        spark.range(0, 1).selectExpr("id", "0 as label")
        .union(spark.range(1, 301).selectExpr("id", "1 as label"))
        .union(spark.range(100000, 102000).selectExpr("id", "2 as label"))
        .persist()
    )
    hub_e.count(), hub_v.count()

    def run_hub_fact():
        m = SubgraphMatcher(spark, hub_v, hub_e)
        try:
            n = m.count_tree_factorized(fact_qv, fact_qe)
            assert n is not None
            return n
        finally:
            m.unpersist()

    def run_hub_pipeline():
        m = SubgraphMatcher(spark, hub_v, hub_e)
        try:
            return m.count(fact_qv, fact_qe, pseudo=True, prune=True)
        finally:
            m.unpersist()

    throughput["match_factorized_hub"] = bench("match_factorized_hub", run_hub_fact)
    assert (
        bench("match_hub_pipeline", run_hub_pipeline)
        == throughput["match_factorized_hub"]
    )
    hub_e.unpersist()
    hub_v.unpersist()

    # the north-star pipeline itself: synthesize the source-code corpus
    # table, derive the file-dependency graph (language-aware import
    # extraction + intra-repo resolve join), run PageRank over it. Corpus
    # size scales with sf (sf0.1 -> 300 repos x 60 files = 18k vertices).
    from subgraph_isomorphism_pregel_spark.sources.corpus import corpus_graph

    n_repos = max(20, int(3000 * float(sf)))
    with timed("corpus_derive_graph"):
        cv, ce = corpus_graph(spark, n_repos=n_repos, files_per_repo=60, seed=11)
        cv = cv.persist()
        ce = ce.persist()
        n_corpus_edges = ce.count()
        cv.count()
    throughput["n_edges_corpus"] = n_corpus_edges

    with timed("corpus_pagerank_8steps"):
        cscores, _ = pagerank(spark, cv, ce, num_partitions=None, fixed_steps=8)
        cscores.agg(F.sum("score")).collect()
    throughput["corpus_pagerank_edges_per_sec"] = round(
        8 * n_corpus_edges / timings["corpus_pagerank_8steps"], 1
    )
    cv.unpersist()
    ce.unpersist()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench(
        "minhash_lsh_dedup",
        lambda: minhash_lsh_pairs(docs, num_hashes=12, bands=4, threshold=0.2).count(),
    )

    bench("simhash_packed", lambda: simhash(docs).count())

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bench("cosine_topk", lambda: cosine_topk(emb, k=5, n_queries=20).count())

    bench(
        "embedding_dups_lsh",
        lambda: embedding_dup_pairs_lsh(emb, threshold=0.4).count(),
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "sf": sf,
                "cpus": cpus,
                "throughput": throughput,
            }
        )
    )


if __name__ == "__main__":
    main()
