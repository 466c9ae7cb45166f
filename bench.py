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

Variance: EVERY query runs SPARK_GRAFT_BENCH_REPEATS times (default 3)
and reports the MIN — at 1-7 s scale single-JVM runs carry 15-20% GC/JIT
noise, which n=1 numbers cannot distinguish from regressions; the raw
repeat times are kept in "runs" and per-query {n, min, median, max} in
"stats" so the spread is adjudicable (round-4 verdict item). Graph
builds unpersist + rebuild per repeat so each timing is a cold build.
The only queries allowed to stop early are those whose single run
exceeds their cap (default 20 s; convergence runs 90 s) — the ~20 s
hub-pipeline cross-product demo deliberately stays n=1.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from subgraph_isomorphism_pregel_spark.operators.components import connected_components  # noqa: E402
from subgraph_isomorphism_pregel_spark.operators.kcore import kcore  # noqa: E402
from subgraph_isomorphism_pregel_spark.operators.dedup import (  # noqa: E402
    decontaminate,
    minhash_lsh_pairs,
    simhash,
)
from subgraph_isomorphism_pregel_spark.operators.sketches import cms_heavy_hitters, hll_distinct  # noqa: E402
from subgraph_isomorphism_pregel_spark.operators.packing import pack_documents  # noqa: E402
from subgraph_isomorphism_pregel_spark.operators.textops import (  # noqa: E402
    dsir_weights,
    lm_score,
    quality_filter,
    repetition_score,
    tfidf_topk,
)
from subgraph_isomorphism_pregel_spark.operators.labelprop import label_propagation  # noqa: E402
from subgraph_isomorphism_pregel_spark.operators.match import SubgraphMatcher  # noqa: E402
from subgraph_isomorphism_pregel_spark.operators.clustering import kmeans  # noqa: E402
from subgraph_isomorphism_pregel_spark.operators.eigen import eigencentrality  # noqa: E402
from subgraph_isomorphism_pregel_spark.operators.hits import hits  # noqa: E402
from subgraph_isomorphism_pregel_spark.operators.hyperball import hyperball  # noqa: E402
from subgraph_isomorphism_pregel_spark.operators.pagerank import pagerank  # noqa: E402
from subgraph_isomorphism_pregel_spark.operators.walks import random_walks  # noqa: E402
from subgraph_isomorphism_pregel_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    embedding_dup_pairs_lsh,
)
from subgraph_isomorphism_pregel_spark.operators.triangles import (  # noqa: E402
    kclique_count,
    triangle_count,
)
from subgraph_isomorphism_pregel_spark.session import get_spark  # noqa: E402
from subgraph_isomorphism_pregel_spark.sources.graph import (  # noqa: E402
    SUPPLIER_ID_OFFSET,
    ring_graph,
    supply_graph,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    # sf from the dirname's trailing sf<number>; any other layout (custom
    # SPARK_GRAFT_SF_DIR) falls back to 0.1 rather than crashing float()
    m_sf = re.search(r"sf([\d.]+)$", os.path.basename(sf_dir.rstrip("/")))
    sf = m_sf.group(1) if m_sf else "0.1"
    spark = get_spark("sip-bench", cores=cpus, shuffle_partitions=cpus)

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", 3))
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    throughput: dict[str, float] = {}

    def bench(name, fn, cap=20.0):
        """Repeat fn while each run stays under `cap` seconds; record min
        (and the raw spread — see the docstring's variance note)."""
        ts = []
        for i in range(max(repeats, 1)):
            t0 = time.time()
            out = fn()
            ts.append(round(time.time() - t0, 3))
            if ts[-1] >= cap:
                break
        timings[name] = min(ts)
        runs[name] = ts
        return out

    # graph construction (shared, measured separately; each repeat
    # unpersists and rebuilds so every timing is a cold build — the last
    # repeat leaves the graph persisted for the downstream queries)
    sv = se = None

    def run_build_supply():
        nonlocal sv, se
        if sv is not None:
            sv.unpersist()
            se.unpersist()
        sv, se = supply_graph(spark, sf_dir)
        sv = sv.persist()
        se = se.persist()
        n = se.count()
        sv.count()
        return n

    n_edges = bench("build_supply_graph", run_build_supply)

    # num_partitions=None: CSR blocks sized by edge volume (auto_partitions)
    # — at sf0.1 that is P=8, ~25% fewer seconds/superstep than P=cpus=32
    # (per-superstep cost is task-scheduling-bound at this graph size)
    pr_scores = None

    def run_pagerank():
        nonlocal pr_scores
        scores, metrics = pagerank(spark, sv, se, num_partitions=None, tol=1e-6)
        scores.agg(F.sum("score")).collect()
        pr_scores = scores
        return metrics

    metrics = bench("pagerank_convergence", run_pagerank, cap=90.0)
    steps = max(m["superstep"] for m in metrics)
    pr_sec = timings["pagerank_convergence"]
    throughput["pagerank_supersteps_per_sec"] = round(steps / pr_sec, 3)
    throughput["pagerank_edges_per_sec"] = round(steps * n_edges / pr_sec, 1)
    throughput["pagerank_supersteps"] = steps
    throughput["n_edges_supply"] = n_edges

    # incremental re-rank: grow the supply graph by a tiny delta
    # (add_vertices) and warm-start from the convergence run's scores —
    # the nightly-delta path; measured end to end (parts build + delta
    # append + warm convergence). The step ratio vs the cold ladder above
    # is the headline (throughput["pagerank_warm_supersteps"]).
    def run_pr_warm():
        from subgraph_isomorphism_pregel_spark.operators.pagerank import (
            build_parts,
            pagerank_warm,
        )
        from subgraph_isomorphism_pregel_spark.operators.pregel import (
            add_vertices,
            auto_partitions,
        )

        P = auto_partitions(n_edges)
        prior = pr_scores.persist()
        n_v = prior.count()
        ex = [int(r["id"]) for r in sv.orderBy("id").limit(8).collect()]
        base = 10**12
        nv = spark.createDataFrame(
            [(base + i, 0) for i in range(8)], "id long, label int"
        )
        ne = spark.createDataFrame(
            [(base + i, x) for i, x in enumerate(ex)]
            + [(x, base + i) for i, x in enumerate(ex)],
            "src long, dst long",
        )
        parts = build_parts(spark, sv, se, P)
        grown = add_vertices(spark, parts, nv, ne, P)
        scores, mw = pagerank_warm(
            spark, grown, prior, n_vertices=n_v + 8, num_partitions=P, tol=1e-6
        )
        scores.agg(F.sum("score")).collect()
        prior.unpersist()
        return max(m["superstep"] for m in mw)

    throughput["pagerank_warm_supersteps"] = bench(
        "pagerank_incremental", run_pr_warm, cap=90.0
    )

    def run_cc():
        comp, _ = connected_components(spark, sv, se, num_partitions=None)
        return comp.agg(F.countDistinct("component")).collect()

    bench("connected_components", run_cc)

    def run_lp():
        lab, _ = label_propagation(spark, sv, se, rounds=3, num_partitions=None)
        return lab.agg(F.countDistinct("lp_label")).collect()

    bench("label_propagation_k3", run_lp)

    def run_kcore():
        core, _ = kcore(spark, sv, se, k=32, num_partitions=None)
        return core.count()

    throughput["kcore32_size"] = bench("kcore_32", run_kcore)

    def run_coreness():
        from subgraph_isomorphism_pregel_spark.operators.coreness import coreness

        core, _ = coreness(spark, sv, se, num_partitions=None)
        return core.agg(F.max("coreness")).collect()[0][0]

    throughput["max_coreness"] = bench("coreness", run_coreness)

    rv = re_ = None

    def run_build_ring():
        nonlocal rv, re_
        if rv is not None:
            rv.unpersist()
            re_.unpersist()
        rv, re_ = ring_graph(spark, sf_dir)
        rv = rv.persist()
        re_ = re_.persist()
        n = re_.count()
        rv.count()
        return n

    ring_edges = bench("build_ring_graph", run_build_ring)
    throughput["n_edges_ring"] = ring_edges

    throughput["triangles"] = bench("triangle_count", lambda: triangle_count(spark, re_))
    throughput["cliques4"] = bench("kclique4_count", lambda: kclique_count(spark, re_, k=4))

    def run_rectangles():
        from subgraph_isomorphism_pregel_spark.operators.triangles import (
            rectangle_stats,
        )

        return rectangle_stats(spark, re_).collect()[0]["c4_count"]

    throughput["rectangles"] = bench("rectangle_count", run_rectangles)

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
    t_pipe = bench("match_twin_paths_pipeline", run_fact_pipeline)
    assert t_pipe == throughput["match_factorized_twin_paths"]


    # the north-star pipeline itself: synthesize the source-code corpus
    # table, derive the file-dependency graph (language-aware import
    # extraction + intra-repo resolve join), run PageRank over it. Corpus
    # size scales with sf (sf0.1 -> 300 repos x 60 files = 18k vertices).
    from subgraph_isomorphism_pregel_spark.sources.corpus import corpus_graph

    n_repos = max(20, int(3000 * float(sf)))
    cv = ce = None

    def run_build_corpus():
        nonlocal cv, ce
        if cv is not None:
            cv.unpersist()
            ce.unpersist()
        cv, ce = corpus_graph(spark, n_repos=n_repos, files_per_repo=60, seed=11)
        cv = cv.persist()
        ce = ce.persist()
        n = ce.count()
        cv.count()
        return n

    n_corpus_edges = bench("corpus_derive_graph", run_build_corpus)
    throughput["n_edges_corpus"] = n_corpus_edges

    def run_corpus_pr():
        cscores, _ = pagerank(spark, cv, ce, num_partitions=None, fixed_steps=8)
        cscores.agg(F.sum("score")).collect()

    bench("corpus_pagerank_8steps", run_corpus_pr)
    throughput["corpus_pagerank_edges_per_sec"] = round(
        8 * n_corpus_edges / timings["corpus_pagerank_8steps"], 1
    )
    cv.unpersist()
    ce.unpersist()

    # compliance pass over the same corpus scale: decorate, detect licenses,
    # redact + re-scan secrets, and find repo-level structural clone pairs —
    # the codegen scans dominate; clone pairs add one fingerprint aggregate
    from subgraph_isomorphism_pregel_spark.operators.codescan import (
        license_detect,
        redact_secrets,
        repo_clone_pairs,
        secret_scan,
        with_license_headers,
    )
    from subgraph_isomorphism_pregel_spark.sources.corpus import synth_corpus

    def run_compliance():
        c = with_license_headers(
            synth_corpus(spark, n_repos=n_repos, files_per_repo=60, seed=11)
        )
        license_detect(c).groupBy("license").count().count()
        assert secret_scan(redact_secrets(c)).where(F.col("n_secrets") > 0).count() == 0
        return repo_clone_pairs(c).count()

    throughput["clone_pairs"] = bench("corpus_compliance", run_compliance)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench(
        "minhash_lsh_dedup",
        lambda: minhash_lsh_pairs(docs, num_hashes=12, bands=4, threshold=0.2).count(),
    )

    bench("simhash_packed", lambda: simhash(docs).count())

    bench("repetition_score", lambda: repetition_score(docs).count())
    bench("tfidf_topk", lambda: tfidf_topk(docs).count())
    bench("dsir_weights", lambda: dsir_weights(docs).count())

    def run_collocations():
        from subgraph_isomorphism_pregel_spark.operators.textops import collocations

        return collocations(docs, min_count=5, k=20).count()

    bench("collocations_pmi", run_collocations)

    def run_copurchase():
        from subgraph_isomorphism_pregel_spark.operators.linkpred import (
            cooccurrence_projection,
        )

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        return cooccurrence_projection(
            li, group_col="l_orderkey", item_col="l_partkey", min_weight=2
        ).count()

    bench("copurchase_projection", run_copurchase)

    def run_event_behavior():
        from subgraph_isomorphism_pregel_spark.operators.funnel import (
            funnel,
            markov_transitions,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        n_tr = markov_transitions(ev).count()
        steps = funnel(ev, ["view", "click", "purchase"]).collect()
        return n_tr + sum(r.users for r in steps)

    bench("event_behavior", run_event_behavior)
    bench("quality_filter", lambda: quality_filter(docs).count())
    bench("lm_score", lambda: lm_score(docs).count())
    bench(
        "seq_pack_cap200",
        lambda: pack_documents(docs, capacity=200, n_shards=64, salt="v1").count(),
    )

    def run_decontaminate():
        bm = docs.where(F.col("doc_id") % 37 == 0)
        tr = docs.where(F.col("doc_id") % 37 != 0)
        return decontaminate(tr, bm, k=3).where("contaminated").count()

    bench("decontaminate", run_decontaminate)

    def run_dedup_spans():
        from subgraph_isomorphism_pregel_spark.operators.dedup import dedup_spans

        return dedup_spans(docs, k=5).agg(F.sum("n_removed")).collect()[0][0]

    throughput["span_tokens_removed"] = bench("dedup_spans", run_dedup_spans)

    def run_chunk():
        from subgraph_isomorphism_pregel_spark.operators.textops import (
            chunk_documents,
        )

        return chunk_documents(docs, max_tokens=64, overlap=16).count()

    throughput["n_chunks"] = bench("chunk_documents", run_chunk)

    def run_bpe():
        from subgraph_isomorphism_pregel_spark.operators.bpe import bpe_train

        mdf, _ = bpe_train(docs, 16)
        rows = mdf.orderBy("rank").collect()
        return [len(rows), rows[-1].left + rows[-1].right if rows else ""]

    throughput["bpe_merges_last"] = bench("bpe_train_16", run_bpe, cap=90.0)

    def run_pipeline():
        import __spark_entry__ as entrymod

        out = entrymod.q_pipeline_docs(spark, sf_dir)
        return out.count()

    throughput["pipeline_chunks"] = bench("pipeline_docs", run_pipeline, cap=90.0)

    def run_mixture():
        from subgraph_isomorphism_pregel_spark.operators.sampling import (
            temperature_mixture,
        )

        out, _ = temperature_mixture(
            docs, domain_col="lang", key_col="doc_id",
            temperature=0.5, target=2000, salt="tm",
        )
        return out.count()

    throughput["mixture_kept"] = bench("temperature_mixture", run_mixture)
    bench("hll_distinct", lambda: hll_distinct(docs, "text", p=12).count())
    bench("cms_heavy_hitters", lambda: cms_heavy_hitters(docs).count())

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bench("cosine_topk", lambda: cosine_topk(emb, k=5, n_queries=20).count())

    bench(
        "embedding_dups_lsh",
        lambda: embedding_dup_pairs_lsh(emb, threshold=0.4).count(),
    )

    bench("kmeans_k8_it3", lambda: kmeans(emb, k=8, iters=3)[0].count())

    def run_hits():
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        pairs = li.select(
            F.col("l_partkey").alias("src"),
            (F.col("l_suppkey") + SUPPLIER_ID_OFFSET).alias("dst"),
        ).distinct()
        # num_partitions=None -> auto by doubled-edge volume (32 fixed
        # partitions measured 13.3s vs 8.6s auto on the 1.18M-edge doubled
        # graph: per-superstep task overhead dominates at this scale)
        scored, _ = hits(spark, pairs, steps=4, num_partitions=None)
        return scored.count()

    bench("hits_4steps", run_hits)

    def run_eigen():
        ev_, ee_ = ring_graph(spark, sf_dir)
        scored, _ = eigencentrality(spark, ev_, ee_, steps=4, num_partitions=None)
        return scored.count()

    bench("eigencentrality_4steps", run_eigen)

    def run_katz():
        from subgraph_isomorphism_pregel_spark.operators.eigen import katz_centrality

        kv_, ke_ = ring_graph(spark, sf_dir)
        scored, _ = katz_centrality(
            spark, kv_, ke_, alpha=0.05, steps=4, num_partitions=None
        )
        return scored.count()

    bench("katz_4steps", run_katz)

    def run_hyperball():
        hv, he = ring_graph(spark, sf_dir)
        est, _ = hyperball(spark, hv, he, radius=3, p=4, num_partitions=None)
        return est.count()

    bench("hyperball_r3", run_hyperball)

    def run_walks():
        wv, we = ring_graph(spark, sf_dir)
        return random_walks(
            we, walk_len=4, walks_per_vertex=2, starts=wv.select("id"), salt="w1"
        ).count()

    bench("walks_len4_x2", run_walks)

    def run_ktruss():
        from subgraph_isomorphism_pregel_spark.operators.triangles import ktruss

        _, ke = ring_graph(spark, sf_dir)
        return ktruss(spark, ke, k=4, rounds=3).count()

    bench("ktruss_k4_r3", run_ktruss)

    def run_msf():
        from subgraph_isomorphism_pregel_spark.operators.mst import boruvka_msf
        from subgraph_isomorphism_pregel_spark.sources.graph import (
            weighted_ring_graph,
        )

        forest, rounds = boruvka_msf(weighted_ring_graph(spark, sf_dir))
        return [forest.count(), rounds]

    throughput["msf_edges_rounds"] = bench("boruvka_msf_ring", run_msf, cap=60.0)

    def run_matching():
        from subgraph_isomorphism_pregel_spark.operators.matching import (
            maximal_matching,
        )

        m, rounds = maximal_matching(re_, salt="mm1")
        return [m.count(), rounds]

    throughput["matching_pairs_rounds"] = bench(
        "maximal_matching_ring", run_matching, cap=60.0
    )

    def run_coloring():
        from subgraph_isomorphism_pregel_spark.operators.coloring import (
            greedy_coloring,
        )

        col, rounds = greedy_coloring(rv, re_, salt="jp1")
        return [col.agg(F.max("color")).collect()[0][0] + 1, rounds]

    throughput["coloring_colors_rounds"] = bench(
        "greedy_coloring_ring", run_coloring, cap=90.0
    )

    def run_louvain():
        from subgraph_isomorphism_pregel_spark.operators.louvain import louvain
        from subgraph_isomorphism_pregel_spark.operators.stats import modularity

        comm = louvain(re_, levels=2, rounds_per_level=6, salt="lv1")
        q = modularity(comm, re_).collect()[0]
        return [q.n_communities, round(float(q.q_modularity), 6)]

    throughput["louvain_comms_q"] = bench("louvain_ring", run_louvain, cap=120.0)

    # the hub/deep-chain section runs LAST: its AQE runtime broadcasts of
    # multi-hundred-MB grouped tables linger in the JVM heap until GC and
    # measurably slow every query that follows (round-5 measurement:
    # embedding_dups_lsh 2.6s standalone vs 11.8s right after this block),
    # so it must not precede the corpus/dedup/similarity timings.
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
    # two more levels below the shared s-pool (for the NESTED demo): each
    # s touches 58 label-3 t's from a 500-pool; each t touches 5 label-4
    # and 5 label-5 u's from 100-pools. Adds no label-1<->label-2 edges,
    # so the single-level hub demos above count exactly as before — but
    # the GRAPH is ~3x more edges than round 4's fixture, so their wall
    # times roughly doubled vs BENCH_r04 (bigger adjacency build, LDF
    # degrees, label-fanout aggregates); the counts prove it's the same
    # workload, the time drift is the fixture, not a plan regression.
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
    t_hub_pipe = bench("match_hub_pipeline", run_hub_pipeline)
    assert t_hub_pipe == throughput["match_factorized_hub"]

    # NESTED (two-level) factorization (round 5): a branch whose INTERNAL
    # same-label conflicts sit two levels below the top split. Query:
    # root(0) - m1(1), m2(1); under m1 two chains s(2)-t(3)-u(4|5) where
    # (s,s') and (t,t') collide INSIDE the branch and the t's are internal
    # (a unique-label u-leaf hangs below each). The naive branch cross
    # product is ~10^10 rows — the PRUNED pipeline's prefix merge
    # performs the same factorization IMPLICITLY (a released same-label
    # witness collapses the frontier like a DP over the chain), so
    # nested='auto' consults _flat_stream_est and declines the recursion
    # here (crossover NESTED_MIN_STREAM ~1e10 streamed rows). MEASURED
    # (solo host, end of round 5): the two plans sit within ~1.5x of each
    # other and the ORDER is host-state sensitive — single-level 21-44 s
    # across runs vs forced 2-level 15.5-18 s today; an earlier same-round
    # measurement had single-level at 11 s and nested at 17 s. The
    # assembly's pinned-equality terms ARE equi-join keys in the optimized
    # plan (Catalyst extracts img_x = img_y into the join condition — no
    # anchor-wise cross product), so both plans are scale-sound and the
    # conservative pick costs at most the observed ~1.5x at this scale.
    # Both paths benched, counts must agree: 'auto' is the plan a user
    # gets, nested=True keeps the depth machinery honest under
    # measurement.
    deep_qv = {0: 0, 1: 1, 9: 1, 11: 2, 12: 3, 13: 4, 21: 2, 22: 3, 23: 5}
    deep_qe = set()
    for a, b in (
        (0, 1), (0, 9),
        (1, 11), (11, 12), (12, 13),
        (1, 21), (21, 22), (22, 23),
    ):
        deep_qe |= {(a, b), (b, a)}

    def run_deep(nested):
        m = SubgraphMatcher(spark, hub_v, hub_e)
        try:
            n = m.count_tree_factorized(deep_qv, deep_qe, nested=nested)
            assert n is not None
            return n
        finally:
            m.unpersist()

    throughput["match_deep_chain_auto"] = bench(
        "match_deep_chain_auto", lambda: run_deep("auto")
    )
    t_deep_forced = bench("match_deep_chain_nested_forced", lambda: run_deep(True))
    assert t_deep_forced == throughput["match_deep_chain_auto"]
    hub_e.unpersist()
    hub_v.unpersist()
    # nudge the ContextCleaner so the big broadcast blocks are dropped
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()

    total = round(sum(timings.values()), 3)
    import statistics

    stats = {
        k: {
            "n": len(v),
            "min": min(v),
            "median": round(statistics.median(v), 3),
            "max": max(v),
        }
        for k, v in runs.items()
    }
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "stats": stats,
                "sf": sf,
                "cpus": cpus,
                "throughput": throughput,
            }
        )
    )


if __name__ == "__main__":
    main()
