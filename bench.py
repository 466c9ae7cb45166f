"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "throughput": {...edges/sec, supersteps/sec...}}

Headlines: PageRank to 1e-6 convergence on the supply graph (the north-star
metric: supersteps/sec, edges/sec), connected components, label propagation,
triangle counting, subgraph-match query set on the ring graph, and the
training-data-pipeline ops (MinHash LSH dedup, cosine top-k).
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

    timings: dict[str, float] = {}
    throughput: dict[str, float] = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.time()
                return self

            def __exit__(self, *a):
                timings[name] = round(time.time() - self.t0, 3)

        return _T()

    # graph construction (shared, measured separately)
    with timed("build_supply_graph"):
        sv, se = supply_graph(spark, sf_dir)
        sv = sv.persist()
        se = se.persist()
        n_edges = se.count()
        sv.count()

    with timed("pagerank_convergence"):
        scores, metrics = pagerank(spark, sv, se, num_partitions=cpus, tol=1e-6)
        scores.agg(F.sum("score")).collect()
    steps = max(m["superstep"] for m in metrics)
    pr_sec = timings["pagerank_convergence"]
    throughput["pagerank_supersteps_per_sec"] = round(steps / pr_sec, 3)
    throughput["pagerank_edges_per_sec"] = round(steps * n_edges / pr_sec, 1)
    throughput["pagerank_supersteps"] = steps
    throughput["n_edges_supply"] = n_edges

    with timed("connected_components"):
        comp, cmet = connected_components(spark, sv, se, num_partitions=cpus)
        comp.agg(F.countDistinct("component")).collect()

    with timed("label_propagation_k3"):
        lab, _ = label_propagation(spark, sv, se, rounds=3, num_partitions=cpus)
        lab.agg(F.countDistinct("lp_label")).collect()

    with timed("build_ring_graph"):
        rv, re_ = ring_graph(spark, sf_dir)
        rv = rv.persist()
        re_ = re_.persist()
        ring_edges = re_.count()
    throughput["n_edges_ring"] = ring_edges

    with timed("triangle_count"):
        tri = triangle_count(spark, re_)
    throughput["triangles"] = tri

    with timed("match_query_set"):
        m = SubgraphMatcher(spark, rv, re_)
        cnts = [
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
        m.unpersist()
    throughput["match_counts"] = cnts

    with timed("match_deferred_acbc"):
        m = SubgraphMatcher(spark, rv, re_)
        deferred_cnt = m.count(
            {1: 0, 2: 1, 3: 2, 4: 1},
            {(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)},
            pseudo=True,
            prune=True,
        )
        m.unpersist()
    throughput["match_deferred_acbc"] = deferred_cnt

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with timed("minhash_lsh_dedup"):
        minhash_lsh_pairs(docs, num_hashes=12, bands=4, threshold=0.2).count()

    with timed("simhash_packed"):
        simhash(docs).count()

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with timed("cosine_topk"):
        cosine_topk(emb, k=5, n_queries=20).count()

    with timed("embedding_dups_lsh"):
        embedding_dup_pairs_lsh(emb, threshold=0.4).count()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "throughput": throughput,
            }
        )
    )


if __name__ == "__main__":
    main()
