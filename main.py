"""spark-submit entry point.

    spark-submit --py-files <zip of subgraph_isomorphism_pregel_spark> main.py \
        --algo {pagerank,ppr,hits,cc,lp,sssp,wsssp,triangles,kcore,coreness,onion,mis,mst,matching,coloring,louvain,scc,eigen,katz,buildorder,match} \
        (--edges E.parquet --vertices V.parquet | --corpus C.parquet | --toy) \
        [--query query.txt] [--order degree|anti-degree|random|candidate] \
        [--pseudo on|off] [--prune on|off] [--mode join|bsp] \
        [--backward auto|adjlist|semijoin] [--factorize on|off|auto] \
        [--partitions 32] [--k 3] [--checkpoint-dir DIR] [--resume] [--output OUT.parquet] \
        [--deltas-dir DIR]   # pagerank: drain edge-delta files as warm micro-batches

Mirrors the reference CLI (-d -q -order -pseudo, /root/reference/src/utils/
global.h:265-327) with table inputs instead of HDFS text files. The query file
uses the reference's text format (README.md:16-20)."""

from __future__ import annotations

import argparse
import json
import os
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description="PySpark link-graph analytics engine")
    p.add_argument("--algo", required=True,
                   choices=["pagerank", "ppr", "hits", "cc", "lp", "sssp", "wsssp",
                            "triangles", "kcore", "coreness", "onion", "mis", "mst", "matching", "coloring", "louvain",
                            "scc", "eigen", "katz", "buildorder", "match"])
    p.add_argument("--edges", help="edge table parquet (src,dst)")
    p.add_argument("--vertices", help="vertex table parquet (id,label)")
    p.add_argument("--corpus", help="corpus parquet (repo,path,commit,lang,content) to derive the graph from")
    p.add_argument("--toy", action="store_true", help="use the reference's builtin toy graph")
    p.add_argument("--query", help="query graph text file (reference format), for --algo match")
    p.add_argument(
        "--order", default="degree", choices=["degree", "anti-degree", "random", "candidate"]
    )
    p.add_argument("--pseudo", default="on", choices=["on", "off"])
    p.add_argument("--mode", default="join", choices=["join", "bsp"],
                   help="matcher engine: Catalyst join frontier (scale path) or BSP kernel vertex program")
    p.add_argument("--prune", default="off", choices=["on", "off"],
                   help="prefix column pruning + factorized counting (match)")
    p.add_argument("--backward", default="auto", choices=["auto", "adjlist", "semijoin"],
                   help="backward-edge check plan: collected-adjacency array_contains, "
                        "hub-safe per-constraint left-semi joins, or auto by max degree")
    p.add_argument("--factorize", default="auto", choices=["on", "off", "auto"],
                   help="branch-factorized counting (independent branch enumeration + "
                        "inclusion-exclusion conflict assembly) for articulation-rooted "
                        "queries; 'auto' switches only when the label-fanout cost model "
                        "says the pipeline frontier is product-dominated")
    p.add_argument("--rounds", type=int, default=3, help="label-propagation rounds")
    p.add_argument("--source", type=int, default=None,
                   help="source vertex for --algo sssp/wsssp (default: min id)")
    p.add_argument("--seeds", default=None,
                   help="comma-separated seed ids for --algo ppr (default: 10 smallest)")
    p.add_argument("--steps", type=int, default=5,
                   help="fixed iterations for --algo hits/eigen/katz")
    p.add_argument("--alpha", type=float, default=0.05,
                   help="attenuation for --algo katz")
    p.add_argument("--max-hops", type=int, default=64, help="superstep bound for --algo sssp/wsssp/buildorder")
    p.add_argument("--k", type=int, default=3, help="core order for --algo kcore")
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--partitions", type=int, default=32)
    p.add_argument("--checkpoint-dir")
    p.add_argument("--checkpoint-every", type=int, default=1,
                   help="durable checkpoint cadence in supersteps (1 = every step)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--deltas-dir",
                   help="edge-delta parquet directory (src,dst,src_label,dst_label): "
                        "after the cold run, drain each file as one micro-batch of "
                        "add_vertices + warm re-rank (--algo pagerank only)")
    p.add_argument("--output", help="write the result DataFrame to this parquet path")
    p.add_argument("--metrics-output", help="write the per-(superstep,partition) metrics table to this parquet path")
    p.add_argument("--cores", type=int, default=None)
    return p.parse_args(argv)


def load_graph(spark, args):
    from pyspark.sql import functions as F

    from subgraph_isomorphism_pregel_spark.sources.corpus import derive_edges, derive_files
    from subgraph_isomorphism_pregel_spark.sources.graph import symmetrize, toy_graph

    if args.toy:
        return toy_graph(spark)
    if args.corpus:
        corpus = spark.read.parquet(args.corpus)
        files = derive_files(corpus)
        vertices = files.select(F.col("file_id").alias("id"), "label")
        edges = symmetrize(derive_edges(corpus, files))
        return vertices, edges
    if not args.edges:
        raise SystemExit("need --edges/--vertices, --corpus, or --toy")
    edges = spark.read.parquet(args.edges)
    if args.vertices:
        vertices = spark.read.parquet(args.vertices)
    else:
        vertices = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
            .withColumn("label", F.lit(0))
        )
    return vertices, edges


def main(argv=None):
    args = parse_args(argv or sys.argv[1:])
    from subgraph_isomorphism_pregel_spark.session import get_spark

    spark = get_spark(f"sip-{args.algo}", cores=args.cores)
    if (args.checkpoint_dir or args.resume) and (
        args.algo == "triangles" or (args.algo == "match" and args.mode == "join")
    ):
        print(
            f"warning: --checkpoint-dir/--resume have no effect for --algo {args.algo} "
            "(single-pass, not an iterative superstep run; --algo match --mode bsp "
            "does checkpoint)",
            file=sys.stderr,
        )
    vertices, edges = load_graph(spark, args)
    metrics = []

    if args.algo == "pagerank" and args.deltas_dir:
        # continuously ingested mode: cold bootstrap, then drain the delta
        # directory as micro-batches of add_vertices + warm re-rank
        import tempfile

        from subgraph_isomorphism_pregel_spark.streaming.graph_stream import (
            IncrementalPageRank,
            edge_delta_stream,
            run_ingest,
        )
        from subgraph_isomorphism_pregel_spark.streaming.windowed import drain

        ck = args.checkpoint_dir or tempfile.mkdtemp(prefix="sip_ingest_")
        # a reused stream checkpoint skips already-committed delta files,
        # but the ranker below bootstraps from the BASE graph each run —
        # silently losing every previously committed delta. Replay safety
        # (graph_stream.py) covers within-run crashes, not fresh processes
        # over an old checkpoint: refuse rather than emit a wrong graph.
        commits = os.path.join(ck, "stream", "commits")
        if os.path.isdir(commits) and any(
            not f.startswith(".") for f in os.listdir(commits)
        ):
            raise SystemExit(
                f"--deltas-dir: checkpoint {ck}/stream already holds committed "
                "batches from an earlier run; their deltas would NOT be "
                "re-applied to the base graph. Use a fresh --checkpoint-dir "
                "(and a base graph that already includes the applied deltas), "
                "or delete the old checkpoint to re-ingest every delta file."
            )
        ipr = IncrementalPageRank(
            spark, vertices, edges, num_partitions=args.partitions, tol=args.tol
        )
        q = run_ingest(ipr, edge_delta_stream(spark, args.deltas_dir), ck + "/stream")
        drain(q)
        result = ipr.scores
        print(
            json.dumps(
                {
                    "batches": len(ipr.steps_log) - 1,
                    "supersteps_per_run": ipr.steps_log,
                    "n_vertices": ipr.n,
                }
            ),
            file=sys.stderr,
        )
    elif args.algo == "pagerank":
        from subgraph_isomorphism_pregel_spark.operators.pagerank import pagerank

        result, metrics = pagerank(
            spark, vertices, edges, num_partitions=args.partitions, tol=args.tol,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
            checkpoint_every=args.checkpoint_every,
        )
    elif args.algo == "cc":
        from subgraph_isomorphism_pregel_spark.operators.components import connected_components

        result, metrics = connected_components(
            spark, vertices, edges, num_partitions=args.partitions,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
            checkpoint_every=args.checkpoint_every,
        )
    elif args.algo == "lp":
        from subgraph_isomorphism_pregel_spark.operators.labelprop import label_propagation

        result, metrics = label_propagation(
            spark, vertices, edges, rounds=args.rounds, num_partitions=args.partitions,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
            checkpoint_every=args.checkpoint_every,
        )
    elif args.algo == "sssp":
        from pyspark.sql import functions as F

        from subgraph_isomorphism_pregel_spark.operators.sssp import sssp

        src = args.source
        if src is None:
            src = int(vertices.agg(F.min("id")).collect()[0][0])
        result, metrics = sssp(
            spark, vertices, edges, source=src, max_hops=args.max_hops,
            num_partitions=args.partitions,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
            checkpoint_every=args.checkpoint_every,
        )
    elif args.algo == "wsssp":
        from pyspark.sql import functions as F

        from subgraph_isomorphism_pregel_spark.operators.sssp import weighted_sssp

        src = args.source
        if src is None:
            src = int(vertices.agg(F.min("id")).collect()[0][0])
        result, metrics = weighted_sssp(
            spark, vertices, edges, source=src, max_rounds=args.max_hops,
            num_partitions=args.partitions,
        )
    elif args.algo == "ppr":
        from pyspark.sql import functions as F

        from subgraph_isomorphism_pregel_spark.operators.pagerank import personalized_pagerank

        if args.seeds:
            seeds = [int(s) for s in args.seeds.split(",")]
        else:
            seeds = [int(r[0]) for r in vertices.orderBy("id").limit(10).collect()]
        result, metrics = personalized_pagerank(
            spark, vertices, edges, seeds, num_partitions=args.partitions, tol=args.tol,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
            checkpoint_every=args.checkpoint_every,
        )
    elif args.algo == "hits":
        from subgraph_isomorphism_pregel_spark.operators.hits import hits

        result, metrics = hits(
            spark, edges, steps=args.steps, num_partitions=args.partitions,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
            checkpoint_every=args.checkpoint_every,
        )
    elif args.algo == "eigen":
        from subgraph_isomorphism_pregel_spark.operators.eigen import eigencentrality

        result, metrics = eigencentrality(
            spark, vertices, edges, steps=args.steps, num_partitions=args.partitions,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
            checkpoint_every=args.checkpoint_every,
        )
    elif args.algo == "katz":
        from subgraph_isomorphism_pregel_spark.operators.eigen import katz_centrality

        result, metrics = katz_centrality(
            spark, vertices, edges, alpha=args.alpha, steps=args.steps,
            num_partitions=args.partitions, checkpoint_dir=args.checkpoint_dir,
            resume=args.resume, checkpoint_every=args.checkpoint_every,
        )
    elif args.algo == "buildorder":
        from subgraph_isomorphism_pregel_spark.operators.toposort import build_order

        result, metrics = build_order(
            spark, vertices, edges, num_partitions=args.partitions,
            max_rounds=args.max_hops,
        )
    elif args.algo == "mis":
        from subgraph_isomorphism_pregel_spark.operators.mis import maximal_independent_set

        result = maximal_independent_set(vertices, edges)
    elif args.algo == "mst":
        from subgraph_isomorphism_pregel_spark.operators.mst import boruvka_msf

        if "w" not in edges.columns:
            raise SystemExit("--algo mst needs a weighted edge table (src,dst,w)")
        result, _ = boruvka_msf(edges)
    elif args.algo == "matching":
        from subgraph_isomorphism_pregel_spark.operators.matching import maximal_matching

        result, _ = maximal_matching(edges)
    elif args.algo == "coloring":
        from subgraph_isomorphism_pregel_spark.operators.coloring import greedy_coloring

        result, _ = greedy_coloring(vertices, edges)
    elif args.algo == "louvain":
        from subgraph_isomorphism_pregel_spark.operators.louvain import louvain
        from subgraph_isomorphism_pregel_spark.sources.graph import symmetrize

        result = louvain(symmetrize(edges.select("src", "dst")))
    elif args.algo == "scc":
        from subgraph_isomorphism_pregel_spark.operators.scc import scc as run_scc

        result, metrics = run_scc(
            spark, vertices, edges,
            num_partitions=args.partitions,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
            checkpoint_every=args.checkpoint_every,
        )
    elif args.algo == "triangles":
        from subgraph_isomorphism_pregel_spark.operators.triangles import triangles_per_vertex

        result = triangles_per_vertex(spark, vertices, edges)
    elif args.algo == "kcore":
        from subgraph_isomorphism_pregel_spark.operators.kcore import kcore

        result, metrics = kcore(
            spark, vertices, edges, k=args.k,
            num_partitions=args.partitions,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
            checkpoint_every=args.checkpoint_every,
        )
    elif args.algo == "coreness":
        from subgraph_isomorphism_pregel_spark.operators.coreness import coreness

        result, metrics = coreness(
            spark, vertices, edges,
            num_partitions=args.partitions,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
            checkpoint_every=args.checkpoint_every,
        )
    elif args.algo == "onion":
        from subgraph_isomorphism_pregel_spark.operators.onion import onion_layers

        result, metrics = onion_layers(
            spark, vertices, edges,
            num_partitions=args.partitions,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
            checkpoint_every=args.checkpoint_every,
        )
    else:  # match
        if not args.query:
            raise SystemExit("--algo match requires --query")
        from subgraph_isomorphism_pregel_spark.operators.match import SubgraphMatcher
        from subgraph_isomorphism_pregel_spark.sources.graph import parse_query_text

        with open(args.query) as f:
            qv, qe = parse_query_text(f.read())
        if args.mode == "bsp":
            from subgraph_isomorphism_pregel_spark.operators.match_bsp import match_count_bsp

            n = match_count_bsp(
                spark, vertices, edges, qv, qe,
                num_partitions=args.partitions, order=args.order,
                checkpoint_dir=args.checkpoint_dir,
            )
        else:
            matcher = SubgraphMatcher(spark, vertices, edges)
            n = matcher.count(
                qv, qe, order=args.order, pseudo=args.pseudo == "on",
                prune=args.prune == "on", backward=args.backward,
                factorize={"on": True, "off": False, "auto": "auto"}[args.factorize],
            )
        print(f"Mapping count: {n}")  # same headline as the reference (README.md:83)
        result = spark.createDataFrame([(n,)], "mapping_count long")

    if args.output:
        result.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    else:
        result.show(20, truncate=False)
    if metrics:
        last = max(m["superstep"] for m in metrics)
        print(json.dumps({"supersteps": last, "metric_rows": len(metrics)}))
        if args.metrics_output:
            from subgraph_isomorphism_pregel_spark.operators.pregel import metrics_df

            metrics_df(spark, metrics).write.mode("overwrite").parquet(args.metrics_output)
            print(f"wrote {args.metrics_output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
