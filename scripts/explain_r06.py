"""Capture .explain('formatted') evidence for the round-6 optimization
deliverable (plans/r06/<query>_{before,after}.txt).

Monkeypatches DataFrameWriter.parquet / saveAsTable so every lineage-cut or
checkpoint write logs the written DataFrame's formatted plan — this works
unmodified on the round-start tree (run inside a git worktree at the old
commit) and on HEAD, so the before/after pairs come from the code that
actually ran, not a reconstruction.

Usage: python scripts/explain_r06.py <out_dir> <tag>   # tag = before|after
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "plans/r06"
TAG = sys.argv[2] if len(sys.argv) > 2 else "after"
os.makedirs(OUT, exist_ok=True)

_captures: list[tuple[str, str]] = []
_current_query = ["?"]


def _fmt(df, limit: int = 300) -> str:
    s = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    lines = s.splitlines()
    if len(lines) > limit:
        s = "\n".join(lines[:limit]) + f"\n... [truncated, {len(lines)} lines total]"
    return s


_orig_parquet = DataFrameWriter.parquet
_orig_save_as_table = DataFrameWriter.saveAsTable


def _patched_parquet(self, path, *a, **k):
    _captures.append((f"{_current_query[0]} write->{os.path.basename(path)}", _fmt(self._df)))
    return _orig_parquet(self, path, *a, **k)


def _patched_save_as_table(self, name, *a, **k):
    _captures.append((f"{_current_query[0]} saveAsTable->{name.split('_')[-1]}", _fmt(self._df)))
    return _orig_save_as_table(self, name, *a, **k)


DataFrameWriter.parquet = _patched_parquet
DataFrameWriter.saveAsTable = _patched_save_as_table


def dump(query: str, picks: list[int] | None = None, extra: str = "") -> None:
    """Write captured plans for `query` to OUT/<query>_<TAG>.txt.

    picks: indexes into this query's capture list (None = all, capped)."""
    mine = [c for c in _captures if c[0].startswith(query)]
    if picks is not None:
        mine = [mine[i] for i in picks if i < len(mine)]
    with open(os.path.join(OUT, f"{query}_{TAG}.txt"), "w") as fh:
        if extra:
            fh.write(extra.rstrip() + "\n\n")
        for label, plan in mine[:6]:
            fh.write(f"===== {label}\n{plan}\n\n")
    print(f"wrote {query}_{TAG}.txt ({len(mine)} captures)")


def main() -> None:
    from subgraph_isomorphism_pregel_spark.session import get_spark
    from subgraph_isomorphism_pregel_spark.sources.graph import ring_graph, supply_graph

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("explain-r06", cores=8, shuffle_partitions=8)

    rv, re_ = ring_graph(spark, sf_dir)
    rv, re_ = rv.persist(), re_.persist()
    re_.count(), rv.count()

    # --- pagerank superstep (kernel): checkpoint-write plan of step 2 ---
    _current_query[0] = "pagerank_superstep"
    from subgraph_isomorphism_pregel_spark.operators.pagerank import pagerank

    sv, se = supply_graph(spark, sf_dir)
    sv, se = sv.persist(), se.persist()
    se.count(), sv.count()
    pagerank(spark, sv, se, num_partitions=None, fixed_steps=3)
    # captures: struct save, state0 save, then one save per superstep —
    # pick the step-2 write (index 3): the after-plan shows CollectMetrics
    # (the Observation that replaced the follow-up stats-collect job)
    dump(
        "pagerank_superstep", picks=[3],
        extra="# One kernel superstep's checkpoint write (pagerank, step 2).\n"
              "# after: a CollectMetrics node rides the write (per-step stats\n"
              "# fold into the SAME job); before: no CollectMetrics — stats\n"
              "# were a second job re-reading the written table.",
    )

    # --- pagerank_incremental: warm-start parts plan (persist) ---
    _current_query[0] = "pagerank_incremental"
    from subgraph_isomorphism_pregel_spark.operators.pagerank import (
        build_parts,
        pagerank_warm,
    )
    from subgraph_isomorphism_pregel_spark.operators.pregel import (
        add_vertices,
        auto_partitions,
    )

    n_edges = se.count()
    P = auto_partitions(n_edges)
    prior = spark.createDataFrame(
        [(int(r["id"]), 1.0 / 2100) for r in sv.limit(50).collect()], "id long, score double"
    )
    parts = build_parts(spark, sv, se, P)
    ex = [int(r["id"]) for r in sv.orderBy("id").limit(4).collect()]
    nv = spark.createDataFrame([(10**12 + i, 0) for i in range(4)], "id long, label int")
    ne = spark.createDataFrame(
        [(10**12 + i, x) for i, x in enumerate(ex)] + [(x, 10**12 + i) for i, x in enumerate(ex)],
        "src long, dst long",
    )
    grown = add_vertices(spark, parts, nv, ne, P)
    pagerank_warm(spark, grown, prior, n_vertices=2104, num_partitions=P, fixed_steps=2)
    # pick the struct save: after shows InMemoryTableScan over the persisted
    # build+rebuild plan (executed once); before re-plans the full tree here
    # AND in the state save AND in the seed aggregate
    dump(
        "pagerank_incremental", picks=[0, 1],
        extra="# Warm-start struct/state saves. after: the struct save scans an\n"
              "# InMemoryRelation of the persisted build_parts+add_vertices plan\n"
              "# (executed once); before: the full build tree is re-planned and\n"
              "# re-executed by the struct save, the state save, and the seed\n"
              "# aggregate (three executions).",
    )

    # --- greedy coloring: one mid-run round write ---
    _current_query[0] = "greedy_coloring_ring"
    from subgraph_isomorphism_pregel_spark.operators.coloring import greedy_coloring

    greedy_coloring(rv, re_, rounds=3, salt="jp1")
    # last capture = round-3 write (a colored set exists by then)
    dump(
        "greedy_coloring_ring", picks=[-2, -1],
        extra="# One Jones-Plassmann round's lineage-cut write (round 3).\n"
              "# after: ONE state-table write per round — edges decorated with\n"
              "# source color once, readiness min + neighbor-color set folded in\n"
              "# a single per-destination aggregate, remaining-uncolored count\n"
              "# via CollectMetrics on this same write; before: two writes per\n"
              "# round (newly + shrinking uncolored), a separate count job, and\n"
              "# a colored-union of one leaf scan per round.",
    )

    # --- louvain: one local-move round write ---
    _current_query[0] = "louvain_ring"
    from subgraph_isomorphism_pregel_spark.operators.louvain import louvain_local_moves

    louvain_local_moves(
        re_.select("src", "dst").unionAll(re_.select(F.col("dst").alias("src"), F.col("src").alias("dst"))),
        rounds=2, salt="lv1",
    )
    dump(
        "louvain_ring", picks=[-1],
        extra="# One Louvain local-move round's state write (round 2). after:\n"
              "# state rows carry (id, comm, k) so the two per-round deg joins\n"
              "# are gone, and best-candidate + stay-listed fold in ONE per-src\n"
              "# aggregate; before: four join subtrees (scored / stay_listed /\n"
              "# stay_unlisted / best) each with its own broadcast stage.",
    )

    # --- bpe_train: word-table cut cadence ---
    _current_query[0] = "bpe_train_16"
    from subgraph_isomorphism_pregel_spark.operators.bpe import bpe_train

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bpe_train(docs, 12)
    dump(
        "bpe_train_16", picks=[1],
        extra="# The word-table lineage-cut write after the first merge block.\n"
              "# after: ONE cut per 8 merges — the written plan carries a chain\n"
              "# of up to 8 codegen `replace` projections; before: one parquet\n"
              "# write+read per merge (a single replace per written plan).",
    )

    # --- match hub pipeline: deferred-group legs plan (no write; explain) ---
    _current_query[0] = "match_hub_pipeline"
    from subgraph_isomorphism_pregel_spark.operators.match import SubgraphMatcher
    from subgraph_isomorphism_pregel_spark.plans.sketch_tree import build_plan

    # max degree must clear DEFER_SPREAD_MIN_DEGREE (64) so the captured
    # plan reflects the hub regime the change targets: 120 mids under one
    # root (root degree 120), 40 leaves per mid
    hub_mid = spark.range(1, 121).selectExpr("0 as src", "id as dst")
    hub_leaf = spark.range(1, 121).selectExpr(
        "id as src", "explode(sequence(0, 39)) as j"
    ).selectExpr("src", "100000 + (src * 37 + j * 13) % 400 as dst")
    hub_fwd = hub_mid.union(hub_leaf)
    hub_e = hub_fwd.union(hub_fwd.selectExpr("dst as src", "src as dst")).distinct()
    hub_v = (
        spark.range(0, 1).selectExpr("id", "0 as label")
        .union(spark.range(1, 121).selectExpr("id", "1 as label"))
        .union(spark.range(100000, 100400).selectExpr("id", "2 as label"))
    )
    m = SubgraphMatcher(spark, hub_v, hub_e)
    fact_qv = {1: 0, 2: 1, 3: 2, 4: 1, 5: 2}
    fact_qe = {(1, 2), (2, 1), (2, 3), (3, 2), (1, 4), (4, 1), (4, 5), (5, 4)}
    plan = build_plan(fact_qv, fact_qe, order="degree", pseudo=True)
    f = m.frontier(plan, prune=True).agg(F.sum("cnt").alias("n"))
    with open(os.path.join(OUT, f"match_hub_pipeline_{TAG}.txt"), "w") as fh:
        fh.write(
            "# Pruned-pipeline count plan on a hub fixture (deferred same-label\n"
            "# leaf group). after: an Exchange RoundRobinPartitioning spreads the\n"
            "# melted distinct-tuple probe across full parallelism BEFORE the\n"
            "# exploding label-l adjacency legs join; before: no such exchange —\n"
            "# AQE coalesced the tuple set to ~2 partitions and the whole\n"
            "# Venn-atom fold ran 2-way parallel (8.8s of a 13s query at sf0.1).\n\n"
        )
        fh.write(_fmt(f, limit=2000))
    print(f"wrote match_hub_pipeline_{TAG}.txt")
    m.unpersist()


if __name__ == "__main__":
    main()
