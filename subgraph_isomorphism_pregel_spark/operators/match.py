"""Labeled subgraph-isomorphism matching: BSP frontier expansion as DataFrame
joins.

The reference implements MATCH as a vertex-centric message-passing pipeline
(/root/reference/src/pregel_app_subgraph.h:211-513): each superstep extends
every partial embedding by one query vertex along the sketch-tree order,
checking (a) label of the candidate, (b) injectivity against same-label
earlier positions, (c) adjacency to all backward non-tree neighbors
(`check_feasibility`, :70-83), then ships the grown embedding to the owner of
the new vertex.

Spark-first re-expression: the frontier is a DataFrame with an
``array<long>`` embedding column; one superstep == one equi-join

    frontier ⋈ adj ON element_at(m, parent_pos+1) = adj.src
               AND adj.dst_label = label(next_u)

plus whole-stage-codegen filters for injectivity, and one join against the
adjacency-list table for backward-edge checks (``array_contains``). Catalyst
plans the join (broadcast when adj is small, shuffle otherwise, AQE skew
splitting on hot vertices), which is exactly the hash-partitioned exchange the
reference hand-rolls with MPI. Pseudo children (degree-1 query leaves with a
query-unique label) are counted, not enumerated, from a precomputed
per-(vertex,label) neighbor-count table — the aggregate-pushdown of reference
M7 (`pregel_app_subgraph.h:153-209`).

Counts equal the reference's "Mapping count" (README.md:83: toy graph +
4-cycle query = 4), verified by golden + brute-force oracle tests.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.sketch_tree import QueryPlan, build_plan


def _perm_expr(cnt_col, k: int):
    """count * (count-1) * ... * (count-k+1) as a Column (injective choices
    of k distinct neighbors; reference math_choose, global.h:236-244)."""
    expr = (cnt_col - F.lit(0)).cast("long")
    for j in range(1, k):
        expr = expr * (cnt_col - F.lit(j))
    return expr


class SubgraphMatcher:
    """Reusable matcher over one data graph (build once, run many queries)."""

    def __init__(self, spark: SparkSession, vertices: DataFrame, edges: DataFrame):
        self.spark = spark
        # degree-decorated vertices (LDF: label-and-degree candidate filter —
        # the reference's Q7 hook is dead code (`pregel_app_subgraph.h:65-68`);
        # implemented for real here)
        deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))
        self.vertices = (
            vertices.join(deg, "id", "left")
            .select("id", "label", F.coalesce("degree", F.lit(0)).alias("degree"))
            .persist()
        )
        # adj: one row per directed edge with the destination's label+degree
        # (denormalized once — the reference caches neighbor labels in
        # KeyLabel entries, /root/reference/src/SItypes/SIValue.h:6-18)
        dstlab = self.vertices.select(
            F.col("id").alias("dst"),
            F.col("label").alias("dst_label"),
            F.col("degree").alias("dst_degree"),
        )
        self.adj = edges.join(dstlab, "dst").select("src", "dst", "dst_label", "dst_degree").persist()
        # adjacency list per vertex (for backward-edge membership tests)
        self.adjlist = (
            edges.groupBy("src")
            .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
            .withColumnRenamed("src", "al_id")
            .persist()
        )
        # per-(vertex, neighbor label) counts (for pseudo-child counting)
        self.nbr_label_counts = (
            self.adj.groupBy("src", "dst_label")
            .agg(F.count("*").alias("n_nbrs"))
            .withColumnRenamed("src", "nl_id")
            .persist()
        )

    def frontier(
        self, plan: QueryPlan, prune: bool = False, backward: str = "adjlist"
    ) -> DataFrame:
        """Run MATCH; returns (m: array<long>, cnt: long) — one row per
        embedding of the non-pseudo query vertices, cnt = multiplicity from
        counted pseudo children.

        backward='adjlist' checks non-tree edges with array_contains on the
        per-vertex collected neighbor array (fast when adjacency rows fit in
        memory); backward='semijoin' instead left-semi-joins the frontier
        against the EDGE TABLE per backward constraint — the hub-safe plan: a
        10^7-degree vertex stays 10^7 edge rows spread over partitions, never
        one multi-hundred-MB array cell.

        prune=True enables embedding-column pruning + factorized counting:
        after each extension, mapping positions that no later step references
        (as parent, backward neighbor, or same-label injectivity witness) are
        dropped and identical pruned rows are merged with summed counts — the
        Spark form of the reference's chd_constraint column pruning + dummy-
        vertex prefix sharing (`SIQuery.h:544-591`, `SIMessage.h:176-203`,
        `pregel_app_subgraph.h:85-99`). Counting-only (rows no longer carry
        full embeddings)."""
        # needed_after[i]: original positions some node j>i still references;
        # positions feeding the deferred conflict fix-up (parents of deferred
        # leaf groups + their enumerated same-label witnesses) stay live to
        # the very end
        n = len(plan.nodes)
        needed_after = [set() for _ in range(n)]
        acc: set[int] = set()
        for g in plan.deferred:
            acc |= {p for p, _ in g.parents} | set(g.enum_pos)
        deferred_need = set(acc)
        for j in range(n - 1, 0, -1):
            nd = plan.nodes[j]
            acc |= {nd.parent_pos, *nd.backward_pos, *nd.samelabel_pos}
            needed_after[j - 1] = set(acc)
        if n:
            needed_after[n - 1] = deferred_need

        root = plan.nodes[0]
        f = (
            self.vertices.where(
                (F.col("label") == root.label) & (F.col("degree") >= root.qdeg)
            )
            .select(F.array(F.col("id")).alias("m"), F.lit(1).cast("long").alias("cnt"))
        )
        f = self._apply_pseudo(f, root, slot_of=None)
        live = [0]  # original position -> slot: live.index(pos)

        def slot(pos: int) -> int:
            return live.index(pos) + 1  # 1-based element_at

        if prune:
            f, live = self._prune(f, live, needed_after[0])
        for node in plan.nodes[1:]:
            a = self.adj.where(
                (F.col("dst_label") == F.lit(node.label))
                & (F.col("dst_degree") >= F.lit(node.qdeg))
            ).alias("a")
            cond = F.element_at(F.col("m"), slot(node.parent_pos)) == F.col("a.src")
            f = f.join(a, cond)
            for p in node.samelabel_pos:
                f = f.where(F.element_at(F.col("m"), slot(p)) != F.col("a.dst"))
            if node.backward_pos:
                if backward == "semijoin":
                    # hub-safe: one left-semi join against the edge table per
                    # backward constraint; no per-vertex giant array row
                    for p in node.backward_pos:
                        be = self.adj.select(
                            F.col("src").alias(f"b{node.pos}_{p}_s"),
                            F.col("dst").alias(f"b{node.pos}_{p}_d"),
                        )
                        f = f.join(
                            be,
                            (F.col("a.dst") == F.col(f"b{node.pos}_{p}_s"))
                            & (
                                F.element_at(F.col("m"), slot(p))
                                == F.col(f"b{node.pos}_{p}_d")
                            ),
                            "left_semi",
                        )
                else:
                    al = self.adjlist.alias(f"al{node.pos}")
                    f = f.join(al, F.col("a.dst") == F.col(f"al{node.pos}.al_id"))
                    for p in node.backward_pos:
                        f = f.where(
                            F.array_contains(
                                F.col(f"al{node.pos}.nbrs"),
                                F.element_at(F.col("m"), slot(p)),
                            )
                        )
            f = f.select(
                F.concat(F.col("m"), F.array(F.col("a.dst"))).alias("m"),
                F.col("cnt"),
            )
            live = live + [node.pos]
            f = self._apply_pseudo(f, node, slot_of=slot)
            if prune:
                f, live = self._prune(f, live, needed_after[node.pos])
        f = self._apply_deferred(f, plan, slot)
        return f

    @staticmethod
    def _prune(f: DataFrame, live: list[int], needed: set[int]):
        keep = [p for p in live if p in needed]
        if keep == live:
            return f, live
        if not keep:
            # everything determined: a single-row count remains
            return f.agg(F.sum("cnt").alias("cnt")).select(
                F.array().cast("array<long>").alias("m"), F.col("cnt")
            ), []
        cols = F.array(*[F.element_at(F.col("m"), live.index(p) + 1) for p in keep])
        f = (
            f.select(cols.alias("m"), F.col("cnt"))
            .groupBy("m")
            .agg(F.sum("cnt").alias("cnt"))
        )
        return f, keep

    def _apply_deferred(self, f: DataFrame, plan: QueryPlan, slot) -> DataFrame:
        """Count deferred same-label leaf groups at plan end with conflict
        fix-up — the Spark form of the reference's conflict-aware branch
        assembly (`SIBranch.h:81-131,161-248`, `pregel_app_subgraph.h:85-99`):
        expansion never enumerated these leaves; here the multiplicative
        count is corrected algebraically instead of by cross-product pruning.

        Per group (label l):
        - each parent's candidate pool is n_nbrs(parent, l) minus every
          mapped enumerated l-vertex adjacent to that parent;
        - one parent, k leaves: falling factorial perm(pool, k);
        - two parents (k=1 each): pool_a * pool_b - |common pool| where the
          common-neighbor count is computed ONLY for the distinct mapped
          parent pairs (aggregate-then-join, never per frontier row)."""
        for gi, g in enumerate(plan.deferred):
            lbl = g.label
            pools = []
            hits = []  # per parent: list of array_contains indicator Columns
            for pi, (ppos, _k) in enumerate(g.parents):
                nl = self.nbr_label_counts.where(
                    F.col("dst_label") == F.lit(lbl)
                ).alias(f"dg{gi}_{pi}")
                f = f.join(
                    nl,
                    F.element_at(F.col("m"), slot(ppos))
                    == F.col(f"dg{gi}_{pi}.nl_id"),
                    "left",
                )
                pool = F.coalesce(F.col(f"dg{gi}_{pi}.n_nbrs"), F.lit(0)).cast("long")
                ind = []
                if g.enum_pos:
                    al = self.adjlist.alias(f"dga{gi}_{pi}")
                    f = f.join(
                        al,
                        F.element_at(F.col("m"), slot(ppos))
                        == F.col(f"dga{gi}_{pi}.al_id"),
                        "left",
                    )
                    for ep in g.enum_pos:
                        hit = F.array_contains(
                            F.col(f"dga{gi}_{pi}.nbrs"),
                            F.element_at(F.col("m"), slot(ep)),
                        )
                        ind.append(hit)
                        pool = pool - F.when(hit, 1).otherwise(0)
                pools.append(pool)
                hits.append(ind)

            if len(g.parents) == 1:
                k = g.parents[0][1]
                f = f.where(pools[0] >= k).select(
                    F.col("m"), (F.col("cnt") * _perm_expr(pools[0], k)).alias("cnt")
                )
            else:
                (p1, _), (p2, _) = g.parents
                x = F.element_at(F.col("m"), slot(p1))
                y = F.element_at(F.col("m"), slot(p2))
                # common-neighbor counts for the distinct mapped parent pairs
                pairs = f.select(x.alias("x"), y.alias("y")).distinct()
                a1 = self.adj.where(F.col("dst_label") == F.lit(lbl)).select(
                    F.col("src").alias("x"), F.col("dst").alias("z")
                )
                a2 = self.adj.where(F.col("dst_label") == F.lit(lbl)).select(
                    F.col("src").alias("y"), F.col("dst").alias("z")
                )
                cn = (
                    pairs.join(a1, "x")
                    .join(a2, ["y", "z"])
                    .groupBy("x", "y")
                    .agg(F.count("*").alias(f"t_raw_{gi}"))
                )
                f = f.join(cn, [x == cn["x"], y == cn["y"]], "left")
                t = F.coalesce(F.col(f"t_raw_{gi}"), F.lit(0)).cast("long")
                # an enumerated l-vertex adjacent to BOTH parents was
                # subtracted from both pools AND sits in the common pool
                for ep_i in range(len(g.enum_pos)):
                    both = hits[0][ep_i] & hits[1][ep_i]
                    t = t - F.when(both, 1).otherwise(0)
                total = pools[0] * pools[1] - t
                f = f.where(total > 0).select(
                    F.col("m"), (F.col("cnt") * total).alias("cnt")
                )
        return f

    def _apply_pseudo(self, f: DataFrame, node, slot_of=None) -> DataFrame:
        """Fold counted pseudo children of `node` into cnt."""
        pos1 = slot_of(node.pos) if slot_of else node.pos + 1
        for lbl, k in node.pseudo:
            nl = self.nbr_label_counts.where(F.col("dst_label") == F.lit(lbl)).alias(
                f"nl{node.pos}_{lbl}"
            )
            f = (
                f.join(
                    nl,
                    F.element_at(F.col("m"), pos1) == F.col(f"nl{node.pos}_{lbl}.nl_id"),
                    "left",
                )
                .withColumn("_pc", F.coalesce(F.col(f"nl{node.pos}_{lbl}.n_nbrs"), F.lit(0)))
                .where(F.col("_pc") >= k)
                .select(F.col("m"), (F.col("cnt") * _perm_expr(F.col("_pc"), k)).alias("cnt"))
            )
        return f

    def candidate_counts(
        self, query_v: dict[int, int], query_e: set[tuple[int, int]]
    ) -> dict[int, int]:
        """LDF candidate cardinality per query vertex (one aggregation pass):
        |{v : label(v)=label(u), deg(v) >= deg_q(u)}| — drives
        order='candidate' (the reference's aggregator-diagonal heuristic,
        `SIQuery.h:261-268`)."""
        qdeg: dict[int, int] = {u: 0 for u in query_v}
        for a, _ in query_e:
            qdeg[a] += 1
        aggs = [
            F.sum(
                ((F.col("label") == l) & (F.col("degree") >= qdeg[u])).cast("long")
            ).alias(f"c_{u}")
            for u, l in query_v.items()
        ]
        row = self.vertices.agg(*aggs).collect()[0]
        return {u: int(row[f"c_{u}"] or 0) for u in query_v}

    def count(
        self,
        query_v: dict[int, int],
        query_e: set[tuple[int, int]],
        order: str = "degree",
        pseudo: bool = True,
        prune: bool = False,
        backward: str = "adjlist",
    ) -> int:
        """Number of injective label/edge-preserving mappings V(Q) -> V(G) —
        the reference's "Mapping count" (/root/reference/README.md:83)."""
        cand = self.candidate_counts(query_v, query_e) if order == "candidate" else None
        plan = build_plan(query_v, query_e, order=order, pseudo=pseudo, cand_counts=cand)
        f = self.frontier(plan, prune=prune, backward=backward)
        row = f.agg(F.sum("cnt").alias("n")).collect()[0]
        return int(row["n"] or 0)

    def embeddings(
        self,
        query_v: dict[int, int],
        query_e: set[tuple[int, int]],
        order: str = "degree",
    ) -> DataFrame:
        """Materialized embeddings: one column ``u_<qid>`` per query vertex
        (pseudo counting and pruning disabled so every query vertex is
        enumerated — the flag the reference ships disabled, SURVEY §2.1 S5)."""
        cand = self.candidate_counts(query_v, query_e) if order == "candidate" else None
        plan = build_plan(query_v, query_e, order=order, pseudo=False, cand_counts=cand)
        f = self.frontier(plan)
        cols = [
            F.element_at(F.col("m"), node.pos + 1).alias(f"u_{node.u}")
            for node in plan.nodes
        ]
        return f.select(*cols)

    def unpersist(self) -> None:
        self.vertices.unpersist()
        self.adj.unpersist()
        self.adjlist.unpersist()
        self.nbr_label_counts.unpersist()


def match_count(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    query_v: dict[int, int],
    query_e: set[tuple[int, int]],
    order: str = "degree",
    pseudo: bool = True,
) -> int:
    m = SubgraphMatcher(spark, vertices, edges)
    try:
        return m.count(query_v, query_e, order=order, pseudo=pseudo)
    finally:
        m.unpersist()
