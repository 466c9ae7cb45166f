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
import warnings
from itertools import combinations, product

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.sketch_tree import PlanDowngradeWarning, QueryPlan, build_plan

# Deferred-group polynomial evaluation tiers: up to this many terms the
# polynomial is one whole-stage-codegen Column expression; above it (the
# plan guard admits up to DEFER_MAX_TERMS) the same terms evaluate in a
# single Arrow-batched vectorized pandas UDF over the atom columns — a
# giant Column tree both hangs the py4j driver building it and blows the
# JVM's 64KB codegen method limit.
CODEGEN_MAX_TERMS = 64

# backward='auto': use the hub-safe per-constraint left-semi-join plan once
# any vertex degree exceeds this (an adjacency array cell of 100k longs is
# ~0.8 MB; a 10^7-degree hub would be one ~80 MB shuffle row).
HUB_DEGREE_THRESHOLD = 100_000

# deferred-group legs: spread the melted probe tuples across the full
# parallelism only when the graph can actually EXPLODE them — the legs
# stream is bounded by |tuples| x parents x max_degree, so on a
# low-max-degree graph a tuple set small enough for AQE to coalesce stays
# small after the join and the extra exchange is pure cost (measured
# +0.3-0.5 s on the ring's tiny deferred queries, -8 s on the hub).
DEFER_SPREAD_MIN_DEGREE = 64

# factorize='auto': branch-factorize when the simulated flat-pipeline
# stream (_flat_stream_est — the same estimator the nested decision uses)
# exceeds this multiple of the summed per-branch grouped-table streams —
# the assembly's extra jobs cost ~2s of fixed overhead locally, so only
# clearly product-dominated shapes should switch.
FACTORIZE_RATIO = 64.0

# Maximum NESTING depth of branch factorization: the top-level split plus
# this many recursive splits inside branches (the reference stages branch
# numbers to arbitrary depth, SIQuery.h:429-486; real queries rarely need
# more than two or three levels, and each level multiplies assembly jobs).
FACTORIZE_MAX_DEPTH = 3

# nested='auto' recurses only when the simulated PRUNED-pipeline stream of
# the branch exceeds this many rows: below it, whole-stage-codegen
# streaming through the prefix-merge aggregates (which performs the same
# factorization implicitly — see _flat_stream_est) beats the assembly's
# extra stages. MEASURED on local[32]: a ~3x10^8-row pruned stream runs in
# ~11 s while the equivalent 2-level assembly pays ~15 s of stage overhead
# on ~2x10^8 joined rows; the crossover is order 10^10.
NESTED_MIN_STREAM = 1e10


def _perm_expr(cnt_col, k: int):
    """count * (count-1) * ... * (count-k+1) as a Column (injective choices
    of k distinct neighbors; reference math_choose, global.h:236-244)."""
    expr = (cnt_col - F.lit(0)).cast("long")
    for j in range(1, k):
        expr = expr * (cnt_col - F.lit(j))
    return expr


def _compositions(k: int, bins: int):
    """All ways to write k as an ordered sum of `bins` non-negative ints."""
    if bins == 1:
        yield (k,)
        return
    for first in range(k + 1):
        for rest in _compositions(k - first, bins - 1):
            yield (first,) + rest


def _multinomial(k: int, parts) -> int:
    r = math.factorial(k)
    for t in parts:
        r //= math.factorial(t)
    return r


def _poly_pandas_udf(spec):
    """Vectorized evaluator for a dense plan-time polynomial: spec is a
    list of (coeff, ((atom_column_index, falling_factorial_exponent), ...))
    terms; the UDF receives the atom-size columns and computes
    Σ coeff · Π P(n_atom, exp) with numpy over the whole Arrow batch —
    the >CODEGEN_MAX_TERMS tier of the deferred-group counting (a Column
    tree of thousands of terms hangs the py4j driver and overflows JVM
    codegen; see plans/sketch_tree.DEFER_MAX_TERMS for the plan guard)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # variadic signatures can't carry pandas type hints (PySpark eval-type
    # inference rejects them) — legacy SCALAR inference handles bare *cols
    @pandas_udf("long")
    def poly(*cols):
        arrs = [c.to_numpy(dtype="int64") for c in cols]
        n = len(arrs[0]) if arrs else 0
        total = np.zeros(n, dtype="int64")
        ftotal = np.zeros(n, dtype="float64")  # overflow sentinel mirror
        for coeff, factors in spec:
            t = np.full(n, coeff, dtype="int64")
            ft = np.full(n, float(coeff))
            for ai, texp in factors:
                a = arrs[ai]
                for j in range(texp):
                    t = t * (a - j)
                    ft = ft * (a - j)
            total = total + t
            ftotal = ftotal + ft
        # every term is non-negative (coeff > 0; a falling factorial past
        # its pool size contains a zero factor), so the float64 mirror is
        # monotone: past ~2^63 the int64 sum has silently wrapped — raise
        # instead (the count()'s documented int64 ceiling)
        if np.any(ftotal > 9.0e18):
            raise OverflowError(
                "deferred-group count exceeds the int64 ceiling (~9.2e18); "
                "the exact count is too large to return as a long"
            )
        return pd.Series(total)

    return poly


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
        # per-(vertex, neighbor label) counts (for pseudo-child counting)
        self.nbr_label_counts = (
            self.adj.groupBy("src", "dst_label")
            .agg(F.count("*").alias("n_nbrs"))
            .withColumnRenamed("src", "nl_id")
            .persist()
        )
        self._adjlist: DataFrame | None = None
        self._max_degree: int | None = None
        self._label_fanout: dict[tuple[int, int], float] | None = None
        self._label_sizes: dict[int, int] = {}
        # deferred-group counting: EXPLICIT broadcast hints on the distinct
        # frontier-key tuple set (adjacency probe + counts join-back, see
        # _apply_deferred_group). Default OFF: with AQE enabled the runtime
        # re-plan already converts these joins to broadcast from observed
        # shuffle sizes (verified in the executed plan), while the explicit
        # hint forces eager driver-side collects that MEASURED ~25% slower
        # on overhead-bound frontiers (sf0.1: acbc 2.06s hinted vs 1.64s
        # AQE). Set True only for non-AQE deployments.
        self.defer_broadcast = False
        # frontiers cached at deferred-group application points (the prefix
        # feeds the main path, the tuple-set broadcast, AND the counts
        # broadcast — caching computes it once); released by unpersist()
        self._temps: list[DataFrame] = []

    @property
    def label_fanout(self) -> dict[tuple[int, int], float]:
        """(src_label, dst_label) -> average number of dst_label neighbors
        per src_label vertex, over ALL src_label vertices (absent pairs are
        0). One cached aggregate over the persisted adjacency — drives the
        factorize='auto' cost estimate."""
        if self._label_fanout is None:
            by_label = (
                self.adj.join(
                    self.vertices.select(
                        F.col("id").alias("src"), F.col("label").alias("src_label")
                    ),
                    "src",
                )
                .groupBy("src_label", "dst_label")
                .agg(F.count("*").alias("n_edges"))
            )
            label_sizes = {
                r["label"]: r["n"]
                for r in self.vertices.groupBy("label")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            self._label_sizes = label_sizes
            self._label_fanout = {
                (r["src_label"], r["dst_label"]): r["n_edges"]
                / max(label_sizes.get(r["src_label"], 1), 1)
                for r in by_label.collect()
            }
        return self._label_fanout

    @property
    def adjlist(self) -> DataFrame:
        """Per-vertex collected adjacency array (backward-edge membership
        tests) — built LAZILY: when backward='auto' resolves to the
        hub-safe semijoin plan this collect_list (the one structure whose
        row size scales with max degree) is never materialized at all."""
        if self._adjlist is None:
            self._adjlist = (
                self.adj.groupBy("src")
                .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
                .withColumnRenamed("src", "al_id")
                .persist()
            )
        return self._adjlist

    @property
    def max_degree(self) -> int:
        """Max out-degree in the data graph (one agg over the persisted
        vertex table; cached) — drives the backward='auto' plan pick."""
        if self._max_degree is None:
            row = self.vertices.agg(F.max("degree").alias("d")).collect()[0]
            self._max_degree = int(row["d"] or 0)
        return self._max_degree

    def resolve_backward(
        self, plan: QueryPlan, backward: str, hub_threshold: int = HUB_DEGREE_THRESHOLD
    ) -> str:
        """'auto' -> 'adjlist' (small max degree: the collected-array probe
        measured faster) or 'semijoin' (hub-safe: a high-degree vertex stays
        that many edge ROWS spread across partitions, never one giant array
        cell — the scale analog of the reference's per-vertex nbs_set,
        SIValue.h:38-41). Plans with no backward constraints never touch
        either structure, so 'auto' resolves to 'adjlist' trivially."""
        if backward != "auto":
            return backward
        if not any(nd.backward_pos for nd in plan.nodes):
            return "adjlist"
        return "semijoin" if self.max_degree > hub_threshold else "adjlist"

    def frontier(
        self,
        plan: QueryPlan,
        prune: bool = False,
        backward: str = "auto",
        keep_pos: frozenset[int] | set[int] = frozenset(),
        live_out: list[int] | None = None,
    ) -> DataFrame:
        """Run MATCH; returns (m: array<long>, cnt: long) — one row per
        embedding of the non-pseudo query vertices, cnt = multiplicity from
        counted pseudo children.

        keep_pos: original plan positions that must SURVIVE pruning to the
        end (grouping keys for the factorized branch tables); live_out, if
        given, is filled in place with the final live position list so the
        caller can map positions to array slots after pruning.

        backward='adjlist' checks non-tree edges with array_contains on the
        per-vertex collected neighbor array (fast when adjacency rows fit in
        memory); backward='semijoin' instead left-semi-joins the frontier
        against the EDGE TABLE per backward constraint — the hub-safe plan: a
        10^7-degree vertex stays 10^7 edge rows spread over partitions, never
        one multi-hundred-MB array cell. backward='auto' (default) picks by
        the graph's max degree (see resolve_backward).

        prune=True enables embedding-column pruning + factorized counting:
        after each extension, mapping positions that no later step references
        (as parent, backward neighbor, or same-label injectivity witness) are
        dropped and identical pruned rows are merged with summed counts — the
        Spark form of the reference's chd_constraint column pruning + dummy-
        vertex prefix sharing (`SIQuery.h:544-591`, `SIMessage.h:176-203`,
        `pregel_app_subgraph.h:85-99`). Counting-only (rows no longer carry
        full embeddings).

        Deferred same-label leaf groups are applied at the EARLIEST position
        where all their parents and same-label witnesses are mapped (not at
        plan end), so (a) their referenced columns stop blocking _prune's
        prefix merging as soon as possible — the factorization the
        reference's staged branch assembly gets from dummy vertices
        (`SIBranch.h:161-248`) — and (b) rows whose conflict-corrected count
        is zero leave the frontier before later extensions."""
        backward = self.resolve_backward(plan, backward)
        n = len(plan.nodes)
        # group gi is ready right after this position's extension step
        ready_at = {
            gi: max([p for p, _ in g.parents] + list(g.enum_pos))
            for gi, g in enumerate(plan.deferred)
        }
        groups_at: dict[int, list[int]] = {}
        for gi, pos in ready_at.items():
            groups_at.setdefault(pos, []).append(gi)
        # needed_after[i]: original positions some LATER consumer references
        # (a node j>i as parent/backward/injectivity-witness, a deferred
        # group applied after position i, or a caller-requested keep_pos
        # grouping key that must survive to the end)
        keep_set = set(keep_pos)
        needed_after = [set(keep_set) for _ in range(n)]
        acc: set[int] = set(keep_set)
        for j in range(n - 1, 0, -1):
            nd = plan.nodes[j]
            acc |= {nd.parent_pos, *nd.backward_pos, *nd.samelabel_pos}
            for gi in groups_at.get(j, ()):
                g = plan.deferred[gi]
                acc |= {p for p, _ in g.parents} | set(g.enum_pos)
            needed_after[j - 1] = set(acc)

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

        for gi in groups_at.get(0, ()):
            f = self._apply_deferred_group(f, plan.deferred[gi], gi, slot)
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
            for gi in groups_at.get(node.pos, ()):
                f = self._apply_deferred_group(f, plan.deferred[gi], gi, slot)
            if prune:
                f, live = self._prune(f, live, needed_after[node.pos])
        if live_out is not None:
            live_out[:] = live
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
        # group on SCALAR key columns and re-assemble the array after the
        # aggregate: hashing/equality on flat longs beats per-row array
        # allocation + array hashing in the hash aggregate (measured ~15%
        # on a 2e8-row merge), and the result is identical
        keys = [
            F.element_at(F.col("m"), live.index(p) + 1).alias(f"__mk{i}")
            for i, p in enumerate(keep)
        ]
        kn = [f"__mk{i}" for i in range(len(keep))]
        f = (
            f.select(*keys, F.col("cnt"))
            .groupBy(*kn)
            .agg(F.sum("cnt").alias("cnt"))
            .select(F.array(*kn).alias("m"), F.col("cnt"))
        )
        return f, keep

    def _apply_deferred_group(self, f: DataFrame, g, gi: int, slot) -> DataFrame:
        """Count one deferred same-label leaf group with conflict fix-up —
        the Spark form of the reference's conflict-aware branch
        assembly (`SIBranch.h:81-131,161-248`, `pregel_app_subgraph.h:85-99`):
        expansion never enumerated these leaves; here the multiplicative
        count is corrected algebraically instead of by cross-product pruning.
        Called from `frontier` at the group's earliest ready position.

        GENERAL shape (any number of parents, any multiplicities). Per group
        (label l, parents p_1..p_m with k_i leaves each):

        1. exact Venn-atom sizes of the parents' label-l neighbor pools in
           ONE aggregate pass over the DISTINCT mapped (parent, witness)
           tuples: union the m adjacency legs tagged with bit 2^i, fold per
           (tuple, neighbor) into the neighbor's parent-adjacency bitmask,
           count per (tuple, mask) — never a per-frontier-row expansion,
           never a 2^m-join pipeline (a witness-free m=1 group
           short-circuits to the per-(vertex,label) count table: a single
           broadcast join);
        2. each mapped enumerated l-vertex is subtracted from the ONE atom
           matching its exact parent-adjacency pattern (injectivity). Its
           mask comes from the SAME aggregate pass (max over the legs rows
           whose neighbor equals the witness image) — hub-safe: no
           per-vertex collected adjacency array ever rides a join cell;
        3. the number of injective leaf assignments expands at PLAN TIME
           into a polynomial in the atom sizes:
               Σ_dist Π_i multinomial(k_i; t_{i,A}) · Π_A P(n_A, Σ_i t_{i,A})
           over all distributions of each parent's k_i leaves among the
           atoms containing that parent (P = falling factorial). m=1 reduces
           to perm(pool, k); m=2, k=1+1 reduces to |A||B| − |A∩B|.
           Up to CODEGEN_MAX_TERMS the polynomial is one whole-stage-codegen
           Column expression; denser groups (the plan guard admits up to
           DEFER_MAX_TERMS) evaluate the SAME plan-time term list in one
           Arrow-batched vectorized pandas UDF over the atom columns —
           numpy term loop per batch, never per row.

        Every step is a per-frontier-row columnar expression plus two
        aggregate shuffles — no per-row Python, no enumeration of the
        leaves."""
        lbl = g.label
        m_parents = len(g.parents)
        ks = [k for _, k in g.parents]
        # bind parent images as named columns (name-based joins below)
        pcols = []
        for i, (ppos, _k) in enumerate(g.parents):
            c = f"dgp{gi}_{i}"
            f = f.withColumn(c, F.element_at(F.col("m"), slot(ppos)))
            pcols.append(c)

        # bind witness images (mapped enumerated same-label vertices)
        wcols = []
        for ei, ep in enumerate(g.enum_pos):
            wc = f"dgw{gi}_{ei}"
            f = f.withColumn(wc, F.element_at(F.col("m"), slot(ep)))
            wcols.append(wc)

        # 1. exact atom sizes + per-witness atom masks, keyed by
        # parent-adjacency bitmask, in one aggregate pass
        atom_raw: dict[frozenset, object] = {}
        wmask_cols: list[str] = []
        if m_parents == 1 and not wcols:
            nl = self.nbr_label_counts.where(
                F.col("dst_label") == F.lit(lbl)
            ).alias(f"dg{gi}_0")
            f = f.join(
                nl, F.col(pcols[0]) == F.col(f"dg{gi}_0.nl_id"), "left"
            )
            atom_raw[frozenset([0])] = F.coalesce(
                F.col(f"dg{gi}_0.n_nbrs"), F.lit(0)
            ).cast("long")
        else:
            key = pcols + wcols
            # cache the frontier-so-far: three consumers read this prefix
            # (the main count path, the broadcast tuple-set collect, and
            # the broadcast counts collect) — without the cache each would
            # recompute the whole join pipeline up to this point
            f = f.persist()
            self._temps.append(f)
            tup = f.select(*key).distinct()
            # melt the (small, distinct) tuple set into (key, parent image,
            # bit) rows so the label-l adjacency is probed by ONE join for
            # ALL m legs (the r3/r4 regression: m separate joins of the
            # full label-l adjacency per group). The melted side is the
            # distinct (pruned) frontier key set — orders of magnitude
            # smaller than the adjacency — so AQE's runtime re-plan turns
            # this into a broadcast hash join from observed sizes (the
            # adjacency never shuffles; verified in the executed plan);
            # defer_broadcast=True adds explicit hints for non-AQE runs.
            melted = None
            for i in range(m_parents):
                part = tup.select(
                    *key,
                    F.col(pcols[i]).alias(f"__src{gi}"),
                    F.lit(1 << i).alias(f"__bit{gi}"),
                )
                melted = part if melted is None else melted.unionByName(part)
            if self.defer_broadcast:
                melted = F.broadcast(melted)
            elif self.max_degree >= DEFER_SPREAD_MIN_DEGREE:
                # the distinct-tuple set is SMALL (AQE coalesces it to a
                # couple of partitions by byte size) but the legs join
                # below EXPLODES it by the per-parent label fanout — a
                # blowup AQE cannot see, so the whole fold ran as 2 tasks
                # on 32 cores on the hub fixture (8.8s of a 13s query).
                # Round-robin the melted tuples across the full
                # parallelism first; the exchange is proportional to the
                # tuple set, not the exploded stream — scale-safe. Gated
                # on max degree (see DEFER_SPREAD_MIN_DEGREE): a graph
                # that cannot fan a tuple out past ~64 rows keeps the
                # coalesced partitioning.
                melted = melted.repartition(
                    melted.sparkSession.sparkContext.defaultParallelism
                )
            ai = self.adj.where(F.col("dst_label") == F.lit(lbl)).select(
                F.col("src").alias(f"__src{gi}"),
                F.col("dst").alias(f"__nb{gi}"),
            )
            legs = melted.join(ai, f"__src{gi}")
            masks = legs.groupBy(*key, f"__nb{gi}").agg(
                F.sum(f"__bit{gi}").alias(f"__mask{gi}")
            )
            aggs = []
            for size in range(1, m_parents + 1):
                for A in combinations(range(m_parents), size):
                    mask = sum(1 << i for i in A)
                    aggs.append(
                        F.sum(
                            (F.col(f"__mask{gi}") == mask).cast("long")
                        ).alias(f"dgn{gi}_raw_{mask}")
                    )
            for ei in range(len(wcols)):
                # the witness's own parent-adjacency mask: the legs row
                # whose neighbor IS the witness image (at most one after
                # the mask fold); null = adjacent to no parent
                aggs.append(
                    F.max(
                        F.when(
                            F.col(f"__nb{gi}") == F.col(wcols[ei]),
                            F.col(f"__mask{gi}"),
                        )
                    ).alias(f"dgwm{gi}_{ei}")
                )
                wmask_cols.append(f"dgwm{gi}_{ei}")
            counts = masks.groupBy(*key).agg(*aggs)
            # counts has <= |tup| rows (one per distinct key tuple) — joined
            # back broadcast so the frontier itself never shuffles either
            if self.defer_broadcast:
                counts = F.broadcast(counts)
            f = f.join(counts, key, "left")
            for size in range(1, m_parents + 1):
                for A in combinations(range(m_parents), size):
                    mask = sum(1 << i for i in A)
                    atom_raw[frozenset(A)] = F.coalesce(
                        F.col(f"dgn{gi}_raw_{mask}"), F.lit(0)
                    ).cast("long")

        # 2. witness-corrected atom sizes (materialized as columns —
        # each is referenced by many polynomial terms below)
        atoms = [
            frozenset(A)
            for size in range(1, m_parents + 1)
            for A in combinations(range(m_parents), size)
        ]
        atom_col: dict[frozenset, str] = {}
        for A in atoms:
            expr = atom_raw[A]
            amask = sum(1 << i for i in A)
            for wm in wmask_cols:
                expr = expr - F.when(F.col(wm) == amask, 1).otherwise(0)
            name = f"dgn{gi}_" + "_".join(map(str, sorted(A)))
            f = f.withColumn(name, expr)
            atom_col[A] = name

        # 3. plan-time polynomial over distributions: collect the term list
        # first (coeff, {atom: exponent}), then pick the evaluation tier
        per_parent_atoms = [[a for a in atoms if i in a] for i in range(m_parents)]
        terms: list[tuple[int, dict[frozenset, int]]] = []
        for joint in product(
            *[
                list(_compositions(ks[i], len(per_parent_atoms[i])))
                for i in range(m_parents)
            ]
        ):
            coeff = 1
            T: dict[frozenset, int] = {a: 0 for a in atoms}
            for i in range(m_parents):
                coeff *= _multinomial(ks[i], joint[i])
                for a, t in zip(per_parent_atoms[i], joint[i]):
                    T[a] += t
            terms.append((coeff, {a: t for a, t in T.items() if t}))

        if len(terms) <= CODEGEN_MAX_TERMS:
            total = None
            for coeff, T in terms:
                term = F.lit(coeff).cast("long")
                for a, t in T.items():
                    term = term * _perm_expr(F.col(atom_col[a]), t)
                total = term if total is None else (total + term)
            f = f.withColumn(f"dgt{gi}", total)
        else:
            atom_index = {a: i for i, a in enumerate(atoms)}
            spec = [
                (coeff, tuple((atom_index[a], t) for a, t in T.items()))
                for coeff, T in terms
            ]
            poly = _poly_pandas_udf(spec)
            f = f.withColumn(
                f"dgt{gi}", poly(*[F.col(atom_col[a]) for a in atoms])
            )
        # bind the polynomial once; filter and project reference the column
        return (
            f.where(F.col(f"dgt{gi}") > 0)
            .select(F.col("m"), (F.col("cnt") * F.col(f"dgt{gi}")).alias("cnt"))
        )

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
        backward: str = "auto",
        factorize: bool | str = False,
    ) -> int:
        """Number of injective label/edge-preserving mappings V(Q) -> V(G) —
        the reference's "Mapping count" (/root/reference/README.md:83).

        Counts are exact up to the int64 ceiling (~9.2e18): per-row factors
        (pseudo permutations, deferred-group polynomials) are computed as
        longs, so astronomically large counts cannot be represented — the
        pandas-UDF polynomial tier raises OverflowError past the ceiling
        rather than wrapping; the codegen tiers share the same bound.

        factorize=True tries branch-factorized counting first (independent
        branch enumeration + inclusion–exclusion assembly of cross-branch
        same-label conflicts; see count_tree_factorized) and falls back to
        the join pipeline when the shape doesn't admit it. factorize='auto'
        additionally consults the label-fanout cost model
        (should_factorize): only product-dominated shapes switch."""
        if factorize == "auto":
            factorize = self.should_factorize(
                query_v, query_e, order=order, prune=prune
            )
        if factorize:
            nf = self.count_tree_factorized(query_v, query_e, order=order)
            if nf is not None:
                return nf
        cand = self.candidate_counts(query_v, query_e) if order == "candidate" else None
        plan = build_plan(query_v, query_e, order=order, pseudo=pseudo, cand_counts=cand)
        f = self.frontier(plan, prune=prune, backward=backward)
        row = f.agg(F.sum("cnt").alias("n")).collect()[0]
        return int(row["n"] or 0)

    def count_tree_factorized(
        self,
        query_v: dict[int, int],
        query_e: set[tuple[int, int]],
        order: str = "degree",
        max_pairs: int = 6,
        nested: bool | str = "auto",
    ) -> int | None:
        """Branch-factorized counting with INTERNAL same-label conflict
        deferral — the Spark form of the reference's conflict-aware branch
        assembly for ENUMERATED (non-leaf) vertices (`SIBranch.h:161-248`
        marked-choice trees, `SIQuery.h` Conflict index chains): each root
        branch is enumerated INDEPENDENTLY and cross-branch injectivity is
        restored algebraically at assembly time, never by materializing the
        cross product of branches.

        Applies whenever the root is an ARTICULATION point of the query:
        branches are the connected components of Q minus the root, so no
        query edge crosses branches, and each branch sub-query (root +
        branch) may itself contain cycles — its sub-frontier checks those
        backward edges exactly like the main pipeline. Tree queries are
        the common case (every non-root vertex of a tree splits off).

        Why this is exact: an injectivity violation can only happen between
        two query vertices of the SAME label. Within one branch (which
        includes the shared root) the branch sub-plan enforces these during
        enumeration exactly like the main pipeline; ACROSS branches the
        only possible violations are the cross-branch same-label pairs P,
        corrected by inclusion–exclusion over subsets M ⊆ P:

            count = Σ_M (−1)^|M| Σ_va Π_i C_i^M(va, pinned images)

        where C_i^M is branch i's embedding count grouped by the anchor
        image and the images of its vertices appearing in M, joined with
        the pair equalities in M pinned. One Spark job: every term is a
        join-aggregate over the (small) grouped branch tables, unioned and
        summed once.

        Returns None when the shape doesn't factorize — the chosen root is
        not an articulation point, more than `max_pairs` cross-branch
        conflict pairs, or a trivial query — and the caller falls back to
        the standard frontier. Per-branch sub-plans keep the full
        pseudo/deferred leaf machinery whenever every label of the branch
        is confined to it, and run through the PRUNED pipeline with the
        grouping images pinned live.

        `nested` (default 'auto'): branches may themselves be counted by
        branch factorization at their own articulation vertices —
        multi-LEVEL factorization, the analog of the reference's staged
        branch numbers (`SIQuery.h:429-486`); see _tree_factorized_df.
        With nested=False every branch runs the flat pipeline (the
        single-level round-4 behavior)."""
        built = self._tree_factorized_df(query_v, query_e, order, max_pairs, nested)
        if built is None:
            return None
        total, tables = built
        try:
            row = total.agg(F.sum("t").alias("n")).collect()[0]
            return int(row["n"] or 0)
        finally:
            for t in tables:
                t.unpersist()

    def _branch_decomposition(
        self,
        query_v: dict[int, int],
        query_e: set[tuple[int, int]],
        order: str = "degree",
        max_pairs: int = 6,
    ):
        """(root_u, branches, spanning labels, cross-branch pairs,
        cand_counts) when the query admits branch factorization, else None:
        some vertex must be an articulation point (the order-chosen plan
        root is preferred; counting is root-agnostic, so any other split
        vertex works when it is not), the query connected and non-trivial,
        and at most max_pairs cross-branch same-label pairs."""
        n = len(query_v)
        if n <= 2:
            return None  # trivial: the pipeline is already flat
        # root selection mirrors the pipeline plan's
        cand = self.candidate_counts(query_v, query_e) if order == "candidate" else None
        plan_root = build_plan(
            query_v, query_e, order=order, pseudo=False, cand_counts=cand
        ).nodes[0].u
        adj: dict[int, set[int]] = {u: set() for u in query_v}
        for a, b in query_e:
            adj[a].add(b)
            adj[b].add(a)

        def split(root_u: int):
            """Connected components of the query minus root_u, or None if
            root_u is not an articulation point / query is disconnected."""
            seen: set[int] = {root_u}
            comps: list[set[int]] = []
            for c in sorted(adj[root_u]):
                if c in seen:
                    continue
                comp, stack = set(), [c]
                while stack:
                    x = stack.pop()
                    if x in seen:
                        continue
                    seen.add(x)
                    comp.add(x)
                    stack.extend(adj[x] - seen)
                comps.append(comp)
            if len(comps) < 2 or len(seen) != n:
                return None
            return comps

        branches = split(plan_root)
        root_u = plan_root
        if branches is None:
            # the plan root doesn't split the query, but another vertex may
            # (queries are tiny: trying each vertex is O(V*E) driver work).
            # Prefer the vertex yielding the most branches, then max degree.
            best = None
            for u in sorted(query_v, key=lambda x: (-len(adj[x]), x)):
                if u == plan_root:
                    continue
                comps = split(u)
                if comps is not None and (best is None or len(comps) > len(best[1])):
                    best = (u, comps)
            if best is None:
                return None  # biconnected: the pipeline is the only plan
            root_u, branches = best
        # labels spanning >1 branch create the cross-branch conflict pairs
        label_branches: dict[int, set[int]] = {}
        for bi, comp in enumerate(branches):
            for u in comp:
                label_branches.setdefault(query_v[u], set()).add(bi)
        spanning = {l for l, bs in label_branches.items() if len(bs) > 1}
        pairs: list[tuple[int, int]] = []  # (query vertex x, query vertex y)
        branch_of = {u: bi for bi, comp in enumerate(branches) for u in comp}
        for l in sorted(spanning):
            vs = sorted(u for u in query_v if query_v[u] == l and u in branch_of)
            for i in range(len(vs)):
                for j in range(i + 1, len(vs)):
                    if branch_of[vs[i]] != branch_of[vs[j]]:
                        pairs.append((vs[i], vs[j]))
        if len(pairs) > max_pairs:
            return None  # 2^|P| assembly terms: hand back to the pipeline
        return root_u, branches, spanning, pairs, cand

    def should_factorize(
        self,
        query_v: dict[int, int],
        query_e: set[tuple[int, int]],
        order: str = "degree",
        ratio: float = FACTORIZE_RATIO,
        prune: bool = True,
    ) -> bool:
        """factorize='auto' cost model, SAME estimator as the nested
        decision inside _grouped_count: simulate the flat pipeline's
        streamed row count with _flat_stream_est (the prefix merge
        factorizes implicitly, so a naive branch-product bound wildly
        overstates the pipeline — the round-5 deep-chain measurement) and
        compare against the sum of the per-branch grouped-table streams
        the assembly would build (each branch keyed by the anchor plus its
        conflict-pinned images). Factorize iff the flat stream exceeds
        `ratio` x the factorized work.

        prune: whether the flat alternative would run with prefix merging
        (count() passes its own flag; embeddings() passes False since
        materialization cannot merge). With prune=False the flat estimate
        is the full un-merged product trace — the honest cost of the path
        actually taken.

        Validated picks (tests + bench): uniform ring/random -> pipeline
        (stream ~ branch sum); bench hub (9e8-row frontier, same-label
        witnesses pinned live so the merge cannot collapse it) ->
        factorized, measured 7.5x; deep chain whose merge DOES collapse
        the stream to ~3e8 rows -> pipeline (measured 11.2s vs 14.6s
        assembly)."""
        dec = self._branch_decomposition(query_v, query_e, order)
        if dec is None:
            return False
        root_u, branches, _spanning, pairs, _cand = dec
        # a zero label-pair fanout on some spanning walk means the
        # pipeline dies instantly on an empty join — never pay the
        # assembly's fixed overhead for a provably-0 count
        ests = self._branch_fanout_ests(query_v, query_e, root_u, branches)
        if any(e_ == 0.0 for e_ in ests):
            return False
        keep = [] if prune else list(query_v)
        flat_est = self._flat_stream_est(query_v, query_e, keep, order)
        pinned_all = {u for p in pairs for u in p}
        fact_sum = 0.0
        for comp in branches:
            b_v = {root_u: query_v[root_u]} | {u: query_v[u] for u in comp}
            b_e = {(a, b) for (a, b) in query_e if a in b_v and b in b_v}
            bg = [root_u] + sorted(pinned_all & comp)
            fact_sum += self._flat_stream_est(b_v, b_e, bg, order)
        return flat_est >= ratio * max(fact_sum, 1.0)

    def _branch_fanout_ests(
        self,
        query_v: dict[int, int],
        query_e: set[tuple[int, int]],
        root_u: int,
        branches: list[set[int]],
    ) -> list[float]:
        """Per-branch per-anchor embedding-count estimates: the product of
        average label-pair fanouts along a spanning walk from the anchor."""
        adj: dict[int, set[int]] = {u: set() for u in query_v}
        for a, b in query_e:
            adj[a].add(b)
            adj[b].add(a)
        fan = self.label_fanout
        ests: list[float] = []
        for comp in branches:
            est, seen, stack = 1.0, {root_u}, [root_u]
            while stack:
                x = stack.pop()
                for nb in sorted(adj[x]):
                    if nb in comp and nb not in seen:
                        est *= fan.get((query_v[x], query_v[nb]), 0.0)
                        seen.add(nb)
                        stack.append(nb)
            ests.append(est)
        return ests

    def _flat_stream_est(
        self,
        sub_v: dict[int, int],
        sub_e: set[tuple[int, int]],
        keep_us,
        order: str,
    ) -> float:
        """Estimated TOTAL streamed row count of the PRUNED flat pipeline
        on this sub-query: simulate the plan's prefix-merge trace with
        label-pair fanout estimates — each extension multiplies the live
        width by the tree-edge fanout, each prune merge divides out the
        contributions of released positions. This is the honest cost of
        the flat path: the prefix merge performs branch factorization
        IMPLICITLY (a released same-label witness collapses the frontier
        like a DP over the chain), so a naive branch-product estimate
        wildly overstates what the pipeline actually streams."""
        plan = build_plan(sub_v, sub_e, order=order, pseudo=False)
        self.label_fanout  # ensure _label_sizes is populated
        fan, sizes = self.label_fanout, self._label_sizes
        n = len(plan.nodes)
        pos_of = {nd.u: nd.pos for nd in plan.nodes}
        contrib: dict[int, float] = {
            0: float(max(sizes.get(plan.nodes[0].label, 1), 1))
        }
        for nd in plan.nodes[1:]:
            plabel = plan.nodes[nd.parent_pos].label
            contrib[nd.pos] = fan.get((plabel, nd.label), 0.0)
        keep = {pos_of[u] for u in keep_us if u in pos_of}
        needed_after = [set(keep) for _ in range(n)]
        acc = set(keep)
        for j in range(n - 1, 0, -1):
            nd = plan.nodes[j]
            acc |= {nd.parent_pos, *nd.backward_pos, *nd.samelabel_pos}
            needed_after[j - 1] = set(acc)
        live = {0}
        width = contrib[0]
        total = width
        for nd in plan.nodes[1:]:
            width *= contrib[nd.pos]
            live.add(nd.pos)
            total += width
            for p in [p for p in live if p not in needed_after[nd.pos]]:
                width /= max(contrib[p], 1e-12)
                live.discard(p)
            width = max(width, 1.0)
        return total

    def _tree_factorized_df(
        self,
        query_v: dict[int, int],
        query_e: set[tuple[int, int]],
        order: str = "degree",
        max_pairs: int = 6,
        nested: bool | str = "auto",
    ) -> tuple[DataFrame, list[DataFrame]] | None:
        """Lazy form of count_tree_factorized: (signed-terms DataFrame whose
        sum('t') is the count, persisted branch tables to unpersist after
        the action), or None when the shape doesn't factorize.

        nested: whether each branch's grouped table may ITSELF be computed
        by branch factorization at the branch's own articulation vertex —
        the multi-level analog of the reference's staged branch numbers
        (`SIQuery.h:429-486`, `pregel_app_subgraph.h:614-676`). True
        always recurses where the shape admits it, False keeps every
        branch on the flat (pruned) pipeline, 'auto' (default) recurses
        only when the label-fanout cost model says the branch's own
        sub-frontier is product-dominated."""
        dec = self._branch_decomposition(query_v, query_e, order, max_pairs)
        if dec is None:
            return None
        root_u, branches, _spanning, pairs, cand = dec
        flc: dict[int, int] = {}
        for l in query_v.values():
            flc[l] = flc.get(l, 0) + 1
        temps: list[DataFrame] = []
        total = self._assemble_grouped(
            query_v, query_e, root_u, branches, pairs, [],
            order, cand, flc, max_pairs, nested, FACTORIZE_MAX_DEPTH, temps,
        )
        return total.withColumnRenamed("c", "t"), temps

    def _grouped_count(
        self,
        sub_v: dict[int, int],
        sub_e: set[tuple[int, int]],
        group_us: list[int],
        order: str,
        cand: dict[int, int] | None,
        flc: dict[int, int],
        max_pairs: int,
        nested: bool | str,
        depth: int,
        temps: list[DataFrame],
        anchor: int | None = None,
    ) -> DataFrame:
        """Injective embedding counts of (sub_v, sub_e) GROUPED by the
        images of `group_us`: columns img_<u> for each u plus count c.
        Either flat — the pruned join pipeline with the group positions
        kept alive — or, when `nested` allows and the sub-query has its
        own articulation vertex, recursively branch-factorized.

        anchor: force the flat plan's matching-order root to this vertex
        (the assembly's split vertex) — branch enumeration anchored at the
        shared vertex starts from its (few) images instead of fanning out
        from an interior vertex and joining back (measured 60% faster on
        the hub fixture)."""
        group_us = sorted(set(group_us))
        # 'auto' never profits from splitting a sub-query below 6 vertices
        # (anchor + split vertex + two branches of depth >= 2) — and the
        # early size check keeps tiny branch tables from ever touching the
        # label_fanout aggregate the stream estimator needs
        consider = nested is True or (nested and len(sub_v) >= 6)
        if consider and depth > 0 and len(sub_v) > 2:
            dec = self._branch_decomposition(sub_v, sub_e, order, max_pairs)
            if dec is not None:
                w, brs, _spn, prs, _ = dec
                if nested is True:
                    go = True
                else:
                    # 'auto': recurse only when the flat PRUNED pipeline
                    # would stream an astronomical number of rows AND the
                    # per-branch streams are collectively much smaller —
                    # the prefix merge already factorizes implicitly (see
                    # _flat_stream_est), so codegen streaming wins below
                    # NESTED_MIN_STREAM despite the branch-product bound
                    flat_est = self._flat_stream_est(sub_v, sub_e, group_us, order)
                    pinned_all = {u for p in prs for u in p}
                    nested_sum = 0.0
                    for comp in brs:
                        b_v = {w: sub_v[w]} | {u: sub_v[u] for u in comp}
                        b_e = {(a, b) for (a, b) in sub_e if a in b_v and b in b_v}
                        bg = [w] + sorted((set(group_us) | pinned_all) & comp)
                        nested_sum += self._flat_stream_est(b_v, b_e, bg, order)
                    go = flat_est >= NESTED_MIN_STREAM and flat_est >= (
                        FACTORIZE_RATIO * max(nested_sum, 1.0)
                    )
                if go:
                    return self._assemble_grouped(
                        sub_v, sub_e, w, brs, prs, group_us,
                        order, cand, flc, max_pairs, nested, depth - 1, temps,
                    )
        # flat: pruned pipeline with the group keys pinned live. Leaf
        # pseudo/deferred counting stays on only when every LEAF label of
        # this sub-query is CONFINED to it (only degree-1 vertices can be
        # pseudo/deferred-counted; a counted leaf whose label also appears
        # outside would dodge an outer assembly's pinned equalities and
        # miss injectivity against the outside images); a group key that
        # still ends up counted away forces a full-enumeration rebuild.
        sub_counts: dict[int, int] = {}
        for l in sub_v.values():
            sub_counts[l] = sub_counts.get(l, 0) + 1
        sdeg: dict[int, int] = {u: 0 for u in sub_v}
        for a, _b in sub_e:
            sdeg[a] += 1
        leaf_labels = {sub_v[u] for u in sub_v if sdeg[u] <= 1}
        pseudo_ok = all(sub_counts[l] == flc.get(l, 0) for l in leaf_labels)
        plan = build_plan(
            sub_v, sub_e, order=order, pseudo=pseudo_ok,
            cand_counts=cand, force_root=anchor,
        )
        pos_of = {nd.u: nd.pos for nd in plan.nodes}
        if any(u not in pos_of for u in group_us):
            plan = build_plan(
                sub_v, sub_e, order=order, pseudo=False,
                cand_counts=cand, force_root=anchor,
            )
            pos_of = {nd.u: nd.pos for nd in plan.nodes}
        live: list[int] = []
        f = self.frontier(
            plan, prune=True, keep_pos={pos_of[u] for u in group_us}, live_out=live
        )
        cols = [
            F.element_at(F.col("m"), live.index(pos_of[u]) + 1).alias(f"img_{u}")
            for u in group_us
        ]
        return (
            f.select(*cols, "cnt")
            .groupBy(*[f"img_{u}" for u in group_us])
            .agg(F.sum("cnt").alias("c"))
        )

    def _assemble_grouped(
        self,
        sub_v: dict[int, int],
        sub_e: set[tuple[int, int]],
        w: int,
        branches: list[set[int]],
        pairs: list[tuple[int, int]],
        group_us: list[int],
        order: str,
        cand: dict[int, int] | None,
        flc: dict[int, int],
        max_pairs: int,
        nested: bool | str,
        depth: int,
        temps: list[DataFrame],
    ) -> DataFrame:
        """One level of branch-factorized assembly, output GROUPED by the
        images of `group_us` (empty -> one signed scalar row per
        inclusion–exclusion term; the caller sums): each branch (anchored
        at the split vertex w) contributes a grouped count table keyed by
        img_w plus whatever images the outer grouping or the conflict
        pairs pin; cross-branch same-label injectivity is restored by
        inclusion–exclusion over subsets of `pairs` (2^|P| signed
        pinned-equality join terms over the small grouped tables — the
        branch cross product never materializes)."""
        group_set = set(group_us)
        pinned_all = {u for p in pairs for u in p}
        btabs: list[tuple[DataFrame, list[int]]] = []
        for bi, comp in enumerate(branches):
            b_v = {w: sub_v[w]} | {u: sub_v[u] for u in comp}
            b_e = {(a, b) for (a, b) in sub_e if a in b_v and b in b_v}
            bg = [w] + sorted((group_set | pinned_all) & comp)
            t = (
                self._grouped_count(
                    b_v, b_e, bg, order, cand, flc, max_pairs, nested, depth,
                    temps, anchor=w,
                )
                .withColumnRenamed("c", f"c{bi}")
                .persist()
            )
            temps.append(t)
            btabs.append((t, bg))
        out_keys = [f"img_{u}" for u in sorted(group_set)]
        terms: list[DataFrame] = []
        # the same (branch, kept-keys) re-aggregation appears in many
        # inclusion–exclusion terms (a branch with one pinned vertex has
        # only two distinct key sets across all 2^|P| terms) — share one
        # DataFrame per distinct key set so the runtime reuses a single
        # aggregate subtree instead of planning/executing it per term
        agg_cache: dict[tuple[int, tuple[str, ...]], DataFrame] = {}

        def agg_branch(bi: int, t: DataFrame, keep: list[str]) -> DataFrame:
            key = (bi, tuple(keep))
            if key not in agg_cache:
                agg_cache[key] = t.groupBy(*keep).agg(
                    F.sum(f"c{bi}").alias(f"c{bi}")
                )
            return agg_cache[key]

        for mask in range(1 << len(pairs)):
            M = [pairs[i] for i in range(len(pairs)) if (mask >> i) & 1]
            pinned = {u for p in M for u in p}
            # re-aggregate each branch down to just the keys this term
            # needs (the ∅ term is one tiny per-anchor table per branch)
            cs = []
            for bi, (t, bg) in enumerate(btabs):
                keep = [
                    f"img_{u}" for u in bg if u == w or u in pinned or u in group_set
                ]
                cs.append(agg_branch(bi, t, keep))
            joined = cs[0]
            for c in cs[1:]:
                joined = joined.join(c, f"img_{w}")
            for x, y in M:
                joined = joined.where(F.col(f"img_{x}") == F.col(f"img_{y}"))
            prod = F.lit(1).cast("long")
            for bi in range(len(branches)):
                prod = prod * F.col(f"c{bi}")
            sign = -1 if len(M) % 2 else 1
            if out_keys:
                terms.append(
                    joined.groupBy(*out_keys).agg(
                        (F.lit(sign) * F.sum(prod)).alias("c")
                    )
                )
            else:
                terms.append(
                    joined.agg(F.coalesce(F.sum(prod), F.lit(0)).alias("c"))
                    .select((F.lit(sign) * F.col("c")).alias("c"))
                )
        total = terms[0]
        for t in terms[1:]:
            total = total.unionByName(t)
        if out_keys:
            # net exact counts per group (empty groups are simply absent);
            # signed terms cancel to 0 for over-counted tuples — drop them
            total = (
                total.groupBy(*out_keys)
                .agg(F.sum("c").alias("c"))
                .where(F.col("c") != 0)
            )
        return total

    def embeddings(
        self,
        query_v: dict[int, int],
        query_e: set[tuple[int, int]],
        order: str = "degree",
    ) -> DataFrame:
        """Materialized embeddings: one column ``u_<qid>`` per query vertex
        (pseudo counting and pruning disabled so every query vertex is
        enumerated — the flag the reference ships disabled, SURVEY §2.1 S5).

        Materialization REQUIRES the enumeration pipeline: each output row
        is one full embedding, so the result itself is the branch cross
        product — factorized counting cannot help. When the cost model says
        the frontier is product-dominated (a hub-shaped graph), warn loudly
        that the user is in the cross-product regime before the job runs."""
        if self.should_factorize(query_v, query_e, order=order, prune=False):
            warnings.warn(
                "embeddings(): the branch cost model estimates a "
                "product-dominated frontier (hub-shaped data graph) — "
                "materializing every embedding IS the branch cross product "
                "and cannot be factorized; expect the enumeration regime. "
                "If only the count is needed, use count(factorize='auto').",
                PlanDowngradeWarning,
                stacklevel=2,
            )
        cand = self.candidate_counts(query_v, query_e) if order == "candidate" else None
        plan = build_plan(query_v, query_e, order=order, pseudo=False, cand_counts=cand)
        f = self.frontier(plan)
        cols = [
            F.element_at(F.col("m"), node.pos + 1).alias(f"u_{node.u}")
            for node in plan.nodes
        ]
        return f.select(*cols)

    def embeddings_factorized(
        self,
        query_v: dict[int, int],
        query_e: set[tuple[int, int]],
        order: str = "degree",
    ) -> "FactorizedEmbeddings | None":
        """Compressed materialization: per-branch embedding tables sharing
        the split vertex's image column, instead of the flat cross-product
        rows — the Spark form of the reference's branch-tree embedding
        representation (`SIBranch.h` keeps per-branch mapping vectors and
        only conceptually crosses them). On a hub-shaped graph the flat
        result is the 10^8+-row branch cross product; the compressed form
        is the SUM of branch sizes and expands lazily (see
        FactorizedEmbeddings.expand).

        Returns None when the query has no articulation split (then
        embeddings() is the only materialization). Unlike counting there
        is no 2^|P| assembly here — cross-branch same-label pairs are
        plain inequality filters at expansion — so any number of pairs is
        accepted."""
        dec = self._branch_decomposition(
            query_v, query_e, order, max_pairs=len(query_v) ** 2
        )
        if dec is None:
            return None
        root_u, branches, _spanning, pairs, cand = dec
        tabs: list[DataFrame] = []
        for comp in branches:
            b_v = {root_u: query_v[root_u]} | {u: query_v[u] for u in comp}
            b_e = {(a, b) for (a, b) in query_e if a in b_v and b in b_v}
            plan = build_plan(
                b_v, b_e, order=order, pseudo=False,
                cand_counts=cand, force_root=root_u,
            )
            cols = [
                F.element_at(F.col("m"), nd.pos + 1).alias(f"u_{nd.u}")
                for nd in plan.nodes
            ]
            tabs.append(self.frontier(plan).select(*cols))
        return FactorizedEmbeddings(root_u, tabs, pairs)

    def unpersist(self) -> None:
        self.vertices.unpersist()
        self.adj.unpersist()
        if self._adjlist is not None:
            self._adjlist.unpersist()
        self.nbr_label_counts.unpersist()
        for t in self._temps:
            t.unpersist()
        self._temps.clear()


class FactorizedEmbeddings:
    """Compressed materialized match result: one full-enumeration DataFrame
    per root branch (columns ``u_<qid>``, each including the split vertex's
    image ``u_<root_u>``), plus the cross-branch same-label pairs that an
    expansion must keep injective. Store or ship the branch tables at
    sum-of-branches size; `expand()` reconstitutes the exact flat embedding
    set (equal to SubgraphMatcher.embeddings row-for-row) by joining the
    branch tables on the anchor image and filtering the pair inequalities —
    the product only ever materializes where the consumer asks for it."""

    def __init__(
        self,
        root_u: int,
        branch_tables: list[DataFrame],
        pairs: list[tuple[int, int]],
    ) -> None:
        self.root_u = root_u
        self.branch_tables = branch_tables
        self.pairs = pairs

    def expand(self) -> DataFrame:
        out: DataFrame | None = None
        for t in self.branch_tables:
            out = t if out is None else out.join(t, f"u_{self.root_u}")
        for x, y in self.pairs:
            out = out.where(F.col(f"u_{x}") != F.col(f"u_{y}"))
        return out


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
