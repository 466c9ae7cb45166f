"""Minimum spanning forest — distributed Borůvka with edge contraction.

Borůvka (1926) is THE parallel MST algorithm: every component picks its
minimum-weight outgoing edge, the picked edges merge components, repeat.
Component count at least halves per round, so the driver loop is
O(log V) regardless of graph shape — the same bounded-round discipline as
the kernel's hash-min CC (components.py) and Luby MIS (mis.py).

Determinism without assuming distinct weights: edges are totally ordered
by (w, u, v) with u = min(src,dst), v = max(src,dst). Under a total order
the minimum spanning forest is UNIQUE (standard exchange argument), so
the output is reproducible on any partitioning and any engine — the
property every gated query here relies on.

Design for scale — the state is the EDGE table, never a vertex table:
each surviving edge carries its current component endpoints (cu, cv)
alongside its original identity (u, v, w). A round is then

  1. pick      — emit each cross-component edge from both sides and
                 groupBy(comp).min(struct(w, u, v, other)): ONE map-side-
                 combining aggregation (a hub component's edges partially
                 reduce before the shuffle — no hot key).
  2. root      — each picking component points at its pick's other
                 endpoint; the unique minimum on the cut between a mutual
                 pair means a 2-cycle is always the SAME edge, broken
                 toward the smaller id. The pointer graph is a forest;
                 ceil(log2(#components)) pointer-jump self-joins (p←p[p])
                 flatten every chain to its root in one uncut lineage —
                 the table is #components rows, shrinking geometrically,
                 and AQE turns the self-joins into broadcast joins.
  3. contract  — relabel the edge table's (cu, cv) through the flattened
                 pointer map (two joins against the SMALL pointer table,
                 not against a |V|-row vertex map) and drop the edges
                 that became internal. Picked edges dedup into the
                 forest (each can be picked from both sides).

Per-round tables are cut to parquet and read back (the mis.py /
ktruss.py lineage discipline); the only driver-side values are the
per-round empty-checks and the component count that sizes the jump
ladder. Parity-plus over the reference (which has no weighted-graph
algorithms): the natural extension of its hash-min CC to weighted edges.
"""

from __future__ import annotations

import math
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Below this many active components the contracted pointer graph is
# collected and flattened driver-side with path compression — one tiny
# collect instead of a log2(#comps) self-join ladder. The EDGE table never
# comes to the driver; only the per-round component graph, which shrinks
# geometrically (at 10^12 vertices the first rounds stay on the ladder).
PTR_COLLECT_MAX = 200_000

# Local-finish cutover: once the surviving cross-component edge table
# shrinks below this, collect it and finish with driver-side Kruskal.
# The tail rounds of the driver loop are stage-launch-bound (a handful of
# tiny shuffles each, constant cost at any core count); contraction
# preserves the MSF and the (w, u, v) total order makes it unique, so the
# local finish returns EXACTLY the edges the remaining rounds would.
LOCAL_FINISH_MAX = 100_000


def boruvka_msf(
    edges: DataFrame,
    max_rounds: int | None = None,
    local_finish_max: int = LOCAL_FINISH_MAX,
) -> tuple[DataFrame, int]:
    """-> ((u, v, w) minimum-spanning-forest edges, rounds_run).

    edges: (src, dst, w) rows of an UNDIRECTED weighted graph — either or
    both directions, duplicates fine (canonicalized u<v here; parallel
    edges keep their minimum weight); self-loops ignored. Isolated
    vertices contribute nothing. max_rounds caps the driver loop (None =
    run to completion; Borůvka needs at most ceil(log2 V) rounds); on an
    early cap the result is a partial forest — still a subset of the true
    MSF, because every per-component minimum is an MSF edge (cut
    property). local_finish_max: once fewer cross-component edges than
    this survive contraction, they are collected and completed with
    driver-side Kruskal (identical output; 0 disables). rounds_run counts
    distributed rounds only.
    """
    spark = edges.sparkSession
    workdir = tempfile.mkdtemp(prefix="boruvka_")

    def cut(df: DataFrame, name: str) -> DataFrame:
        path = f"{workdir}/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    e = cut(
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.col("w").cast("double").alias("w"),
        )
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .select(F.col("u").alias("cu"), F.col("v").alias("cv"), "u", "v", "w"),
        "e0",
    )
    forest: DataFrame | None = None
    r = 0
    while True:
        if max_rounds is not None and r >= max_rounds:
            break
        r += 1
        # 1. each component's minimum outgoing edge under (w, u, v);
        # votes from both sides so every active component picks
        both = e.select(
            F.col("cu").alias("c"),
            F.struct("w", "u", "v", F.col("cv").alias("other")).alias("t"),
        ).unionAll(
            e.select(
                F.col("cv").alias("c"),
                F.struct("w", "u", "v", F.col("cu").alias("other")).alias("t"),
            )
        )
        picks = cut(
            both.groupBy("c")
            .agg(F.min("t").alias("t"))
            .select(
                "c",
                F.col("t.w").alias("w"),
                F.col("t.u").alias("u"),
                F.col("t.v").alias("v"),
                F.col("t.other").alias("other"),
            ),
            f"p{r}",
        )
        n_comp = picks.count()
        if n_comp == 0:
            r -= 1
            break
        # duplicates (an edge picked from both sides) collapse in the one
        # final groupBy — no per-round distinct shuffle
        new_edges = picks.select("u", "v", "w")
        forest = new_edges if forest is None else forest.unionAll(new_edges)
        # 2. pointer graph c -> other; a mutual pair (always the same edge)
        # roots at its smaller id.
        p2 = picks.select(F.col("c").alias("c2"), F.col("other").alias("other2"))
        ptr = picks.join(
            p2,
            (F.col("other") == F.col("c2")) & (F.col("other2") == F.col("c")),
            "left",
        ).select(
            "c",
            F.when(
                F.col("c2").isNotNull() & (F.col("c") < F.col("other")), F.col("c")
            )
            .otherwise(F.col("other"))
            .alias("p"),
        )
        if n_comp <= PTR_COLLECT_MAX:
            # tiny component graph: flatten driver-side (path compression)
            pairs = {row.c: row.p for row in ptr.collect()}

            def root(x: int) -> int:
                seen = []
                while pairs.get(x, x) != x:
                    seen.append(x)
                    x = pairs[x]
                for s in seen:
                    pairs[s] = x
                return x

            flat = [(c, root(c)) for c in pairs]
            ptr = spark.createDataFrame(flat, "c long, p long")
        else:
            # distributed ladder: pointer jumps in batches of 3 with a
            # convergence probe between batches — min-edge pointer chains
            # are typically O(log) shallow, so the probe exits after one
            # or two batches instead of paying the full ceil(log2(#comps))
            # worst-case ladder of wide self-join shuffles
            max_jumps = max(1, math.ceil(math.log2(max(n_comp, 2))))
            done = 0
            ptr = cut(ptr, f"j{r}_0")
            while done < max_jumps:
                batch = min(3, max_jumps - done)
                nxt = ptr
                for _ in range(batch):
                    nxt = (
                        nxt.alias("a")
                        .join(
                            nxt.select(
                                F.col("c").alias("pc"), F.col("p").alias("pp")
                            ).alias("b"),
                            F.col("a.p") == F.col("pc"),
                            "left",
                        )
                        .select(
                            F.col("a.c").alias("c"),
                            F.coalesce("pp", "a.p").alias("p"),
                        )
                    )
                nxt = cut(nxt, f"j{r}_{done + batch}")
                done += batch
                changed = (
                    nxt.alias("n")
                    .join(ptr.alias("o"), F.col("n.c") == F.col("o.c"))
                    .where(F.col("n.p") != F.col("o.p"))
                    .limit(1)
                    .count()
                )
                ptr = nxt
                if changed == 0:
                    break
        # 3. contract: relabel surviving edges through the root map and
        # drop the now-internal ones. The root map is broadcast when it
        # came from the driver-side flatten (it is tiny by construction);
        # at ladder scale AQE picks the join side.
        pu = ptr.select(F.col("c").alias("cu"), F.col("p").alias("nu"))
        pv = ptr.select(F.col("c").alias("cv"), F.col("p").alias("nv"))
        if n_comp <= PTR_COLLECT_MAX:
            pu, pv = F.broadcast(pu), F.broadcast(pv)
        e = cut(
            e.join(pu, "cu", "left")
            .join(pv, "cv", "left")
            .select(
                F.coalesce("nu", "cu").alias("cu"),
                F.coalesce("nv", "cv").alias("cv"),
                "u",
                "v",
                "w",
            )
            .where(F.col("cu") != F.col("cv")),
            f"e{r}",
        )
        n_live = e.count()
        if n_live == 0:
            break
        if local_finish_max and n_live <= local_finish_max:
            # driver-side Kruskal over the contracted component graph:
            # union-find on component ids, edges in (w, u, v) order — the
            # unique remaining MSF edges, same as running the ladder out
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                root = x
                while parent.get(root, root) != root:
                    root = parent[root]
                while parent.get(x, x) != x:
                    parent[x], x = root, parent[x]
                return root

            picked = []
            for row in sorted(e.collect(), key=lambda t: (t.w, t.u, t.v)):
                a, b = find(row.cu), find(row.cv)
                if a != b:
                    parent[max(a, b)] = min(a, b)
                    picked.append((row.u, row.v, float(row.w)))
            if picked:
                local = spark.createDataFrame(picked, "u long, v long, w double")
                forest = local if forest is None else forest.unionAll(local)
            break
    if forest is None:
        forest = spark.createDataFrame([], "u long, v long, w double")
    return forest.groupBy("u", "v").agg(F.min("w").alias("w")), r
