"""Connected components by hash-min label flooding (undirected graphs).

Each vertex starts with component = own id; every changed vertex floods its
component id to neighbors; receivers keep the min. Converges in O(diameter)
supersteps; only the changed frontier scatters (the Spark analog of the
reference's vote_to_halt / message-wake protocol,
/root/reference/src/basic/Vertex.h:83-94)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pregel import Pregel, VertexProgram, auto_partitions, build_parts


def cc_program(P: int) -> VertexProgram:
    def init(part):
        nv = len(part["ids"])
        return {
            "comp": part["ids"].astype(np.int64),
            "changed": np.ones(nv, dtype=np.int32),
            "msgs_in": 0,
            "active": nv,
        }

    SENTINEL = np.iinfo(np.int64).max

    def scatter(part, step, carry):
        comp = part["comp"]
        s_spos, s_dpos, s_bounds = part["s_spos"], part["s_dpos"], part["s_bounds"]
        changed = part["changed"].astype(bool)
        if not changed.any() or s_dpos.size == 0:
            return None
        # partition-local min-combine by DENSE destination position before
        # the shuffle, ONE packed row per destination partition (reference
        # multicast batching, /root/reference/src/basic/Vertex.h:102-106).
        # Edges sit in the build-time scatter layout (sorted by destination
        # partition) — per-step work is slice + mask + minimum.at, no sort.
        rows = []
        for p in range(P):
            lo, hi = int(s_bounds[p]), int(s_bounds[p + 1])
            if hi <= lo:
                continue
            sp = s_spos[lo:hi]
            m = changed[sp]
            if not m.any():
                continue
            block_pos = s_dpos[lo:hi][m]
            mins = np.full(int(block_pos.max()) + 1, SENTINEL)
            np.minimum.at(mins, block_pos, comp[sp[m]])
            nz = np.nonzero(mins != SENTINEL)[0]
            rows.append((int(p), nz.astype(np.int32), mins[nz]))
        if not rows:
            return None
        return pd.DataFrame(rows, columns=["pid", "dpos", "comp"])

    def update(part, inbox: pd.DataFrame, step, carry):
        comp = part["comp"].copy()
        changed = np.zeros(len(comp), dtype=np.int32)
        n_msgs = 0
        if len(inbox):
            # fold per-source-partition packed partial minima by position
            pos = np.concatenate([np.asarray(x) for x in inbox["dpos"].values]).astype(np.int64)
            val = np.concatenate([np.asarray(x) for x in inbox["comp"].values])
            n_msgs = len(pos)
            cand = np.full(len(comp), SENTINEL)
            np.minimum.at(cand, pos, val)
            better = cand < comp
            comp[better] = cand[better]
            changed[better] = 1
        return {
            "comp": comp,
            "changed": changed,
            "msgs_in": int(n_msgs),
            "active": int(changed.sum()),
        }

    return VertexProgram(
        name="connected_components",
        state_schema="comp array<long>, changed array<int>, msgs_in long, active long",
        msg_schema="pid int, dpos array<int>, comp array<long>",
        init=init,
        scatter=scatter,
        update=update,
        stats=[("msgs_in", F.sum), ("active", F.sum)],
        converged=lambda srow, step: int(srow["active"] or 0) == 0,
        struct_cols=("s_spos", "s_dpos", "s_bounds"),
    )


def components_df(parts: DataFrame) -> DataFrame:
    z = F.explode(F.arrays_zip("ids", "comp")).alias("z")
    return parts.select(z).select(
        F.col("z.ids").alias("id"), F.col("z.comp").alias("component")
    )


def connected_components(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    num_partitions: int | None = 32,
    max_steps: int = 200,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, list[dict]]:
    if num_partitions is None:
        num_partitions = auto_partitions(edges.count())
    parts = build_parts(spark, vertices, edges, num_partitions)
    kern = Pregel(spark, parts, num_partitions)
    final, metrics = kern.run(
        cc_program(num_partitions),
        max_steps=max_steps,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        checkpoint_every=checkpoint_every,
    )
    return components_df(final), metrics


def warm_cc_state(
    parts: DataFrame, P: int, prior: DataFrame, touched: DataFrame
) -> DataFrame:
    """Kernel state for INCREMENTAL connected components after the graph
    GREW (append-only deltas — add_vertices; deletions invalidate min
    labels and need a cold run): old vertices keep their prior component
    label, new ones start at their own id, and ONLY delta-touched
    vertices start `changed` — the min flood re-propagates exactly from
    the delta frontier instead of from everywhere.

    Why this is exact under growth: a prior label is the min id of the
    vertex's OLD component, so it is (a) a valid member id and (b) an
    upper bound of the final label (growth only merges components, never
    splits). Any strictly-lower label therefore enters a region through a
    delta edge, i.e. at a touched vertex — and every adoption re-arms
    `changed`, so the flood follows the perturbation wavefront and halts
    in O(delta diameter) supersteps instead of O(graph diameter).

    prior: (id, component); touched: ids incident to the delta (both
    endpoints of every new edge, plus all new vertices). One cogroup of
    the struct blocks with the pid-keyed inputs — no driver-side
    materialization (warm_state_cogroup, the scaffold shared with the
    incremental PageRank / SSSP builders)."""
    from .pregel import match_prior_values, pid_keyed, warm_state_cogroup

    pr = pid_keyed(prior, P, F.col("component").alias("comp"), F.lit(0).alias("t"))
    tc = pid_keyed(
        touched, P, F.lit(None).cast("long").alias("comp"), F.lit(1).alias("t")
    )
    side = pr.unionByName(tc)

    def build(part: dict, side_pdf: pd.DataFrame) -> dict:
        ids = np.asarray(part["ids"])
        comp = ids.astype(np.int64).copy()  # default: own id (new vertices)
        changed = np.zeros(len(ids), dtype=np.int32)
        if len(side_pdf):
            pri = side_pdf[side_pdf["t"] == 0]
            mask = np.zeros(len(ids), dtype=bool)
            if len(pri):
                vals, mask = match_prior_values(
                    ids,
                    pri["id"].to_numpy(dtype="int64"),
                    pri["comp"].to_numpy(dtype="int64"),
                )
                comp[mask] = vals
            # vertices with no prior label are NEW — they must flood
            changed[~mask] = 1
            tch = side_pdf[side_pdf["t"] == 1]["id"].to_numpy(dtype="int64")
            if len(tch):
                # vectorized membership — a Python per-id loop costs seconds
                # per multi-million-vertex block on every warm restart
                changed[np.isin(ids, tch)] = 1
        else:
            changed[:] = 1  # no prior at all: cold semantics
        return {
            "comp": comp,
            "changed": changed,
            "msgs_in": 0,
            "active": int(changed.sum()),
        }

    schema = "pid int, comp array<long>, changed array<int>, msgs_in long, active long"
    return warm_state_cogroup(parts, side, ("pid", "ids"), schema, build)


def connected_components_warm(
    spark: SparkSession,
    parts: DataFrame,
    prior: DataFrame,
    touched: DataFrame,
    num_partitions: int = 32,
    max_steps: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, list[dict]]:
    """Incremental CC on a pre-built parts table (the add_vertices output):
    warm-start the hash-min flood from prior labels with only the delta
    frontier active. Same fixed point as a cold run on the grown graph
    (asserted in tests); superstep count scales with the DELTA's reach,
    not the graph diameter."""
    P = num_partitions
    # two consumers execute the (typically lazy build+rebuild) parts plan —
    # the kernel's struct save and the warm-state save; persist so it runs
    # once (same discipline as pagerank_warm)
    parts = parts.persist()
    state0 = warm_cc_state(parts, P, prior, touched)
    try:
        final, metrics = Pregel(spark, parts, P).run(
            cc_program(P),
            max_steps=max_steps,
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
            state0=state0,
        )
    finally:
        parts.unpersist()
    return components_df(final), metrics


def bipartite_components(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    num_partitions: int | None = 32,
    max_steps: int = 200,
) -> tuple[DataFrame, list[dict]]:
    """Per-component bipartiteness test -> (component, n_vertices,
    is_bipartite) via the DOUBLE COVER reduction: each vertex v becomes
    two cover vertices (2v, 2v+1) and each undirected edge {u, w} becomes
    the parity-flipping cover edges 2u—2w+1 and 2u+1—2w. A component is
    bipartite iff its cover splits into TWO components — equivalently,
    cover_comp(2v) != cover_comp(2v+1) for its vertices (all of them agree,
    so bool_or over the component is exact, not a heuristic).

    No new kernel code: two runs of the existing hash-min CC vertex
    program (original graph for labels/sizes, cover graph for parity), one
    id-arithmetic projection between them, one groupBy. The cover doubles
    |V| and |E| and at most doubles the flood diameter; everything else —
    frontier scatter, packed min-combine, checkpoint story — is inherited.
    `edges` must already hold both directions of every undirected edge
    (the CC input contract; sources.graph.symmetrize).

    Reference scope note: bipartiteness is added breadth (not in the
    reference's algorithm set), but the reduction exercises the same
    framework path as /root/reference/src/basic/Vertex.h hash-min flooding.
    """
    comp, m1 = connected_components(
        spark, vertices, edges, num_partitions, max_steps
    )
    ids = vertices.select("id")
    # the 2v / 2v+1 cover encoding needs headroom: |id| >= 2^62 would wrap
    # int64 and alias distinct cover vertices (full-range hashed id spaces
    # can reach this — remap through a dense rank first if so)
    top = ids.agg(F.max(F.abs(F.col("id"))).alias("m")).collect()[0]["m"]
    if top is not None and top >= (1 << 62):
        raise ValueError(
            "bipartite_components: |id| must be < 2^62 for the double-cover "
            f"encoding (max |id| = {top}); densely re-rank ids first"
        )
    cover_v = (
        ids.select((F.col("id") * 2).alias("id"))
        .unionByName(ids.select((F.col("id") * 2 + 1).alias("id")))
        .withColumn("label", F.lit(0).cast("int"))
    )
    cover_e = edges.select(
        (F.col("src") * 2).alias("src"), (F.col("dst") * 2 + 1).alias("dst")
    ).unionByName(
        edges.select(
            (F.col("src") * 2 + 1).alias("src"), (F.col("dst") * 2).alias("dst")
        )
    )
    cover, m2 = connected_components(
        spark, cover_v, cover_e, num_partitions, max_steps
    )
    # pmod, not %: Spark's % keeps the dividend's sign, so a NEGATIVE odd
    # cover id (2v+1 for v < 0, e.g. -5 % 2 == -1) matches neither branch
    # and the vertex silently drops out of the even⋈odd join
    # integer div, not /2: float division loses exactness past 2^53 while
    # cover ids range up to 2^62 (both operands are even, so truncating
    # division is exact for either sign)
    even = cover.where(F.pmod(F.col("id"), F.lit(2)) == 0).select(
        F.expr("id div 2").alias("id"), F.col("component").alias("c0")
    )
    odd = cover.where(F.pmod(F.col("id"), F.lit(2)) == 1).select(
        F.expr("(id - 1) div 2").alias("id"),
        F.col("component").alias("c1"),
    )
    flags = even.join(odd, "id").select(
        "id", (F.col("c0") == F.col("c1")).alias("odd_cycle")
    )
    out = (
        comp.join(flags, "id")
        .groupBy("component")
        .agg(
            F.count("*").alias("n_vertices"),
            (~F.max("odd_cycle")).alias("is_bipartite"),
        )
    )
    return out, m1 + m2
