"""Single-source shortest paths (unweighted BFS hop distance) on the kernel.

Not in the reference's algorithm set — added breadth for the link-graph
engine: the canonical min-plus vertex program (reference framework analog:
the same vote-to-halt / changed-frontier protocol the reference's Vertex.h
implements, /root/reference/src/basic/Vertex.h:83-94).

Semantics are explicitly BOUNDED: distances up to `max_hops` supersteps;
vertices further than that (or unreachable) carry no row. The DuckDB oracle
twin implements the identical bound with a recursive CTE (`WHERE dist <
max_hops`), so the contract is exact on both sides regardless of graph
diameter — no unroll-depth assumption (the defect the round-1 CC oracle had).
Converges early (active = 0) when the frontier empties before the bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pregel import Pregel, VertexProgram, auto_partitions, build_parts

UNREACHED = -1


def sssp_program(source: int, P: int) -> VertexProgram:
    SENTINEL = np.iinfo(np.int64).max

    def init(part):
        ids = part["ids"]
        dist = np.full(len(ids), UNREACHED, dtype=np.int64)
        changed = np.zeros(len(ids), dtype=np.int32)
        at_src = ids == source
        dist[at_src] = 0
        changed[at_src] = 1
        return {
            "dist": dist,
            "changed": changed,
            "msgs_in": 0,
            "active": int(changed.sum()),
        }

    def scatter(part, step, carry):
        dist = part["dist"]
        s_spos, s_dpos, s_bounds = part["s_spos"], part["s_dpos"], part["s_bounds"]
        changed = part["changed"].astype(bool)
        if not changed.any() or s_dpos.size == 0:
            return None
        # partition-local min-combine by dense destination position, ONE
        # packed row per destination partition (multicast batching); edges
        # sit in the build-time scatter layout — slice + mask, no per-step sort
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
            np.minimum.at(mins, block_pos, dist[sp[m]] + 1)
            nz = np.nonzero(mins != SENTINEL)[0]
            rows.append((int(p), nz.astype(np.int32), mins[nz]))
        if not rows:
            return None
        return pd.DataFrame(rows, columns=["pid", "dpos", "dist"])

    def update(part, inbox: pd.DataFrame, step, carry):
        dist = part["dist"].copy()
        changed = np.zeros(len(dist), dtype=np.int32)
        n_msgs = 0
        if len(inbox):
            pos = np.concatenate([np.asarray(x) for x in inbox["dpos"].values]).astype(np.int64)
            val = np.concatenate([np.asarray(x) for x in inbox["dist"].values])
            n_msgs = len(pos)
            cand = np.full(len(dist), SENTINEL)
            np.minimum.at(cand, pos, val)
            better = (cand < SENTINEL) & ((dist == UNREACHED) | (cand < dist))
            dist[better] = cand[better]
            changed[better] = 1
        return {
            "dist": dist,
            "changed": changed,
            "msgs_in": int(n_msgs),
            "active": int(changed.sum()),
        }

    return VertexProgram(
        name="sssp",
        state_schema="dist array<long>, changed array<int>, msgs_in long, active long",
        msg_schema="pid int, dpos array<int>, dist array<long>",
        init=init,
        scatter=scatter,
        update=update,
        stats=[("msgs_in", F.sum), ("active", F.sum)],
        converged=lambda srow, step: int(srow["active"] or 0) == 0,
        struct_cols=("s_spos", "s_dpos", "s_bounds"),
    )


def wsssp_program(source: int, P: int, weight_fn=None) -> VertexProgram:
    """Weighted SSSP (delta Bellman-Ford / min-plus) on the kernel.

    After R supersteps, dist(v) is EXACTLY the minimum cost over paths of
    at most R edges (delta relaxation reaches the same R-round fixpoint as
    full Bellman-Ford: every improvement re-enters the changed frontier
    and scatters the following step), so a fixed-round run matches an
    unrolled SQL relaxation verbatim and a convergence run (active == 0)
    is the true shortest-path vector.

    weight_fn(src_ids, dst_ids) -> int64 weights per edge; the default is
    the deterministic arithmetic family (src + dst) % 7 + 1 used by the
    gate. Weights are derived ONCE in init and stored in state in SCATTER
    ORDER — the scatter layout is a stable argsort of the CSR edges by
    destination pid (pregel.py build_parts), so replaying that argsort over
    the stored `indices` reproduces the exact edge order. At a scale where
    weights are data (not a formula), they belong in the static structure
    table instead; the program shape is identical."""
    SENTINEL = np.iinfo(np.int64).max
    if weight_fn is None:
        weight_fn = lambda s, d: (s + d) % 7 + 1  # noqa: E731

    def init(part):
        ids = np.asarray(part["ids"])
        indptr = np.asarray(part["indptr"])
        indices = np.asarray(part["indices"])
        src_ids = np.repeat(ids, np.diff(indptr))
        w_csr = np.asarray(weight_fn(src_ids, indices), dtype=np.int64)
        dpid = indices % P  # pmod: ids are non-negative
        order2 = np.argsort(dpid, kind="stable")
        dist = np.full(len(ids), UNREACHED, dtype=np.int64)
        changed = np.zeros(len(ids), dtype=np.int32)
        at_src = ids == source
        dist[at_src] = 0
        changed[at_src] = 1
        return {
            "dist": dist,
            "changed": changed,
            "s_w": w_csr[order2],
            "msgs_in": 0,
            "active": int(changed.sum()),
        }

    def scatter(part, step, carry):
        dist = part["dist"]
        s_spos, s_dpos, s_bounds = part["s_spos"], part["s_dpos"], part["s_bounds"]
        s_w = np.asarray(part["s_w"], dtype=np.int64)
        changed = part["changed"].astype(bool)
        if not changed.any() or s_dpos.size == 0:
            return None
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
            np.minimum.at(mins, block_pos, dist[sp[m]] + s_w[lo:hi][m])
            nz = np.nonzero(mins != SENTINEL)[0]
            rows.append((int(p), nz.astype(np.int32), mins[nz]))
        if not rows:
            return None
        return pd.DataFrame(rows, columns=["pid", "dpos", "dist"])

    base = sssp_program(source, P)

    def update(part, inbox, step, carry):
        out = base.update(part, inbox, step, carry)
        out["s_w"] = np.asarray(part["s_w"], dtype=np.int64)
        return out

    return VertexProgram(
        name="wsssp",
        state_schema=(
            "dist array<long>, changed array<int>, s_w array<long>, "
            "msgs_in long, active long"
        ),
        msg_schema=base.msg_schema,
        init=init,
        scatter=scatter,
        update=update,
        stats=base.stats,
        converged=base.converged,
        struct_cols=("s_spos", "s_dpos", "s_bounds"),
    )


def weighted_sssp(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    source: int,
    max_rounds: int = 64,
    num_partitions: int | None = 32,
    weight_fn=None,
) -> tuple[DataFrame, list[dict]]:
    """Weighted shortest paths from `source` -> ((id, dist), metrics);
    dist = exact min cost over paths of <= max_rounds edges (unreached
    vertices carry no row)."""
    if num_partitions is None:
        num_partitions = auto_partitions(edges.count())
    parts = build_parts(spark, vertices, edges, num_partitions)
    prog = wsssp_program(source, num_partitions, weight_fn=weight_fn)
    kern = Pregel(spark, parts, num_partitions)
    final, metrics = kern.run(prog, max_steps=max_rounds)
    return distances_df(final), metrics


def distances_df(parts: DataFrame) -> DataFrame:
    """(id, dist) for vertices reached within the bound; unreached dropped."""
    z = F.explode(F.arrays_zip("ids", "dist")).alias("z")
    return (
        parts.select(z)
        .select(F.col("z.ids").alias("id"), F.col("z.dist").alias("dist"))
        .where(F.col("dist") >= 0)
    )


def sssp(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    source: int,
    max_hops: int = 64,
    num_partitions: int | None = 32,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, list[dict]]:
    """Hop distances from `source`, bounded at max_hops supersteps."""
    if num_partitions is None:
        num_partitions = auto_partitions(edges.count())
    parts = build_parts(spark, vertices, edges, num_partitions)
    kern = Pregel(spark, parts, num_partitions)
    final, metrics = kern.run(
        sssp_program(source, num_partitions),
        max_steps=max_hops,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        checkpoint_every=checkpoint_every,
    )
    return distances_df(final), metrics


def warm_sssp_state(
    parts: DataFrame, P: int, prior: DataFrame, touched: DataFrame
) -> DataFrame:
    """Kernel state for INCREMENTAL SSSP after append-only growth: old
    vertices keep their prior hop distance (UNREACHED when absent from
    prior — the bounded contract drops those rows), new vertices start
    UNREACHED, and only delta-touched ids start `changed`. Exact under
    growth for the same reason as warm CC: added edges only SHORTEN
    distances, prior distances are valid upper bounds, and every strict
    improvement enters through a delta edge — the min-plus wave follows
    the shortcut wavefront instead of re-flooding from the source.
    Distances map through get_indexer (int64 end to end)."""
    from .pregel import match_prior_values, pid_keyed, warm_state_cogroup

    pr = pid_keyed(prior, P, F.col("dist").alias("d"), F.lit(0).alias("t"))
    tc = pid_keyed(
        touched, P, F.lit(None).cast("long").alias("d"), F.lit(1).alias("t")
    )
    side = pr.unionByName(tc)

    def build(part: dict, side_pdf: pd.DataFrame) -> dict:
        ids = np.asarray(part["ids"])
        dist = np.full(len(ids), UNREACHED, dtype=np.int64)
        changed = np.zeros(len(ids), dtype=np.int32)
        if len(side_pdf):
            pri = side_pdf[side_pdf["t"] == 0]
            if len(pri):
                vals, m = match_prior_values(
                    ids,
                    pri["id"].to_numpy(dtype="int64"),
                    pri["d"].to_numpy(dtype="int64"),
                )
                dist[m] = vals
            tch = side_pdf[side_pdf["t"] == 1]["id"].to_numpy(dtype="int64")
            if len(tch):
                # vectorized membership — a Python per-id loop costs seconds
                # per multi-million-vertex block on every warm restart
                is_t = np.isin(ids, tch)
                # only FINITE touched distances scatter: an UNREACHED
                # vertex has nothing to offer until it receives (scattering
                # would send UNREACHED+1 = 0 and poison the flood); it
                # wakes up the step a finite touched neighbor reaches it
                changed[is_t & (dist != UNREACHED)] = 1
        return {
            "dist": dist,
            "changed": changed,
            "msgs_in": 0,
            "active": int(changed.sum()),
        }

    schema = "pid int, dist array<long>, changed array<int>, msgs_in long, active long"
    return warm_state_cogroup(parts, side, ("pid", "ids"), schema, build)


def sssp_warm(
    spark: SparkSession,
    parts: DataFrame,
    prior: DataFrame,
    touched: DataFrame,
    source: int,
    max_hops: int = 64,
    num_partitions: int = 32,
    max_steps: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, list[dict]]:
    """Incremental bounded SSSP on a grown parts table: warm-start min-plus
    from prior distances with only the delta frontier active, run to
    convergence (the wave is as deep as the shortcut's reach, not the
    source's eccentricity), and re-apply the hop bound on output — a
    vertex whose improved distance still exceeds max_hops carries no row,
    exactly like the cold bounded run. `source` is only used to guard the
    degenerate no-prior case (cold semantics: flood from source)."""
    P = num_partitions
    has_prior = prior.limit(1).count() > 0
    if not has_prior:
        final, metrics = Pregel(spark, parts, P).run(
            sssp_program(source, P),
            max_steps=max_hops,
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
        )
        return distances_df(final), metrics
    # persist: the struct save and the warm-state save both execute the
    # (typically lazy build+rebuild) parts plan (same discipline as
    # pagerank_warm / connected_components_warm)
    parts = parts.persist()
    state0 = warm_sssp_state(parts, P, prior, touched)
    try:
        final, metrics = Pregel(spark, parts, P).run(
            sssp_program(source, P),
            max_steps=max_steps,
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
            state0=state0,
        )
    finally:
        parts.unpersist()
    return distances_df(final).where(F.col("dist") <= max_hops), metrics


def landmark_program(landmarks: list[int], P: int) -> VertexProgram:
    """Multi-source BFS: ONE kernel run computes hop distances to k
    landmarks simultaneously (the landmark-embedding / closeness feature
    matrix). State is a band-major k*nv vector per block (band b, dense
    position p -> index b*nv + p); messages encode (position, band) as
    pos*k + band so the update fold stays ONE minimum.at over the packed
    vector — per-superstep work is k-vectorized slices, never a per-band
    Spark job. The reference framework has no multi-source variant; this
    is the vector-state generalization of the same min-plus program."""
    import numpy as np
    import pandas as pd

    k = len(landmarks)
    SENTINEL = np.iinfo(np.int64).max

    def init(part):
        ids = np.asarray(part["ids"], dtype=np.int64)
        nv = len(ids)
        dist = np.full(k * nv, UNREACHED, dtype=np.int64)
        changed = np.zeros(k * nv, dtype=np.int32)
        for b, lm in enumerate(landmarks):
            at = np.nonzero(ids == lm)[0]
            dist[b * nv + at] = 0
            changed[b * nv + at] = 1
        return {
            "dist": dist,
            "changed": changed,
            "msgs_in": 0,
            "active": int(changed.sum()),
        }

    def scatter(part, step, carry):
        s_spos, s_dpos, s_bounds = part["s_spos"], part["s_dpos"], part["s_bounds"]
        dist = np.asarray(part["dist"])
        changed = np.asarray(part["changed"]).astype(bool)
        nv = len(dist) // k
        if not changed.any() or s_dpos.size == 0:
            return None
        rows = []
        for p in range(P):
            lo, hi = int(s_bounds[p]), int(s_bounds[p + 1])
            if hi <= lo:
                continue
            sp = s_spos[lo:hi].astype(np.int64)
            dp = s_dpos[lo:hi].astype(np.int64)
            enc_parts, val_parts = [], []
            for b in range(k):
                m = changed[b * nv + sp]
                if not m.any():
                    continue
                enc_parts.append(dp[m] * k + b)
                val_parts.append(dist[b * nv + sp[m]] + 1)
            if not enc_parts:
                continue
            enc = np.concatenate(enc_parts)
            val = np.concatenate(val_parts)
            mins = np.full(int(enc.max()) + 1, SENTINEL)
            np.minimum.at(mins, enc, val)
            nz = np.nonzero(mins != SENTINEL)[0]
            rows.append((int(p), nz.astype(np.int64), mins[nz]))
        if not rows:
            return None
        return pd.DataFrame(rows, columns=["pid", "enc", "dist"])

    def update(part, inbox: pd.DataFrame, step, carry):
        dist = np.asarray(part["dist"]).copy()
        nv = len(dist) // k
        changed = np.zeros(len(dist), dtype=np.int32)
        n_msgs = 0
        if len(inbox):
            enc = np.concatenate([np.asarray(x) for x in inbox["enc"].values]).astype(np.int64)
            val = np.concatenate([np.asarray(x) for x in inbox["dist"].values])
            n_msgs = len(enc)
            idx = (enc % k) * nv + (enc // k)
            cand = np.full(len(dist), SENTINEL)
            np.minimum.at(cand, idx, val)
            better = (cand < SENTINEL) & ((dist == UNREACHED) | (cand < dist))
            dist[better] = cand[better]
            changed[better] = 1
        return {
            "dist": dist,
            "changed": changed,
            "msgs_in": int(n_msgs),
            "active": int(changed.sum()),
        }

    return VertexProgram(
        name="landmarks",
        state_schema="dist array<long>, changed array<int>, msgs_in long, active long",
        msg_schema="pid int, enc array<long>, dist array<long>",
        init=init,
        scatter=scatter,
        update=update,
        stats=[("msgs_in", F.sum), ("active", F.sum)],
        converged=lambda srow, step: int(srow["active"] or 0) == 0,
        struct_cols=("s_spos", "s_dpos", "s_bounds"),
    )


def landmark_distances(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    landmarks: list[int],
    max_hops: int = 32,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, list[dict]]:
    """(id, d0..d{k-1}): hop distance from every vertex TO each landmark
    (columns in landmark order; -1 = unreached within max_hops — ALL
    vertices carry a row, unlike sssp, because the output is a feature
    matrix). Same bounded-distance contract as sssp: after R supersteps
    d_b is exact over paths of at most R edges."""
    if not landmarks:
        raise ValueError("landmark_distances: need at least one landmark")
    P = (
        num_partitions
        if num_partitions is not None
        else auto_partitions(edges.count())
    )
    parts = build_parts(spark, vertices, edges, P)
    final, metrics = Pregel(spark, parts, P).run(
        landmark_program(list(landmarks), P),
        max_steps=max_hops,
        checkpoint_dir=checkpoint_dir,
    )
    k = len(landmarks)
    base = final.select(
        F.size("ids").alias("__nv"),
        F.posexplode("ids").alias("__i", "id"),
        F.col("dist").alias("__d"),
    )
    cols = [
        F.element_at(
            F.col("__d"), (F.lit(b) * F.col("__nv") + F.col("__i") + 1).cast("int")
        ).alias(f"d{b}")
        for b in range(k)
    ]
    return base.select("id", *cols), metrics


def harmonic_centrality(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    landmarks: list[int],
    max_hops: int = 32,
    num_partitions: int | None = None,
) -> tuple[DataFrame, list[dict]]:
    """(id, harmonic): landmark-sampled harmonic centrality — Σ over
    landmarks s (s != v, v reached within max_hops) of 1/d(s, v), on top of
    landmark_distances. The float sum is written as a FIXED-ORDER chain of
    the k per-landmark terms (term_0 + term_1 + ...), so with bit-identical
    distances both engines produce the bit-identical double: the score
    hash-gates exactly without rounding."""
    d, metrics = landmark_distances(
        spark, vertices, edges, landmarks,
        max_hops=max_hops, num_partitions=num_partitions,
    )
    total = None
    for b in range(len(landmarks)):
        term = F.when(
            F.col(f"d{b}") > 0, F.lit(1.0) / F.col(f"d{b}")
        ).otherwise(F.lit(0.0))
        total = term if total is None else (total + term)
    return d.select("id", total.alias("harmonic")), metrics


def closeness_centrality(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    landmarks: list[int],
    max_hops: int = 32,
    num_partitions: int | None = None,
) -> tuple[DataFrame, list[dict]]:
    """(id, reached, dist_sum, closeness): landmark-sampled closeness
    centrality on top of landmark_distances — reached = # landmarks s != v
    found within max_hops, dist_sum = Σ d(s, v) over those, closeness =
    reached / dist_sum (0.0 when nothing is reached). Both aggregates are
    exact int64, so the single double division is bit-identical across
    engines — the score hash-gates without rounding, like its harmonic
    sibling (same one-kernel-run, k-distance-bands plan)."""
    d, metrics = landmark_distances(
        spark, vertices, edges, landmarks,
        max_hops=max_hops, num_partitions=num_partitions,
    )
    reached = None
    dsum = None
    for b in range(len(landmarks)):
        hit = F.when(F.col(f"d{b}") > 0, F.lit(1)).otherwise(F.lit(0))
        term = F.when(F.col(f"d{b}") > 0, F.col(f"d{b}")).otherwise(F.lit(0))
        reached = hit if reached is None else (reached + hit)
        dsum = term if dsum is None else (dsum + term)
    closeness = F.when(
        dsum > 0, reached.cast("long") / dsum.cast("long")
    ).otherwise(F.lit(0.0))
    return (
        d.select(
            "id",
            reached.cast("long").alias("reached"),
            dsum.cast("long").alias("dist_sum"),
            closeness.alias("closeness"),
        ),
        metrics,
    )
