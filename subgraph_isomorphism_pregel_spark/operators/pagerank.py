"""PageRank as a vertex program over the BSP kernel.

Semantics (matched exactly by the numpy oracle in tests and the unrolled SQL
oracle in __spark_entry__):

    rank_0(v)    = 1/N
    rank_t+1(v)  = (1-d)/N + d * ( sum_{u->v} rank_t(u)/outdeg(u)
                                   + dangling_mass_t / N )
    dangling_mass_t = sum of rank_t(u) over outdeg(u) == 0
    stop when max_v |rank_t+1(v) - rank_t(v)| < tol   (tol 1e-6, per the
    north rule's allclose-1e-6 requirement)

The scatter stage pre-aggregates contributions per (source partition,
destination) in numpy before the shuffle — map-side combining that bounds a
hub vertex's inbox to P rows (skew handling; the reference's Combiner is
disabled dead code, /root/reference/src/utils/Combiner.h:4-11).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pregel import Pregel, VertexProgram, auto_partitions, build_parts

DAMPING = 0.85


def pagerank_program(n_vertices: int, P: int, tol: float = 1e-6, fixed_steps: int | None = None) -> VertexProgram:
    N = float(n_vertices)
    d = DAMPING

    def init(part):
        nv = len(part["ids"])
        rank = np.full(nv, 1.0 / N)
        outdeg = np.diff(part["indptr"]).astype(np.int64)
        # only the (usually tiny) set of dangling positions crosses into the
        # state table — update() runs without the structure table, and the
        # per-step checkpoint should carry the mutable rank array, not a
        # static degree copy
        dang_pos = np.nonzero(outdeg == 0)[0].astype(np.int64)
        return {
            "rank": rank,
            "dang_pos": dang_pos,
            "max_delta": 1.0,
            "dangling_partial": float(rank[dang_pos].sum()),
            "msgs_in": 0,
            "active": nv,
        }

    def scatter(part, step, carry):
        rank, indptr = part["rank"], part["indptr"]
        s_spos, s_dpos = part["s_spos"], part["s_dpos"]
        s_bounds = part["s_bounds"]
        if s_dpos.size == 0:
            return None
        outdeg = np.diff(indptr)
        rate = np.where(outdeg > 0, rank / np.maximum(outdeg, 1), 0.0)
        # ONE row per destination partition carrying packed (position, value)
        # arrays — the Spark analog of the reference's one-payload-per-worker
        # multicast batching (/root/reference/src/basic/Vertex.h:102-106,
        # vecs.h:75-79). Edges live in the build-time SCATTER LAYOUT (sorted
        # by destination partition, with dense destination positions), so the
        # per-block pre-aggregation is a slice + bincount: no per-step sort,
        # no id search — nothing O(E log E) in the superstep.
        rows = []
        for p in range(P):
            lo, hi = int(s_bounds[p]), int(s_bounds[p + 1])
            if hi <= lo:
                continue
            dense = np.bincount(s_dpos[lo:hi], weights=rate[s_spos[lo:hi]])
            nz = np.nonzero(dense)[0]
            # positions are dense block offsets — int32 halves their bytes
            # through the message shuffle
            rows.append((int(p), nz.astype(np.int32), dense[nz]))
        return pd.DataFrame(rows, columns=["pid", "dpos", "contrib"])

    def update(part, inbox: pd.DataFrame, step, carry):
        rank = part["rank"]
        dang_pos = part["dang_pos"]
        contrib = np.zeros(len(rank))
        n_msgs = 0
        if len(inbox):
            # fold per-source-partition packed partials by position
            pos = np.concatenate([np.asarray(x) for x in inbox["dpos"].values]).astype(np.int64)
            val = np.concatenate([np.asarray(x) for x in inbox["contrib"].values])
            n_msgs = len(pos)
            np.add.at(contrib, pos, val)
        dangling = float(carry.get("dangling", 0.0))
        new_rank = (1.0 - d) / N + d * (contrib + dangling / N)
        delta = np.abs(new_rank - rank)
        return {
            "rank": new_rank,
            "dang_pos": dang_pos,
            "max_delta": float(delta.max(initial=0.0)),
            "dangling_partial": float(new_rank[dang_pos].sum()),
            "msgs_in": int(n_msgs),
            "active": int((delta >= tol).sum()),
        }

    def carry_fn(srow):
        return {"dangling": float(srow["dangling_partial"] or 0.0)}

    def converged(srow, step):
        if fixed_steps is not None:
            return step >= fixed_steps
        return float(srow["max_delta"]) < tol

    return VertexProgram(
        name="pagerank",
        state_schema="rank array<double>, dang_pos array<long>, max_delta double, dangling_partial double, msgs_in long, active long",
        msg_schema="pid int, dpos array<int>, contrib array<double>",
        init=init,
        scatter=scatter,
        update=update,
        stats=[
            ("max_delta", F.max),
            ("dangling_partial", F.sum),
            ("msgs_in", F.sum),
            ("active", F.sum),
        ],
        carry_fn=carry_fn,
        converged=converged,
        struct_cols=("indptr", "s_spos", "s_dpos", "s_bounds"),
    )


def ppr_program(
    seeds: list[int], P: int, tol: float = 1e-6, fixed_steps: int | None = None
) -> VertexProgram:
    """Personalized PageRank: the teleport vector is uniform over the seed
    set instead of over all vertices, and dangling mass is returned to the
    seeds (the standard PPR convention):

        rank_0(v)    = e_S(v)
        rank_t+1(v)  = (1-d) * e_S(v) + d * ( sum_{u->v} rank_t(u)/outdeg(u)
                                              + dangling_mass_t * e_S(v) )
        e_S(v) = 1/|S| if v in S else 0

    Shares the packed-multicast scatter with the global program; only init
    and the rank update differ (teleport is a sparse per-partition vector
    reconstructed from seed positions stored in state, so checkpoints carry
    positions, not a dense copy)."""
    d = DAMPING
    n_seeds = float(len(seeds))
    seeds_arr = np.asarray(sorted(set(seeds)), dtype=np.int64)
    base = pagerank_program(1, P, tol=tol, fixed_steps=fixed_steps)

    def teleport(nv: int, seed_pos: np.ndarray) -> np.ndarray:
        tele = np.zeros(nv)
        tele[seed_pos] = 1.0 / n_seeds
        return tele

    def init(part):
        nv = len(part["ids"])
        seed_pos = np.nonzero(np.isin(part["ids"], seeds_arr))[0].astype(np.int64)
        rank = teleport(nv, seed_pos)
        outdeg = np.diff(part["indptr"]).astype(np.int64)
        dang_pos = np.nonzero(outdeg == 0)[0].astype(np.int64)
        return {
            "rank": rank,
            "dang_pos": dang_pos,
            "seed_pos": seed_pos,
            "max_delta": 1.0,
            "dangling_partial": float(rank[dang_pos].sum()),
            "msgs_in": 0,
            "active": nv,
        }

    def update(part, inbox: pd.DataFrame, step, carry):
        rank = part["rank"]
        dang_pos = part["dang_pos"]
        seed_pos = np.asarray(part["seed_pos"], dtype=np.int64)
        contrib = np.zeros(len(rank))
        n_msgs = 0
        if len(inbox):
            pos = np.concatenate([np.asarray(x) for x in inbox["dpos"].values]).astype(np.int64)
            val = np.concatenate([np.asarray(x) for x in inbox["contrib"].values])
            n_msgs = len(pos)
            np.add.at(contrib, pos, val)
        dangling = float(carry.get("dangling", 0.0))
        tele = teleport(len(rank), seed_pos)
        new_rank = (1.0 - d) * tele + d * (contrib + dangling * tele)
        delta = np.abs(new_rank - rank)
        return {
            "rank": new_rank,
            "dang_pos": dang_pos,
            "seed_pos": seed_pos,
            "max_delta": float(delta.max(initial=0.0)),
            "dangling_partial": float(new_rank[dang_pos].sum()),
            "msgs_in": int(n_msgs),
            "active": int((delta >= tol).sum()),
        }

    return VertexProgram(
        name="ppr",
        state_schema=(
            "rank array<double>, dang_pos array<long>, seed_pos array<long>, "
            "max_delta double, dangling_partial double, msgs_in long, active long"
        ),
        msg_schema=base.msg_schema,
        init=init,
        scatter=base.scatter,
        update=update,
        stats=base.stats,
        carry_fn=base.carry_fn,
        converged=base.converged,
        struct_cols=base.struct_cols,
    )


def personalized_pagerank(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    seeds: list[int],
    num_partitions: int | None = 32,
    tol: float = 1e-6,
    max_steps: int = 100,
    fixed_steps: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, list[dict]]:
    """Personalized PageRank from a seed set -> ((id, score), metrics)."""
    if not seeds:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    if num_partitions is None:
        num_partitions = auto_partitions(edges.count())
    seed_set = set(int(s) for s in seeds)
    # dangling seeds determine the step-1 carry: rank_0 = e_S, so the
    # initial dangling mass is |dangling seeds| / |S|
    with_out = {
        int(r[0])
        for r in edges.select("src")
        .where(F.col("src").isin(list(seed_set)))
        .distinct()
        .collect()
    }
    n_dang_seeds = len(seed_set - with_out)
    parts = build_parts(spark, vertices, edges, num_partitions)
    prog = ppr_program(sorted(seed_set), num_partitions, tol=tol, fixed_steps=fixed_steps)
    kern = Pregel(spark, parts, num_partitions)
    final, metrics = kern.run(
        prog,
        max_steps=fixed_steps or max_steps,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        checkpoint_every=checkpoint_every,
        carry0={"dangling": n_dang_seeds / len(seed_set)},
    )
    return scores_df(final), metrics


def warm_pagerank_state(
    parts: DataFrame, P: int, prior: DataFrame, n_vertices: int,
    scale: float = 1.0,
) -> DataFrame:
    """Build a pagerank kernel state table seeded from PRIOR scores — the
    incremental-recompute path for a continuously ingested link graph:
    after the nightly delta lands (add_vertices), a warm run restarts
    power iteration from yesterday's fixed point instead of from uniform,
    so it converges in the few supersteps the delta actually perturbed
    rather than the full cold ladder (log(N)/log(1/d) ~ 40+ at 1e-6).

    prior: (id, score); vertices absent from it (the newly added ones)
    start at 1/N, and prior scores are rescaled by `scale` (pass
    N_old/N_new: fixed-point mass is 1 on both graphs, so growth shifts
    every score down by roughly that factor — rescaling absorbs the
    global teleport shift so the residual error is only the delta's LOCAL
    perturbation). One cogroup of the struct blocks with the pid-keyed
    prior scores — distributed, no driver-side materialization, any prior
    size. The reference has no analog (it rebuilds state per run,
    /root/reference/src/basic/Worker.h:218-287); this is what its runtime
    vertex-addition hook (F9) is FOR at web scale."""
    from .pregel import match_prior_values, pid_keyed, warm_state_cogroup

    N = float(n_vertices)
    by_pid = pid_keyed(prior, P, "score")

    def build(part: dict, sc_pdf: pd.DataFrame) -> dict:
        ids = np.asarray(part["ids"])
        nv = len(ids)
        rank = np.full(nv, 1.0 / N)
        if len(sc_pdf):
            vals, mask = match_prior_values(
                ids,
                sc_pdf["id"].to_numpy(dtype="int64"),
                sc_pdf["score"].to_numpy(dtype="float64"),
            )
            rank[mask] = vals * scale
        outdeg = np.diff(np.asarray(part["indptr"])).astype(np.int64)
        dang_pos = np.nonzero(outdeg == 0)[0].astype(np.int64)
        return {
            "rank": rank,
            "dang_pos": dang_pos,
            "max_delta": 1.0,
            "dangling_partial": float(rank[dang_pos].sum()),
            "msgs_in": 0,
            "active": nv,
        }

    schema = (
        "pid int, rank array<double>, dang_pos array<long>, max_delta double, "
        "dangling_partial double, msgs_in long, active long"
    )
    return warm_state_cogroup(parts, by_pid, ("pid", "ids", "indptr"), schema, build)


def pagerank_warm(
    spark: SparkSession,
    parts: DataFrame,
    prior: DataFrame,
    n_vertices: int,
    num_partitions: int = 32,
    tol: float = 1e-6,
    max_steps: int = 100,
    fixed_steps: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, list[dict]]:
    """PageRank WARM-STARTED from prior (id, score) on a pre-built parts
    table (typically the output of add_vertices after a graph delta) ->
    ((id, score), metrics). Converges to the same fixed point as a cold
    run (power iteration is contraction-mapped; the start only changes
    the step count) — asserted in tests. Usually reaches tol in far fewer
    steps than the cold ladder (5 vs 43 on the sf0.1 bench); the honest
    caveat is that a sharply LOCALIZED delta can occasionally re-converge
    slower than cold-from-uniform when its error vector rides a slow
    local mode (uniform error decays via global mixing) — the returned
    metrics carry the per-run superstep count so a scheduler can monitor
    exactly this."""
    P = num_partitions
    n_prior = prior.count()
    scale = (n_prior / n_vertices) if (n_prior and n_vertices) else 1.0
    # `parts` is typically a LAZY build_parts+add_vertices plan; three
    # consumers read it (the dangling aggregate below, the kernel's struct
    # save, and the warm-state save) — persist so the CSR build and the
    # incremental rebuild execute ONCE instead of three times (measured
    # ~2.9s per re-execution at sf0.1). Same for the warm-state cogroup,
    # which feeds both the aggregate and the state save.
    parts = parts.persist()
    state0 = warm_pagerank_state(parts, P, prior, n_vertices, scale=scale).persist()
    # step-1 dangling carry = prior mass sitting on dangling vertices
    # (one aggregate over the warm state — no driver-side score scan)
    dang0 = state0.agg(F.sum("dangling_partial").alias("s")).collect()[0]["s"] or 0.0
    prog = pagerank_program(n_vertices, P, tol=tol, fixed_steps=fixed_steps)
    try:
        final, metrics = Pregel(spark, parts, P).run(
            prog,
            max_steps=fixed_steps or max_steps,
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
            carry0={"dangling": float(dang0)},
            state0=state0,
        )
    finally:
        state0.unpersist()
        parts.unpersist()
    return scores_df(final), metrics


def weighted_pagerank_program(
    n_vertices: int,
    P: int,
    tol: float = 1e-6,
    fixed_steps: int | None = None,
    weight_fn=None,
) -> VertexProgram:
    """PageRank with weighted transitions: a walker at u moves to v with
    probability w(u,v) / W(u) where W(u) is u's total out-weight (dangling
    = W(u) == 0). weight_fn(src_ids, dst_ids) -> float64 per-edge weights;
    default (src + dst) % 7 + 1 (the gate's arithmetic family). Weights
    and per-source totals derive ONCE in init by replaying the scatter
    layout's stable argsort over the CSR indices (see
    sssp.wsssp_program); everything else is the global program."""
    N = float(n_vertices)
    d = DAMPING
    if weight_fn is None:
        weight_fn = lambda s, t: (s + t) % 7 + 1  # noqa: E731
    base = pagerank_program(n_vertices, P, tol=tol, fixed_steps=fixed_steps)

    def init(part):
        ids = np.asarray(part["ids"])
        indptr = np.asarray(part["indptr"])
        indices = np.asarray(part["indices"])
        src_ids = np.repeat(ids, np.diff(indptr))
        w_csr = np.asarray(weight_fn(src_ids, indices), dtype=np.float64)
        wsum = np.zeros(len(ids))
        src_pos = np.repeat(np.arange(len(ids)), np.diff(indptr))
        np.add.at(wsum, src_pos, w_csr)
        order2 = np.argsort(indices % P, kind="stable")
        nv = len(ids)
        rank = np.full(nv, 1.0 / N)
        dang_pos = np.nonzero(wsum == 0.0)[0].astype(np.int64)
        return {
            "rank": rank,
            "dang_pos": dang_pos,
            "s_w": w_csr[order2],
            "wsum": wsum,
            "max_delta": 1.0,
            "dangling_partial": float(rank[dang_pos].sum()),
            "msgs_in": 0,
            "active": nv,
        }

    def scatter(part, step, carry):
        rank = part["rank"]
        s_spos, s_dpos = part["s_spos"], part["s_dpos"]
        s_bounds = part["s_bounds"]
        if s_dpos.size == 0:
            return None
        wsum = np.asarray(part["wsum"], dtype=np.float64)
        s_w = np.asarray(part["s_w"], dtype=np.float64)
        safe = np.where(wsum > 0, wsum, 1.0)
        rows = []
        for p in range(P):
            lo, hi = int(s_bounds[p]), int(s_bounds[p + 1])
            if hi <= lo:
                continue
            sp = s_spos[lo:hi]
            contrib = rank[sp] / safe[sp] * s_w[lo:hi]
            dense = np.bincount(s_dpos[lo:hi], weights=contrib)
            nz = np.nonzero(dense)[0]
            rows.append((int(p), nz.astype(np.int32), dense[nz]))
        return pd.DataFrame(rows, columns=["pid", "dpos", "contrib"])

    def update(part, inbox, step, carry):
        out = base.update(part, inbox, step, carry)
        out["s_w"] = np.asarray(part["s_w"], dtype=np.float64)
        out["wsum"] = np.asarray(part["wsum"], dtype=np.float64)
        return out

    return VertexProgram(
        name="wpagerank",
        state_schema=(
            "rank array<double>, dang_pos array<long>, s_w array<double>, "
            "wsum array<double>, max_delta double, dangling_partial double, "
            "msgs_in long, active long"
        ),
        msg_schema=base.msg_schema,
        init=init,
        scatter=scatter,
        update=update,
        stats=base.stats,
        carry_fn=base.carry_fn,
        converged=base.converged,
        struct_cols=("s_spos", "s_dpos", "s_bounds"),
    )


def weighted_pagerank(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    num_partitions: int | None = 32,
    tol: float = 1e-6,
    max_steps: int = 100,
    fixed_steps: int | None = None,
    weight_fn=None,
) -> tuple[DataFrame, list[dict]]:
    """Weighted-transition PageRank -> ((id, score), metrics).

    weight_fn must be strictly positive (the step-1 dangling carry is
    derived from out-edge EXISTENCE; a zero-weight edge would break that
    equivalence)."""
    if num_partitions is None:
        num_partitions = auto_partitions(edges.count())
    n = vertices.count()
    # initial dangling mass: vertices with zero out-WEIGHT — with strictly
    # positive weights that is exactly the vertices with no out-edges
    n_dangling = n - edges.select("src").distinct().count()
    parts = build_parts(spark, vertices, edges, num_partitions)
    prog = weighted_pagerank_program(
        n, num_partitions, tol=tol, fixed_steps=fixed_steps, weight_fn=weight_fn
    )
    kern = Pregel(spark, parts, num_partitions)
    final, metrics = kern.run(
        prog,
        max_steps=fixed_steps or max_steps,
        carry0={"dangling": n_dangling / n if n else 0.0},
    )
    return scores_df(final), metrics


def scores_df(parts: DataFrame) -> DataFrame:
    """parts -> (id, score), JVM-side explode of the aligned arrays."""
    z = F.explode(F.arrays_zip("ids", "rank")).alias("z")
    return parts.select(z).select(
        F.col("z.ids").alias("id"), F.col("z.rank").alias("score")
    )


def pagerank(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    num_partitions: int | None = 32,
    tol: float = 1e-6,
    max_steps: int = 100,
    fixed_steps: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, list[dict]]:
    """End-to-end PageRank: (vertices, edges) -> ((id, score) DataFrame,
    metrics). num_partitions=None sizes CSR blocks by edge volume
    (auto_partitions) instead of core count."""
    if num_partitions is None:
        num_partitions = auto_partitions(edges.count())
    n = vertices.count()
    n_dangling = n - edges.select("src").distinct().count()
    parts = build_parts(spark, vertices, edges, num_partitions)
    prog = pagerank_program(n, num_partitions, tol=tol, fixed_steps=fixed_steps)
    kern = Pregel(spark, parts, num_partitions)
    final, metrics = kern.run(
        prog,
        max_steps=fixed_steps or max_steps,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        checkpoint_every=checkpoint_every,
        carry0={"dangling": n_dangling / n if n else 0.0},
    )
    return scores_df(final), metrics
