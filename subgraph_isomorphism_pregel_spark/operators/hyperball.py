"""HyperBall: per-vertex neighborhood-size estimation on the BSP kernel.

The neighborhood function — |B(v, r)|, the number of vertices reachable
from v within r hops — is the primitive behind effective-diameter and
centrality estimates on web-scale link graphs, and computing it exactly is
O(n²). HyperBall (Boldi & Vigna's HyperANF refinement) keeps ONE
HyperLogLog sketch per vertex and iterates

    regs_0(v)   = HLL registers of {v}
    regs_r(v)   = elementwise max(regs_{r-1}(v),
                                  regs_{r-1}(w)) for every out-edge v->w

so after r rounds regs(v) sketches exactly B(v, r), and the HLL estimate
turns each vertex's m registers into |B(v, r)|.

Kernel mapping: registers live VERTEX-MAJOR in one flat int64 state array
(pos*m + j — the landmark-BFS band-packing pattern, sssp.py); the input
edges are REVERSED at build time so out-neighbor registers flow back to
their source; scatter sends the m registers of changed vertices only, and
the update fold is a single np.maximum.at over (dense position, register)
codes. Convergence: a vertex re-scatters only when some register grew, so
the frontier dies once every ball stops growing (bounded by `radius`).

Determinism: the register construction reuses hll_distinct's md5
convention byte-for-byte (top p bits bucket, leading-zero rank of the
remaining 32-p bits, sketches.py:47-61), and every per-vertex estimate
term 2^(R-M) is an exact power of two (order-independent sum), so the
DuckDB oracle replays the registers AND the estimates exactly — the only
float exposure is the final ln of the linear-counting branch, rounded 6dp
like the other gated estimates.

Reference analog: none (the reference has no sketches); the superstep
protocol is the same vote-to-halt loop as its Vertex.h programs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pregel import Pregel, VertexProgram, auto_partitions, build_parts
from .sketches import hll_params


def _init_registers(ids: np.ndarray, m: int, W: int) -> np.ndarray:
    """nv x m vertex-major registers for the singleton sets {id}.

    One md5 per vertex, once at build time (the per-superstep path never
    hashes); at cluster scale this loop runs partition-parallel inside
    init(), nv = vertices per block."""
    nv = len(ids)
    regs = np.zeros(nv * m, dtype=np.int64)
    for i, v in enumerate(ids):
        h32 = int(hashlib.md5(str(int(v)).encode()).hexdigest()[:8], 16)
        b = h32 >> W
        w = h32 & ((1 << W) - 1)
        rank = W - (w.bit_length()) + 1
        regs[i * m + b] = rank
    return regs


def _estimates(regs: np.ndarray, m: int, R: int, num: float) -> np.ndarray:
    """Per-vertex HLL estimates from the packed register vector (the
    hll_distinct formula, vectorized)."""
    mat = regs.reshape(-1, m)
    v_empty = (mat == 0).sum(axis=1)
    s = np.power(2.0, float(R) - mat).sum(axis=1)
    e_raw = num / s
    lin = float(m) * np.log(float(m) / np.maximum(v_empty, 1))
    return np.where((e_raw <= 2.5 * m) & (v_empty > 0), lin, e_raw)


def hyperball_program(
    P: int,
    m: int,
    W: int,
    radius: int,
    R: int,
    num: float,
    nf_collect: list | None = None,
) -> VertexProgram:
    def init(part):
        ids = np.asarray(part["ids"], dtype=np.int64)
        nv = len(ids)
        regs = _init_registers(ids, m, W)
        est0 = _estimates(regs, m, R, num)
        return {
            "regs": regs,
            "changed": np.ones(nv, dtype=np.int32),
            "msgs_in": 0,
            "active": nv,
            # fixed-point per-partition partial of the round's N(r) total:
            # per-vertex estimates quantized to 1e-6 then int64-summed, so
            # the cross-partition fold is order-independent and the
            # neighborhood function hash-gates (fixed_point_sum discipline)
            "est_micro": int(np.floor(est0 * 1e6 + 0.5).astype(np.int64).sum()),
        }

    def scatter(part, step, carry):
        regs = np.asarray(part["regs"], dtype=np.int64)
        s_spos, s_dpos, s_bounds = part["s_spos"], part["s_dpos"], part["s_bounds"]
        changed = np.asarray(part["changed"]).astype(bool)
        if not changed.any() or s_dpos.size == 0:
            return None
        mat = regs.reshape(-1, m)
        rows = []
        for p in range(P):
            lo, hi = int(s_bounds[p]), int(s_bounds[p + 1])
            if hi <= lo:
                continue
            sp = s_spos[lo:hi]
            mask = changed[sp]
            if not mask.any():
                continue
            bp = s_dpos[lo:hi][mask].astype(np.int64)
            vals = mat[sp[mask]]  # n_edges x m
            # partition-local elementwise-max combine per dense destination
            width = int(bp.max()) + 1
            dense = np.zeros(width * m, dtype=np.int64)
            enc = (bp[:, None] * m + np.arange(m)).ravel()
            np.maximum.at(dense, enc, vals.ravel())
            dmat = dense.reshape(width, m)
            nz = np.nonzero(dmat.any(axis=1))[0]
            rows.append((int(p), nz.astype(np.int32), dmat[nz].ravel()))
        if not rows:
            return None
        return pd.DataFrame(rows, columns=["pid", "dpos", "regs"])

    def update(part, inbox: pd.DataFrame, step, carry):
        # update sees only the state columns (no structure row): derive
        # the block's vertex count from the packed register vector
        regs = np.asarray(part["regs"], dtype=np.int64).copy()
        nv = len(regs) // m
        changed = np.zeros(nv, dtype=np.int32)
        n_msgs = 0
        if len(inbox):
            pos = np.concatenate(
                [np.asarray(x) for x in inbox["dpos"].values]
            ).astype(np.int64)
            vals = np.concatenate(
                [np.asarray(x) for x in inbox["regs"].values]
            ).astype(np.int64)
            n_msgs = len(pos)
            old = regs.copy()
            enc = (pos[:, None] * m + np.arange(m)).ravel()
            np.maximum.at(regs, enc, vals)
            grew = (regs != old).reshape(nv, m).any(axis=1)
            changed[grew] = 1
        est = _estimates(regs, m, R, num)
        return {
            "regs": regs,
            "changed": changed,
            "msgs_in": int(n_msgs),
            "active": int(changed.sum()),
            "est_micro": int(np.floor(est * 1e6 + 0.5).astype(np.int64).sum()),
        }

    def carry_fn(srow):
        # driver-side capture of the round's folded N(r) total (int64
        # micro-units) — the HyperANF neighborhood function, one entry
        # per superstep
        if nf_collect is not None:
            nf_collect.append(int(srow["est_micro"] or 0))
        return {}

    return VertexProgram(
        name="hyperball",
        state_schema="regs array<long>, changed array<int>, msgs_in long, active long, est_micro long",
        msg_schema="pid int, dpos array<int>, regs array<long>",
        init=init,
        scatter=scatter,
        update=update,
        stats=[("msgs_in", F.sum), ("active", F.sum), ("est_micro", F.sum)],
        carry_fn=carry_fn,
        converged=lambda srow, step: step >= radius or int(srow["active"] or 0) == 0,
        struct_cols=("s_spos", "s_dpos", "s_bounds"),
    )


def hyperball(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    radius: int = 3,
    p: int = 4,
    num_partitions: int | None = None,
    nf_collect: list | None = None,
) -> tuple[DataFrame, list[dict]]:
    """(id, est_ball_r) — HLL-estimated |B(id, radius)| along out-edges,
    rounded 6dp; exact-register SQL twin in __spark_entry__.  Pass a list
    as nf_collect to receive the per-round neighborhood-function totals
    N(1)..N(radius) in int64 micro-units."""
    if radius < 1:
        raise ValueError("hyperball needs radius >= 1")
    m, W, R, num = hll_params(p)
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    P = (
        num_partitions
        if num_partitions is not None
        else auto_partitions(rev.count())
    )
    parts = build_parts(spark, vertices, rev, P)
    final, metrics = Pregel(spark, parts, P).run(
        hyperball_program(P, m, W, radius, R, num, nf_collect), max_steps=radius
    )
    # band-unpack: one (id, register) row per vertex-register pair, then
    # the hll_distinct estimate fold per vertex (16n rows, one shuffle)
    flat = final.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(ids) - 1),"
                f" i -> struct(ids[i] AS id, slice(regs, i * {m} + 1, {m}) AS vregs))"
            )
        ).alias("z")
    ).select(F.col("z.id").alias("id"), F.col("z.vregs").alias("vregs"))
    per_reg = flat.select(
        "id", F.explode("vregs").alias("M")
    )
    agg = per_reg.groupBy("id").agg(
        F.sum(F.when(F.col("M") == 0, 1).otherwise(0)).alias("v_empty"),
        F.sum(F.pow(F.lit(2.0), F.lit(R) - F.col("M"))).alias("s"),
    )
    e_raw = F.lit(num) / F.col("s")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (F.col("v_empty") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_empty")),
    ).otherwise(e_raw)
    return agg.select("id", F.round(est, 6).alias("est_ball_r")), metrics


def neighborhood_function(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    radius: int = 3,
    p: int = 4,
    num_partitions: int | None = None,
) -> tuple[DataFrame, list[dict]]:
    """HyperANF: (r, n_est_micro) for r = 1..radius — the total estimated
    ball mass sum_v |B(v, r)| per round, in exact int64 micro-units (the
    per-vertex estimates quantized at 1e-6 inside the kernel fold, so the
    totals are partitioning-independent and hash-gate).  One kernel run;
    the per-round totals ride the scalar stats fold, costing nothing
    beyond the vectorized estimate pass each superstep."""
    nf: list[int] = []
    _, metrics = hyperball(
        spark,
        vertices,
        edges,
        radius=radius,
        p=p,
        num_partitions=num_partitions,
        nf_collect=nf,
    )
    # the kernel votes to halt once every ball stops growing, so an early
    # convergence leaves fewer than `radius` totals; N(r) is constant from
    # there on, so pad with the converged value to keep the documented
    # r = 1..radius contract (effective_diameter indexes all of it)
    while nf and len(nf) < radius:
        nf.append(nf[-1])
    rows = [(r + 1, int(v)) for r, v in enumerate(nf)]
    df = spark.createDataFrame(rows, "r int, n_est_micro long")
    return df, metrics


def effective_diameter(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    radius: int = 3,
    p: int = 4,
    alpha: float = 0.9,
    num_partitions: int | None = None,
) -> tuple[DataFrame, list[dict]]:
    """One row (eff_diameter double): the HyperANF effective diameter —
    the smallest r where the neighborhood function reaches alpha of its
    value at `radius`, linearly interpolated between rounds (Boldi &
    Vigna's convention, anchored at N(1) for r <= 1).

    Driver arithmetic over the radius-many int64 N(r) totals — exact
    inputs, a handful of double ops, mirrored verbatim by the SQL twin.
    """
    nf, metrics = neighborhood_function(
        spark, vertices, edges, radius=radius, p=p, num_partitions=num_partitions
    )
    rows = {r["r"]: r["n_est_micro"] for r in nf.collect()}
    if not rows:  # empty vertex set: no supersteps ran, no ball to measure
        return spark.createDataFrame([(0.0,)], "eff_diameter double"), metrics
    ns = [rows[r] for r in range(1, radius + 1)]
    target = alpha * float(ns[-1])
    if float(ns[0]) >= target:
        d = 1.0
    else:
        d = float(radius)
        for i in range(1, radius):
            if float(ns[i]) >= target:
                d = float(i) + (target - float(ns[i - 1])) / (
                    float(ns[i]) - float(ns[i - 1])
                )
                break
    out = spark.createDataFrame(
        [(round(d, 6),)], "eff_diameter double"
    )
    return out, metrics
