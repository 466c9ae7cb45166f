"""Eigenvector and Katz centrality as vertex programs over the BSP kernel.

Plain normalized power iteration on the adjacency matrix — the unipartite
single-role sibling of HITS (operators/hits.py):

    x_0(v) = 1 for every vertex
    x_t(v) = sum_{u->v} x_{t-1}(u) / ||x_{t-1}||_2
    output: x_T / ||x_T||_2

The iterate stored in state stays UN-normalized (each step's send rate
divides by the carry norm), so the per-step values are exactly the r{t}
tables of the unrolled SQL oracle and nothing overflows for any step
count.  Same scatter/CSR/zero-exchange-cogroup mechanics as PageRank; the
L2 norm is the one P-row scalar collect per superstep.  Reference analog:
the same superstep message loop as the ref's PageRank-style programs
(/root/reference/src/pregel/Worker.h); eigenvector centrality itself is
engine breadth beyond the reference's algorithm set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pregel import Pregel, VertexProgram, auto_partitions, build_parts


def eigen_program(P: int, fixed_steps: int) -> VertexProgram:
    def init(part):
        nv = len(part["ids"])
        return {
            "value": np.ones(nv),
            "ss_partial": float(nv),
            "msgs_in": 0,
            "active": nv,
        }

    def scatter(part, step, carry):
        value = np.asarray(part["value"], dtype=np.float64)
        s_spos, s_dpos, s_bounds = part["s_spos"], part["s_dpos"], part["s_bounds"]
        if s_dpos.size == 0:
            return None
        rate = value / np.sqrt(max(float(carry.get("ss", 1.0)), 1e-300))
        rows = []
        for p in range(P):
            lo, hi = int(s_bounds[p]), int(s_bounds[p + 1])
            if hi <= lo:
                continue
            dense = np.bincount(s_dpos[lo:hi], weights=rate[s_spos[lo:hi]])
            nz = np.nonzero(dense)[0]
            rows.append((int(p), nz.astype(np.int32), dense[nz]))
        return pd.DataFrame(rows, columns=["pid", "dpos", "contrib"])

    def update(part, inbox: pd.DataFrame, step, carry):
        value = np.asarray(part["value"], dtype=np.float64)
        contrib = np.zeros(len(value))
        n_msgs = 0
        if len(inbox):
            pos = np.concatenate(
                [np.asarray(x) for x in inbox["dpos"].values]
            ).astype(np.int64)
            val = np.concatenate([np.asarray(x) for x in inbox["contrib"].values])
            n_msgs = len(pos)
            np.add.at(contrib, pos, val)
        return {
            "value": contrib,
            "ss_partial": float((contrib**2).sum()),
            "msgs_in": int(n_msgs),
            "active": int(len(value)),
        }

    return VertexProgram(
        name="eigen",
        state_schema=(
            "value array<double>, ss_partial double, msgs_in long, active long"
        ),
        msg_schema="pid int, dpos array<int>, contrib array<double>",
        init=init,
        scatter=scatter,
        update=update,
        stats=[("ss_partial", F.sum), ("msgs_in", F.sum), ("active", F.sum)],
        carry_fn=lambda srow: {"ss": float(srow["ss_partial"] or 0.0)},
        converged=lambda srow, step: step >= fixed_steps,
        struct_cols=("s_spos", "s_dpos", "s_bounds"),
    )


def eigencentrality(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    steps: int = 5,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, list[dict]]:
    """(id, score) for every vertex after `steps` normalized power
    iterations along the DIRECTED edges (pass a symmetrized edge set for
    the undirected notion); score is L2-normalized, vertices nothing
    points at score 0."""
    if steps < 1:
        raise ValueError("eigencentrality needs steps >= 1")
    P = (
        num_partitions
        if num_partitions is not None
        else auto_partitions(edges.count())
    )
    n0 = vertices.count()
    parts = build_parts(spark, vertices, edges, P)
    final, metrics = Pregel(spark, parts, P).run(
        eigen_program(P, fixed_steps=steps),
        max_steps=steps,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        checkpoint_every=checkpoint_every,
        carry0={"ss": float(n0)},
    )
    scored = final.select(F.explode(F.arrays_zip("ids", "value")).alias("z")).select(
        F.col("z.ids").alias("id"), F.col("z.value").alias("value")
    )
    norm = scored.agg(
        F.sqrt(F.sum(F.col("value") * F.col("value"))).alias("n")
    ).collect()[0]["n"]
    norm = float(norm or 0.0) or 1.0
    return (
        scored.select("id", (F.col("value") / F.lit(norm)).alias("score")),
        metrics,
    )


def katz_program(P: int, fixed_steps: int, alphas: dict[int, float]) -> VertexProgram:
    """Katz centrality by EXACT integer path counting: state carries the
    int64 vector n_t(v) = # directed paths of length t ending at v, plus a
    float accumulator folded in fixed step order:

        acc_t(v) = acc_{t-1}(v) + alpha^t * n_t(v)

    Path counts are integers (bincount sums — exact in float64 up to 2^53,
    guarded), so floating point enters ONLY through the per-step fold,
    whose operand order is fixed by the superstep sequence — the SQL
    oracle replays the identical IEEE operations (alpha^t literals are
    the same Python doubles) and the scores hash-match exactly."""

    def init(part):
        nv = len(part["ids"])
        return {
            "count": np.ones(nv, dtype=np.int64),
            "acc": np.zeros(nv),
            "msgs_in": 0,
            "active": nv,
        }

    def scatter(part, step, carry):
        count = np.asarray(part["count"], dtype=np.int64)
        s_spos, s_dpos, s_bounds = part["s_spos"], part["s_dpos"], part["s_bounds"]
        if s_dpos.size == 0 or not count.any():
            return None
        weights = count.astype(np.float64)
        rows = []
        for p in range(P):
            lo, hi = int(s_bounds[p]), int(s_bounds[p + 1])
            if hi <= lo:
                continue
            dense = np.bincount(s_dpos[lo:hi], weights=weights[s_spos[lo:hi]])
            nz = np.nonzero(dense)[0]
            rows.append((int(p), nz.astype(np.int32), dense[nz].astype(np.int64)))
        return pd.DataFrame(rows, columns=["pid", "dpos", "cnt"])

    def update(part, inbox: pd.DataFrame, step, carry):
        old = np.asarray(part["count"], dtype=np.int64)
        acc = np.asarray(part["acc"], dtype=np.float64).copy()
        count = np.zeros(len(old), dtype=np.int64)
        n_msgs = 0
        if len(inbox):
            pos = np.concatenate(
                [np.asarray(x) for x in inbox["dpos"].values]
            ).astype(np.int64)
            val = np.concatenate(
                [np.asarray(x) for x in inbox["cnt"].values]
            ).astype(np.int64)
            n_msgs = len(pos)
            np.add.at(count, pos, val)
        if count.size and int(count.max()) > 2**52:
            raise ValueError(
                "katz: path counts exceeded 2^52 — integer-exact counting "
                "breaks past float64's integer range; lower `steps`"
            )
        acc = acc + alphas[step] * count.astype(np.float64)
        return {
            "count": count,
            "acc": acc,
            "msgs_in": int(n_msgs),
            "active": int(len(old)),
        }

    return VertexProgram(
        name="katz",
        state_schema="count array<long>, acc array<double>, msgs_in long, active long",
        msg_schema="pid int, dpos array<int>, cnt array<long>",
        init=init,
        scatter=scatter,
        update=update,
        stats=[("msgs_in", F.sum), ("active", F.sum)],
        converged=lambda srow, step: step >= fixed_steps,
        struct_cols=("s_spos", "s_dpos", "s_bounds"),
    )


def katz_centrality(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    alpha: float = 0.05,
    steps: int = 4,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, list[dict]]:
    """(id, score) — truncated Katz centrality over the DIRECTED edges:

        score(v) = sum_{t=1..steps} alpha^t * (# paths of length t ending at v)

    (the classic attenuated-path-count centrality, cut at `steps` rather
    than iterated to the geometric-series limit, so no spectral-radius
    condition on alpha is needed). Engine-exact by construction — see
    katz_program. Walks are COUNTED, not enumerated: the per-step work is
    one integer scatter-add over the CSR layout, identical mechanics to
    the PageRank kernel (zero-exchange cogroups, P-row packed inboxes)."""
    if steps < 1:
        raise ValueError("katz_centrality needs steps >= 1")
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    alphas = {t: alpha**t for t in range(1, steps + 1)}
    P = (
        num_partitions
        if num_partitions is not None
        else auto_partitions(edges.count())
    )
    parts = build_parts(spark, vertices, edges, P)
    final, metrics = Pregel(spark, parts, P).run(
        katz_program(P, fixed_steps=steps, alphas=alphas),
        max_steps=steps,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        checkpoint_every=checkpoint_every,
    )
    scored = final.select(F.explode(F.arrays_zip("ids", "acc")).alias("z")).select(
        F.col("z.ids").alias("id"), F.col("z.acc").alias("score")
    )
    return scored, metrics
