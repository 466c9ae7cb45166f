"""Betweenness centrality (pivot-sampled Brandes) on the BSP kernel.

bc(v) = Σ over pivot sources s of δ_s(v), the source dependency from
Brandes' algorithm — with a FIXED deterministic pivot set this is the
standard sampled estimator, and because the pivots are fixed the result is
exactly reproducible (pytest Brandes oracle; the gate's DuckDB twin unrolls
the same level-synchronous recursion).

Two phases in one vertex program, staged through the carry like scc.py:

  FWD (level-synchronous multi-source BFS): at level f every vertex
      discovered at f-1 scatters its path count σ; an unvisited receiver
      sets dist = f and σ = Σ of incoming σ (exact: in an unweighted graph
      EVERY shortest-path predecessor sits at the previous level, so the
      level sum is the complete σ recurrence).
  BWD (dependency accumulation, by DESCENDING level): at backward step j,
      band b's vertices at level L_b − j send (1 + δ_w)/σ_w to neighbors;
      a receiver one level below folds δ_v += σ_v · Σ — Brandes'
      δ(v) = Σ_{w succ} σ_v/σ_w (1 + δ_w), scheduled exactly like the
      reference's staged branch wake-up (levels instead of branch numbers).

All k pivots ride ONE kernel run as band-major packed vectors (dist, σ, δ
of length k·nv, messages encode (position, band) as pos·k + band — the
same layout as landmark_distances).  σ is exact while < 2^53 (float64
holds integers exactly there); δ folds sort (enc, val) before accumulating
so the float sums are deterministic under any message arrival order.

Bounded contract: levels beyond `max_hops` are not explored (dist −1, no
contribution) — the oracle implements the identical bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pregel import Pregel, VertexProgram, auto_partitions, build_parts

UNVISITED = -1
FWD, BWD = 0, 1


def betweenness_program(pivots: list[int], P: int, max_hops: int) -> VertexProgram:
    k = len(pivots)

    def init(part):
        ids = np.asarray(part["ids"], dtype=np.int64)
        nv = len(ids)
        dist = np.full(k * nv, UNVISITED, dtype=np.int64)
        sigma = np.zeros(k * nv, dtype=np.float64)
        delta = np.zeros(k * nv, dtype=np.float64)
        for b, s in enumerate(pivots):
            at = np.nonzero(ids == s)[0]
            dist[b * nv + at] = 0
            sigma[b * nv + at] = 1.0
        out = {
            "dist": dist,
            "sigma": sigma,
            "delta": delta,
            "msgs_in": 0,
            "active": int((dist == 0).sum()),
            "phase": FWD,
            "f": 0,
            "j": -1,
            "done": 0,
        }
        for b in range(k):
            out[f"ml{b}"] = int(dist[b * len(ids): (b + 1) * len(ids)].max(initial=-1))
        return out

    def _levels(carry):
        return [int(x) for x in carry.get("L", [])]

    def scatter(part, step, carry):
        ph = int(carry.get("phase", FWD))
        dist = np.asarray(part["dist"])
        sigma = np.asarray(part["sigma"])
        nv = len(dist) // k
        s_spos, s_dpos, s_bounds = part["s_spos"], part["s_dpos"], part["s_bounds"]
        if s_dpos.size == 0:
            return None
        rows = []
        if ph == FWD:
            f = int(carry.get("f", 1))
            send_level = np.full(k, f - 1, dtype=np.int64)
            delta = None
        else:
            j = int(carry.get("j", 0))
            L = _levels(carry)
            send_level = np.array([L[b] - j for b in range(k)], dtype=np.int64)
            delta = np.asarray(part["delta"])
        for p in range(P):
            lo, hi = int(s_bounds[p]), int(s_bounds[p + 1])
            if hi <= lo:
                continue
            sp = s_spos[lo:hi].astype(np.int64)
            dp = s_dpos[lo:hi].astype(np.int64)
            enc_parts, val_parts = [], []
            for b in range(k):
                if send_level[b] < 0:
                    continue
                m = dist[b * nv + sp] == send_level[b]
                if not m.any():
                    continue
                enc_parts.append(dp[m] * k + b)
                if ph == FWD:
                    val_parts.append(sigma[b * nv + sp[m]])
                else:
                    idx = b * nv + sp[m]
                    val_parts.append((1.0 + delta[idx]) / sigma[idx])
            if not enc_parts:
                continue
            enc = np.concatenate(enc_parts)
            val = np.concatenate(val_parts)
            # partition-local partial sum per destination slot (sorted fold
            # keeps the float accumulation order deterministic)
            order = np.lexsort((val, enc))
            enc, val = enc[order], val[order]
            sums = np.zeros(int(enc.max()) + 1, dtype=np.float64)
            np.add.at(sums, enc, val)
            nz = np.nonzero(sums != 0.0)[0]
            # σ partials are positive; δ contributions are positive too, so
            # a zero cell means "no message" in both phases
            rows.append((int(p), nz.astype(np.int64), sums[nz]))
        if not rows:
            return None
        return pd.DataFrame(rows, columns=["pid", "enc", "val"])

    def update(part, inbox: pd.DataFrame, step, carry):
        ph = int(carry.get("phase", FWD))
        dist = np.asarray(part["dist"]).copy()
        sigma = np.asarray(part["sigma"]).copy()
        delta = np.asarray(part["delta"]).copy()
        nv = len(dist) // k
        n_msgs = 0
        active = 0
        if len(inbox):
            enc = np.concatenate([np.asarray(x) for x in inbox["enc"].values]).astype(np.int64)
            val = np.concatenate([np.asarray(x) for x in inbox["val"].values])
            n_msgs = len(enc)
            order = np.lexsort((val, enc))
            enc, val = enc[order], val[order]
            idx = (enc % k) * nv + (enc // k)
            sums = np.zeros(len(dist), dtype=np.float64)
            np.add.at(sums, idx, val)
            if ph == FWD:
                f = int(carry.get("f", 1))
                accept = (dist == UNVISITED) & (sums > 0.0)
                dist[accept] = f
                sigma[accept] = sums[accept]
                active = int(accept.sum())
            else:
                j = int(carry.get("j", 0))
                L = _levels(carry)
                accept = np.zeros(len(dist), dtype=bool)
                for b in range(k):
                    t = L[b] - j
                    if t >= 1:
                        band = slice(b * nv, (b + 1) * nv)
                        accept[band] = dist[band] == t - 1
                accept &= sums != 0.0
                delta[accept] = delta[accept] + sigma[accept] * sums[accept]
                active = int(accept.sum())
        L = _levels(carry)
        j = int(carry.get("j", -1))
        done = int(ph == BWD and (not L or j >= max(L) - 1 or max(L) <= 0))
        out = {
            "dist": dist,
            "sigma": sigma,
            "delta": delta,
            "msgs_in": int(n_msgs),
            "active": active,
            "phase": ph,
            "f": int(carry.get("f", 0)),
            "j": j,
            "done": done,
        }
        for b in range(k):
            out[f"ml{b}"] = int(dist[b * nv:(b + 1) * nv].max(initial=-1))
        return out

    def carry_fn(srow):
        ph = int(srow.get("phase") or 0)
        act = int(srow.get("active") or 0)
        L = [int(srow.get(f"ml{b}") or -1) for b in range(k)]
        L = [max(x, 0) for x in L]
        if ph == FWD:
            f = int(srow.get("f") or 0)
            if act > 0 and f < max_hops:
                return {"phase": FWD, "f": f + 1}
            return {"phase": BWD, "j": 0, "L": L}
        return {"phase": BWD, "j": int(srow.get("j") or 0) + 1, "L": L}

    schema = (
        "dist array<long>, sigma array<double>, delta array<double>, "
        "msgs_in long, active long, phase int, f int, j int, done int"
    )
    schema += "".join(f", ml{b} int" for b in range(k))
    return VertexProgram(
        name="betweenness",
        state_schema=schema,
        msg_schema="pid int, enc array<long>, val array<double>",
        init=init,
        scatter=scatter,
        update=update,
        stats=[("msgs_in", F.sum), ("active", F.sum), ("phase", F.max),
               ("f", F.max), ("j", F.max), ("done", F.max)]
        + [(f"ml{b}", F.max) for b in range(k)],
        carry_fn=carry_fn,
        converged=lambda srow, step: int(srow.get("done") or 0) == 1,
        struct_cols=("s_spos", "s_dpos", "s_bounds"),
    )


def betweenness(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    pivots: list[int],
    max_hops: int = 16,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    round_dp: int = 6,
) -> tuple[DataFrame, list[dict]]:
    """(id, bc): pivot-sampled betweenness over a SYMMETRIC (undirected)
    edge set — bc(v) = Σ over pivots s≠v of the Brandes dependency δ_s(v),
    rounded to round_dp decimals (float sums are order-deterministic inside
    the kernel, but a cross-engine oracle needs the rounding).  Every
    vertex carries a row (0.0 when on no shortest path)."""
    if not pivots:
        raise ValueError("betweenness: need at least one pivot")
    P = (
        num_partitions
        if num_partitions is not None
        else auto_partitions(edges.count())
    )
    parts = build_parts(spark, vertices, edges, P)
    final, metrics = Pregel(spark, parts, P).run(
        betweenness_program(list(pivots), P, max_hops),
        max_steps=3 * max_hops + 4,
        checkpoint_dir=checkpoint_dir,
        carry0={"phase": FWD, "f": 1},
    )
    k = len(pivots)
    base = final.select(
        F.size("ids").alias("__nv"),
        F.posexplode("ids").alias("__i", "id"),
        F.col("delta").alias("__d"),
    )
    total = None
    for b, s in enumerate(pivots):
        term = F.when(
            F.col("id") == F.lit(s), F.lit(0.0)
        ).otherwise(
            F.element_at(
                F.col("__d"), (F.lit(b) * F.col("__nv") + F.col("__i") + 1).cast("int")
            )
        )
        total = term if total is None else (total + term)
    return base.select("id", F.round(total, round_dp).alias("bc")), metrics
