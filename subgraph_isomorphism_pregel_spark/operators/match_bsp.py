"""Subgraph matching as a BSP vertex program over the Pregel kernel.

The production matcher (operators/match.py) expresses MATCH as DataFrame
joins and lets Catalyst plan the exchanges. THIS module runs the very same
sketch-tree plan as a superstep program on the kernel — the literal Spark
re-expression of the reference's vertex-centric pipeline
(/root/reference/src/pregel_app_subgraph.h:211-513):

    reference                                   BSP mode here
    ---------                                   -------------
    SIVertex::compute: extend partial           'extend' superstep: scatter at
    embedding along the matching order,         the owner of the mapped parent
    send to owner of the new vertex             walks the local CSR slice and
    (pregel_app_subgraph.h:331-417)             multicasts (embedding ++ w) to
                                                owner(w) = ind_pid (packed rows)
    check_feasibility at the receiver           validation at the START of the
    (label + injectivity + backward             NEXT scatter: the kernel's
    adjacency, :70-83)                          update phase has no adjacency,
                                                so candidates are stored pending
                                                and checked lazily where w's CSR
                                                slice is local
    route to the owner of the next              'route' superstep whenever the
    query vertex's parent                       next node's parent is not the
                                                vertex just matched

Counts equal the join formulation (pseudo counting and prefix pruning are
join-mode optimizations; BSP mode enumerates every query vertex, so compare
against count(..., pseudo=False)). This mode exists to exercise the kernel on
irregular, data-dependent payloads (frontiers grow and shrink per step) and
to validate the survey's design claim (SURVEY §7 milestones 4-5); the join
formulation remains the scale path — its frontier lives in shuffled
DataFrame rows, not per-partition in-memory arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.sketch_tree import QueryPlan, build_plan
from .pregel import Pregel, VertexProgram, build_parts

STATE_SCHEMA = "emb array<long>, width int, nemb long, msgs_in long, active long"
MSG_SCHEMA = "pid int, emb array<long>, n long"


def _schedule(plan: QueryPlan) -> list[tuple[str, int | None]]:
    """Superstep schedule for a plan: 'route' hops the frontier to the owner
    of the next node's parent when that parent is not the vertex matched
    last; 'extend' grows every embedding by one query vertex; 'finalize'
    validates the last extension's pending candidates."""
    sched: list[tuple[str, int | None]] = []
    for t in range(1, len(plan.nodes)):
        if plan.nodes[t].parent_pos != t - 1:
            sched.append(("route", t))
        sched.append(("extend", t))
    sched.append(("finalize", None))
    return sched


def _sorter(ids: np.ndarray) -> np.ndarray | None:
    """None when ids are already ascending (build_parts emits them sorted);
    a stable argsort otherwise — add_vertices APPENDS new vertices, so grown
    blocks are not globally sorted and a bare searchsorted would silently
    misvalidate (ADVICE r2 #1)."""
    if ids.size < 2 or bool(np.all(ids[1:] >= ids[:-1])):
        return None
    return np.argsort(ids, kind="stable")


def _find(ids: np.ndarray, vals: np.ndarray, srt: np.ndarray | None):
    """(block position, found) of each val in ids, sorted or not."""
    idx = np.searchsorted(ids, vals, sorter=srt)
    idxc = np.clip(idx, 0, len(ids) - 1)
    pos = srt[idxc] if srt is not None else idxc
    found = (idx < len(ids)) & (ids[pos] == vals)
    return pos, found


def _validate(E: np.ndarray, node, ids, labels, indptr, indices,
              srt: np.ndarray | None = None) -> np.ndarray:
    """Feasibility of pending candidates at the owner of the new vertex
    (reference check_feasibility, pregel_app_subgraph.h:70-83): label, LDF
    degree, same-label injectivity, backward non-tree adjacency. The new
    vertex w is the last column; its CSR slice is local by construction."""
    if not len(E):
        return E
    w = E[:, -1]
    pos, ok = _find(ids, w, srt)
    ok &= labels[pos] == node.label
    ok &= (indptr[pos + 1] - indptr[pos]) >= node.qdeg
    for p in node.samelabel_pos:
        ok &= E[:, p] != w
    if node.backward_pos:
        # CSR neighbor slices are sorted and appear in row-position order, so
        # row*M + neighbor is globally ascending: ONE searchsorted per
        # backward constraint replaces the per-row loop (VERDICT r2 wrong #2)
        M = int(max(indices.max(initial=0), int(E.max(initial=0)))) + 1
        if len(indices) == 0:
            ok &= False
        elif len(ids) * M < 2**62:
            row_of = np.repeat(np.arange(len(ids), dtype=np.int64), np.diff(indptr))
            keys = row_of * M + indices
            for p in node.backward_pos:
                qk = pos.astype(np.int64) * M + E[:, p]
                j = np.searchsorted(keys, qk)
                jc = np.clip(j, 0, len(keys) - 1)
                ok &= (j < len(keys)) & (keys[jc] == qk)
        else:  # astronomically-wide ids: overflow-safe per-row fallback
            for p in node.backward_pos:
                tgt = E[:, p]
                lo, hi = indptr[pos], indptr[pos + 1]
                hit = np.zeros(len(E), dtype=bool)
                for i in np.nonzero(ok)[0]:
                    j = lo[i] + np.searchsorted(indices[lo[i] : hi[i]], tgt[i])
                    hit[i] = j < hi[i] and indices[j] == tgt[i]
                ok &= hit
    return E[ok]


def _pack(by_pid: dict[int, np.ndarray]) -> pd.DataFrame:
    rows = [
        {"pid": int(pid), "emb": E.ravel(), "n": int(len(E))}
        for pid, E in by_pid.items()
        if len(E)
    ]
    if not rows:
        return pd.DataFrame({"pid": pd.Series([], dtype=object),
                             "emb": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=object)})
    return pd.DataFrame(rows)


def match_bsp_program(plan: QueryPlan, P: int) -> VertexProgram:
    sched = _schedule(plan)
    root = plan.nodes[0]
    # embedding width stored in state after each superstep, and whether that
    # state is pending validation for the node extended that step
    width_after = [1]
    pending_after = [None]  # node index whose candidates await validation
    for phase, t in sched:
        if phase == "extend":
            width_after.append(width_after[-1] + 1)
            pending_after.append(t)
        else:
            width_after.append(width_after[-1])
            pending_after.append(None)

    def init(part: dict) -> dict:
        ids, labels, indptr = part["ids"], part["labels"], part["indptr"]
        deg = np.diff(indptr)
        mask = (labels == root.label) & (deg >= root.qdeg)
        E = ids[mask].astype(np.int64)[:, None]
        return {
            "emb": E.ravel(),
            "width": 1,
            "nemb": len(E),
            "msgs_in": 0,
            "active": len(E),
        }

    def scatter(part: dict, step: int, carry: dict) -> pd.DataFrame | None:
        phase, t = sched[step - 1]
        ids = part["ids"].astype(np.int64)
        labels = part["labels"].astype(np.int64)
        indptr = part["indptr"].astype(np.int64)
        indices = part["indices"].astype(np.int64)
        ind_pid = part["ind_pid"].astype(np.int64)
        srt = _sorter(ids)
        w_in = int(part["width"]) if part["nemb"] else width_after[step - 1]
        E = np.asarray(part["emb"], dtype=np.int64).reshape(-1, max(w_in, 1))
        pend = pending_after[step - 1]
        if pend is not None:
            E = _validate(E, plan.nodes[pend], ids, labels, indptr, indices, srt)
        if not len(E):
            return None
        if phase == "finalize":
            return _pack({int(part["pid"]): E})
        node = plan.nodes[t]
        if phase == "route":
            dest = (E[:, node.parent_pos] % P).astype(np.int64)
            return _pack({pid: E[dest == pid] for pid in np.unique(dest)})
        # extend: walk the local CSR slice of each embedding's parent vertex
        parent = E[:, node.parent_pos]
        pos, _ = _find(ids, parent, srt)
        start, end = indptr[pos], indptr[pos + 1]
        deg = end - start
        total = int(deg.sum())
        if total == 0:
            return None
        rep = np.repeat(np.arange(len(E)), deg)
        flat = np.repeat(start, deg) + (
            np.arange(total) - np.repeat(np.cumsum(deg) - deg, deg)
        )
        w = indices[flat]
        wpid = ind_pid[flat]
        newE = np.concatenate([E[rep], w[:, None]], axis=1)
        return _pack({pid: newE[wpid == pid] for pid in np.unique(wpid)})

    def update(part: dict, inbox: pd.DataFrame, step: int, carry: dict) -> dict:
        w = width_after[step]
        chunks = [
            np.asarray(e, dtype=np.int64).reshape(-1, w)
            for e in (inbox["emb"] if len(inbox) else [])
        ]
        E = np.concatenate(chunks, axis=0) if chunks else np.empty((0, w), np.int64)
        return {
            "emb": E.ravel(),
            "width": w,
            "nemb": len(E),
            "msgs_in": int(sum(int(n) for n in inbox["n"])) if len(inbox) else 0,
            "active": len(E),
        }

    return VertexProgram(
        name="match_bsp",
        state_schema=STATE_SCHEMA,
        msg_schema=MSG_SCHEMA,
        init=init,
        scatter=scatter,
        update=update,
        stats=[("nemb", F.max), ("msgs_in", F.max), ("active", F.max)],
        converged=lambda srow, step: step >= len(sched),
        struct_cols=("ids", "labels", "indptr", "indices", "ind_pid"),
    )


def match_count_bsp(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    query_v: dict[int, int],
    query_e: set[tuple[int, int]],
    num_partitions: int = 8,
    order: str = "degree",
    checkpoint_dir: str | None = None,
    parts: DataFrame | None = None,
) -> int:
    """Mapping count via the BSP kernel — must equal
    SubgraphMatcher.count(..., pseudo=False) (tests assert parity).
    Pass `parts` to reuse prebuilt CSR blocks (e.g. grown via add_vertices —
    unsorted ids within a block are handled, see _sorter)."""
    plan = build_plan(query_v, query_e, order=order, pseudo=False)
    if parts is None:
        parts = build_parts(spark, vertices, edges, num_partitions)
    prog = match_bsp_program(plan, num_partitions)
    kern = Pregel(spark, parts, num_partitions)
    final, _metrics = kern.run(
        prog,
        max_steps=len(_schedule(plan)),
        checkpoint_dir=checkpoint_dir,
    )
    row = final.agg(F.sum("nemb").alias("n")).collect()[0]
    return int(row["n"] or 0)
