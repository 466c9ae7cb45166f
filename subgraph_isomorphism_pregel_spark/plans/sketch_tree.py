"""Driver-side query planner: spanning-tree matching order for the matcher.

Re-implements (from scratch, in Python, over a plain dict graph) the planning
role of the reference's sketch tree (/root/reference/src/SItypes/SIQuery.h):

- root selection by 'degree' (max degree), 'random' (first id), or
  'anti-degree' (min degree) — reference Q1 (`SIQuery.h:226-278`);
- DFS spanning tree ordering children by descending degree — reference Q2
  (`SIQuery.h:338-427`);
- per-node backward constraints: non-tree query edges to already-ordered
  vertices (adjacency checks) and same-label earlier positions (injectivity)
  — reference M3's feasibility inputs (`pregel_app_subgraph.h:70-83`);
- pseudo children: degree-1 leaves counted instead of enumerated — reference
  Q2/M7 (`SIQuery.h:411-423`, `pregel_app_subgraph.h:153-209`). A leaf whose
  label is unique in the query is counted EARLY (at its parent's expansion
  step; no conflicts are possible). A leaf whose label is NOT unique is
  counted DEFERRED — the Spark form of the reference's conflict-aware branch
  assembly (`SIBranch.h:81-131,161-248`): expansion never enumerates it, and
  at the end of the plan the count is fixed up algebraically against the
  mapped same-label vertices (adjacency subtraction) and against same-label
  leaves on OTHER branches. GENERAL shapes are supported: any number of
  parents with any per-parent leaf multiplicities — the matcher computes the
  Venn-atom decomposition of the parents' label-l neighbor pools
  (inclusion–exclusion over subset intersection counts) and expands the
  exact injective-assignment count as a plan-time polynomial in the atom
  sizes. The polynomial's term count is bounded EXACTLY before deferring:
  with m parents, parent i's k_i leaves distribute over its 2^(m-1)
  containing atoms, so the expansion has
  prod_i C(k_i + 2^(m-1) - 1, 2^(m-1) - 1) terms — groups beyond
  ``DEFER_MAX_TERMS`` fall back to ordinary enumeration WITH an explicit
  ``PlanDowngradeWarning`` (never a silent cap) and are recorded on
  ``QueryPlan.downgraded``.

The plan is a tiny immutable object; the matcher broadcasts it implicitly in
its join expressions (reference broadcasts the whole query graph,
`Worker.h:349-385`).
"""

from __future__ import annotations

import math
import warnings
from dataclasses import dataclass

# Hard ceiling on the plan-time polynomial expansion of one deferred group.
# Terms are materialized as expression work (Column tree or pandas-UDF term
# loop); past this the driver-side build itself becomes the bottleneck —
# e.g. 4 parents x 2 leaves each is C(9,7)^4 ~= 1.68M terms. Groups whose
# EXACT term count exceeds this enumerate their leaves normally instead.
DEFER_MAX_TERMS = 4096


class PlanDowngradeWarning(UserWarning):
    """A deferred-counting group fell back to plain enumeration (the leaf
    group was too dense for the plan-time polynomial). The count stays
    exact; the query runs in the frontier-enumeration regime instead of
    the factorized-counting regime — surface it, never cap silently."""


def deferred_term_count(ks: list[int] | tuple[int, ...]) -> int:
    """Exact number of terms in the injective-assignment polynomial for a
    deferred group with per-parent leaf multiplicities `ks`: each parent's
    k_i leaves distribute over the 2^(m-1) Venn atoms containing it, i.e.
    C(k_i + 2^(m-1) - 1, 2^(m-1) - 1) weak compositions, multiplied across
    parents."""
    m = len(ks)
    bins = 1 << (m - 1)
    terms = 1
    for k in ks:
        terms *= math.comb(k + bins - 1, bins - 1)
    return terms


@dataclass(frozen=True)
class PlanNode:
    u: int  # query vertex id
    label: int
    pos: int  # position in the matching order (and in the embedding array)
    parent_pos: int | None  # position of the spanning-tree parent (None for root)
    backward_pos: tuple[int, ...]  # positions with a non-tree query edge to u
    samelabel_pos: tuple[int, ...]  # earlier positions with the same label
    # (label, multiplicity) pseudo children counted at this node
    pseudo: tuple[tuple[int, int], ...] = ()
    qdeg: int = 0  # degree of u in the query (LDF: candidates need >= this)


@dataclass(frozen=True)
class DeferredGroup:
    """Same-label leaves counted at plan end with conflict fix-up.

    parents: (parent position in the matching order, leaf multiplicity) —
    any number of entries; the matcher counts injective assignments exactly
    via the Venn-atom decomposition of the parents' neighbor pools.
    enum_pos: positions of ENUMERATED query vertices with this label; each
    mapped image adjacent to a parent shrinks that parent's candidate pool
    (subtracted from its exact Venn atom).
    """

    label: int
    parents: tuple[tuple[int, int], ...]
    enum_pos: tuple[int, ...]


@dataclass(frozen=True)
class QueryPlan:
    nodes: tuple[PlanNode, ...]  # matching order; nodes[0] is the root
    n_query_vertices: int  # including pseudo children
    deferred: tuple[DeferredGroup, ...] = ()
    # (label, n_parents, n_leaves) of leaf groups that EXCEEDED
    # DEFER_MAX_TERMS and re-entered ordinary enumeration; a
    # PlanDowngradeWarning was issued for each at plan time
    downgraded: tuple[tuple[int, int, int], ...] = ()

    @property
    def depth(self) -> int:
        return len(self.nodes)


def build_plan(
    query_v: dict[int, int],
    query_e: set[tuple[int, int]],
    order: str = "degree",
    pseudo: bool = True,
    cand_counts: dict[int, int] | None = None,
    force_root: int | None = None,
) -> QueryPlan:
    """query_v: id -> label; query_e: directed pairs (both directions present).

    order='candidate' picks the root with the fewest LDF candidates in the
    data graph (cand_counts: query vertex -> candidate count, supplied by the
    matcher) — the reference's `-order candidate` hook (`SIQuery.h:261`,
    driven by the aggregator diagonal), which its released pipeline never
    populates; here it is computed for real.

    force_root pins the matching-order root regardless of `order` — used by
    the branch-factorized counter, whose per-branch sub-plans must all be
    anchored at the SAME query vertex."""
    adj: dict[int, set[int]] = {u: set() for u in query_v}
    for a, b in query_e:
        adj[a].add(b)
        adj[b].add(a)
    deg = {u: len(adj[u]) for u in query_v}

    if force_root is not None:
        root = force_root
    elif order == "degree":
        root = max(query_v, key=lambda u: (deg[u], -u))
    elif order == "anti-degree":
        root = min(query_v, key=lambda u: (deg[u], u))
    elif order == "candidate":
        if not cand_counts:
            raise ValueError("order='candidate' requires cand_counts")
        root = min(query_v, key=lambda u: (cand_counts.get(u, 0), u))
    else:  # 'random' — the reference uses node 0 (`SIQuery.h:234-236`)
        root = min(query_v)

    label_counts: dict[int, int] = {}
    for u, l in query_v.items():
        label_counts[l] = label_counts.get(l, 0) + 1

    # EARLY pseudo children: degree-1 vertices with a label unique in the
    # query (no conflicts possible), never the root — counted at their
    # parent's expansion step
    is_pseudo = {
        u: (pseudo and deg[u] == 1 and label_counts[query_v[u]] == 1 and u != root)
        for u in query_v
    }

    # DEFERRED leaves: degree-1 vertices whose label is shared with other
    # query vertices — counted at plan end with conflict fix-up when the
    # shape allows (one parent with any multiplicity, or a two-parent pair)
    is_deferred = {u: False for u in query_v}
    deferred_specs: list[tuple[int, dict[int, int]]] = []  # (label, parent u -> k)
    downgraded: list[tuple[int, int, int]] = []
    if pseudo:
        leaves_by_label: dict[int, list[int]] = {}
        for u in query_v:
            if deg[u] == 1 and u != root and not is_pseudo[u]:
                leaves_by_label.setdefault(query_v[u], []).append(u)
        for lbl, leaves in sorted(leaves_by_label.items()):
            by_parent: dict[int, int] = {}
            for u in leaves:
                by_parent[next(iter(adj[u]))] = by_parent.get(next(iter(adj[u])), 0) + 1
            # the matcher's Venn-atom count handles ANY parent/multiplicity
            # shape; bound the EXACT term count of the plan-time polynomial
            # (independent parent/leaf bounds admit explosive combinations:
            # 4 parents x 2 leaves = 36^4 terms) — beyond the bound, these
            # leaves enumerate normally, loudly
            n_terms = deferred_term_count(list(by_parent.values()))
            if n_terms > DEFER_MAX_TERMS:
                downgraded.append((lbl, len(by_parent), len(leaves)))
                warnings.warn(
                    f"deferred-counting group (label={lbl}, "
                    f"{len(by_parent)} parents, {len(leaves)} leaves) needs "
                    f"{n_terms} polynomial terms > DEFER_MAX_TERMS="
                    f"{DEFER_MAX_TERMS}; falling back to enumerating these "
                    f"leaves (exact but in the frontier-expansion regime)",
                    PlanDowngradeWarning,
                    stacklevel=2,
                )
                continue
            # (a parent with deg 1 is necessarily the root of a 2-vertex
            # query — roots are always enumerated, so deferral stays valid)
            for u in leaves:
                is_deferred[u] = True
            deferred_specs.append((lbl, by_parent))

    order_list: list[int] = []
    pos_of: dict[int, int] = {}
    parent_of: dict[int, int | None] = {root: None}
    pseudo_of: dict[int, list[int]] = {u: [] for u in query_v}

    def dfs(u: int) -> None:
        pos_of[u] = len(order_list)
        order_list.append(u)
        if order == "candidate" and cand_counts:
            # most selective child first (fewest data-graph candidates)
            child_key = lambda c: (cand_counts.get(c, 0), c)  # noqa: E731
        else:
            child_key = lambda c: (-deg[c], c)  # noqa: E731
        children = sorted(
            (c for c in adj[u] if c not in pos_of and c not in parent_of),
            key=child_key,
        )
        for c in children:
            if c in pos_of:
                continue
            if is_pseudo[c]:
                pseudo_of[u].append(c)
                parent_of[c] = u
                continue
            if is_deferred[c]:
                parent_of[c] = u
                continue
            parent_of[c] = u
            dfs(c)

    dfs(root)
    # vertices unreachable from root would mean a disconnected query — the
    # reference assumes connected queries; so do we.
    n_real = len(order_list)
    n_pseudo = sum(len(v) for v in pseudo_of.values())
    n_deferred = sum(is_deferred.values())
    if n_real + n_pseudo + n_deferred != len(query_v):
        raise ValueError("query graph must be connected")

    nodes = []
    for i, u in enumerate(order_list):
        lbl = query_v[u]
        pp = pos_of[parent_of[u]] if parent_of[u] is not None else None
        back = tuple(
            sorted(
                pos_of[w]
                for w in adj[u]
                if w in pos_of
                and pos_of[w] < i
                and pos_of[w] != pp
                and not is_pseudo[w]
                and not is_deferred[w]
            )
        )
        same = tuple(p for p in range(i) if query_v[order_list[p]] == lbl)
        ps_counts: dict[int, int] = {}
        for c in pseudo_of[u]:
            ps_counts[query_v[c]] = ps_counts.get(query_v[c], 0) + 1
        nodes.append(
            PlanNode(
                u=u,
                label=lbl,
                pos=i,
                parent_pos=pp,
                backward_pos=back,
                samelabel_pos=same,
                pseudo=tuple(sorted(ps_counts.items())),
                qdeg=deg[u],
            )
        )

    deferred = tuple(
        DeferredGroup(
            label=lbl,
            parents=tuple(sorted((pos_of[p], k) for p, k in by_parent.items())),
            enum_pos=tuple(
                pos_of[w] for w in order_list if query_v[w] == lbl
            ),
        )
        for lbl, by_parent in deferred_specs
    )
    return QueryPlan(
        nodes=tuple(nodes),
        n_query_vertices=len(query_v),
        deferred=deferred,
        downgraded=tuple(downgraded),
    )
