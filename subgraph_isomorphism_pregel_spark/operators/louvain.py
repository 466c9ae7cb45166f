"""Louvain-style community detection — synchronous modularity-gain local
moves, hash-derandomized, with optional graph contraction levels.

The sequential Louvain method (Blondel et al. 2008) sweeps vertices one at
a time, moving each to the neighboring community with the largest
modularity gain, then contracts communities into supervertices and
repeats. The sweep order makes it inherently sequential; the standard
distributed form (parallel/distributed Louvain on Pregel-like systems)
replaces the sweep with SYNCHRONOUS rounds: every vertex evaluates its
best move against the PREVIOUS round's assignment, and a symmetry-breaking
schedule prevents neighbor pairs from chasing each other's old labels
forever. This module uses the repo's derandomization house style (lex-first
matching / Jones-Plassmann coloring): a vertex is active in round r iff
its fixed md5 hash bucket equals ``(r-1) mod buckets``, so the whole
trajectory is a deterministic function of (edges, rounds, buckets, salt)
and an ANSI-SQL twin can replay it round for round.

Gain comparisons are INTEGER-exact. With 2m = Σ_v k_v (weighted degree
total), moving v into community c changes modularity by a positive
multiple of

    score(v, c) = 2m · k_{v,c}  −  k_v · (tot(c) − [v ∈ c] · k_v)

where k_{v,c} is the weight from v to c and tot(c) the summed degree of
c's members (both longs for integer edge weights). v moves to the
candidate community maximizing score — ties broken by SMALLEST community
id — iff that beats the score of staying put; Spark and DuckDB therefore
agree bit-for-bit, no float modularity ever enters the decision.

Each round is three shuffles, all with map-side partial aggregation:
per-community degree totals (groupBy comm), per-(vertex, neighbor
community) weights (groupBy src, c), and the move join-back. Nothing is
per-row Python and nothing collects to the driver; community-size skew
lands in AQE's skew-join handling, and the per-round lineage is cut to
parquet (the mis.py discipline) so a long schedule cannot accumulate a
deep plan. Self-loops created by contraction ride along as a per-vertex
``selfw`` that contributes 2·selfw to the vertex degree but never to any
k_{v,c} (a supervertex carries its internal weight into whichever
community it joins, so it cancels from every score comparison).

Parity-plus over the reference (no community detection there beyond what
label propagation approximates, /root/reference/src/pregel_app_lp.h);
Louvain is the classic link-graph community workload and reuses the same
BSP-round shape as the kernel programs.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, buckets: int, salt: str):
    """Fixed md5-derived round bucket in [0, buckets) — ascii of the first
    hex digit of md5("{id}:{salt}"), identical in DuckDB (``ascii(substr(
    md5(...), 1, 1)) % buckets``)."""
    return F.ascii(
        F.substring(F.md5(F.concat_ws(":", col.cast("string"), F.lit(salt))), 1, 1)
    ) % buckets


def louvain_local_moves(
    edges: DataFrame,
    rounds: int,
    buckets: int = 2,
    salt: str = "",
    selfw: DataFrame | None = None,
) -> DataFrame:
    """-> (id, comm) after exactly `rounds` synchronous local-move rounds.

    edges: SYMMETRIC directed rows (src, dst[, w]) — both directions of
    every undirected edge present, integer weights (w absent -> 1);
    self-rows are ignored (pass contraction self-loops via `selfw`).
    Every endpoint is a vertex; isolated vertices may be absent (they
    would never move). Initial assignment: comm = id.

    selfw: optional (id, sw) internal weight per vertex (from
    contraction); contributes 2·sw to the vertex degree only.
    """
    spark = edges.sparkSession
    workdir = tempfile.mkdtemp(prefix="louvain_")

    def cut(df: DataFrame, name: str) -> DataFrame:
        path = f"{workdir}/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    cols = edges.columns
    w = F.col("w").cast("long") if "w" in cols else F.lit(1).cast("long")
    e = edges.where(F.col("src") != F.col("dst")).select(
        "src", "dst", w.alias("w")
    )
    e = cut(e, "edges")

    deg = e.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("k"))
    if selfw is not None:
        deg = (
            deg.join(selfw.select("id", F.col("sw").cast("long").alias("sw")), "id", "full")
            .select(
                "id",
                (
                    F.coalesce(F.col("k"), F.lit(0))
                    + 2 * F.coalesce(F.col("sw"), F.lit(0))
                ).alias("k"),
            )
        )
    deg = cut(deg, "deg")
    m2 = deg.agg(F.sum("k")).collect()[0][0] or 0

    # ONE state table (id, comm, k) per round: carrying the static degree
    # beside the mutable community removes the two per-round deg joins, and
    # folding best-candidate + stay-listed into ONE per-src aggregate
    # replaces the old scored/stay_listed/stay_unlisted/best four-subtree
    # shape (each its own broadcast stage per round). Scores, tie-breaks
    # and the stay default are the identical integer expressions.
    state = cut(deg.select("id", F.col("id").alias("comm"), "k"), "c0")
    for r in range(1, rounds + 1):
        tot = state.groupBy("comm").agg(F.sum("k").alias("tot"))
        active = state.where(_bucket(F.col("id"), buckets, salt) == (r - 1) % buckets)
        # weight from each active vertex to each neighboring community
        kvc = (
            e.join(active.select(F.col("id").alias("src")), "src", "left_semi")
            .join(
                state.select(F.col("id").alias("dst"), F.col("comm").alias("c")),
                "dst",
            )
            .groupBy("src", "c")
            .agg(F.sum("w").alias("kvc"))
        )
        scored = (
            kvc.join(tot.withColumnRenamed("comm", "c"), "c")
            .join(active.select(F.col("id").alias("src"), "comm", "k"), "src")
            .select(
                "src",
                "c",
                "comm",
                "k",
                (
                    F.lit(m2) * F.col("kvc")
                    - F.col("k")
                    * (
                        F.col("tot")
                        - F.when(F.col("c") == F.col("comm"), F.col("k")).otherwise(
                            F.lit(0)
                        )
                    )
                ).alias("score"),
            )
        )
        # per-src fold: best candidate (same min(struct(-score, c))
        # smallest-community tie-break) + the stay score of the own-
        # community row when a neighbor sits inside it
        per_src = scored.groupBy("src").agg(
            F.min(
                F.struct((-F.col("score")).alias("ns"), F.col("c").alias("c"))
            ).alias("b"),
            F.max(
                F.when(F.col("c") == F.col("comm"), F.col("score"))
            ).alias("stay_l"),
            F.min("comm").alias("mcomm"),
            F.min("k").alias("mk"),
        )
        # stay default (no neighbor in the own community): k_{v,comm} = 0
        # -> stay = -k * (tot(comm) - k), with tot joined on the own comm
        movers = (
            per_src.join(
                tot.withColumnRenamed("comm", "mcomm").withColumnRenamed(
                    "tot", "mtot"
                ),
                "mcomm",
            )
            .where(
                (-F.col("b.ns"))
                > F.coalesce(
                    F.col("stay_l"),
                    -F.col("mk") * (F.col("mtot") - F.col("mk")),
                )
            )
            .select(F.col("src").alias("id"), F.col("b.c").alias("nc"))
        )
        state = cut(
            state.join(movers, "id", "left").select(
                "id", F.coalesce(F.col("nc"), F.col("comm")).alias("comm"), "k"
            ),
            f"c{r}",
        )
    return state.select("id", "comm")


def louvain(
    edges: DataFrame,
    levels: int = 2,
    rounds_per_level: int = 6,
    buckets: int = 2,
    salt: str = "",
) -> DataFrame:
    """Full Louvain: local moves, contract communities into supervertices
    (inter-community weights summed, internal weight kept as a self
    weight), repeat `levels` times, then map every original vertex to its
    final community. Deterministic for fixed parameters. -> (id, comm)."""
    cols = edges.columns
    w = F.col("w").cast("long") if "w" in cols else F.lit(1).cast("long")
    e = edges.where(F.col("src") != F.col("dst")).select("src", "dst", w.alias("w"))
    selfw: DataFrame | None = None
    mapping: DataFrame | None = None  # original id -> current supervertex
    for lv in range(levels):
        comm = louvain_local_moves(
            e, rounds_per_level, buckets=buckets, salt=f"{salt}:{lv}", selfw=selfw
        )
        mapping = (
            comm
            if mapping is None
            else mapping.join(
                comm.select(F.col("id").alias("comm"), F.col("comm").alias("nc")),
                "comm",
            ).select("id", F.col("nc").alias("comm"))
        )
        if lv == levels - 1:
            break
        # contract: relabel endpoints by community, sum parallel weights
        ec = (
            e.join(comm.withColumnRenamed("id", "src").withColumnRenamed("comm", "cs"), "src")
            .join(comm.withColumnRenamed("id", "dst").withColumnRenamed("comm", "cd"), "dst")
            .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
            .agg(F.sum("w").alias("w"))
        )
        # internal (directed both ways) weight / 2 becomes the self weight —
        # PLUS the self weights the merging supervertices already carried
        # (they are invisible to `ec`, which is built from inter-vertex
        # edges only; dropping them would shrink k for every community that
        # absorbed a supervertex with internal mass, skewing the gain
        # comparisons from the third level on)
        internal = ec.where(F.col("src") == F.col("dst")).select(
            F.col("src").alias("id"), (F.col("w") / 2).cast("long").alias("sw")
        )
        if selfw is not None:
            carried = (
                selfw.join(comm, "id")
                .groupBy(F.col("comm").alias("id"))
                .agg(F.sum("sw").alias("sw"))
            )
            internal = (
                internal.unionByName(carried)
                .groupBy("id")
                .agg(F.sum("sw").alias("sw"))
            )
        selfw = internal
        e = ec.where(F.col("src") != F.col("dst"))
    return mapping
