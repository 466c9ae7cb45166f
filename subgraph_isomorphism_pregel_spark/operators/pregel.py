"""The BSP superstep kernel: an iterative DataFrame loop over CSR-packed
per-partition adjacency.

Rebuilds (from scratch, Spark-first) the execution skeleton of the reference's
Pregel+ worker loop (/root/reference/src/basic/Worker.h:410-569):

    reference                                   this kernel
    ---------                                   -----------
    MPI process == worker                       partition id `pid` = pmod(id, P)
                                                (reference: id % _num_workers,
                                                 /root/reference/src/pregel_app_subgraph.h:697)
    vertex objects with adjacency lists         one CSR block per pid:
    (SIValue.nbs_vector, SIValue.h:31-42)       ids/indptr/indices numpy arrays
                                                in an Arrow-backed DataFrame row
    Vertex::compute + send_messages             `scatter` (mapInPandas, vectorized
                                                numpy over the CSR block)
    MessageBuffer::sync_messages (MPI           ONE Spark shuffle (the message
    all-to-all, MessageBuffer.h:66-105)         exchange) — scatter pre-aggregates
                                                per source partition in numpy,
                                                subsuming the reference's disabled
                                                Combiner (src/utils/Combiner.h)
    distribute_messages + next compute          `update` (cogrouped applyInPandas
                                                of parts × inbox, keyed by pid)
    MPI_Barrier per superstep                   stage boundary of the shuffle
    aggregator agg_sync (Worker.h:158-215)      driver-side .agg().collect() on
                                                scalar per-pid stat columns

Skew handling (absent in the reference; required by the north rule): messages
are partially aggregated *inside the scatter UDF per source partition* before
they hit the shuffle, so a hot destination vertex receives at most P partial
rows instead of deg(v) rows — the same effect as key salting with P salts —
and AQE skew handling is enabled on top for the frontier shuffles.

Storage layout (the shuffle story): the graph is SPLIT into a static
structure table (CSR blocks) written once and a dynamic state table
checkpointed every superstep, both parquet tables bucketed by pid. A cogroup
of two pid-bucketed tables plans with zero exchanges, so per superstep only
the messages cross the wire — the adjacency never moves after the initial
build, exactly like the reference where vertices own their adjacency for the
whole run. On a multi-executor cluster the bucketed layout is what makes the
cogroups co-located instead of all-to-all.

Checkpoint/resume: on a configurable cadence (`checkpoint_every`, default
every superstep) the state table is written (bucketed) together with a
per-partition lineage record and the per-superstep metrics (messages, active
vertices, skew ratio); the table read-back is also the lineage cut that keeps
the iterative plan flat. `run(..., resume=True)` restarts mid-iteration from
the newest complete checkpoint.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

BASE_SCHEMA = (
    "pid int, ids array<long>, labels array<int>, indptr array<long>, "
    "indices array<long>, ind_pid array<int>, ind_pos array<int>, "
    "s_spos array<int>, s_dpos array<int>, s_bounds array<long>"
)
STRUCT_ONLY = (
    "labels", "indptr", "indices", "ind_pid", "ind_pos",
    "s_spos", "s_dpos", "s_bounds",
)


def _np(col) -> np.ndarray:
    """Column cell (list or np array) -> contiguous numpy array."""
    return np.asarray(col)


def auto_partitions(
    n_edges: int,
    cores: int | None = None,
    edges_per_partition: int = 150_000,
    max_parts: int = 32768,
) -> int:
    """Size CSR blocks by DATA VOLUME, not core count.

    Each superstep schedules O(P) tasks and two Python-UDF invocations per
    block, so an oversized P turns small graphs into pure scheduling
    overhead (measured at sf0.1, 1.18M edges on the same 32 cores:
    P=32 -> 0.82 supersteps/s, P=8 -> 1.04); an undersized P starves cores
    and overflows executor memory at scale. The local default targets
    ~150k edges (~2-3 MB CSR) per block with a floor of min(cores, 8).

    At cluster scale override edges_per_partition to target EXECUTOR MEMORY
    instead: 8-32M edges (~0.1-0.5 GB CSR) per block, giving P >> total
    cores (the classic 2-3-tasks-per-core rule) — e.g. a 10^12-edge graph
    at 16M edges/block is P ≈ 62500 over ~1000 executors."""
    import math as _math

    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    want = max(1, _math.ceil(n_edges / edges_per_partition))
    return int(min(max(want, min(int(cores), 8)), max_parts))


def build_parts(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    num_partitions: int | None = None,
    edge_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Pack the graph into one CSR block per partition.

    vertices(id, label) + edges(src, dst) -> parts(pid, ids, labels, indptr,
    indices): ids sorted ascending; indices sorted within each source's slice
    (enables binary-search membership tests, the Spark analog of the
    reference's nbs_set, /root/reference/src/SItypes/SIValue.h:38-41).

    Each edge additionally carries the destination's (partition, position)
    pair — a one-off distributed renumbering (row_number within the sorted
    pid block) so supersteps can address destination state by dense position:
    the scatter pre-aggregation becomes a bincount and the update fold a
    direct positional add, with no per-step id sorting or binary search.

    One shuffle each side plus one join, all one-off at build time.

    num_partitions=None sizes blocks by edge volume (auto_partitions); the
    algorithm entry points resolve this BEFORE calling so the kernel and the
    program agree on P.

    edge_cols: optional DATA-CARRIED per-edge attributes — {name: "int"|"long"}
    columns present on `edges` — stored in the static structure table in
    SCATTER ORDER as ``s_<name>`` arrays (aligned with s_spos/s_dpos, so a
    scatter program reads the attribute of slot k directly). This is the
    structural home for edge data that is not a formula of the endpoints
    (direction flags on a union graph, measured weights): the wsssp-style
    init replay only works for derivable weights. Attribute arrays live in
    the struct table, written once — they never ride the per-step state
    checkpoint.
    """
    P = num_partitions if num_partitions is not None else auto_partitions(edges.count())
    edge_cols = dict(edge_cols or {})
    _npt = {"int": np.int32, "long": np.int64}
    for c, t in edge_cols.items():
        if t not in _npt:
            raise ValueError(f"build_parts: edge_cols[{c!r}] must be 'int' or 'long', got {t!r}")
    from pyspark.sql.window import Window

    v = vertices.withColumn("pid", F.pmod(F.col("id"), F.lit(P)).cast("int"))
    posmap = v.select(
        F.col("id").alias("dst"),
        F.col("pid").alias("dpid"),
        (
            F.row_number().over(Window.partitionBy("pid").orderBy("id")) - 1
        ).alias("dpos"),
    )
    # left join so a dst absent from the vertex table surfaces as a null
    # dpid inside make_csr (raise) instead of silently vanishing in the join
    e = edges.withColumn("pid", F.pmod(F.col("src"), F.lit(P)).cast("int")).join(
        posmap, "dst", "left"
    )

    def make_csr(key, v_pdf: pd.DataFrame, e_pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        order = np.argsort(v_pdf["id"].values, kind="stable")
        ids = v_pdf["id"].values[order].astype(np.int64)
        labels = v_pdf["label"].values[order].astype(np.int32)
        if len(e_pdf):
            if e_pdf["dpid"].isna().any():
                bad = e_pdf.loc[e_pdf["dpid"].isna(), "dst"].unique()[:5]
                raise ValueError(
                    f"build_parts: edges in partition {pid} have destination "
                    f"ids absent from the vertex table (e.g. {bad.tolist()})"
                )
            src = e_pdf["src"].values.astype(np.int64)
            dst = e_pdf["dst"].values.astype(np.int64)
            dpid = e_pdf["dpid"].values.astype(np.int32)
            # dense position within the destination block: int32 halves the
            # widest per-superstep Arrow column (positions per block < 2^31 —
            # at 10^12 vertices that still holds for any P >= 512)
            dpos = e_pdf["dpos"].values.astype(np.int32)
            eorder = np.lexsort((dst, src))
            src, dst = src[eorder], dst[eorder]
            dpid, dpos = dpid[eorder], dpos[eorder]
            counts = np.zeros(len(ids) + 1, dtype=np.int64)
            pos = np.searchsorted(ids, src)
            # an edge whose src is absent from the vertex table must fail
            # loudly, not be silently credited to a neighboring slice
            covered = (pos < len(ids)) & (ids[np.clip(pos, 0, len(ids) - 1)] == src)
            if not covered.all():
                missing = np.unique(src[~covered])[:5]
                raise ValueError(
                    f"build_parts: {int((~covered).sum())} edges in partition "
                    f"{pid} have source ids absent from the vertex table "
                    f"(e.g. {missing.tolist()}); every edge endpoint must "
                    "appear in vertices(id, label)"
                )
            np.add.at(counts, pos + 1, 1)
            indptr = np.cumsum(counts)
            indices = dst
            # SCATTER LAYOUT: the same edges pre-sorted by destination
            # partition, with each edge's source POSITION. Scatter programs
            # walk per-destination slices directly (s_bounds), so no
            # per-superstep argsort of the static dpid array ever happens —
            # it would be an O(E log E) sort of static data EVERY step.
            order2 = np.argsort(dpid, kind="stable")
            s_spos = pos[order2].astype(np.int32)
            s_dpos = dpos[order2]
            s_bounds = np.searchsorted(dpid[order2], np.arange(P + 1)).astype(np.int64)
            extra = {
                f"s_{c}": e_pdf[c].values.astype(_npt[t])[eorder][order2]
                for c, t in edge_cols.items()
            }
        else:
            indptr = np.zeros(len(ids) + 1, dtype=np.int64)
            indices = np.empty(0, dtype=np.int64)
            dpid = np.empty(0, dtype=np.int32)
            dpos = np.empty(0, dtype=np.int32)
            s_spos = np.empty(0, dtype=np.int32)
            s_dpos = np.empty(0, dtype=np.int32)
            s_bounds = np.zeros(P + 1, dtype=np.int64)
            extra = {
                f"s_{c}": np.empty(0, dtype=_npt[t]) for c, t in edge_cols.items()
            }
        return pd.DataFrame(
            {
                "pid": [pid],
                "ids": [ids],
                "labels": [labels],
                "indptr": [indptr],
                "indices": [indices],
                "ind_pid": [dpid],
                "ind_pos": [dpos],
                "s_spos": [s_spos],
                "s_dpos": [s_dpos],
                "s_bounds": [s_bounds],
                **{k: [v_] for k, v_ in extra.items()},
            }
        )

    schema = BASE_SCHEMA + "".join(
        f", s_{c} array<{t}>" for c, t in edge_cols.items()
    )
    parts = (
        v.groupBy("pid")
        .cogroup(e.groupBy("pid"))
        .applyInPandas(make_csr, schema)
    )
    return parts


def add_vertices(
    spark: SparkSession,
    parts: DataFrame,
    new_vertices: DataFrame,
    new_edges: DataFrame | None,
    num_partitions: int,
) -> DataFrame:
    """Runtime graph mutation (reference F9, /root/reference/src/basic/
    Vertex.h:108-111 — add_vertex during computation; the reference uses it
    to inject dummy vertices mid-run).

    Spark-first form: an INCREMENTAL rebuild between superstep runs.
    Append-only addressing — new vertices take positions AFTER the existing
    ones in their block, so every existing (pid, pos) address, and therefore
    every ind_pid/ind_pos cell in UNTOUCHED blocks, stays valid; only blocks
    that receive new vertices or new out-edges rebuild their CSR, everything
    else passes through byte-identical. (After an append, ids within a block
    are no longer globally sorted — the kernel's algorithm programs address
    state positionally; match_bsp, which DOES look vertices up by id, detects
    unsorted blocks and binary-searches through a per-block argsort.)

    new_vertices: (id, label) — ids must be new; new_edges: (src, dst) where
    both endpoints exist in the grown vertex set (raises otherwise, same
    contract as build_parts). Per-step STATE built on the old graph is not
    migrated — rerun the program's init, or resume with a program whose init
    handles grown blocks.

    Not yet supported for graphs built with build_parts(edge_cols=...): the
    incremental CSR rebuild does not re-derive the s_<attr> scatter-order
    attribute arrays (raises rather than silently dropping them).
    """
    base_cols = {f.strip().split()[0] for f in BASE_SCHEMA.split(",")}
    extra_attr = [c for c in parts.columns if c not in base_cols]
    if extra_attr:
        raise NotImplementedError(
            "add_vertices: incremental rebuild does not support edge "
            f"attribute columns yet (found {extra_attr}); rebuild with "
            "build_parts instead"
        )
    P = num_partitions
    from pyspark.sql.window import Window

    old_pos = parts.select(
        "pid", F.posexplode("ids").alias("pos", "vid")
    ).select(F.col("vid").alias("id"), "pid", F.col("pos").cast("long").alias("pos"))
    nv_base = parts.select("pid", F.size("ids").cast("long").alias("nv"))
    nv = new_vertices.withColumn("pid", F.pmod(F.col("id"), F.lit(P)).cast("int"))
    new_pos = (
        nv.withColumn(
            "rk", F.row_number().over(Window.partitionBy("pid").orderBy("id")) - 1
        )
        .join(nv_base, "pid", "left")
        .select("id", "pid", (F.col("rk") + F.coalesce(F.col("nv"), F.lit(0))).alias("pos"))
    )
    posmap = old_pos.unionByName(new_pos)

    v_add = nv.select(
        "pid", F.lit("v").alias("kind"), "id", F.col("label").cast("int").alias("label"),
        F.lit(None).cast("long").alias("spos"), F.lit(None).cast("long").alias("dst"),
        F.lit(None).cast("int").alias("dpid"), F.lit(None).cast("long").alias("dpos"),
    )
    adds = v_add
    if new_edges is not None:
        smap = posmap.select(
            F.col("id").alias("src"), F.col("pid").alias("e_pid"), F.col("pos").alias("spos")
        )
        dmap = posmap.select(
            F.col("id").alias("dst"), F.col("pid").alias("dpid"), F.col("pos").alias("dpos")
        )
        e_add = (
            new_edges.join(smap, "src", "left")
            .join(dmap, "dst", "left")
            .select(
                F.col("e_pid").alias("pid"), F.lit("e").alias("kind"),
                F.col("src").alias("id"), F.lit(None).cast("int").alias("label"),
                "spos", "dst", "dpid", "dpos",
            )
        )
        adds = adds.unionByName(e_add)

    def rebuild(key, parts_pdf: pd.DataFrame, add_pdf: pd.DataFrame) -> pd.DataFrame:
        if pd.isna(key[0]):
            # edges whose src resolved to no partition: absent source ids
            bad = add_pdf["id"].dropna().unique()[:5]
            raise ValueError(
                "add_vertices: new edges reference source ids absent from "
                f"the grown vertex set (e.g. {list(bad)})"
            )
        pid = int(key[0])
        if len(add_pdf) == 0:
            return parts_pdf  # untouched block passes through
        if len(parts_pdf):
            row = _part_to_dict(parts_pdf.iloc[0])
            ids, labels = row["ids"], row["labels"]
            indptr, indices = row["indptr"], row["indices"]
            ind_pid, ind_pos = row["ind_pid"], row["ind_pos"]
        else:
            ids = np.empty(0, dtype=np.int64); labels = np.empty(0, dtype=np.int32)
            indptr = np.zeros(1, dtype=np.int64); indices = np.empty(0, dtype=np.int64)
            ind_pid = np.empty(0, dtype=np.int32); ind_pos = np.empty(0, dtype=np.int32)
        vs = add_pdf[add_pdf["kind"] == "v"].sort_values("id")
        es = add_pdf[add_pdf["kind"] == "e"]
        if es["spos"].isna().any() or es["dpos"].isna().any():
            raise ValueError(
                f"add_vertices: new edges in partition {pid} reference ids "
                "absent from the grown vertex set"
            )
        if len(vs) and np.isin(vs["id"].values, ids).any():
            raise ValueError(f"add_vertices: duplicate vertex ids in partition {pid}")
        new_ids = np.concatenate([ids, vs["id"].values.astype(np.int64)])
        new_labels = np.concatenate([labels, vs["label"].values.astype(np.int32)])
        # old edges as (src position, dst, dpid, dpos) tuples + new ones
        old_spos = np.repeat(np.arange(len(ids), dtype=np.int64), np.diff(indptr))
        all_spos = np.concatenate([old_spos, es["spos"].values.astype(np.int64)])
        all_dst = np.concatenate([indices, es["dst"].values.astype(np.int64)])
        all_dpid = np.concatenate([ind_pid, es["dpid"].values.astype(np.int32)])
        all_dpos = np.concatenate([ind_pos, es["dpos"].values.astype(np.int32)])
        order = np.lexsort((all_dst, all_spos))
        counts = np.zeros(len(new_ids) + 1, dtype=np.int64)
        np.add.at(counts, all_spos + 1, 1)
        order2 = np.argsort(all_dpid, kind="stable")
        return pd.DataFrame(
            {
                "pid": [pid],
                "ids": [new_ids],
                "labels": [new_labels],
                "indptr": [np.cumsum(counts)],
                "indices": [all_dst[order]],
                "ind_pid": [all_dpid[order]],
                "ind_pos": [all_dpos[order]],
                "s_spos": [all_spos[order2].astype(np.int32)],
                "s_dpos": [all_dpos[order2].astype(np.int32)],
                "s_bounds": [
                    np.searchsorted(all_dpid[order2], np.arange(P + 1)).astype(np.int64)
                ],
            }
        )

    return (
        parts.groupBy("pid")
        .cogroup(adds.groupBy("pid"))
        .applyInPandas(rebuild, BASE_SCHEMA)
    )


@dataclass
class VertexProgram:
    """One BSP algorithm = init + scatter + combine + update.

    state_schema: extra per-part columns (arrays aligned with `ids`, plus
        scalar per-partition stat columns) appended to BASE_SCHEMA.
    msg_schema: schema of scatter's output; MUST start with `pid int` (the
        destination's partition) so combine/update can group by it.
    """

    name: str
    state_schema: str
    msg_schema: str
    init: Callable[[dict], dict] = None  # part dict -> state cols dict
    scatter: Callable[[dict, int, dict], pd.DataFrame] = None  # (part, step, carry) -> msgs
    combine: Callable[[DataFrame], DataFrame] = None  # msgs df -> inbox df (keeps pid)
    update: Callable[[dict, pd.DataFrame, int, dict], dict] = None  # -> new state cols
    stats: list = field(default_factory=list)  # list[(colname, F agg fn)]
    carry_fn: Callable[[dict], dict] = None  # stats row dict -> carry for next step
    converged: Callable[[dict, int], bool] = None  # (stats row, step) -> bool
    # structure columns scatter actually reads (None = all). Declaring them
    # prunes the per-superstep Arrow transfer into the scatter UDF — e.g.
    # PageRank/CC/LP address destinations by dense (ind_pid, ind_pos) and
    # never touch `indices` (the destination VERTEX IDS — by far the widest
    # array), so dropping it cuts the dominant per-step JVM->Python volume.
    # init() always sees the full structure row.
    struct_cols: tuple | None = None


METRICS_SCHEMA = (
    "superstep int, partition int, messages_received long, active_vertices long, "
    "skew_ratio double, checkpoint_path string, wall_sec double"
)


def metrics_df(spark: SparkSession, metrics: list[dict]) -> DataFrame:
    """The per-(superstep, partition) metrics table as a DataFrame (the
    north-star metrics contract; reference analog: the AggMat time/count
    cells, /root/reference/src/SItypes/SIAggregator.h:43-46)."""
    rows = [
        (
            int(m["superstep"]),
            int(m["partition"]),
            int(m["messages_received"]),
            int(m["active_vertices"]),
            float(m["skew_ratio"]),
            str(m["checkpoint_path"]),
            float(m.get("wall_sec", 0.0)),
        )
        for m in metrics
    ]
    return spark.createDataFrame(rows, METRICS_SCHEMA)


def _part_to_dict(row: pd.Series) -> dict:
    return {k: (_np(v) if isinstance(v, (list, np.ndarray)) else v) for k, v in row.items()}


def pid_keyed(df: DataFrame, P: int, *cols) -> DataFrame:
    """pid-tag a per-vertex side table for a cogroup against the struct
    blocks (same pmod discipline as build_parts)."""
    return df.select(
        F.pmod(F.col("id"), F.lit(P)).cast("int").alias("pid"), "id", *cols
    )


def match_prior_values(
    ids: np.ndarray, id_np: np.ndarray, val_np: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(values, mask): prior values positioned onto a block's id array by
    VALUE — grown blocks may hold unsorted ids after the append-only CSR
    rebuild, so positional/searchsorted matching is wrong there.
    get_indexer keeps the id dtype int64 end to end — a float64 roundtrip
    would corrupt ids past 2^53, and corpus file ids are full-range
    xxhash64."""
    idx = pd.Index(id_np)
    pos = idx.get_indexer(ids)
    mask = pos >= 0
    return val_np[pos[mask]], mask


def warm_state_cogroup(
    parts: DataFrame,
    side: DataFrame,
    struct_cols: tuple[str, ...],
    schema: str,
    build: Callable[[dict, pd.DataFrame], dict],
) -> DataFrame:
    """Shared scaffold of the warm-start state builders (incremental
    PageRank / CC / SSSP): cogroup the CSR struct blocks with a pid-keyed
    side table and emit ONE packed state row per block. `build(part,
    side_pdf)` returns the per-algorithm state fields (everything except
    pid); the empty-struct guard (side rows whose pid holds no block) and
    the applyInPandas wiring live here exactly once."""
    empty_cols = [f.strip().split()[0] for f in schema.split(",")]

    def mk(struct_pdf: pd.DataFrame, side_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(struct_pdf) == 0:
            return pd.DataFrame(columns=empty_cols)
        part = _part_to_dict(struct_pdf.iloc[0])
        row = build(part, side_pdf)
        row["pid"] = int(part["pid"])
        return pd.DataFrame([row])

    return (
        parts.select(*struct_cols)
        .groupBy("pid")
        .cogroup(side.groupBy("pid"))
        .applyInPandas(mk, schema)
    )


class Pregel:
    """Driver for the superstep loop. One instance per (graph, partitioning)."""

    def __init__(self, spark: SparkSession, parts: DataFrame, num_partitions: int):
        self.spark = spark
        self.parts = parts
        self.P = num_partitions

    def _save_bucketed(self, df: DataFrame, name: str, path: str) -> DataFrame:
        """Write df as an external parquet table bucketed by pid and return
        the table scan. Bucketing is the heart of the kernel's shuffle story:
        a cogroup of two pid-bucketed tables plans with ZERO exchanges
        (verified on the physical plan), so the static adjacency never moves
        after the initial build — only messages cross the wire, exactly like
        the reference where vertices own their adjacency for the whole run."""
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.format("parquet")
            .bucketBy(self.P, "pid")
            .option("path", path)
            .mode("overwrite")
            .saveAsTable(name)
        )
        return self.spark.table(name)

    def run(
        self,
        program: VertexProgram,
        max_steps: int,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        carry0: dict | None = None,
        keep_checkpoints: int = 2,
        checkpoint_every: int = 1,
        state0: DataFrame | None = None,
    ) -> tuple[DataFrame, list[dict]]:
        """Run the program to convergence or max_steps.

        Returns (final struct⋈state DataFrame, metrics rows).

        state0: optional WARM-START state table (schema `pid int, ` +
        program.state_schema, one row per partition) used INSTEAD of
        program.init — the incremental-recompute hook: seed the run from a
        previous run's final state after the graph grew (add_vertices), so
        convergence restarts from the old fixed point instead of from
        scratch. Ignored when `resume` finds a durable checkpoint (the
        checkpoint is the newer truth). Bucketed by pid on write like any
        other state, so the superstep cogroups stay exchange-free.

        Layout: the graph is split into a STATIC structure table
        (pid, ids, labels, indptr, indices, ...) written once, and a DYNAMIC
        state table (pid, <program state>) checkpointed EVERY superstep — both
        parquet tables bucketed by pid. The state carries ONLY what changes:
        vertex ids are static, so they live in the structure table alone and
        programs address vertices by dense position within the block (the
        build-time renumbering) — the per-step checkpoint write shrinks to
        the mutable arrays. One superstep:

          scatter: cogroup(struct, state)  -> messages      [0 exchanges]
          update:  cogroup(state, inbox)   -> new state     [1 exchange: inbox]
          checkpoint: bucketed write of new state (the lineage cut AND the
          durable per-partition resume point) + stats fold on the driver.

        (A localCheckpoint-based lineage cut degrades the Spark 4.1 driver
        exponentially after ~20 steps — measured; the table round-trip is
        flat.) If checkpoint_dir is None a session temp dir is used.

        checkpoint_every=k writes the DURABLE bucketed state table only on
        supersteps divisible by k (plus the final step); intermediate steps
        keep state as a persisted pid-hash-partitioned DataFrame instead (the
        cogroups stay exchange-free — HashPartitioning(pid, P) on both
        sides). This is a DURABILITY-CADENCE knob, not a local speedup: the
        logical plan doubles per non-durable step (state feeds both
        cogroups), and on this host's page-cache-fast local disk k>1 measured
        SLOWER than the per-step parquet round-trip — reach for it only when
        the checkpoint filesystem is slow relative to recompute (e.g. object
        storage), and keep k small (≤4). Resume restarts from the newest
        durable step and replays at most k-1 steps.
        """
        state_schema = "pid int, " + program.state_schema
        if checkpoint_dir is None:
            checkpoint_dir = tempfile.mkdtemp(prefix=f"sip_ckpt_{program.name}_")
        os.makedirs(checkpoint_dir, exist_ok=True)
        token = uuid.uuid4().hex[:8]
        tname = f"sip_{program.name}_{token}"
        start_step = 0
        metrics: list[dict] = []
        carry = dict(carry0 or {})

        # static structure table (adjacency CSR blocks) — written once,
        # cached (InMemoryRelation preserves the bucketed partitioning, so
        # cogroups stay exchange-free while reads skip the disk re-scan)
        struct_tbl = self._save_bucketed(
            self.parts, f"{tname}_struct", os.path.join(checkpoint_dir, f"struct_{token}")
        ).persist()

        # vertex counts per partition are static — collected ONCE, not per step
        nv_by_pid = {
            int(r["pid"]): int(r["nv"])
            for r in struct_tbl.select("pid", F.size("ids").alias("nv")).collect()
        }

        loaded = self._load_checkpoint(checkpoint_dir) if resume else None
        init_fn = program.init
        if loaded is not None:
            state_df, start_step, carry, metrics = loaded
            # the loaded path is about to be read while we re-bucket it, so
            # the resumed state table gets its own location
            resume_path = os.path.join(checkpoint_dir, f"resume_{token}")
        else:
            resume_path = os.path.join(checkpoint_dir, f"step_{start_step:05d}")

            def do_init(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in pdf_iter:
                    # drop every STRUCT column from the state output (ids,
                    # CSR arrays, scatter layout, and any s_<edge_col>
                    # attribute arrays) — only pid crosses over
                    drop = set(pdf.columns) - {"pid"}
                    out = []
                    for _, row in pdf.iterrows():
                        part = _part_to_dict(row)
                        part.update(init_fn(part))
                        out.append(
                            {k: v for k, v in part.items() if k not in drop}
                        )
                    yield pd.DataFrame(out)

            state_df = (
                state0 if state0 is not None
                else struct_tbl.mapInPandas(do_init, state_schema)
            )
        state_tbl = self._save_bucketed(
            state_df, f"{tname}_s{start_step:05d}", resume_path
        ).persist()

        scatter_fn, update_fn = program.scatter, program.update
        # project the structure side of the scatter cogroup down to the
        # columns the program declares (a Project over the bucketed scan
        # keeps pid clustering, so the cogroup stays exchange-free)
        if program.struct_cols is not None:
            scatter_struct = struct_tbl.select("pid", *program.struct_cols)
        else:
            scatter_struct = struct_tbl
        step = start_step
        for step in range(start_step + 1, max_steps + 1):
            t0 = time.time()
            carry_b = dict(carry)

            def make_scatter(_step, _carry):
                def do_scatter(struct_pdf, state_pdf):
                    if len(struct_pdf) == 0 or len(state_pdf) == 0:
                        return None
                    part = _part_to_dict(struct_pdf.iloc[0])
                    part.update(_part_to_dict(state_pdf.iloc[0]))
                    return scatter_fn(part, _step, _carry)

                def wrapper(l, r):
                    msgs = do_scatter(l, r)
                    if msgs is None or not len(msgs):
                        # object dtype: empty float64 columns break the Arrow
                        # cast to list<> message types
                        return pd.DataFrame(
                            {f.split()[0]: pd.Series([], dtype=object) for f in _schema_fields}
                        )
                    return msgs

                _schema_fields = [s.strip() for s in program.msg_schema.split(",")]
                return wrapper

            msgs_df = (
                scatter_struct.groupBy("pid")
                .cogroup(state_tbl.groupBy("pid"))
                .applyInPandas(make_scatter(step, carry_b), program.msg_schema)
            )
            # combine=None: scatter already pre-aggregated per source partition,
            # so a Spark-side groupBy would shuffle the exact same volume and
            # cost one extra exchange — the update UDF folds partials in numpy
            # instead (map-side combining semantics, reducer-side fold).
            inbox_df = program.combine(msgs_df) if program.combine else msgs_df

            def make_update(_step, _carry):
                def do_update(state_pdf, inbox_pdf):
                    if len(state_pdf) == 0:
                        # messages to a pid with no state row are dropped, like the
                        # reference (/root/reference/src/basic/MessageBuffer.h:107-136)
                        return state_pdf.head(0)
                    part = _part_to_dict(state_pdf.iloc[0])
                    part.update(update_fn(part, inbox_pdf, _step, _carry))
                    return pd.DataFrame([part])

                return do_update

            new_state = (
                state_tbl.groupBy("pid")
                .cogroup(inbox_df.groupBy("pid"))
                .applyInPandas(make_update(step, carry_b), state_schema)
            )

            # bucketed checkpoint table on the durable cadence: the resume
            # point, the lineage cut, and the next step's exchange-free input.
            # Off-cadence steps persist a pid-hash-partitioned DataFrame
            # instead (same zero-exchange cogroups, no parquet round-trip).
            #
            # Stats ride the SAME action via an Observation (CollectMetrics
            # over the write): one Spark job per superstep instead of two —
            # the old follow-up .select(stats).collect() cost a second job
            # (~15% of a superstep at sf0.1) re-reading the just-written
            # table. The observation is the same P-row gather, folded on the
            # driver exactly as before (the Spark analog of the reference's
            # agg_sync, /root/reference/src/basic/Worker.h:158-215).
            stat_cols = [c for c, _ in program.stats]
            durable = (step % checkpoint_every == 0) or step == max_steps
            if durable:
                obs = Observation(f"{tname}_stats_{step:05d}")
                observed = new_state.observe(
                    obs,
                    F.collect_list(
                        F.struct(F.col("pid"), *[F.col(c) for c in stat_cols])
                    ).alias("rows"),
                )
                new_tbl = self._save_bucketed(
                    observed, f"{tname}_s{step:05d}",
                    os.path.join(checkpoint_dir, f"step_{step:05d}"),
                ).persist()
                per_pid = obs.get["rows"]
            else:
                new_tbl = new_state.repartition(self.P, "pid").persist()
                per_pid = None
            t_write = time.time()
            old_tbl = state_tbl
            state_tbl = new_tbl

            if per_pid is None:
                # off-cadence step: the stats collect doubles as the action
                # that materializes the persisted state
                per_pid = state_tbl.select("pid", *stat_cols).collect()
            old_tbl.unpersist()
            if os.environ.get("SIP_DEBUG"):
                print(
                    f"[pregel] step {step} wall {time.time() - t0:.2f}s "
                    f"(write {t_write - t0:.2f}s, stats {time.time() - t_write:.2f}s)",
                    flush=True,
                )
            srow = {}
            for c, fn in program.stats:
                vals = [r[c] for r in per_pid if r[c] is not None]
                agg = max if fn is F.max else (min if fn is F.min else sum)
                srow[c] = agg(vals) if vals else None

            msg_counts = [r["msgs_in"] for r in per_pid if "msgs_in" in r.asDict()]
            skew = (
                float(max(msg_counts)) / (sum(msg_counts) / len(msg_counts))
                if msg_counts and sum(msg_counts) > 0
                else 1.0
            )
            for r in per_pid:
                d = r.asDict()
                metrics.append(
                    {
                        "superstep": step,
                        "partition": int(d["pid"]),
                        "messages_received": int(d.get("msgs_in", 0) or 0),
                        "active_vertices": int(d.get("active", 0) or 0),
                        "skew_ratio": skew,
                        "checkpoint_path": (
                            os.path.join(checkpoint_dir, f"step_{step:05d}")
                            if durable
                            else ""
                        ),
                        "wall_sec": time.time() - t0,
                    }
                )
            # carry stored in the lineage is the one the NEXT superstep needs,
            # so a resumed run continues with identical arithmetic.
            if program.carry_fn:
                carry = program.carry_fn(srow)
            self._finish_checkpoint(
                checkpoint_dir, step, carry, metrics, nv_by_pid, srow, durable=durable
            )
            if durable:
                self._prune_checkpoints(
                    checkpoint_dir, step, keep=keep_checkpoints, tname=tname
                )
            if program.converged and program.converged(srow, step):
                break

        # a run that converged between durable points still leaves a durable
        # final checkpoint, so resume never replays the converged tail
        if step > start_step and not durable:
            mem_tbl = state_tbl
            state_tbl = self._save_bucketed(
                mem_tbl, f"{tname}_s{step:05d}",
                os.path.join(checkpoint_dir, f"step_{step:05d}"),
            )
            mem_tbl.unpersist()
            self._finish_checkpoint(
                checkpoint_dir, step, carry, metrics, nv_by_pid, srow, durable=True
            )
            self._prune_checkpoints(checkpoint_dir, step, keep=keep_checkpoints, tname=tname)

        # release the cached structure AND final-state blocks; files stay on
        # disk so the returned scan (a zero-exchange bucketed join of the
        # static ids with the final state) keeps working. Leaving the final
        # state persisted would leak one cache entry per run() — and the
        # CacheManager compares every later persist/lookup against every
        # cached plan, so leaked entries slow the whole session down.
        struct_tbl.unpersist()
        state_tbl.unpersist()
        final = struct_tbl.select("pid", "ids").join(state_tbl, "pid")
        return final, metrics

    # -- checkpointing ----------------------------------------------------

    def _finish_checkpoint(
        self, ckdir, step, carry, metrics, nv_by_pid, srow, durable=True
    ) -> None:
        """Write the per-partition lineage record after stats are known; the
        lineage file's presence marks the checkpoint complete for resume.
        Off-cadence (non-durable) steps append metrics only — no lineage, so
        resume never points at a step without a parquet table behind it.

        Metrics rows go to an append-only metrics.jsonl (one line per
        (superstep, partition)) so the per-step write cost is O(P), not
        O(steps * P) — a 1000-superstep run must not rewrite its whole metric
        history every step."""
        lineage = {
            "superstep": step,
            "path": os.path.join(ckdir, f"step_{step:05d}"),
            "carry": carry,
            "stats": {k: v for k, v in srow.items()},
            "partitions": [
                {"pid": p, "n_vertices": n} for p, n in sorted(nv_by_pid.items())
            ],
        }
        already = any(
            m["superstep"] == step and m.get("_logged") for m in metrics
        )
        if not already:
            with open(os.path.join(ckdir, "metrics.jsonl"), "a") as f:
                for m in metrics:
                    if m["superstep"] == step:
                        f.write(json.dumps(m, default=float) + "\n")
                        m["_logged"] = True
        if durable:
            with open(os.path.join(ckdir, f"lineage_{step:05d}.json"), "w") as f:
                json.dump(lineage, f, default=float)

    def _prune_checkpoints(self, ckdir, step, keep=2, tname: str | None = None) -> None:
        """Keep the newest `keep` checkpoints; drop older tables + files."""
        steps = sorted(
            int(f[len("step_"):]) for f in os.listdir(ckdir) if f.startswith("step_")
        )
        for s in steps[:-keep] if keep > 0 else []:
            if tname:
                self.spark.sql(f"DROP TABLE IF EXISTS {tname}_s{s:05d}")
            shutil.rmtree(os.path.join(ckdir, f"step_{s:05d}"), ignore_errors=True)
            try:
                os.remove(os.path.join(ckdir, f"lineage_{s:05d}.json"))
            except OSError:
                pass

    def _load_checkpoint(self, ckdir):
        if not os.path.isdir(ckdir):
            return None
        lineages = sorted(
            f for f in os.listdir(ckdir) if f.startswith("lineage_") and f.endswith(".json")
        )
        for fname in reversed(lineages):
            with open(os.path.join(ckdir, fname)) as f:
                lin = json.load(f)
            if os.path.exists(os.path.join(lin["path"], "_SUCCESS")):
                df = self.spark.read.parquet(lin["path"])
                carry = lin.get("carry", {})
                step = lin["superstep"]
                metrics = self._load_metrics(ckdir, step)
                return df, step, carry, metrics
        return None

    def _load_metrics(self, ckdir, up_to_step: int) -> list[dict]:
        """Read metrics.jsonl up to the resumed step; rows beyond it (from a
        crashed later attempt) are dropped and the file truncated so the
        resumed run's re-executed steps don't duplicate lines. Falls back to
        the legacy embedded metrics_so_far field if the jsonl is absent."""
        path = os.path.join(ckdir, "metrics.jsonl")
        if not os.path.exists(path):
            return []
        metrics = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                m = json.loads(line)
                if m.get("superstep", 0) <= up_to_step:
                    metrics.append(m)
        with open(path, "w") as f:
            for m in metrics:
                f.write(json.dumps(m, default=float) + "\n")
        return metrics
