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
    MessageBuffer::sync_messages (MPI           one Spark shuffle:
    all-to-all, MessageBuffer.h:66-105)         groupBy(pid,dst).agg(...) with
                                                map-side partial aggregation
                                                (subsumes the reference's disabled
                                                Combiner, src/utils/Combiner.h)
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

Checkpoint/resume: EVERY superstep the parts DataFrame is written to parquet
together with a per-partition lineage record and the per-superstep metrics
(messages, active vertices, skew ratio); the parquet read-back is also the
lineage cut that keeps the iterative plan flat. `run(..., resume=True)`
restarts mid-iteration from the newest complete checkpoint.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_SCHEMA = "pid int, ids array<long>, labels array<int>, indptr array<long>, indices array<long>"


def _np(col) -> np.ndarray:
    """Column cell (list or np array) -> contiguous numpy array."""
    return np.asarray(col)


def build_parts(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    num_partitions: int,
) -> DataFrame:
    """Pack the graph into one CSR block per partition.

    vertices(id, label) + edges(src, dst) -> parts(pid, ids, labels, indptr,
    indices): ids sorted ascending; indices sorted within each source's slice
    (enables binary-search membership tests, the Spark analog of the
    reference's nbs_set, /root/reference/src/SItypes/SIValue.h:38-41).

    One shuffle each side, then the blocks are built vectorized in numpy.
    At cluster scale the parts table would be persisted bucketed by pid so
    later cogroups reuse the layout.
    """
    P = num_partitions
    v = vertices.withColumn("pid", F.pmod(F.col("id"), F.lit(P)).cast("int"))
    e = edges.withColumn("pid", F.pmod(F.col("src"), F.lit(P)).cast("int"))

    def make_csr(key, v_pdf: pd.DataFrame, e_pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        order = np.argsort(v_pdf["id"].values, kind="stable")
        ids = v_pdf["id"].values[order].astype(np.int64)
        labels = v_pdf["label"].values[order].astype(np.int32)
        if len(e_pdf):
            src = e_pdf["src"].values.astype(np.int64)
            dst = e_pdf["dst"].values.astype(np.int64)
            eorder = np.lexsort((dst, src))
            src, dst = src[eorder], dst[eorder]
            counts = np.zeros(len(ids) + 1, dtype=np.int64)
            pos = np.searchsorted(ids, src)
            np.add.at(counts, pos + 1, 1)
            indptr = np.cumsum(counts)
            indices = dst
        else:
            indptr = np.zeros(len(ids) + 1, dtype=np.int64)
            indices = np.empty(0, dtype=np.int64)
        return pd.DataFrame(
            {
                "pid": [pid],
                "ids": [ids],
                "labels": [labels],
                "indptr": [indptr],
                "indices": [indices],
            }
        )

    parts = (
        v.groupBy("pid")
        .cogroup(e.groupBy("pid"))
        .applyInPandas(make_csr, BASE_SCHEMA)
    )
    return parts


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


def _part_to_dict(row: pd.Series) -> dict:
    return {k: (_np(v) if isinstance(v, (list, np.ndarray)) else v) for k, v in row.items()}


class Pregel:
    """Driver for the superstep loop. One instance per (graph, partitioning)."""

    def __init__(self, spark: SparkSession, parts: DataFrame, num_partitions: int):
        self.spark = spark
        self.parts = parts
        self.P = num_partitions

    def run(
        self,
        program: VertexProgram,
        max_steps: int,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        carry0: dict | None = None,
        keep_checkpoints: int = 2,
    ) -> tuple[DataFrame, list[dict]]:
        """Run the program to convergence or max_steps.

        Returns (final parts DataFrame incl. state columns, metrics rows).
        One superstep = scatter (map) -> combine (shuffle w/ partial agg) ->
        update (cogrouped shuffle) -> parquet checkpoint (the lineage cut AND
        the durable resume point) -> driver stats fold. If checkpoint_dir is
        None a session-scoped temp dir is used.
        """
        full_schema = BASE_SCHEMA + ", " + program.state_schema
        if checkpoint_dir is None:
            checkpoint_dir = tempfile.mkdtemp(prefix=f"sip_ckpt_{program.name}_")
        self.keep_checkpoints = keep_checkpoints
        start_step = 0
        metrics: list[dict] = []
        carry = dict(carry0 or {})

        state = None
        if resume and checkpoint_dir:
            state = self._load_checkpoint(checkpoint_dir)
        if state is not None:
            parts_df, start_step, carry, metrics = state
        else:
            init_fn = program.init

            def do_init(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in pdf_iter:
                    out = []
                    for _, row in pdf.iterrows():
                        part = _part_to_dict(row)
                        part.update(init_fn(part))
                        out.append(part)
                    yield pd.DataFrame(out)

            parts_df = self.parts.mapInPandas(do_init, full_schema)

        parts_df = parts_df.persist()
        parts_df.count()

        scatter_fn, update_fn = program.scatter, program.update
        step = start_step
        for step in range(start_step + 1, max_steps + 1):
            t0 = time.time()
            carry_b = dict(carry)

            def make_scatter(_step, _carry):
                def do_scatter(pdf_iter):
                    for pdf in pdf_iter:
                        for _, row in pdf.iterrows():
                            msgs = scatter_fn(_part_to_dict(row), _step, _carry)
                            if msgs is not None and len(msgs):
                                yield msgs

                return do_scatter

            msgs_df = parts_df.mapInPandas(make_scatter(step, carry_b), program.msg_schema)
            # combine=None: scatter already pre-aggregated per source partition,
            # so a Spark-side groupBy would shuffle the exact same volume and
            # cost one extra exchange — the update UDF folds partials in numpy
            # instead (map-side combining semantics, reducer-side fold).
            inbox_df = program.combine(msgs_df) if program.combine else msgs_df

            def make_update(_step, _carry):
                def do_update(part_pdf, inbox_pdf):
                    if len(part_pdf) == 0:
                        # messages to a pid with no parts row are dropped, like the
                        # reference (/root/reference/src/basic/MessageBuffer.h:107-136)
                        return part_pdf.head(0)
                    out = []
                    for _, row in part_pdf.iterrows():
                        part = _part_to_dict(row)
                        part.update(update_fn(part, inbox_pdf, _step, _carry))
                        out.append(part)
                    return pd.DataFrame(out)

                return do_update

            do_update = make_update(step, carry_b)

            new_parts = (
                parts_df.groupBy("pid")
                .cogroup(inbox_df.groupBy("pid"))
                .applyInPandas(do_update, full_schema)
            )

            # Checkpoint EVERY superstep (north-star requirement), and use the
            # parquet round-trip as the lineage cut: reading the checkpoint back
            # gives a clean FileScan leaf plan. (localCheckpoint leaves driver
            # state behind that degrades exponentially after ~20 supersteps in
            # Spark 4.1 — measured; the parquet round-trip is flat and doubles
            # as the durable, resumable state the north rule asks for.)
            t_plan = time.time()
            ckpt_path = self._write_checkpoint(checkpoint_dir, step, new_parts, carry)
            old_parts = parts_df
            # the checkpoint is written partitionBy("pid") -> one file per pid,
            # so the read-back scans with P-way parallelism (a single coalesced
            # file would serialize the next scatter) and no extra exchange
            parts_df = self.spark.read.parquet(ckpt_path).persist()

            # ONE action per superstep: collect the per-pid scalar stat columns
            # (P rows) and fold the global aggregates on the driver — the Spark
            # analog of the reference's agg_sync gather
            # (/root/reference/src/basic/Worker.h:158-215).
            per_pid = parts_df.select(
                "pid", F.size("ids").alias("n_vertices"), *[c for c, _ in program.stats]
            ).collect()
            old_parts.unpersist()
            if os.environ.get("SIP_DEBUG"):
                print(f"[pregel] step {step} wall {time.time() - t_plan:.2f}s", flush=True)
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
                        "messages_sent": int(d.get("msgs_in", 0) or 0),
                        "active_vertices": int(d.get("active", 0) or 0),
                        "skew_ratio": skew,
                        "checkpoint_path": ckpt_path,
                        "wall_sec": time.time() - t0,
                    }
                )
            # carry stored in the lineage is the one the NEXT superstep needs,
            # so a resumed run continues with identical arithmetic.
            if program.carry_fn:
                carry = program.carry_fn(srow)
            self._finish_checkpoint(checkpoint_dir, step, carry, metrics, per_pid, srow)
            self._prune_checkpoints(checkpoint_dir, step, keep=keep_checkpoints)
            if program.converged and program.converged(srow, step):
                break

        return parts_df, metrics

    # -- checkpointing ----------------------------------------------------

    def _write_checkpoint(self, ckdir, step, parts_df, carry) -> str:
        path = os.path.join(ckdir, f"step_{step:05d}")
        parts_df.write.mode("overwrite").partitionBy("pid").parquet(path)
        return path

    def _finish_checkpoint(self, ckdir, step, carry, metrics, per_pid, srow) -> None:
        """Write the per-partition lineage record after stats are known; the
        lineage file's presence marks the checkpoint complete for resume."""
        lineage = {
            "superstep": step,
            "path": os.path.join(ckdir, f"step_{step:05d}"),
            "carry": carry,
            "stats": {k: v for k, v in srow.items()},
            "partitions": [
                {"pid": int(r["pid"]), "n_vertices": int(r["n_vertices"])} for r in per_pid
            ],
            "metrics_so_far": metrics,
        }
        with open(os.path.join(ckdir, f"lineage_{step:05d}.json"), "w") as f:
            json.dump(lineage, f, default=float)

    def _prune_checkpoints(self, ckdir, step, keep=2) -> None:
        """Keep the newest `keep` checkpoints, delete older step dirs+lineage."""
        steps = sorted(
            int(f[len("step_"):]) for f in os.listdir(ckdir) if f.startswith("step_")
        )
        for s in steps[:-keep] if keep > 0 else []:
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
                return df, lin["superstep"], carry, list(lin.get("metrics_so_far", []))
        return None
