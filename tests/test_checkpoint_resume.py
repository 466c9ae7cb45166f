"""Checkpoint/resume: a run killed mid-iteration must resume from its last
complete checkpoint and end allclose-1e-6 to an uninterrupted run
(SURVEY.md §5 item 4 / FIXTURES.md §6)."""

import os
import tempfile

from subgraph_isomorphism_pregel_spark.operators.pagerank import (
    Pregel,
    build_parts,
    pagerank,
    pagerank_program,
    scores_df,
)
from subgraph_isomorphism_pregel_spark.sources.graph import toy_graph


def test_resume_mid_iteration_equals_uninterrupted(spark):
    v, e = toy_graph(spark)
    n = v.count()

    # uninterrupted reference run (fixed 12 steps)
    full, _ = pagerank(spark, v, e, num_partitions=8, fixed_steps=12)
    want = {r["id"]: r["score"] for r in full.collect()}

    # interrupted: run only 5 steps into a checkpoint dir...
    ck = tempfile.mkdtemp(prefix="resume_test_")
    parts = build_parts(spark, v, e, 8)
    kern = Pregel(spark, parts, 8)
    prog5 = pagerank_program(n, 8, fixed_steps=5)
    kern.run(prog5, max_steps=5, checkpoint_dir=ck, carry0={"dangling": 0.0})
    assert any(f.startswith("lineage_") for f in os.listdir(ck))

    # ...then resume with the full 12-step program from the same dir;
    # count update-UDF executions to prove steps 1-5 are NOT re-run
    prog12 = pagerank_program(n, 8, fixed_steps=12)
    calls_log = os.path.join(ck, "update_calls.log")
    orig_update = prog12.update

    def counting_update(part, inbox, step, carry):
        with open(calls_log, "a") as f:
            f.write(f"{step}\n")
        return orig_update(part, inbox, step, carry)

    prog12.update = counting_update
    final, metrics = kern.run(
        prog12, max_steps=12, checkpoint_dir=ck, resume=True, carry0={"dangling": 0.0}
    )
    got = {r["id"]: r["score"] for r in scores_df(final).collect()}
    with open(calls_log) as f:
        executed_steps = sorted({int(x) for x in f.read().split()})
    assert executed_steps == list(range(6, 13)), executed_steps
    # metrics history restored from the lineage covers steps 1..12
    assert sorted({m["superstep"] for m in metrics}) == list(range(1, 13))
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k

    # metrics table: one row per (superstep, partition), all fields present
    seen = {(m["superstep"], m["partition"]) for m in metrics}
    assert len(seen) == len(metrics)
    for m in metrics:
        assert {"messages_received", "active_vertices", "skew_ratio", "checkpoint_path"} <= set(m)


def test_checkpoint_every_cadence_and_resume(spark):
    """checkpoint_every=k: identical scores, durable lineage only on the
    cadence (+ final step), and resume replays only the steps after the
    newest durable checkpoint."""
    v, e = toy_graph(spark)

    full, _ = pagerank(spark, v, e, num_partitions=8, fixed_steps=10)
    want = {r["id"]: r["score"] for r in full.collect()}

    ck = tempfile.mkdtemp(prefix="cadence_test_")
    got_df, metrics = pagerank(
        spark, v, e, num_partitions=8, fixed_steps=10,
        checkpoint_dir=ck, checkpoint_every=4,
    )
    got = {r["id"]: r["score"] for r in got_df.collect()}
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k
    lineage_steps = sorted(
        int(f[len("lineage_"):-len(".json")])
        for f in os.listdir(ck) if f.startswith("lineage_")
    )
    # cadence steps 4, 8 plus the final step 10; prune keeps the newest 2
    assert lineage_steps == [8, 10], lineage_steps
    # off-cadence metrics rows carry no durable path, cadence rows do
    by_step = {}
    for m in metrics:
        by_step.setdefault(m["superstep"], set()).add(bool(m["checkpoint_path"]))
    assert by_step[4] == {True} and by_step[8] == {True} and by_step[10] == {True}
    assert by_step[5] == {False} and by_step[9] == {False}

    # resume from step 10 (final durable) with 2 more steps
    more, m2 = pagerank(
        spark, v, e, num_partitions=8, fixed_steps=12,
        checkpoint_dir=ck, resume=True, checkpoint_every=4,
    )
    ref12, _ = pagerank(spark, v, e, num_partitions=8, fixed_steps=12)
    want12 = {r["id"]: r["score"] for r in ref12.collect()}
    got12 = {r["id"]: r["score"] for r in more.collect()}
    for k in want12:
        assert abs(got12[k] - want12[k]) < 1e-9, k


def test_sssp_resume_equals_uninterrupted(spark):
    """Resume is program-agnostic: a DIFFERENT vertex program (SSSP —
    int-array state, no carry, frontier-driven convergence) interrupted at
    2 hops and resumed must equal the uninterrupted run, with the restored
    metrics history covering every superstep."""
    from subgraph_isomorphism_pregel_spark.operators.sssp import sssp

    v, e = toy_graph(spark)
    full, fmet = sssp(spark, v, e, source=1, max_hops=10, num_partitions=4)
    want = {r["id"]: r["dist"] for r in full.collect()}
    n_steps = max(m["superstep"] for m in fmet)

    ck = tempfile.mkdtemp(prefix="sssp_resume_")
    sssp(spark, v, e, source=1, max_hops=2, num_partitions=4, checkpoint_dir=ck)
    got_df, metrics = sssp(
        spark, v, e, source=1, max_hops=10, num_partitions=4,
        checkpoint_dir=ck, resume=True,
    )
    got = {r["id"]: r["dist"] for r in got_df.collect()}
    assert got == want
    assert sorted({m["superstep"] for m in metrics}) == list(range(1, n_steps + 1))
