"""Continuously ingested link graph: delta files drained through
foreachBatch must leave the incremental ranker at the SAME fixed point as a
cold PageRank over the fully-unioned graph — and each micro-batch must
re-converge in fewer supersteps than its cold ladder."""

import os
import tempfile

from subgraph_isomorphism_pregel_spark.operators.pagerank import pagerank
from subgraph_isomorphism_pregel_spark.streaming.graph_stream import (
    EDGE_DELTA_SCHEMA,
    IncrementalPageRank,
    edge_delta_stream,
    run_ingest,
)
from subgraph_isomorphism_pregel_spark.streaming.windowed import drain


def _base(spark):
    n = 40
    vs = [(i, i % 3) for i in range(n)]
    es = sorted(
        {(i, (i * i + 1) % n) for i in range(n)}
        | {(i, (7 * i + 3) % n) for i in range(n)}
    )
    es = [t for t in es if t[0] != t[1]]
    v = spark.createDataFrame(vs, "id long, label int")
    e = spark.createDataFrame(es, "src long, dst long")
    return v, e, vs, es


def test_stream_ingest_matches_cold_fixed_point(spark):
    v, e, vs, es = _base(spark)
    ipr = IncrementalPageRank(spark, v, e, num_partitions=4, tol=1e-8)

    deltas = [
        # batch 1: two new vertices chained onto 0
        [(200, 0, 0, 0), (0, 200, 0, 0), (200, 201, 0, 1), (201, 200, 1, 0)],
        # batch 2: a new vertex bridging two old ones (+ a duplicate edge row)
        [(202, 5, 2, 2), (5, 202, 2, 2), (202, 9, 2, 0), (9, 202, 0, 2), (202, 5, 2, 2)],
        # batch 3: an edge between vertices first seen in earlier batches
        [(201, 202, 1, 2), (202, 201, 2, 1)],
    ]
    with tempfile.TemporaryDirectory() as tmp:
        ddir = os.path.join(tmp, "deltas")
        os.makedirs(ddir)
        for i, rows in enumerate(deltas):
            spark.createDataFrame(rows, EDGE_DELTA_SCHEMA).coalesce(1).write.parquet(
                os.path.join(ddir, f"batch_{i}")
            )
        # the file source lists files recursively per directory of files —
        # point it at each batch dir's parquet via a flat dir of files
        flat = os.path.join(tmp, "flat")
        os.makedirs(flat)
        import glob
        import shutil

        for i in range(len(deltas)):
            src = glob.glob(os.path.join(ddir, f"batch_{i}", "*.parquet"))[0]
            shutil.copy(src, os.path.join(flat, f"delta_{i}.parquet"))
        q = run_ingest(
            ipr, edge_delta_stream(spark, flat), os.path.join(tmp, "ckpt")
        )
        drain(q)

    new_vs = {200: 0, 201: 1, 202: 2}
    new_es = {(r[0], r[1]) for rows in deltas for r in rows}
    vall = spark.createDataFrame(
        sorted({**dict(vs), **new_vs}.items()), "id long, label int"
    )
    eall = spark.createDataFrame(
        sorted(set(es) | new_es), "src long, dst long"
    )
    cold, mc = pagerank(spark, vall, eall, num_partitions=4, tol=1e-8)
    rc = {r["id"]: r["score"] for r in cold.collect()}
    rw = {r["id"]: r["score"] for r in ipr.scores.collect()}
    ipr.unpersist()
    assert set(rc) == set(rw) and len(rw) == 43
    for k in rc:
        assert abs(rc[k] - rw[k]) < 1e-6, k
    # one bootstrap + three applied batches; the claim at this level is the
    # EXACT fixed point through arbitrary micro-batch arrival order (file
    # order is mtime-based, so batch order is not pinned). Step-count
    # savings are asserted where they are theorems (the island test below;
    # the deferred-local-delta tests in test_add_vertices) — a localized
    # delta CAN re-converge slower than cold-from-uniform when its error
    # vector rides a slow local mode (observed: 66 vs 56 on this fixture),
    # which is exactly why the ranker logs steps per batch for monitoring.
    assert len(ipr.steps_log) == 4, ipr.steps_log
    assert max(m["superstep"] for m in mc) > 0


def test_disconnected_delta_is_the_rescale_exact_case(spark):
    """A delta forming its own island leaves every old score at exactly
    prior * N_old/N_new — the warm run re-converges in <= 2 supersteps."""
    v, e, _vs, _es = _base(spark)
    ipr = IncrementalPageRank(spark, v, e, num_partitions=4, tol=1e-8)
    island = spark.createDataFrame(
        [(300, 301, 0, 1), (301, 300, 1, 0)], EDGE_DELTA_SCHEMA
    )
    ipr.apply_delta(island)
    assert ipr.steps_log[-1] <= 2, ipr.steps_log
    assert ipr.n == 42
    ipr.unpersist()


def test_lineage_cut_preserves_fixed_point(spark):
    """With cut_every=2 the parquet lineage cut fires twice across five
    batches; scores must still land on the cold fixed point over the
    fully-grown graph, and the cut generation dirs must rotate (only the
    newest kept) and vanish on unpersist()."""
    v, e, vs, es = _base(spark)
    ipr = IncrementalPageRank(spark, v, e, num_partitions=4, tol=1e-8, cut_every=2)
    deltas = [
        [(200 + i, (3 * i) % 40, 0, (3 * i) % 3), ((3 * i) % 40, 200 + i, (3 * i) % 3, 0)]
        for i in range(5)
    ]
    for rows in deltas:
        ipr.apply_delta(spark.createDataFrame(rows, EDGE_DELTA_SCHEMA))
    assert ipr._applied == 5 and ipr._gen == 2
    cutdir = ipr._cutdir
    assert cutdir is not None and sorted(os.listdir(cutdir)) == ["gen2"]

    new_vs = {200 + i: 0 for i in range(5)}
    new_es = {(r[0], r[1]) for rows in deltas for r in rows}
    vall = spark.createDataFrame(
        sorted({**dict(vs), **new_vs}.items()), "id long, label int"
    )
    eall = spark.createDataFrame(sorted(set(es) | new_es), "src long, dst long")
    cold, _ = pagerank(spark, vall, eall, num_partitions=4, tol=1e-8)
    rc = {r["id"]: r["score"] for r in cold.collect()}
    rw = {r["id"]: r["score"] for r in ipr.scores.collect()}
    ipr.unpersist()
    assert set(rc) == set(rw) and len(rw) == 45
    for k in rc:
        assert abs(rc[k] - rw[k]) < 1e-6, k
    assert not os.path.isdir(cutdir)


def test_replayed_batch_is_a_noop(spark):
    """foreachBatch is at-least-once: re-delivering an already-applied batch
    must not duplicate edges (scores unchanged, no extra warm run)."""
    v, e, _vs, _es = _base(spark)
    ipr = IncrementalPageRank(spark, v, e, num_partitions=4, tol=1e-8)
    batch = spark.createDataFrame(
        [(200, 0, 0, 0), (0, 200, 0, 0)], EDGE_DELTA_SCHEMA
    )
    ipr.apply_delta(batch)
    after_first = {r["id"]: r["score"] for r in ipr.scores.collect()}
    n_runs = len(ipr.steps_log)
    ipr.apply_delta(batch)  # replay
    after_second = {r["id"]: r["score"] for r in ipr.scores.collect()}
    assert after_first == after_second
    assert len(ipr.steps_log) == n_runs  # no new warm run was spent
    assert ipr.n == 41
    ipr.unpersist()
