"""Corpus synthesis + graph derivation (SURVEY.md §7 Milestone 0):
per-row sha256 invariant, expected edge list on the tiny fixture,
determinism across regeneration, and end-to-end PageRank on the derived
dependency graph."""

from subgraph_isomorphism_pregel_spark.operators.pagerank import pagerank
from subgraph_isomorphism_pregel_spark.sources.corpus import (
    _file_row,
    corpus_graph,
    derive_edges,
    derive_files,
    synth_corpus,
    verify_sha,
)


def test_sha_invariant(spark):
    corpus = synth_corpus(spark, n_repos=3, files_per_repo=20)
    assert verify_sha(corpus) == 0


def test_tiny_fixture_edges_exact(spark):
    """1 repo, 10 files: derived edges == the generator's import targets."""
    corpus = synth_corpus(spark, n_repos=1, files_per_repo=10)
    files = derive_files(corpus)
    edges = derive_edges(corpus, files)
    id_of = {r["path"]: r["file_id"] for r in files.collect()}
    want = set()
    for j in range(10):
        row = _file_row(0, j, 10, 42)
        for mult, add in ((7, 1), (13, 5)):
            t = (j * mult + add + 42) % 10
            if t != j:
                trow = _file_row(0, t, 10, 42)
                want.add((id_of[row["path"]], id_of[trow["path"]]))
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == want
    assert len(got) > 0


def test_deterministic_regeneration(spark):
    c1 = synth_corpus(spark, n_repos=2, files_per_repo=15).orderBy("repo", "path").collect()
    c2 = synth_corpus(spark, n_repos=2, files_per_repo=15).orderBy("repo", "path").collect()
    assert c1 == c2


def test_pagerank_on_derived_graph(spark):
    vertices, edges = corpus_graph(spark, n_repos=2, files_per_repo=25)
    scores, metrics = pagerank(spark, vertices, edges, num_partitions=8, tol=1e-6)
    rows = scores.collect()
    assert len(rows) == vertices.count()
    assert abs(sum(r["score"] for r in rows) - 1.0) < 1e-6
