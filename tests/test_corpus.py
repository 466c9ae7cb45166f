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


def test_rev0_identical_to_default(spark):
    """rev=0 must be byte-identical to the historical generator output."""
    base = synth_corpus(spark, n_repos=2, files_per_repo=15).orderBy("repo", "path").collect()
    r0 = synth_corpus(spark, n_repos=2, files_per_repo=15, rev=0).orderBy("repo", "path").collect()
    assert base == r0


def test_graph_diff_matches_generator_formula(spark):
    """graph_diff over the two corpus revisions == the diff computed from
    _file_row's import targets directly (changed files keep their ids)."""
    from subgraph_isomorphism_pregel_spark.operators.stats import graph_diff

    n_r, fpr, sd = 2, 20, 42
    c0 = synth_corpus(spark, n_repos=n_r, files_per_repo=fpr, seed=sd)
    c1 = synth_corpus(spark, n_repos=n_r, files_per_repo=fpr, seed=sd, rev=1)
    files = derive_files(c0)
    id_of = {(r["repo"], r["path"]): r["file_id"] for r in files.collect()}

    def edge_set(rev):
        out = set()
        for r in range(n_r):
            for j in range(fpr):
                row = _file_row(r, j, fpr, sd, rev)
                changed = rev >= 1 and (j * 3 + sd) % 10 == 0
                second = (17, 3) if changed else (13, 5)
                for mult, add in ((7, 1), second):
                    t = (j * mult + add + sd) % fpr
                    if t != j:
                        trow = _file_row(r, t, fpr, sd, rev)
                        out.add(
                            (id_of[(row["repo"], row["path"])],
                             id_of[(trow["repo"], trow["path"])])
                        )
        return out

    s0, s1 = edge_set(0), edge_set(1)
    want = {(s, d, "added") for (s, d) in s1 - s0} | {
        (s, d, "removed") for (s, d) in s0 - s1
    }
    assert want, "fixture must produce a non-empty diff"
    d = graph_diff(derive_edges(c0, files), derive_edges(c1, files))
    got = {(r["src"], r["dst"], r["change"]) for r in d.collect()}
    assert got == want
    # changed files get a NEW commit id; unchanged files keep theirs
    commits0 = {(r["repo"], r["path"]): r["commit"] for r in c0.collect()}
    commits1 = {(r["repo"], r["path"]): r["commit"] for r in c1.collect()}
    n_changed = sum(1 for k in commits0 if commits0[k] != commits1[k])
    assert n_changed == sum(
        1 for j in range(fpr) if (j * 3 + sd) % 10 == 0
    ) * n_r
