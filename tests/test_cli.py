"""spark-submit entry point (main.py) — drive the argparse dispatch for a
representative algo set, including the round-5 additions, and check the
parquet outputs against the operators' own results."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import main as cli


@pytest.fixture(scope="module")
def graph_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_graph")
    pd.DataFrame(
        {"src": [0, 1, 2, 3, 0], "dst": [1, 2, 3, 0, 2], "w": [5.0, 1.0, 2.0, 9.0, 7.0]}
    ).to_parquet(d / "weighted.parquet")
    pd.DataFrame({"src": [0, 1, 2, 3, 0], "dst": [1, 2, 3, 0, 2]}).to_parquet(
        d / "edges.parquet"
    )
    return d


def test_cli_mst(spark, graph_dir, tmp_path):
    out = str(tmp_path / "mst.parquet")
    assert (
        cli.main(
            ["--algo", "mst", "--edges", str(graph_dir / "weighted.parquet"), "--output", out]
        )
        == 0
    )
    got = pd.read_parquet(out).sort_values(["u", "v"]).values.tolist()
    assert got == [[0, 1, 5.0], [1, 2, 1.0], [2, 3, 2.0]]


def test_cli_mst_requires_weights(graph_dir):
    with pytest.raises(SystemExit):
        cli.main(["--algo", "mst", "--edges", str(graph_dir / "edges.parquet")])


def test_cli_matching(spark, graph_dir, tmp_path):
    out = str(tmp_path / "m.parquet")
    assert (
        cli.main(
            ["--algo", "matching", "--edges", str(graph_dir / "edges.parquet"), "--output", out]
        )
        == 0
    )
    m = pd.read_parquet(out)
    used = m[["u", "v"]].values.ravel().tolist()
    assert len(used) == len(set(used)) and len(m) >= 1


def test_cli_coloring(spark, graph_dir, tmp_path):
    out = str(tmp_path / "c.parquet")
    assert (
        cli.main(
            ["--algo", "coloring", "--edges", str(graph_dir / "edges.parquet"), "--output", out]
        )
        == 0
    )
    col = pd.read_parquet(out).set_index("id")["color"].to_dict()
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]:
        assert col[a] != col[b]
    assert max(col.values()) == 2  # triangle 0-2-3 forces exactly 3 colors


def test_cli_louvain(spark, graph_dir, tmp_path):
    out = str(tmp_path / "lv.parquet")
    assert (
        cli.main(
            ["--algo", "louvain", "--edges", str(graph_dir / "edges.parquet"), "--output", out]
        )
        == 0
    )
    lv = pd.read_parquet(out)
    assert sorted(lv.columns) == ["comm", "id"]
    assert sorted(lv["id"].tolist()) == [0, 1, 2, 3]


def test_cli_coreness(spark, graph_dir, tmp_path):
    # symmetrized input (the kernel programs' contract): 4-cycle with one
    # chord plus a pendant vertex 4 — cycle vertices core 2, pendant core 1
    import pandas as pd

    sym = []
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (3, 4)]:
        sym += [(a, b), (b, a)]
    p = str(tmp_path / "sym.parquet")
    pd.DataFrame(sym, columns=["src", "dst"]).to_parquet(p)
    out = str(tmp_path / "core.parquet")
    assert cli.main(["--algo", "coreness", "--edges", p, "--output", out]) == 0
    got = pd.read_parquet(out).set_index("id")["coreness"].to_dict()
    assert got == {0: 2, 1: 2, 2: 2, 3: 2, 4: 1}


def test_cli_onion(spark, graph_dir, tmp_path):
    import pandas as pd

    sym = []
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (3, 4)]:
        sym += [(a, b), (b, a)]
    p = str(tmp_path / "sym_on.parquet")
    pd.DataFrame(sym, columns=["src", "dst"]).to_parquet(p)
    out = str(tmp_path / "onion.parquet")
    assert cli.main(["--algo", "onion", "--edges", p, "--output", out]) == 0
    got = pd.read_parquet(out).set_index("id")
    # pendant 4 peels in wave 1 at threshold 1; 1 and 3 (degree 2) go in
    # wave 2; removing them exposes 0 and 2, which peel in wave 3 — all
    # four cycle vertices share coreness 2
    assert got["coreness"].to_dict() == {0: 2, 1: 2, 2: 2, 3: 2, 4: 1}
    assert got["layer"].to_dict() == {0: 3, 1: 2, 2: 3, 3: 2, 4: 1}


def test_cli_pagerank_ingest(spark, tmp_path):
    """--deltas-dir: cold bootstrap + streamed warm micro-batches must land
    on the cold fixed point of the unioned graph."""
    base_e = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 0]})
    base_v = pd.DataFrame({"id": [0, 1, 2, 3], "label": [0, 1, 0, 1]})
    gdir = tmp_path / "g"
    gdir.mkdir()
    base_e.to_parquet(gdir / "edges.parquet")
    base_v.to_parquet(gdir / "vertices.parquet")
    ddir = tmp_path / "deltas"
    ddir.mkdir()
    pd.DataFrame(
        {"src": [7, 0], "dst": [0, 7], "src_label": [0, 0], "dst_label": [0, 0]}
    ).astype({"src": "int64", "dst": "int64", "src_label": "int32", "dst_label": "int32"}).to_parquet(ddir / "d0.parquet")
    out = str(tmp_path / "scores.parquet")
    assert (
        cli.main(
            [
                "--algo", "pagerank",
                "--edges", str(gdir / "edges.parquet"),
                "--vertices", str(gdir / "vertices.parquet"),
                "--deltas-dir", str(ddir),
                "--partitions", "2",
                "--output", out,
            ]
        )
        == 0
    )
    got = pd.read_parquet(out)
    assert set(got["id"]) == {0, 1, 2, 3, 7}
    from subgraph_isomorphism_pregel_spark.operators.pagerank import pagerank

    vall = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 0), (3, 1), (7, 0)], "id long, label int"
    )
    eall = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (7, 0), (0, 7)], "src long, dst long"
    )
    cold, _ = pagerank(spark, vall, eall, num_partitions=2)
    rc = {r["id"]: r["score"] for r in cold.collect()}
    rw = dict(zip(got["id"], got["score"]))
    for k in rc:
        assert abs(rc[k] - rw[k]) < 1e-5, k

    # reusing a stream checkpoint with the BASE graph would silently skip
    # every committed delta: the CLI must refuse, not emit a wrong graph
    import pytest

    ck = str(tmp_path / "ck")
    argv = [
        "--algo", "pagerank",
        "--edges", str(gdir / "edges.parquet"),
        "--vertices", str(gdir / "vertices.parquet"),
        "--deltas-dir", str(ddir),
        "--partitions", "2",
        "--checkpoint-dir", ck,
        "--output", out,
    ]
    assert cli.main(argv) == 0
    with pytest.raises(SystemExit, match="committed batches"):
        cli.main(argv)
