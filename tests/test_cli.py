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
