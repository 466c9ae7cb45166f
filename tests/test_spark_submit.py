"""Ship-it evidence for the north rule's deployment clause: the engine runs
via `spark-submit --py-files engine.zip` with NO repo checkout on the
driver's path — the zip built by scripts/make_pyfiles_zip.py is the whole
deployment unit, exactly what a multi-executor cluster submission ships.

The submitted driver script asserts the submit-time --master wins over
get_spark's local default (a cluster submission must not be demoted to a
single-JVM local master by the library), then runs the CLI's toy PageRank
end-to-end and writes parquet, which this test checks numerically.
"""

import os
import shutil
import subprocess
import sys
import zipfile

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import sys
from subgraph_isomorphism_pregel_spark.session import get_spark

# cores=9 would mean master local[9] if the library ignored the submission;
# the submit line says --master local[3] and that must win.
spark = get_spark("submit-e2e", cores=9)
assert spark.sparkContext.master == "local[3]", spark.sparkContext.master

import main
rc = main.main(["--algo", "pagerank", "--toy", "--output", sys.argv[1]])
assert rc == 0, rc
spark.stop()
print("SUBMIT_E2E_OK")
"""


def spark_submit_bin() -> str:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    found = shutil.which("spark-submit")
    if found:
        return found
    pytest.skip("no spark-submit binary available")


def test_make_pyfiles_zip_contains_package(tmp_path):
    from scripts.make_pyfiles_zip import build

    out = build(str(tmp_path / "engine.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert "subgraph_isomorphism_pregel_spark/session.py" in names
    assert "subgraph_isomorphism_pregel_spark/operators/pregel.py" in names
    assert "subgraph_isomorphism_pregel_spark/operators/match.py" in names
    # package-only artifact: nothing from tests/, scripts/, or data sneaks in
    assert all(n.startswith("subgraph_isomorphism_pregel_spark/") for n in names)
    assert all(n.endswith(".py") for n in names)


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    from scripts.make_pyfiles_zip import build

    zip_path = build(str(tmp_path / "engine.zip"))
    driver_py = tmp_path / "driver.py"
    driver_py.write_text(DRIVER)
    out_parquet = str(tmp_path / "pr.parquet")

    # clean environment: the repo root must NOT be importable except through
    # the shipped zip (this is what a bare cluster image looks like)
    env = dict(os.environ)
    pypath = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and os.path.abspath(p) != REPO
    ]
    env["PYTHONPATH"] = os.pathsep.join(pypath)
    env.pop("SPARK_MASTER", None)

    proc = subprocess.run(
        [
            spark_submit_bin(),
            "--master",
            "local[3]",
            "--py-files",
            f"{zip_path},{os.path.join(REPO, 'main.py')}",
            str(driver_py),
            out_parquet,
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-4000:]
    assert "SUBMIT_E2E_OK" in proc.stdout

    got = pd.read_parquet(out_parquet)
    assert sorted(got.columns) == ["id", "score"]
    assert len(got) == 15  # the reference's toy graph
    assert abs(got["score"].sum() - 1.0) < 1e-9
    assert (got["score"] > 0).all()
