"""Build the spark-submit --py-files artifact.

Produces a zip whose root contains the `subgraph_isomorphism_pregel_spark`
package, so `spark-submit --py-files engine.zip main.py ...` makes the engine
importable on the driver AND every executor's Python worker (Spark puts the
zip on sys.path on both sides). This is the deployment unit the north rule
names: the engine ships as modules, not as an installed wheel, so a cluster
with a bare PySpark image can run it with zero image changes.

Usage: python scripts/make_pyfiles_zip.py [out.zip]   (default: dist/engine.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "subgraph_isomorphism_pregel_spark"


def build(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(root, PKG)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_dir):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                # archive name relative to the repo root keeps the package
                # importable from the zip root
                zf.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join("dist", "engine.zip")
    print(build(out))
