"""Python-worker import-machinery fix: mtime-guard zipimporter cache reloads.

PySpark's worker preamble calls ``importlib.invalidate_caches()`` before
EVERY task (``pyspark/worker_util.py::setup_spark_files``), and Spark's
worker PYTHONPATH always contains zip entries (pyspark.zip, the py4j zip,
and the spark-core jar). On CPython 3.11, ``zipimporter.invalidate_caches``
re-reads the whole zip table of contents UNCONDITIONALLY:

    def invalidate_caches(self):
        self._files = _read_directory(self.archive)   # full TOC parse

Measured on this host (Spark 4.1.2 local mode, warm reused worker,
1-element task): the worker-side ``init`` phase is ~200 ms per task, of
which ~140 ms is ``importlib.invalidate_caches`` re-parsing the TOCs of
the cached zipimporters (the ~13 MB spark-core jar costs ~35 ms and is
cached under two path keys, pyspark.zip under five). Every applyInPandas /
mapInPandas / pandas_udf TASK pays this, so iterative kernels with two
Python stages per superstep pay ~0.3 s per superstep of pure TOC parsing.

CPython 3.12 fixed this upstream (gh-84283: zipimport.invalidate_caches
only reloads when the archive mtime changed). This module backports that
exact semantics: stat the archive, reload only when the mtime differs.
Newly-added zip entries (addPyFile) still invalidate correctly — a fresh
zipimporter has no recorded mtime and a replaced archive has a new one.

Installed from the package ``__init__`` — every UDF in this engine lives
in an importable module, so unpickling any of them in a worker imports the
package and applies the patch; from the second task per worker onward the
preamble cost drops to one os.stat per cached zip entry. On Python >= 3.12
the stdlib already behaves this way and the patch is a no-op.
"""

from __future__ import annotations

import os
import sys
import zipimport


def install() -> None:
    if sys.version_info >= (3, 12):
        return  # stdlib already mtime-guards the reload
    zi = zipimport.zipimporter
    if getattr(zi, "_sip_mtime_guarded", False):
        return
    orig = zi.invalidate_caches

    def invalidate_caches(self):
        try:
            mtime = os.stat(self.archive).st_mtime
        except OSError:
            mtime = None
        if mtime is not None and mtime == getattr(self, "_sip_files_mtime", None):
            return
        orig(self)
        try:
            self._sip_files_mtime = mtime
        except AttributeError:  # pragma: no cover - C implementation fallback
            pass

    zi.invalidate_caches = invalidate_caches
    zi._sip_mtime_guarded = True
