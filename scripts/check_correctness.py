"""Local mirror of the driver's correctness gate: run every queries() entry
with Spark and its oracle_sql() twin with DuckDB on the same parquet tables,
compare row count, column names, and (order-insensitively) values.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from subgraph_isomorphism_pregel_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def exact_hash(df: pd.DataFrame) -> str:
    """Mirror of the driver's value hash: sort columns by name, stringify every
    cell with its pandas dtype's repr (so int64 1 != float64 1.0), sort rows,
    sha256 the whole thing.  A dtype difference between Spark and the oracle
    (e.g. DuckDB HUGEINT -> float64) fails HERE even when values are equal —
    exactly as the driver's gate does (VERDICT r2 'what's wrong' #1)."""
    import hashlib

    s = df[sorted(df.columns)].astype(str)
    rows = sorted("\x1f".join(r) for r in s.itertuples(index=False, name=None))
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        errs.append(f"schema: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return errs
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"rowcount: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = norm(spark_pdf), norm(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
                import numpy as np

                bad = ~(
                    (pd.isna(av) & pd.isna(bv))
                    | (abs(av.astype(float) - bv.astype(float)) < 1e-12)
                )
                if bad.any():
                    i = int(bad.argmax())
                    errs.append(
                        f"col {c}: {int(bad.sum())} mismatches, first row {i}: "
                        f"spark={av[i]} duck={bv[i]}"
                    )
            else:
                if not (av == bv).all():
                    bad = av != bv
                    i = int(bad.argmax())
                    errs.append(
                        f"col {c}: {int(bad.sum())} mismatches, first row {i}: "
                        f"spark={av[i]!r} duck={bv[i]!r}"
                    )
    if not errs and exact_hash(spark_pdf) != exact_hash(duck_pdf):
        # values agree under tolerance but the driver's exact string hash
        # diverges — almost always a dtype mismatch (int vs float render)
        a2, b2 = norm(spark_pdf), norm(duck_pdf)
        detail = ", ".join(
            f"{c}: spark={spark_pdf[c].dtype} duck={duck_pdf[c].dtype}"
            for c in sorted(spark_pdf.columns)
            if str(spark_pdf[c].dtype) != str(duck_pdf[c].dtype)
        )
        errs.append(f"exact-hash mismatch (dtype?): {detail or 'render difference'}")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("correctness", cores=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spark_pdf)} rows ({time.time() - t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures += 1
            continue
        errs = compare(name, spark_pdf, duck_pdf)
        if errs:
            failures += 1
            print(f"FAIL {name} ({time.time() - t0:.1f}s)")
            for e in errs:
                print(f"   {e}")
        else:
            print(f"OK   {name}: {len(spark_pdf)} rows ({time.time() - t0:.1f}s)")
    print("failures:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
