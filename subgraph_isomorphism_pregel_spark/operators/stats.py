"""Exact grouped quantiles — corpus length/score distributions per stratum.

Approximate quantiles (approx_percentile / t-digest) are not
engine-reproducible; this is the EXACT discrete quantile under the
explicit convention

    Q(q) = the value at rank ceil(q * n) (1-based, ascending)

which both engines express with the same row_number construction —
deterministic even with duplicate values because only the VALUE at the
rank is returned. One window shuffle per group column (group cardinality
= strata count, so the per-partition sort is per-stratum). For a 100 TB
single-group quantile use partial histograms instead; per-stratum
distributions (the curation use-case) are exactly this shape."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """-> (group, q double, value) exact discrete quantiles per group."""
    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError("qs must be fractions in (0, 1]")
    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    ranked = df.select(group_col, value_col).withColumn(
        "rn", F.row_number().over(w)
    )
    counts = ranked.groupBy(group_col).agg(F.max("rn").alias("n"))
    r = ranked.join(counts, group_col)
    out = None
    for q in qs:
        part = r.where(
            F.col("rn") == F.ceil(F.lit(float(q)) * F.col("n"))
        ).select(
            group_col,
            F.lit(float(q)).alias("q"),
            F.col(value_col).alias("value"),
        )
        out = part if out is None else out.unionAll(part)
    return out
