"""Z-order (Morton) data layout — multi-dimensional clustering for
min/max file skipping, the lakehouse OPTIMIZE ZORDER BY analog and the
natural companion of the bucketed layout (sources/bucketed.py): bucketing
co-locates JOINS, z-ordering co-locates RANGE PREDICATES on two columns
at once.

z2 interleaves the low `bits` bits of two non-negative ints with the
classic magic-number spread — pure codegen shifts/masks with identical
semantics in Spark and DuckDB, so the key itself is oracle-checkable
bit-for-bit. Sorting (or range-partitioning) by z gives every output file
a tight bounding BOX in (x, y) space instead of a tight interval in one
dimension: a filter on EITHER column prunes most files by footer min/max
stats, which single-column sorting only achieves for its own column.

Scale shape: the key is per-row codegen; the layout write is one range
shuffle — the same pay-once discipline as bucketing. At 100 TB the win is
at scan time: Spark's parquet reader skips row groups whose (min, max)
stats exclude the predicate, and z-ordering is what makes those stats
selective on BOTH dimensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic-number bit spread: 16 bits -> even positions of 32
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    x = c.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def z2(x: Column | str, y: Column | str) -> Column:
    """Morton-interleave the low 16 bits of two non-negative int columns
    into one 32-bit z value (x on even bit positions, y on odd)."""
    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    return _spread16(cx).bitwiseOR(F.shiftleft(_spread16(cy), 1))


def zorder_frame(
    df: DataFrame,
    x: str,
    y: str,
    num_files: int = 8,
    z_col: str = "z",
) -> DataFrame:
    """Lay `df` out in z-order on (x, y): one range shuffle on the Morton
    key + an in-partition sort, so each output file covers a tight (x, y)
    bounding box. Write the result with any sink; the column `z_col` stays
    for inspection."""
    return (
        df.withColumn(z_col, z2(x, y))
        .repartitionByRange(num_files, z_col)
        .sortWithinPartitions(z_col)
    )
