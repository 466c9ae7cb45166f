"""Z-order layout: Morton key vs a python bit-replay, and the clustering
property the layout exists for — per-file (x, y) bounding boxes are tight
on BOTH dimensions, unlike a single-column sort."""

import random

from pyspark.sql import functions as F

from subgraph_isomorphism_pregel_spark.sources.zorder import z2, zorder_frame


def py_z2(x, y):
    def spread(v):
        v &= 0xFFFF
        for sh, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
            v = (v | (v << sh)) & mask
        return v

    return spread(x) | (spread(y) << 1)


def test_z2_matches_python_replay(spark):
    rng = random.Random(3)
    rows = [(i, rng.randrange(65536), rng.randrange(65536)) for i in range(300)]
    rows += [(300, 0, 0), (301, 65535, 65535), (302, 65535, 0), (303, 0, 65535)]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    got = {r["i"]: r["z"] for r in df.select("i", z2("x", "y").alias("z")).collect()}
    assert got == {i: py_z2(x, y) for i, x, y in rows}
    # interleave is a bijection on the test points
    assert len(set(got.values())) == len(rows)


def test_zorder_partitions_bound_both_dimensions(spark):
    """On a uniform 64x64 grid split into 16 files, min/max skipping for a
    point predicate on EITHER dimension touches few z-ordered files, while
    a single-column sort leaves every file matching on the other
    dimension. (Total bbox area is NOT the discriminator — both layouts
    tile the plane exactly; per-file span on the off dimension is.)"""
    pts = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x long, y long")

    def boxes(frame):
        return (
            frame.withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(
                F.min("x").alias("x0"), F.max("x").alias("x1"),
                F.min("y").alias("y0"), F.max("y").alias("y1"),
            )
            .collect()
        )

    def files_hit(bs, dim, v):
        lo, hi = (f"{dim}0", f"{dim}1")
        return sum(1 for b in bs if b[lo] <= v <= b[hi])

    zb = boxes(zorder_frame(df, "x", "y", num_files=16))
    xb = boxes(df.repartitionByRange(16, "x").sortWithinPartitions("x"))
    assert len(zb) == len(xb) == 16
    # x-sorted files all span the full y range: a y-point predicate hits
    # every file; z-order hits only the files whose quadrant contains it
    for v in (0, 17, 40, 63):
        assert files_hit(xb, "y", v) == 16
        assert files_hit(zb, "y", v) <= 8
        assert files_hit(zb, "x", v) <= 8  # and x stays prunable too
    # both layouts hold all rows
    assert zorder_frame(df, "x", "y", num_files=16).count() == 64 * 64
