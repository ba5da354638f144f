from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from pipelines_spark.functions.zorder import (
    interleave_bits,
    with_zorder_key,
    write_zordered,
)


def test_interleave_bits_known_value(spark):
    # x=0b11, y=0b01, 2 bits: bit i of col j -> position i*2+j
    # positions: x0->0, y0->1, x1->2, y1->3  =>  0b0111 = 7
    row = spark.range(1).select(
        interleave_bits([F.lit(3).cast("long"), F.lit(1).cast("long")], bits=2).alias("z")
    ).collect()[0]
    assert row["z"] == 7


def test_zorder_key_is_codegen_only(spark):
    df = spark.range(100).select(
        (F.col("id") % 10).alias("x"), (F.col("id") / 10).cast("long").alias("y")
    )
    keyed = with_zorder_key(df, ["x", "y"], bits=8)
    plan = keyed._sc._jvm.PythonSQLUtils.explainString(
        keyed._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _file_ranges(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` per parquet file from footer stats."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


@pytest.fixture(scope="module")
def grid_df(spark):
    # 200x200 independent grid: x and y carry no mutual information,
    # the adversarial case for single-column sorting
    return spark.range(40_000).select(
        (F.col("id") % 200).cast("long").alias("x"),
        (F.col("id") / 200).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )


def test_zorder_prunes_both_dimensions_linear_sort_does_not(spark, grid_df, tmp_path):
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zordered(grid_df, zpath, ["x", "y"], num_files=16)
    (
        grid_df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def files_hit(path, col, lo, hi):
        return sum(1 for mn, mx in _file_ranges(path, col) if not (mx < lo or mn > hi))

    n_z = len(glob.glob(f"{zpath}/*.parquet"))
    n_l = len(glob.glob(f"{lpath}/*.parquet"))
    assert n_z >= 8 and n_l >= 8

    # selective filter on y (10/200 of the domain)
    z_y, l_y = files_hit(zpath, "y", 10, 19), files_hit(lpath, "y", 10, 19)
    # x-sorted layout: y spans the full domain in every file -> no skip
    assert l_y == n_l
    # z-ordered: files cover hyper-rectangles -> most files skip
    assert z_y <= n_z // 2
    # and x stays prunable too (z-order trades a LITTLE x-locality,
    # not all of it)
    z_x = files_hit(zpath, "x", 10, 19)
    assert z_x <= n_z // 2


def test_zordered_write_preserves_data(spark, grid_df, tmp_path):
    path = str(tmp_path / "z2")
    write_zordered(grid_df, path, ["x", "y"], num_files=8)
    back = spark.read.parquet(path)
    assert back.count() == 40_000
    assert sorted(back.columns) == ["payload", "x", "y"]
    assert back.agg(F.sum("payload")).collect()[0][0] == sum(range(40_000))
    # a selective 2-D box returns exactly the grid cells inside it
    got = back.filter((F.col("x").between(10, 19)) & (F.col("y").between(10, 19))).count()
    assert got == 100


def test_zorder_handles_dates_and_nulls(spark, tmp_path):
    df = spark.range(1000).select(
        F.when(F.col("id") % 7 == 0, None).otherwise(F.col("id") % 50).alias("x"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 365).cast("int")).alias("d"),
    )
    keyed = with_zorder_key(df, ["x", "d"], bits=8)
    assert keyed.filter(F.col("_zorder").isNull()).count() == 0
    assert keyed.count() == 1000


def test_polygon_centroid(spark):
    from pipelines_spark.functions.geo import polygon_centroid, rect_ring

    # rectangle centroid = its center, any winding
    row = spark.range(1).select(
        polygon_centroid(rect_ring(F.lit(2.0), F.lit(1.0), F.lit(6.0), F.lit(5.0))).alias("c")
    ).collect()[0]["c"]
    assert (row["x"], row["y"]) == (4.0, 3.0)

    # L-shaped (non-convex) polygon: area-weighted centroid, not the
    # vertex mean. L = 2x2 square + 1x2 tab -> centroid known
    pts = [(0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0), (1.0, 2.0), (0.0, 2.0)]
    ring = F.array(*[F.struct(F.lit(x).alias("x"), F.lit(y).alias("y")) for x, y in pts])
    row = spark.range(1).select(polygon_centroid(ring).alias("c")).collect()[0]["c"]
    # area = 3; centroid = (sum of piece centroids weighted): square
    # [0,1]x[0,2] area2 c=(0.5,1.0); tab [1,2]x[0,1] area1 c=(1.5,0.5)
    assert abs(row["x"] - (2 * 0.5 + 1 * 1.5) / 3) < 1e-9
    assert abs(row["y"] - (2 * 1.0 + 1 * 0.5) / 3) < 1e-9

    # degenerate (collinear) ring falls back to the vertex mean
    line = F.array(*[F.struct(F.lit(float(i)).alias("x"), F.lit(0.0).alias("y")) for i in range(3)])
    row = spark.range(1).select(polygon_centroid(line).alias("c")).collect()[0]["c"]
    assert (row["x"], row["y"]) == (1.0, 0.0)
