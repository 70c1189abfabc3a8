"""Z-order layout (operators/layout.py): curve arithmetic and the measured
file-pruning payoff from written parquet footers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yfinance_etl_spark.operators.layout import (
    files_intersecting_box,
    write_zordered,
    zorder_value,
)


def _grid(spark, side=64):
    # full uniform (x, y) grid: every combination exactly once, so the
    # linear-vs-zorder comparison has no data-skew alibi
    return spark.range(side * side).select(
        (F.col("id") % side).cast("int").alias("x"),
        (F.col("id") / side).cast("int").alias("y"),
    )


def test_zorder_value_known_points(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "x int, y int"
    )
    got = [
        r.z
        for r in df.select(zorder_value("x", "y", 16).alias("z"))
        .orderBy("x", "y")
        .collect()
    ]
    # interleave(x=3, y=5): x bits 0,1 -> z bits 0,2; y bits 0,2 -> z bits 1,5
    assert got == [0, 0b10, 1, 0b100111, (1 << 32) - 1]


def test_zorder_bits_bounds():
    with pytest.raises(ValueError, match="bits"):
        zorder_value("x", "y", 0)
    with pytest.raises(ValueError, match="bits"):
        zorder_value("x", "y", 32)


def test_zorder_layout_prunes_cross_dimension_boxes(spark, tmp_path):
    """The measured claim: on the same data, same file count, and the
    same write cost (one range shuffle either way), a y-selective box
    must read EVERY file of an x-sorted linear layout but only a corner
    of the z-ordered one — judged by the parquet footer min/max that
    real scan skipping consults."""
    df = _grid(spark)
    linear = str(tmp_path / "linear")
    (
        df.repartitionByRange(8, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zordered = str(tmp_path / "zordered")
    write_zordered(df, "x", "y", zordered, n_files=8, bits=6)

    # box selective in y only (x unconstrained): the linear layout's
    # nemesis — every x-range file contains all y values
    box = dict(xcol="x", xr=(0, 63), ycol="y", yr=(0, 7))
    lin_hit, lin_total = files_intersecting_box(linear, **box)
    z_hit, z_total = files_intersecting_box(zordered, **box)
    assert lin_total == z_total == 8
    assert lin_hit == 8  # linear layout cannot prune a y-box at all
    assert z_hit < lin_hit  # z-order prunes the same query on the same data
    # and the symmetric x-box still prunes too (no dimension is sacrificed)
    xbox = dict(xcol="x", xr=(0, 7), ycol="y", yr=(0, 63))
    zx_hit, _ = files_intersecting_box(zordered, **xbox)
    assert zx_hit < 8


def test_zorder_write_preserves_rows_and_schema(spark, tmp_path):
    df = _grid(spark, side=16)
    out = str(tmp_path / "z")
    write_zordered(df, "x", "y", out, n_files=4, bits=4)
    back = spark.read.parquet(out)
    assert back.columns == ["x", "y"]  # transient zval column dropped
    assert back.count() == 256
    assert back.select(F.sum("x").cast("long").alias("s")).first().s == df.select(
        F.sum("x").cast("long").alias("s")
    ).first().s
