"""F11/A13/P10 map restructure unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yfinance_etl_spark.operators.maps import explode_filled, map_total, weights_map


def test_weights_map_builds_sorted_entries(spark):
    rows = [("f1", "b", 0.4), ("f1", "a", 0.6), ("f2", "a", 1.0)]
    df = spark.createDataFrame(rows, "fund string, sector string, w double")
    got = {r.fund: r.weights for r in weights_map(df, "fund", "sector", "w").collect()}
    assert got["f1"] == {"a": 0.6, "b": 0.4}
    assert got["f2"] == {"a": 1.0}


def test_map_total_exact_sum(spark):
    df = spark.createDataFrame([("f", {"a": 0.1, "b": 0.2, "c": 0.7},)], "fund string, weights map<string,double>")
    got = df.select(map_total("weights").alias("t")).collect()[0].t
    assert got == pytest.approx(1.0, abs=1e-15)


def test_explode_filled_fills_missing_keys(spark):
    maps = spark.createDataFrame(
        [("f1", {"a": 0.6, "b": 0.4}), ("f2", {"a": 1.0})],
        "fund string, weights map<string,double>",
    )
    grid = spark.createDataFrame(
        [(f, s) for f in ("f1", "f2") for s in ("a", "b")], "fund string, sector string"
    )
    got = {
        (r.fund, r.sector): r.w
        for r in explode_filled(maps, grid, "fund", "sector").collect()
    }
    assert got == {("f1", "a"): 0.6, ("f1", "b"): 0.4, ("f2", "a"): 1.0, ("f2", "b"): 0.0}
