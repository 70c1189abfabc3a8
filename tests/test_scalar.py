"""Scalar expression library (SURVEY §2.8 F1-F13) — previously dead code,
now pinned by both these tests and the scalar_profile registry query."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from yfinance_etl_spark.functions.scalar import (
    clean_ticker,
    coalesce_default,
    date_str,
    davg,
    dsum,
    parse_pct,
    parse_ticker_list,
    sentiment_bucket,
    status_label,
)


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0].v


def test_clean_ticker_upper_trim(spark):
    df = spark.createDataFrame([("  spy ",), ("qqq",)], "t string")
    assert [r.v for r in df.select(clean_ticker("t").alias("v")).collect()] == ["SPY", "QQQ"]


def test_date_str_format(spark):
    df = spark.createDataFrame([(dt.datetime(2024, 3, 7, 15, 30),)], "ts timestamp")
    assert df.select(date_str("ts").alias("v")).collect()[0].v == "2024-03-07"


def test_parse_pct_strips_decorations(spark):
    df = spark.createDataFrame([("12.5%",), ("$1,234.50",), ("3.2B",), ("bad",)], "s string")
    got = [r.v for r in df.select(parse_pct("s").alias("v")).collect()]
    assert got == [12.5, 1234.5, 3.2, None]


def test_coalesce_default(spark):
    df = spark.createDataFrame([(None,), (7.0,)], "x double")
    assert [r.v for r in df.select(coalesce_default("x", 0.0).alias("v")).collect()] == [0.0, 7.0]


def test_parse_ticker_list_hof(spark):
    df = spark.createDataFrame([("spy, qqq , ,vti",), ("",)], "s string")
    got = [r.v for r in df.select(parse_ticker_list("s").alias("v")).collect()]
    assert got == [["SPY", "QQQ", "VTI"], []]


def test_sentiment_bucket_thresholds(spark):
    df = spark.createDataFrame([(0.2,), (0.1,), (-0.1,), (-0.3,)], "s double")
    got = [r.v for r in df.select(sentiment_bucket("s").alias("v")).collect()]
    # >0.1 positive, <-0.1 negative, boundary values are neutral (streamlit_app.py:272-273)
    assert got == ["positive", "neutral", "neutral", "negative"]


def test_status_label_case_chain(spark):
    df = spark.createDataFrame([("critical",), ("warning",), ("good",), ("other",)], "s string")
    got = [r.v for r in df.select(status_label("s").alias("v")).collect()]
    assert got == ["[CRIT] critical", "[WARN] warning", "[OK] good", "[INFO] other"]


def test_dsum_is_partitioning_insensitive(spark):
    # 0.1 is inexact in binary; naive double sums differ across orders, the
    # decimal path must not.
    vals = [(0.1,)] * 1000 + [(1e15,), (-1e15,)]
    a = spark.createDataFrame(vals, "x double").repartition(1)
    b = spark.createDataFrame(list(reversed(vals)), "x double").repartition(7)
    sa = a.agg(dsum("x").alias("s")).collect()[0].s
    sb = b.agg(dsum("x").alias("s")).collect()[0].s
    assert sa == sb == 100.0


def test_davg(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (None,)], "x double")
    assert df.agg(davg("x").alias("v")).collect()[0].v == 1.5


def test_tz_conversion_dst_edges(spark):
    """F3: Spark and the DuckDB oracle agree on every unambiguous local
    time INCLUDING the nonexistent spring-forward hour; the ambiguous
    fall-back hour is the ONE documented divergence (Spark → earlier/DST
    offset, DuckDB → later/standard offset), pinned here so a tzdb or
    engine upgrade that shifts it is caught."""
    import duckdb

    from pyspark.sql import functions as F

    locals_ = [
        "2024-01-15 12:00:00",  # winter (EST)
        "2024-07-15 12:00:00",  # summer (EDT)
        "2024-03-10 02:30:00",  # nonexistent (spring forward)
        "2024-11-03 01:30:00",  # ambiguous (fall back)
    ]
    df = spark.createDataFrame([(t,) for t in locals_], "t string")
    got = {
        r.t: r.u
        for r in df.select(
            "t",
            F.to_utc_timestamp(F.col("t").cast("timestamp_ntz"), "America/New_York").alias("u"),
        ).collect()
    }
    duck = {
        t: duckdb.sql(
            f"SELECT timezone('UTC', timezone('America/New_York', TIMESTAMP '{t}'))"
        ).fetchone()[0]
        for t in locals_
    }
    for t in locals_[:3]:
        assert got[t] == duck[t], t
    # the ambiguous hour: engines differ by exactly the DST offset
    amb = locals_[3]
    assert got[amb].hour == 5 and duck[amb].hour == 6
