"""Window-family semantics (SURVEY §2.5 W1-W8) on tiny literal frames,
pinning the reference's pandas quirks: pct_change leading null, min_periods
nulls for SMA, row-count (not calendar) lookbacks, cummax drawdown."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd
import pytest

from yfinance_etl_spark.operators import windows as W


def _bars(spark, prices: dict[int, list[float]]):
    """Build a bars frame: one row per (suppkey, consecutive weekday)."""
    rows = []
    for key, series in prices.items():
        d = dt.date(2024, 1, 1)
        for p in series:
            rows.append((key, d, float(p), 1.0))
            d += dt.timedelta(days=1)
    return spark.createDataFrame(rows, "suppkey bigint, ddate date, price double, qty double")


PRICES = [100.0, 102.0, 99.0, 99.0, 105.0, 101.0]


def test_pct_change_leading_null(spark):
    out = (
        W.with_return(_bars(spark, {1: PRICES}))
        .orderBy("ddate")
        .select("r")
        .collect()
    )
    rs = [row.r for row in out]
    assert rs[0] is None  # pandas pct_change leading NaN (streamlit_app.py:351)
    expected = pd.Series(PRICES).pct_change().tolist()
    for got, exp in zip(rs[1:], expected[1:]):
        assert got == pytest.approx(exp, rel=1e-12)


def test_drawdown_matches_cummax_formula(spark):
    out = W.with_drawdown(_bars(spark, {1: PRICES})).orderBy("ddate").collect()
    s = pd.Series(PRICES)
    expected = ((s - s.cummax()) / s.cummax()).tolist()
    for row, exp in zip(out, expected):
        assert row.drawdown == pytest.approx(exp, rel=1e-12)
    assert min(r.drawdown for r in out) == pytest.approx(min(expected))  # 101 after 105


def test_cum_return_matches_cumprod(spark):
    out = W.with_cum_return(W.with_return(_bars(spark, {1: PRICES}))).orderBy("ddate").collect()
    r = pd.Series(PRICES).pct_change().dropna()
    expected = ((1 + r).cumprod() - 1).tolist()
    assert len(out) == len(expected)  # leading-null row dropped pre-cumprod
    for row, exp in zip(out, expected):
        assert row.cum_return == pytest.approx(exp, rel=1e-12)


def test_sma_min_periods_nulls(spark):
    out = W.with_sma(_bars(spark, {1: PRICES}), n=3).orderBy("ddate").collect()
    smas = [row.sma for row in out]
    assert smas[0] is None and smas[1] is None  # window not yet full → NULL
    expected = pd.Series(PRICES).rolling(3).mean().tolist()
    for got, exp in zip(smas[2:], expected[2:]):
        assert got == pytest.approx(exp, rel=1e-12)


def test_lookback_null_when_series_too_short(spark):
    out = (
        W.with_lookback(_bars(spark, {1: PRICES}), {"r_3": 3, "r_10": 10})
        .orderBy(W.F.desc("ddate"))
        .limit(1)
        .collect()[0]
    )
    assert out.r_3 == pytest.approx(PRICES[-1] / PRICES[-4] - 1)
    assert out.r_10 is None  # series shorter than offset → reference's NaN branch


def test_trend_flag_lag_compare(spark):
    out = W.with_trend_flag(_bars(spark, {1: PRICES})).orderBy("ddate").collect()
    flags = [row.uptrend for row in out]
    assert flags[0] is None  # no previous row
    assert flags[1:] == [True, False, False, True, False]


def test_single_row_group_all_windows_null_safe(spark):
    bars = _bars(spark, {1: [50.0]})
    row = W.with_lookback(
        W.with_trend_flag(W.with_sma(W.with_drawdown(W.with_return(bars)), n=3)),
        {"r_5": 5},
    ).collect()[0]
    assert row.r is None and row.sma is None and row.uptrend is None and row.r_5 is None
    assert row.drawdown == 0.0  # price == own cummax


def test_daily_bars_mean_price_per_key_date(spark):
    li = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1), 10.0, 2.0),
            (1, dt.datetime(2024, 1, 1), 20.0, 3.0),
            (1, dt.datetime(2024, 1, 2), 30.0, 1.0),
        ],
        "l_suppkey bigint, l_shipdate timestamp, l_extendedprice double, l_quantity double",
    )
    out = {(r.suppkey, r.ddate): (r.price, r.qty) for r in W.daily_bars(li).collect()}
    assert out[(1, dt.date(2024, 1, 1))] == (15.0, 5.0)
    assert out[(1, dt.date(2024, 1, 2))] == (30.0, 1.0)


def test_zero_price_yields_null_return_not_job_abort(spark):
    # ANSI-on Spark aborts on /0: one zero price in a series must produce
    # NULL pct-change/drawdown/lookback rows, not kill the job
    import datetime as dt

    from pyspark.sql import functions as F

    from yfinance_etl_spark.operators.windows import (
        with_drawdown,
        with_lookback,
        with_return,
    )

    bars = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), 0.0), (1, dt.date(2024, 1, 2), 10.0),
         (1, dt.date(2024, 1, 3), 12.0)],
        "suppkey bigint, ddate date, price double",
    )
    rows = sorted(with_return(bars).collect(), key=lambda r: r.ddate)
    assert rows[0].r is None      # no lag
    assert rows[1].r is None      # 10 / 0 -> NULL, not DIVIDE_BY_ZERO
    assert rows[2].r == pytest.approx(0.2)

    zero_max = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), 0.0)], "suppkey bigint, ddate date, price double"
    )
    assert with_drawdown(zero_max).collect()[0].drawdown is None

    lb = sorted(
        with_lookback(bars, {"r_1": 1}).collect(), key=lambda r: r.ddate
    )
    assert lb[1].r_1 is None and lb[2].r_1 is not None
