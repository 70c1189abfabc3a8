"""Aggregation-family semantics (SURVEY §2.4) vs the reference's exact pandas
formulas (streamlit_app.py:349-462), including the ddof quirks: sample std for
volatility (A2) but POPULATION std for tracking error (A6) and downside
deviation (A7); Sortino's mean over ALL excess rows vs std over negatives only."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from yfinance_etl_spark.operators import metrics as M
from yfinance_etl_spark.operators import windows as W

PRICES = [100.0, 103.0, 101.0, 104.0, 102.0, 108.0, 107.0, 111.0]
BENCH = [50.0, 50.5, 50.2, 51.0, 50.8, 52.0, 51.9, 52.6]


def _rets_frame(spark):
    rows = []
    d = dt.date(2024, 1, 1)
    for p in PRICES:
        rows.append((7, d, p, 1.0))
        d += dt.timedelta(days=1)
    bars = spark.createDataFrame(rows, "suppkey bigint, ddate date, price double, qty double")
    return W.with_drawdown(W.with_return(bars))


def test_risk_metrics_match_reference_formulas(spark):
    row = M.risk_metrics(_rets_frame(spark)).collect()[0]
    s = pd.Series(PRICES)
    r = s.pct_change().dropna()
    assert row.n_days == len(PRICES)
    assert row.ann_return == pytest.approx(round(r.mean() * 252, 6), abs=1e-6)
    # volatility is SAMPLE std (pandas .std() ddof=1, streamlit_app.py:353)
    assert row.volatility == pytest.approx(round(r.std(ddof=1) * np.sqrt(252), 6), abs=1e-6)
    assert row.sharpe == pytest.approx(
        round((r.mean() * 252) / (r.std(ddof=1) * np.sqrt(252)), 6), abs=1e-6
    )
    assert row.period_return == pytest.approx(round(s.iloc[-1] / s.iloc[0] - 1, 6), abs=1e-6)
    dd = (s - s.cummax()) / s.cummax()
    assert row.max_drawdown == pytest.approx(round(dd.min(), 6), abs=1e-6)


def test_benchmark_metrics_pop_std_and_closed_form_ols(spark):
    r = pd.Series(PRICES).pct_change().dropna().to_numpy()
    b = pd.Series(BENCH).pct_change().dropna().to_numpy()
    joined = spark.createDataFrame(
        [(7, float(x), float(y)) for x, y in zip(r, b)], "suppkey bigint, r double, b double"
    )
    row = M.benchmark_relative_metrics(joined).collect()[0]
    # tracking error uses np.std ddof=0 (streamlit_app.py:368)
    te = np.std(r - b) * np.sqrt(252)
    assert row.tracking_error == pytest.approx(round(te, 6), abs=1e-6)
    # OLS closed form == statsmodels OLS with intercept (streamlit_app.py:436-442)
    beta, alpha_daily = np.polyfit(b, r, 1)
    assert row.beta == pytest.approx(round(beta, 6), abs=1e-6)
    assert row.alpha == pytest.approx(round(alpha_daily * 252, 6), abs=1e-6)
    r2 = np.corrcoef(r, b)[0, 1] ** 2
    assert row.r_squared == pytest.approx(round(r2, 6), abs=1e-6)


def test_sortino_asymmetry_mean_all_std_negative(spark):
    row = M.sortino_metrics(_rets_frame(spark)).collect()[0]
    r = pd.Series(PRICES).pct_change().dropna().to_numpy()
    excess = r - 0.01 / 252
    neg = excess[excess < 0]
    # mean over ALL rows, pop-std over NEGATIVE subset (streamlit_app.py:374-381)
    assert row.mean_excess == pytest.approx(round(excess.mean(), 8), abs=1e-8)
    assert row.downside_dev == pytest.approx(round(np.std(neg), 8), abs=1e-8)
    assert row.sortino == pytest.approx(
        round(excess.mean() / np.std(neg) * np.sqrt(252), 6), abs=1e-6
    )


def test_sketch_accuracy_vs_exact(spark):
    # sketch_profile's guarantees vs the exact baseline: HLL++ rsd=0.02
    # (assert within 5 sigma) and GK percentile accuracy=10000 (rank error
    # <= n/10000, assert value within 1% here)
    from yfinance_etl_spark.plans.queries import REGISTRY

    sf = "/root/testdata/sf0.01"
    exact = {
        r["o_orderpriority"]: r
        for r in REGISTRY["order_value_quantiles"].fn(spark, sf).collect()
    }
    approx = {
        r["o_orderpriority"]: r
        for r in REGISTRY["sketch_profile"].fn(spark, sf).collect()
    }
    assert exact.keys() == approx.keys()
    for k in exact:
        e, a = exact[k], approx[k]
        assert abs(a["approx_customers"] - e["n_customers"]) <= 0.10 * e["n_customers"]
        assert abs(a["approx_p50"] - e["p50"]) <= 0.01 * e["p50"]
        assert abs(a["approx_p99"] - e["p99"]) <= 0.01 * e["p99"]


def test_pairwise_correlation_matches_pandas(spark):
    # Pearson corr of two fixed return series == pandas .corr() to 1e-9
    from yfinance_etl_spark.operators.metrics import pairwise_correlation

    xs = [0.01, -0.02, 0.015, 0.03, -0.01, 0.005, -0.025, 0.02]
    ys = [0.02, -0.01, 0.005, 0.025, -0.02, 0.01, -0.015, 0.01]
    rows = [
        (t, d, r)
        for d, (x, y) in enumerate(zip(xs, ys))
        for t, r in ((1, x), (2, y))
    ]
    rets = spark.createDataFrame(rows, "suppkey int, ddate int, r double")
    out = pairwise_correlation(rets).collect()
    assert len(out) == 1 and out[0]["t1"] == 1 and out[0]["t2"] == 2
    expected = pd.Series(xs).corr(pd.Series(ys))
    assert abs(out[0]["corr"] - round(expected, 6)) < 1e-9
    assert out[0]["n_days"] == 8


def test_kmv_estimator_error_bound_and_small_group_exactness(spark):
    # KMV with k=256: standard error 1/sqrt(k) ~ 6%; pin a 3-sigma bound
    # at sf0.01, and exactness when a group has fewer than k distinct keys
    # (the estimator then returns the true count by construction)
    from pyspark.sql import functions as F

    from yfinance_etl_spark.plans.queries import REGISTRY

    est = {
        r.o_orderpriority: r.kmv_customers
        for r in REGISTRY["kmv_distinct"].fn(spark, "/root/testdata/sf0.01").collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for p, n in exact.items():
        assert abs(est[p] - n) / n <= 0.2, (p, est[p], n)

    small_est = {
        r.o_orderpriority: r.kmv_customers
        for r in REGISTRY["kmv_distinct"].fn(spark, "/root/testdata/sf0.001").collect()
    }
    small_exact = {
        r.o_orderpriority: r.n
        for r in spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    for p, n in small_exact.items():
        if n < 256:
            assert small_est[p] == float(n), (p, small_est[p], n)


def test_ansi_zero_divisors_yield_null_not_job_abort(spark):
    # this session runs Spark 4's ANSI default, where x/0 aborts the whole
    # job; each shape below has a genuinely-zero divisor on real data and
    # must yield NULL (what the DuckDB oracle computes for x/0) instead
    # one return only (two bars): n-1 == 0 for volatility
    one_ret = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), 10.0, None, 0.0),
         (1, dt.date(2024, 1, 2), 11.0, 0.1, 0.0)],
        "suppkey bigint, ddate date, price double, r double, drawdown double",
    )
    row = M.risk_metrics(one_ret).collect()[0]
    assert row.volatility is None and row.sharpe is None
    assert row.ann_return is not None  # the mean itself is fine

    # constant series: variance exactly 0 -> sharpe NULL, volatility 0
    const = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1 + i), 10.0, 0.0, 0.0) for i in range(5)],
        "suppkey bigint, ddate date, price double, r double, drawdown double",
    )
    row = M.risk_metrics(const).collect()[0]
    assert row.volatility == 0.0 and row.sharpe is None

    # constant benchmark: var_b == 0 -> beta/alpha/r2 NULL, te still real
    joined = spark.createDataFrame(
        [(1, 0.01, 0.0), (1, -0.02, 0.0), (1, 0.005, 0.0)],
        "suppkey bigint, r double, b double",
    )
    row = M.benchmark_relative_metrics(joined).collect()[0]
    assert row.beta is None and row.alpha is None and row.r_squared is None
    assert row.tracking_error is not None

    # single negative excess return: downside variance exactly 0
    neg_once = spark.createDataFrame(
        [(1, 0.5), (1, 0.6), (1, -1.0)],
        "suppkey bigint, r double",
    )
    row = M.sortino_metrics(neg_once).collect()[0]
    assert row.downside_dev == 0.0 and row.sortino is None

    # one ticker constant over the aligned dates: corr with it is NULL
    rets = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1 + i), 0.01 * (i - 1)) for i in range(3)]
        + [(2, dt.date(2024, 1, 1 + i), 0.0) for i in range(3)],
        "suppkey bigint, ddate date, r double",
    )
    row = M.pairwise_correlation(rets).collect()[0]
    assert row.corr is None


def test_winsorized_stats_hand_computed(spark):
    from yfinance_etl_spark.operators.metrics import winsorized_stats

    # group g: values 0..10 plus an outlier 1000. p05/p95 (linear interp
    # over sorted 12 values): lo = 0.05*11 = 0.55, hi = values[10] +
    # 0.45*(1000-10) = 455.5 — the outlier clips to hi, the 0 clips to lo
    rows = [("g", float(v)) for v in range(11)] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, "grp string, x double")
    out = winsorized_stats(df, "grp", "x", 0.05, 0.95).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_rows, r.n_clipped_low, r.n_clipped_high) == (12, 1, 1)
    lo = 0.05 * 11  # interpolated p05 over 0..10,1000
    hi = sorted([float(v) for v in range(11)] + [1000.0])[10] + 0.45 * (1000.0 - 10.0)
    vals = [min(max(float(v), lo), hi) for v in range(11)] + [hi]
    import math
    assert r.robust_mean == round(math.fsum(vals) / 12, 6)


def test_winsorized_stats_broadcasts_bounds(spark):
    from yfinance_etl_spark.operators.metrics import winsorized_stats

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(50)] + [("b", float(i * 2)) for i in range(50)],
        "grp string, x double",
    )
    plan = (
        winsorized_stats(df, "grp", "x")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the bounds join must be broadcast — a shuffled join would move the
    # fact table an extra time for a group-cardinality-sized dimension
    assert "BroadcastHashJoin" in plan
