"""Aggregation family (SURVEY.md §2.4, A1-A14): the reference's 14-metric
``calculate_metrics`` (streamlit_app.py:349-462) as ONE ``groupBy(key).agg(...)``
pass — partial + final hash aggregation, no driver-side loops, no N+1 fetches.

Statistical aggregates (variance, covariance, correlation) are expressed as
*moment sums*: Σx, Σx², Σxy, n — each an exact decimal sum — then combined in
closed form. Two reasons:

1. Determinism: streaming variance (Welford) visits rows in engine-specific
   order; moment sums through decimals are order-insensitive, so Spark and the
   DuckDB oracle agree bit-for-bit (before the final 6-dp rounding).
2. Scale: moment sums are plain partial-aggregable SUMs — one shuffle of tiny
   partial states per group, identical cost profile to the built-ins.

This also demonstrates SURVEY A11/L9: the reference's per-ticker statsmodels OLS
(streamlit_app.py:424-442) is a closed-form aggregate — beta = cov(r,b)/var(b),
alpha = (E[r] − beta·E[b])·252, R² = corr(r,b)² — no UDAF, no Python in the path.

The reference's ddof quirks are preserved on purpose (SURVEY §7 watch list):
volatility uses *sample* std (pandas .std(), streamlit_app.py:353) while
tracking error and downside deviation use *population* std (np.std,
streamlit_app.py:368,377-379); Sortino's mean is over ALL excess rows but its
std is over the negative subset only (streamlit_app.py:374-381).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yfinance_etl_spark.functions.scalar import PRODUCT_SCALE, STAT_SCALE, dsum, r6

TRADING_DAYS = 252
RISK_FREE_DAILY = 0.01 / TRADING_DAYS


def _moments(x: Column) -> tuple[Column, Column, Column]:
    """(Σx, Σx², n) over non-null x, exact and order-insensitive."""
    return dsum(x, STAT_SCALE), dsum(x * x, STAT_SCALE), F.count(x)


def _div(num: Column, den: Column) -> Column:
    """ANSI-safe ratio: NULL on a zero divisor instead of the job-aborting
    DIVIDE_BY_ZERO this session's ANSI-on Spark 4 default raises. NULL is
    also exactly what the DuckDB oracle computes for x/0, so the guard
    IMPROVES parity; for nonzero divisors try_divide is bit-identical to
    `/` (same result type, decimals included). Zero divisors are real
    shapes here: a group with one return (n-1 = 0), a constant series
    (variance 0), a constant benchmark (var_b 0)."""
    return F.try_divide(num, den)


def _var_samp(s1: Column, s2: Column, n: Column) -> Column:
    return _div(s2 - s1 * s1 / n, n - 1)


def _var_pop(s1: Column, s2: Column, n: Column) -> Column:
    return (s2 - s1 * s1 / n) / n


def risk_metrics(rets: DataFrame, key: str = "suppkey") -> DataFrame:
    """A1-A5, A12, A14 over a returns frame (key, ddate, price, r, drawdown).

    One pass: annualized return (A1), annualized sample-std volatility (A2),
    Sharpe (A3), first/last period return (A4 via min_by/max_by on the unique
    date key), max drawdown (A5), row count (A14) — assembled in a single agg
    (A12).
    """
    s1, s2, n = _moments(F.col("r"))
    ann_ret = s1 / n * TRADING_DAYS
    vol = F.sqrt(_var_samp(s1, s2, n) * TRADING_DAYS)
    first_price = F.min_by("price", "ddate")
    last_price = F.max_by("price", "ddate")
    return rets.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_days"),
        r6(ann_ret).alias("ann_return"),
        r6(vol).alias("volatility"),
        r6(_div(ann_ret, vol)).alias("sharpe"),
        r6(_div(last_price, first_price) - 1).alias("period_return"),
        r6(F.min("drawdown")).alias("max_drawdown"),
    )


def benchmark_relative_metrics(joined: DataFrame, key: str = "suppkey") -> DataFrame:
    """A6 + A11 over a frame with per-row fund return ``r`` and benchmark
    return ``b``: tracking error (population std of r−b, annualized) and the
    OLS trio alpha/beta/R² as closed-form aggregates.
    """
    d = F.col("r") - F.col("b")
    ds1, ds2, dn = _moments(d)
    rs1, rs2, n = _moments(F.col("r"))
    bs1, bs2, _ = _moments(F.col("b"))
    srb = dsum(F.col("r") * F.col("b"), STAT_SCALE)
    cov = _div(srb - rs1 * bs1 / n, n - 1)
    var_b = _var_samp(bs1, bs2, n)
    var_r = _var_samp(rs1, rs2, n)
    beta = _div(cov, var_b)
    alpha = (rs1 / n - beta * (bs1 / n)) * TRADING_DAYS
    r2 = _div(cov * cov, var_r * var_b)
    te = F.sqrt(_var_pop(ds1, ds2, dn) * TRADING_DAYS)
    return joined.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_days"),
        r6(te).alias("tracking_error"),
        r6(beta).alias("beta"),
        r6(alpha).alias("alpha"),
        r6(r2).alias("r_squared"),
    )


def sortino_metrics(rets: DataFrame, key: str = "suppkey") -> DataFrame:
    """A7: Sortino with the reference's asymmetry kept intact — mean over ALL
    excess returns, population std over only the NEGATIVE excess returns
    (streamlit_app.py:374-381)."""
    excess = F.col("r") - F.lit(RISK_FREE_DAILY)
    neg = F.when(excess < 0, excess)
    es1, _, en = _moments(excess)
    ns1, ns2, nn = _moments(neg)
    mean_excess = es1 / en
    downside_std = F.sqrt(_var_pop(ns1, ns2, nn))
    return rets.filter(F.col("r").isNotNull()).groupBy(key).agg(
        r6(mean_excess, 8).alias("mean_excess"),
        r6(downside_std, 8).alias("downside_dev"),
        r6(_div(mean_excess, downside_std) * F.sqrt(F.lit(float(TRADING_DAYS)))).alias("sortino"),
    )


def pairwise_correlation(rets: DataFrame, key: str = "suppkey") -> DataFrame:
    """Pairwise return-correlation matrix (upper triangle) — the portfolio
    view behind the reference's columnwise return arithmetic (J4,
    streamlit_app.py:366): every ticker pair's Pearson correlation as one
    closed-form aggregate over a date-aligned self-join.

    Scale shape: the self-join keys on ddate only, so each date's k tickers
    fan out to k(k-1)/2 pair rows — quadratic in the WATCHED ticker count,
    linear in days. That is the right trade for portfolio-sized k (tens);
    for all-pairs over thousands of keys, route through the dedup/ANN
    family instead (embedding-cosine, operators/similarity.py).
    """
    a = rets.select(
        F.col(key).alias("t1"), "ddate", F.col("r").alias("x")
    ).where(F.col("x").isNotNull())
    b = rets.select(
        F.col(key).alias("t2"), "ddate", F.col("r").alias("y")
    ).where(F.col("y").isNotNull())
    pairs = a.join(b, "ddate").where(F.col("t1") < F.col("t2"))
    xs1, xs2, n = _moments(F.col("x"))
    ys1, ys2, _ = _moments(F.col("y"))
    sxy = dsum(F.col("x") * F.col("y"), STAT_SCALE)
    cov = sxy - xs1 * ys1 / n
    corr = _div(cov, F.sqrt((xs2 - xs1 * xs1 / n) * (ys2 - ys1 * ys1 / n)))
    return pairs.groupBy("t1", "t2").agg(
        n.alias("n_days"), r6(corr).alias("corr")
    )


def winsorized_stats(
    df: DataFrame,
    group: str,
    col: str,
    lo_p: float = 0.05,
    hi_p: float = 0.95,
) -> DataFrame:
    """Winsorized (quantile-clipped) robust mean per group: values below
    the group's ``lo_p`` quantile or above its ``hi_p`` quantile are
    clipped to the bound before averaging — the standard outlier-resistant
    aggregate for long-tailed money/metric columns.

    Two-pass shape: pass 1 is an exact ``percentile`` aggregate producing
    ONE (lo, hi) row per group — group-cardinality-sized, so it BROADCASTS
    back to the fact side (no fact shuffle for the join); pass 2 clips
    per-row (``greatest``/``least``, pure Catalyst) and aggregates with
    the exact-decimal sum. Total cost: two hash aggs on the same key + a
    broadcast — the fact table crosses the wire once per pass, never for
    the join. (Single-pass approximation with mergeable GK sketches is the
    ``sketch_profile`` family; this operator is the exact tier.)

    Exact ``percentile`` buffers each GROUP's values; with group counts in
    the millions use the sketch tier first to pre-clip. Bounds are used
    RAW (unrounded) for clipping — both engines interpolate quantiles
    bit-identically (linear interpolation, same as DuckDB quantile_cont;
    the order_value_quantiles precedent) — so the clipped per-row doubles
    are bit-equal. The SUM runs at PRODUCT_SCALE (6), not MONEY_SCALE:
    the interpolated bounds are not clean decimals and repeat across up
    to ~(lo_p + 1-hi_p) of each group's rows, so a scale-12 sum would let
    the engines' double→decimal conversion skew accumulate COHERENTLY
    (same 1e-12/row sign every time — the dividend_yield failure mode);
    the coarse grid snaps both engines to the same true decimal per row
    (scalar.PRODUCT_SCALE rationale; r9 advice).
    """
    x = F.col(col)
    bounds = df.groupBy(group).agg(
        F.percentile(x, F.lit(lo_p)).alias("__lo"),
        F.percentile(x, F.lit(hi_p)).alias("__hi"),
    )
    clipped = df.join(F.broadcast(bounds), group).withColumn(
        "__clip", F.least(F.greatest(x, F.col("__lo")), F.col("__hi"))
    )
    return clipped.groupBy(group).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((x < F.col("__lo")).cast("long")).alias("n_clipped_low"),
        F.sum((x > F.col("__hi")).cast("long")).alias("n_clipped_high"),
        F.round(
            dsum(F.col("__clip"), PRODUCT_SCALE) / F.count(F.lit(1)), 6
        ).alias("robust_mean"),
    )
