"""Window-function family (SURVEY.md §2.5, W1-W8).

The reference's per-ticker, date-ordered pandas ops become Spark window specs
``Window.partitionBy(key).orderBy(date)``. On the driver testdata the "ticker"
is ``l_suppkey`` and the "price" is the per-(supplier, ship-date) daily bar —
(supplier, date) is not unique in raw lineitem, so we aggregate to daily bars
first; that also makes every window ordering deterministic (unique sort key).

Scale note: all of these shuffle once on the partition key and then run as a
single sort-based window stage. Partition count = number of distinct keys'
hash buckets, so skew lives in the hottest ticker; for real 100 TB price data
the key cardinality (instruments) is large and balanced. None of these ops
collect to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from yfinance_etl_spark.functions.scalar import dsum


def daily_bars(
    lineitem: DataFrame,
    key: str = "l_suppkey",
    date: str = "l_shipdate",
    value: str = "l_extendedprice",
) -> DataFrame:
    """Collapse raw lineitem to one bar per (key, date): price = mean value.

    Mirrors the OHLCV daily-bar shape of the reference's yfinance download
    (src/interface/yfinance_client.py:15-29, interval='1d'). The mean goes
    through an exact decimal sum so the result is order/partition insensitive.
    """
    return lineitem.groupBy(
        F.col(key).alias("suppkey"), F.col(date).cast("date").alias("ddate")
    ).agg(
        (dsum(value) / F.count(F.lit(1))).alias("price"),
        dsum("l_quantity").alias("qty"),
        # carried so market-wide aggregates (the benchmark series) can be
        # derived FROM the bars — one lineitem scan for the whole suite,
        # not one per consumer
        dsum(value).alias("vsum"),
        F.count(F.lit(1)).alias("n_items"),
    )


def series_window(key: str = "suppkey", date: str = "ddate") -> WindowSpec:
    return Window.partitionBy(key).orderBy(date)


def with_return(bars: DataFrame, w: WindowSpec | None = None) -> DataFrame:
    """W1: pct_change — (x - lag(x)) / lag(x) (reference streamlit_app.py:351).

    try_divide, not `/`: under the session's ANSI-on default a single
    zero price would abort the whole job; NULL matches both pandas
    pct_change-over-zero being inf-free garbage anyway and DuckDB's x/0."""
    w = w or series_window()
    return bars.withColumn(
        "r", F.try_divide(F.col("price"), F.lag("price", 1).over(w)) - 1
    )


def with_running_max(bars: DataFrame, w: WindowSpec | None = None) -> DataFrame:
    """W2: cummax (reference streamlit_app.py:356-357)."""
    w = (w or series_window()).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return bars.withColumn("run_max", F.max("price").over(w))


def with_drawdown(bars: DataFrame) -> DataFrame:
    """W2 + arithmetic: (price - cummax) / cummax (reference streamlit_app.py:357)."""
    return with_running_max(bars).withColumn(
        "drawdown",
        F.try_divide(F.col("price") - F.col("run_max"), F.col("run_max")),
    )


def with_cum_return(rets: DataFrame, w: WindowSpec | None = None) -> DataFrame:
    """W3: cumulative return (1+r).cumprod() - 1 (reference streamlit_app.py:330-333).

    Spark has no cumprod; the log-sum-exp identity exp(Σ log1p(r)) - 1 turns it
    into a cumulative SUM window, which IS native. Exact for r > -1 (prices > 0).
    Rows with null r (the pct_change leading null) are excluded first, matching
    the reference's dropna-before-cumprod.
    """
    w = (w or series_window()).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return rets.filter(F.col("r").isNotNull()).withColumn(
        "cum_return", F.exp(F.sum(F.log1p("r")).over(w)) - 1
    )


def with_sma(bars: DataFrame, n: int = 20, w: WindowSpec | None = None) -> DataFrame:
    """W4: rolling mean with min_periods=n null semantics
    (reference streamlit_app.py:522, rolling(50).mean()).

    The frame average goes through an exact decimal sum (deterministic across
    engines); rows before the window is full get NULL, like pandas min_periods.
    """
    base = w or series_window()
    frame = base.rowsBetween(-(n - 1), Window.currentRow)
    sma = F.sum(F.col("price").cast("decimal(38,12)")).over(frame).cast("double") / n
    return bars.withColumn(
        "sma", F.when(F.row_number().over(base) >= n, sma)
    )


def with_trend_flag(bars: DataFrame, w: WindowSpec | None = None) -> DataFrame:
    """W6 + P8: uptrend = price > lag(price) (reference streamlit_app.py:524-525)."""
    w = w or series_window()
    return bars.withColumn("uptrend", F.col("price") > F.lag("price", 1).over(w))


def with_lookback(bars: DataFrame, offsets: dict[str, int], w: WindowSpec | None = None) -> DataFrame:
    """W7/A10: positional (row-count, not calendar) lookback returns
    (reference streamlit_app.py:411-422: iloc[-756]/iloc[-1260]).

    For each named offset n adds ``price / lag(price, n) - 1`` (NULL when the
    series is shorter than n rows — the reference's NaN branch).
    """
    w = w or series_window()
    out = bars
    for name, n in offsets.items():
        out = out.withColumn(
            name, F.try_divide(F.col("price"), F.lag("price", n).over(w)) - 1
        )
    return out
