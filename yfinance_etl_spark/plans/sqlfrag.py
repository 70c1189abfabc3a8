"""SQL fragment builders shared by the DuckDB oracle strings in queries.py.

These mirror the determinism helpers in functions/scalar.py: every float
aggregate goes through an exact decimal sum and every float output is rounded,
so the oracle and the Spark plan agree bit-for-bit (see scalar.py docstring).
"""

from __future__ import annotations

MONEY_SCALE = 12
STAT_SCALE = 18


def dsum(x: str, scale: int = MONEY_SCALE) -> str:
    return f"CAST(SUM(CAST({x} AS DECIMAL(38,{scale}))) AS DOUBLE)"


PRODUCT_SCALE = 6


def dsum_r(x: str, places: int = 2, scale: int = PRODUCT_SCALE) -> str:
    """Decimal-space round of the exact sum, then cast to double — the
    oracle twin of scalar.dsum_r (see its docstring: the coarse per-row
    scale makes Spark's shortest-repr and DuckDB's exact-binary
    double→decimal casts agree, and rounding in decimal space avoids the
    double(x.xx5) half-boundary split)."""
    return f"CAST(ROUND(SUM(CAST({x} AS DECIMAL(38,{scale}))), {places}) AS DOUBLE)"


def davg(x: str, scale: int = MONEY_SCALE) -> str:
    return f"{dsum(x, scale)} / COUNT({x})"


#: daily price bars per supplier — the engine's OHLCV-analog series
#: (windows.daily_bars is the Spark twin)
BARS = f"""bars AS (
  SELECT l_suppkey AS suppkey,
         CAST(l_shipdate AS DATE) AS ddate,
         {dsum('l_extendedprice')} / COUNT(*) AS price,
         {dsum('l_quantity')} AS qty,
         {dsum('l_extendedprice')} AS vsum,
         COUNT(*) AS n_items
  FROM lineitem
  GROUP BY 1, 2
)"""

#: daily returns (W1 pct_change) over the bars
RETS = """rets AS (
  SELECT suppkey, ddate, price,
         price / LAG(price) OVER (PARTITION BY suppkey ORDER BY ddate) - 1 AS r
  FROM bars
)"""

#: market benchmark series: value-weighted mean price across ALL suppliers per
#: day, DERIVED FROM the bars CTE (decimal re-sum of the per-bar sums, so it
#: is order-insensitive and needs no second lineitem scan)
BENCH = """bench AS (
  SELECT ddate,
         CAST(SUM(CAST(vsum AS DECIMAL(38,12))) AS DOUBLE) / SUM(n_items) AS bprice
  FROM bars
  GROUP BY 1
),
bench_rets AS (
  SELECT ddate, bprice / LAG(bprice) OVER (ORDER BY ddate) - 1 AS b
  FROM bench
)"""
