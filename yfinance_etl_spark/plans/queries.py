"""Query registry: one named (Spark callable, DuckDB oracle SQL) pair per
implemented operator from SURVEY.md §2. Consumed by __spark_entry__.py.

Every callable takes (spark, sf_dir) → DataFrame; every oracle is ANSI SQL that
DuckDB runs on the same parquet tables. Column names/aliases match exactly on
both sides (the driver sorts columns by name before hashing). Float outputs are
rounded and aggregates flow through exact decimal sums — see
functions/scalar.py for why that makes the hash comparison robust.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yfinance_etl_spark.catalog import load_table
from yfinance_etl_spark.functions.scalar import STAT_SCALE, davg, dsum, r6
from yfinance_etl_spark.operators import metrics as M
from yfinance_etl_spark.operators import windows as W
from yfinance_etl_spark.plans import sqlfrag as S


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records a weaker rows-only check


REGISTRY: dict[str, Query] = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = Query(fn, oracle)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# M0 flagship: scan → daily bars → returns/drawdown windows → one risk agg
# (SURVEY W1+W2+A1-A5+A12+A14; reference calculate_metrics streamlit_app.py:349-462)
# ---------------------------------------------------------------------------

_FLAGSHIP_SQL = f"""
WITH {S.BARS},
rets AS (
  SELECT suppkey, ddate, price,
         price / LAG(price) OVER (PARTITION BY suppkey ORDER BY ddate) - 1 AS r,
         (price - MAX(price) OVER (PARTITION BY suppkey ORDER BY ddate
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         / MAX(price) OVER (PARTITION BY suppkey ORDER BY ddate
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS drawdown
  FROM bars
),
mom AS (
  SELECT suppkey,
         COUNT(*) AS n_days,
         {S.dsum('r', S.STAT_SCALE)} AS s1,
         {S.dsum('r * r', S.STAT_SCALE)} AS s2,
         COUNT(r) AS n,
         arg_min(price, ddate) AS first_price,
         arg_max(price, ddate) AS last_price,
         MIN(drawdown) AS min_dd
  FROM rets
  GROUP BY suppkey
)
SELECT suppkey,
       n_days,
       ROUND(s1 / n * 252, 6) AS ann_return,
       ROUND(SQRT((s2 - s1 * s1 / n) / (n - 1) * 252), 6) AS volatility,
       ROUND((s1 / n * 252) / SQRT((s2 - s1 * s1 / n) / (n - 1) * 252), 6) AS sharpe,
       ROUND(last_price / first_price - 1, 6) AS period_return,
       ROUND(min_dd, 6) AS max_drawdown
FROM mom
"""


@_register("flagship_risk", _FLAGSHIP_SQL)
def q_flagship_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = W.daily_bars(_t(spark, sf_dir, "lineitem"))
    rets = W.with_drawdown(W.with_return(bars))
    return M.risk_metrics(rets)


# ---------------------------------------------------------------------------
# A12/A14 + pushdown: TPC-H-Q1-style pricing summary (single multi-agg pass)
# (reference's 14-metric summary frame, streamlit_app.py:446-461)
# ---------------------------------------------------------------------------

_PRICING_SQL = f"""
SELECT l_returnflag, l_linestatus,
       ROUND({S.dsum('l_quantity')}, 2) AS sum_qty,
       ROUND({S.dsum('l_extendedprice')}, 2) AS sum_base_price,
       ROUND({S.dsum('l_extendedprice * (1 - l_discount)')}, 2) AS sum_disc_price,
       ROUND({S.dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}, 2) AS sum_charge,
       ROUND({S.davg('l_quantity')}, 6) AS avg_qty,
       ROUND({S.davg('l_extendedprice')}, 6) AS avg_price,
       ROUND({S.davg('l_discount', S.STAT_SCALE)}, 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@_register("pricing_summary", _PRICING_SQL)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        r6(dsum("l_quantity"), 2).alias("sum_qty"),
        r6(dsum("l_extendedprice"), 2).alias("sum_base_price"),
        r6(dsum(disc_price), 2).alias("sum_disc_price"),
        r6(dsum(charge), 2).alias("sum_charge"),
        r6(davg("l_quantity")).alias("avg_qty"),
        r6(davg("l_extendedprice")).alias("avg_price"),
        r6(davg("l_discount", STAT_SCALE)).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# O2 top-k: TakeOrderedAndProject, deterministic tiebreak on the unique key
# (reference newest-5-articles, streamlit_app.py:465,470)
# ---------------------------------------------------------------------------

_TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 5
"""


@_register("top_orders", _TOPK_SQL)
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(5)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# J1 join chain with broadcast dims (reference's benchmark/fund_info joins,
# streamlit_app.py:429-430 + N+1 metadata loop collapsed, :384-409)
# ---------------------------------------------------------------------------

_REVENUE_REGION_SQL = f"""
SELECT r_name,
       ROUND({S.dsum('l_extendedprice * (1 - l_discount)')}, 2) AS revenue,
       COUNT(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
"""


@_register("revenue_by_region", _REVENUE_REGION_SQL)
def q_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            r6(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# J2 semi-join (reference dividends⋉prices, streamlit_app.py:397)
# ---------------------------------------------------------------------------

_SEMI_SQL = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND({S.dsum('o_totalprice')}, 2) AS total_price
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
"""


@_register("orders_with_lineitems_semi", _SEMI_SQL)
def q_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r6(dsum("o_totalprice"), 2).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# anti-join (SURVEY §2.3 "not implemented in reference" — engine completeness)
# ---------------------------------------------------------------------------

_ANTI_SQL = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       ROUND({S.dsum('c_acctbal')}, 2) AS total_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


@_register("customers_without_urgent_orders_anti", _ANTI_SQL)
def q_customers_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            r6(dsum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )
