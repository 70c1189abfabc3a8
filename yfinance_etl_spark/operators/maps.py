"""Map-typed restructuring — SURVEY.md §2 S5 + F11 + A13 + P10.

The reference turns a fund's list-of-dicts sector weights into a keyed
mapping, explodes it for display, fills missing sectors with 0 across
funds, and guards on the weights summing to ~1
(streamlit_app.py:303-310; fund metadata scan S5). The engine analog uses
regions as funds and nations as sectors, weighted by order revenue:

* build:   groupBy fund → ``map_from_entries(sort_array(collect_list(
           struct(key, value))))`` — the list-of-dicts → map restructure
           (F11), deterministic entry order.
* explode: ``explode(weights)`` back to rows (the S5 scan shape).
* fill:    full fund×sector grid left-join + ``coalesce(w, 0)`` (P10).
* guard:   A13 sum-of-weights via a decimal-accumulator ``F.aggregate``
           HOF over ``map_values`` — exact, order-insensitive, JVM-side.

Scale: one shuffle builds the per-fund maps (5 regions → 5 rows); the
grid is a broadcast cross join of two dimension tables. Nothing here
touches the fact table twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yfinance_etl_spark.functions.scalar import r6


def weights_map(shares: DataFrame, fund: str, key: str, value: str) -> DataFrame:
    """F11: (fund, key, value) rows → one map<key,value> row per fund."""
    return shares.groupBy(fund).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct(F.col(key), F.col(value))))
        ).alias("weights")
    )


def map_total(weights: Column | str) -> Column:
    """A13 guard: exact sum of a map's values (decimal accumulator HOF)."""
    weights = F.col(weights) if isinstance(weights, str) else weights
    return F.aggregate(
        F.map_values(weights),
        F.lit(0).cast("decimal(38,18)"),
        # re-cast: Spark's decimal + rules widen (38,18)+(38,18) → (38,17),
        # which would break the accumulator type contract
        lambda acc, x: (acc + x.cast("decimal(38,18)")).cast("decimal(38,18)"),
    ).cast("double")


def explode_filled(
    maps: DataFrame, grid: DataFrame, fund: str, key: str, default: float = 0.0
) -> DataFrame:
    """Explode the maps and left-join onto the full fund×key grid so missing
    keys appear with ``default`` (the reference's fillna(0) across funds)."""
    # broadcast the EXPLODED side: for a left outer join Spark can only
    # build the right side, so a hint on the preserved grid side would be
    # silently dropped (HintErrorLogger) and the join would shuffle both
    # sides. The exploded frame is post-aggregation map entries — bounded
    # by grid cardinality, always broadcastable.
    exploded = F.broadcast(maps.select(fund, F.explode("weights").alias(key, "w")))
    return grid.join(exploded, [fund, key], "left").withColumn(
        "w", F.coalesce(F.col("w"), F.lit(default))
    )


def sector_weights(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Fund-metadata analog: per-region nation revenue weights, exploded
    over the full region×nation grid with the A13 total guard."""
    dims = F.broadcast(
        nation.join(region, nation["n_regionkey"] == region["r_regionkey"]).select(
            F.col("n_nationkey").alias("nationkey"),
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )
    rev = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(dims, F.col("c_nationkey") == F.col("nationkey"))
        .groupBy("region_name", "nation_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,12)")).cast("double").alias("nrev"))
    )
    reg = rev.groupBy("region_name").agg(
        F.sum(F.col("nrev").cast("decimal(38,12)")).cast("double").alias("rrev")
    )
    shares = rev.join(reg, "region_name").select(
        "region_name",
        "nation_name",
        # try_divide: a zero-revenue region yields NULL weights (DuckDB
        # x/0 parity) instead of an ANSI job abort
        r6(F.try_divide(F.col("nrev"), F.col("rrev"))).alias("w"),
    )
    maps = weights_map(shares, "region_name", "nation_name", "w")
    totals = maps.select("region_name", r6(map_total("weights")).alias("region_total"))
    # no broadcast hint here: grid is the PRESERVED side of explode_filled's
    # left join, which Spark cannot use as the broadcast build side — the
    # exploded side carries the hint instead (see explode_filled)
    grid = region.select(F.col("r_name").alias("region_name")).crossJoin(
        nation.select(F.col("n_name").alias("nation_name"))
    )
    filled = explode_filled(maps, grid, "region_name", "nation_name")
    return filled.join(totals, "region_name").select(
        "region_name", "nation_name", F.col("w").alias("weight"), "region_total"
    )
