"""Genuinely sequential per-key operators (SURVEY.md §7 "what's hard" list).

EMA (W5, reference streamlit_app.py:523 ``ewm(span=20, adjust=False)``) is the
one reference op that is NOT expressible as a Spark window frame: each value
depends recursively on the previous output. The Spark-idiomatic shape is a
grouped-map pandas UDF (``applyInPandas``): one shuffle on the series key, then
each group's recursion runs vectorized in Arrow batches.

Scale note: this shuffles whole groups, so a single series must fit in one
task's memory. MEASURED ceiling (r9, tools/ema_ceiling.py → ema_ceiling.json,
COVERAGE.md "EMA applyInPandas group-size ceiling"): per-row cost is flat to
1e7 rows/key (~229 MiB/group, ~0.74 s per million rows), degrades from
~3e7 rows (~0.7 GiB, +21%) and reaches +72% at 1e8 rows (2.3 GiB) — still
completing, but implying several GiB of single-task memory. A 30-year daily
series is ~8e3 rows, four orders below the plateau edge, so ``ema_last``
stays the default at reference scales; ``ema_last_segmented`` below is the
implemented tick-scale path — per-segment (decay^len, partial) affine maps
composed in order, group memory bounded by the SEGMENT — for keys past the
measured ceiling. All other window ops in this engine stay JVM-side; this
is the deliberate slow path, used only where semantics demand it.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def round_half_away(x: float, places: int = 4) -> float:
    """Round half AWAY from zero, like DuckDB/C++ ROUND — not Python's
    ``round()``, which is banker's (half-to-even) and would diverge from the
    oracle at exact .5 boundaries."""
    p = 10.0**places
    y = x * p
    return (math.floor(y + 0.5) if y >= 0 else math.ceil(y - 0.5)) / p


def round_half_away_col(c: Column, places: int = 4) -> Column:
    """Column twin of ``round_half_away`` — the SAME binary-value ops
    (floor(y + 0.5) on the double), NOT ``F.round``, whose
    shortest-decimal-repr HALF_UP can differ on boundary doubles."""
    p = float(10**places)
    y = c * F.lit(p)
    return (
        F.when(c >= 0, F.floor(y + F.lit(0.5))).otherwise(F.ceil(y - F.lit(0.5)))
        / F.lit(p)
    )


def ema_last(
    bars: DataFrame,
    span: int = 20,
    key: str = "suppkey",
    date: str = "ddate",
    value: str = "price",
) -> DataFrame:
    """Per-key recursive EMA (adjust=False); returns the final EMA per key.

    y_0 = x_0;  y_t = a·x_t + (1−a)·y_{t−1},  a = 2/(span+1)
    """

    def _ema(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(date)
        ema = pdf[value].ewm(span=span, adjust=False).mean()
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "n_days": [len(pdf)],
                "last_ema": [round_half_away(float(ema.iloc[-1]), 4)],
            }
        )

    # NULL values are dropped up front: the DuckDB list_reduce oracle's
    # list() aggregate skips NULLs, pandas ewm would instead NaN-infect
    # or reweight (ignore_na semantics), and the segmented twin's
    # collect_list drops them — one shared null contract for all three
    return (
        bars.select(key, date, value)
        .where(F.col(value).isNotNull())
        .groupBy(key)
        .applyInPandas(_ema, schema=f"{key} bigint, n_days bigint, last_ema double")
    )


def ema_last_segmented(
    bars: DataFrame,
    span: int = 20,
    key: str = "suppkey",
    date: str = "ddate",
    value: str = "price",
    segment: Column | None = None,
    summarizer: str = "catalyst",
) -> DataFrame:
    """Scale-path twin of ``ema_last`` for tick-scale keys — the measured
    ceiling of the whole-key ``applyInPandas`` is ~3e7 rows/key
    (ema_ceiling.json); past it, a key no longer fits one task. This
    variant removes the ceiling with a segmented linear-recurrence scan:

    1. map-only time-bucket segmentation (default: ``year(date)``; any
       expression monotone in ``date`` works — tick pipelines would pass
       a day or hour bucket),
    2. per-(key, segment) summary — PURE CATALYST, no Python: the segment's
       values are an ``array_sort``-ed ``collect_list`` (JVM memory bounded
       by the SEGMENT, not the key) folded by an ``aggregate`` HOF with the
       exact expression of the oracle's ``list_reduce`` — so within-segment
       IEEE operation order matches the sequential loop bit-for-bit.
       y_t = a·x_t + (1−a)·y_{t−1} is affine in the carried state, so n
       rows collapse to y_out = A·y_in + B with A = (1−a)^n and B the fold
       from y_in = 0; the segment also emits its y_0 = x_0 seeded value,
       used when it is the key's first segment (single-segment keys are
       therefore bit-identical to the sequential recurrence),
    3. per-key composition over the TINY summaries (one row per segment:
       a year of ms-ticks at daily segments is ~250 rows) — again a JVM
       ``aggregate`` fold, y ← A·y + B in segment order.

    ``summarizer`` picks the step-2 engine, and the choice is MEASURED,
    not aesthetic — the two regimes have opposite winners:

    * ``"catalyst"`` (default): the HOF fold above. Zero Python workers;
      at sf0.1's 7 000 (key, year) groups it runs 0.6 s where the
      ``applyInPandas`` variant pays ~0.7 ms/group of Python round-trip
      (6.8 s). Its cost is JVM array materialization: ``collect_list`` +
      HOF copies carry ~100 B/element of object overhead, so it is the
      small-segment engine.
    * ``"arrow"``: ``applyInPandas`` per (key, segment) — the segment
      streams to a Python worker as Arrow batches and folds in pandas'
      C loop (zero-prepended for the from-zero leg), never building the
      JVM array. At 1e6-row segments (1e8-row key) it runs 8.0 s where
      the catalyst fold spends 69 s in GC-bound boxing — the
      tick-scale engine.

    Crossover ≈ 1e3 rows/segment (0.7 ms/group Python overhead vs
    ~0.6 µs/row JVM boxing overhead). Shuffle-partition count must scale
    with segment count (tools/ema_ceiling.py sets ≈ n/SEG_ROWS): at the
    default 32, one task buffers 1/32nd of ALL rows in collect_list
    state — the catalyst path's only OOM mode, and a config error, not an
    operator property. Both summarizers produce identical results (same
    within-segment IEEE op order as the sequential loop; pinned in
    tests). Only the cross-segment composition reassociates floating
    point — the classic parallel-scan tradeoff, ulp-bounded; the 4-dp
    output round (binary half-away, same ops as ``round_half_away``)
    absorbs it (deterministic per dataset, verified against the
    sequential oracle at all three fixture scales).
    """
    if segment is None:
        segment = F.year(F.col(date))
    a = 2.0 / (span + 1)
    one_minus_a = 1.0 - a  # the SAME double the oracle's (1 - 2.0/21.0) yields

    # left fold of the recurrence, identical expression (and therefore
    # identical IEEE operation order) to the oracle's
    # list_reduce(prices, (acc, x) -> a*x + (1-a)*acc)
    def _fold(vals: Column, init: Column) -> Column:
        return F.aggregate(
            vals, init, lambda acc, x: F.lit(a) * x + F.lit(one_minus_a) * acc
        )

    # same null contract as ema_last: NULL values never enter the fold.
    # Beyond consistency this is a crash guard — an all-NULL (key, segment)
    # group would leave collect_list empty and __vals[0] raises
    # INVALID_ARRAY_INDEX under the session's ANSI default; filtered, the
    # group simply doesn't exist (and arrow/catalyst agree on n_days,
    # where len() counted NaN rows the JVM collect_list dropped)
    tagged = (
        bars.select(key, date, value)
        .where(F.col(value).isNotNull())
        .withColumn("__seg", segment.cast("long"))
    )
    if summarizer == "arrow":

        def _summarize(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(date)
            x = pdf[value].astype("float64")
            seeded = x.ewm(span=span, adjust=False).mean().iloc[-1]
            from_zero = (
                pd.concat([pd.Series([0.0]), x], ignore_index=True)
                .ewm(span=span, adjust=False)
                .mean()
                .iloc[-1]
            )
            return pd.DataFrame(
                {
                    key: [pdf[key].iloc[0]],
                    "__seg": [int(pdf["__seg"].iloc[0])],
                    "n": [len(x)],
                    "decay": [(1.0 - a) ** len(x)],
                    "from_zero": [float(from_zero)],
                    "seeded": [float(seeded)],
                }
            )

        summaries = tagged.groupBy(key, "__seg").applyInPandas(
            _summarize,
            schema=(
                f"{key} bigint, __seg bigint, n bigint, "
                "decay double, from_zero double, seeded double"
            ),
        )
    elif summarizer == "catalyst":
        vals = F.transform(
            F.array_sort(F.collect_list(F.struct(date, value))), lambda s: s[value]
        )
        summaries = (
            tagged.groupBy(key, "__seg")
            .agg(vals.alias("__vals"))
            .select(
                key,
                "__seg",
                F.size("__vals").alias("n"),
                F.pow(F.lit(one_minus_a), F.size("__vals")).alias("decay"),
                # recurrence from y_in = 0 over the whole segment
                _fold(F.col("__vals"), F.lit(0.0)).alias("from_zero"),
                # seeded (y_0 = x_0) value, used when this is the key's
                # first segment — seeds with element 1 and folds the rest,
                # exactly like list_reduce (and pandas ewm adjust=False)
                _fold(
                    F.slice(
                        F.col("__vals"), 2, F.greatest(F.size("__vals") - 1, F.lit(0))
                    ),
                    F.col("__vals")[0],
                ).alias("seeded"),
            )
        )
    else:
        raise ValueError(f"summarizer must be 'catalyst' or 'arrow', got {summarizer!r}")
    segs = F.array_sort(
        F.collect_list(F.struct("__seg", "decay", "from_zero", "seeded"))
    )
    return (
        summaries.groupBy(key)
        .agg(F.sum("n").alias("n_days"), segs.alias("__segs"))
        .select(
            key,
            "n_days",
            round_half_away_col(
                F.aggregate(
                    F.slice(
                        F.col("__segs"), 2, F.greatest(F.size("__segs") - 1, F.lit(0))
                    ),
                    F.col("__segs")[0]["seeded"],
                    lambda acc, s: s["decay"] * acc + s["from_zero"],
                )
            ).alias("last_ema"),
        )
    )
