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
series is ~8e3 rows, four orders below the plateau edge; the segmented
linear-recurrence scan (per-segment (decay^len, partial) affine maps,
composed in order) is the documented follow-up if keys ever exceed ~3e7
rows. All other window ops in this engine stay JVM-side; this is the
deliberate slow path, used only where semantics demand it.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame


def round_half_away(x: float, places: int = 4) -> float:
    """Round half AWAY from zero, like DuckDB/C++ ROUND — not Python's
    ``round()``, which is banker's (half-to-even) and would diverge from the
    oracle at exact .5 boundaries."""
    p = 10.0**places
    y = x * p
    return (math.floor(y + 0.5) if y >= 0 else math.ceil(y - 0.5)) / p


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

    return bars.select(key, date, value).groupBy(key).applyInPandas(
        _ema, schema=f"{key} bigint, n_days bigint, last_ema double"
    )
