"""Measure the EMA applyInPandas group-size ceiling (r8 verdict item 9).

``operators/sequential.ema_last`` shuffles WHOLE groups to single tasks
(the documented deliberate slow path — the recursion y_t = a·x_t +
(1-a)·y_{t-1} is not a Spark window frame). Its scale ceiling is the
single-group Arrow materialization: one task must hold one key's entire
series as a pandas DataFrame. This tool SWEEPS single-key group sizes and
publishes where that degrades, turning the docstring's qualitative
"chunked segment-recursion would be needed for 1B-row keys" into a
measured number for COVERAGE.md.

Method: for each n, synthesize ONE key with n (date, value) rows via
``spark.range`` (so input synthesis is JVM-side and the measurement
isolates the applyInPandas leg), run ema_last, record wall seconds,
per-row throughput, and the approximate Arrow-materialized group bytes
(n × 24: bigint key + bigint day ordinal + double value). Degradation =
per-row cost rising materially above the large-n plateau (small n is
dominated by fixed job overhead, so throughput RISES until the plateau;
the ceiling shows as it FALLING again — spill/GC pressure) or an OOM.

Usage: python tools/ema_ceiling.py [max_exp]   # sweeps 10^4 .. 10^max_exp
Writes ema_ceiling.json next to the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BYTES_PER_ROW = 24  # bigint key + bigint ordinal + double value


def main() -> int:
    from pyspark.sql import functions as F

    from yfinance_etl_spark.operators.sequential import ema_last
    from yfinance_etl_spark.session import get_spark

    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark("ema-ceiling")
    sweeps = []
    ns = []
    e = 4
    while e <= max_exp:
        ns.extend([10**e, 3 * 10**e] if e < max_exp else [10**e])
        e += 1
    for n in ns:
        # one key, n rows: the worst case for whole-group shuffling.
        # day ordinal as the sort column (monotone ints sort cheaply and
        # deterministically; the recursion only needs the order).
        bars = spark.range(n).select(
            F.lit(1).cast("bigint").alias("suppkey"),
            F.col("id").alias("ddate"),
            (F.col("id") % 1000).cast("double").alias("price"),
        )
        t0 = time.monotonic()
        try:
            row = ema_last(bars, span=20, key="suppkey", date="ddate").collect()[0]
            wall = time.monotonic() - t0
            ok = row.n_days == n
        except Exception as ex:  # noqa: BLE001 — the failure IS the datum
            wall = time.monotonic() - t0
            sweeps.append({"n_rows": n, "group_mb": round(n * BYTES_PER_ROW / 2**20, 1),
                           "wall_sec": round(wall, 2), "error": str(ex)[:200]})
            print(f"n={n:>12,}  FAILED after {wall:.1f}s: {str(ex)[:120]}")
            break
        per_m = wall / (n / 1e6)
        sweeps.append({
            "n_rows": n,
            "group_mb": round(n * BYTES_PER_ROW / 2**20, 1),
            "wall_sec": round(wall, 2),
            "sec_per_million_rows": round(per_m, 3),
            "ok": ok,
        })
        print(f"n={n:>12,}  group≈{n * BYTES_PER_ROW / 2**20:>8.1f} MiB  "
              f"wall={wall:>7.2f}s  {per_m:>7.3f} s/Mrow")
    out = {"metric": "ema_applyinpandas_ceiling", "bytes_per_row": BYTES_PER_ROW,
           "sweeps": sweeps}
    path = os.path.join(REPO, "ema_ceiling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
