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

r9 follow-up: the same sweep now ALSO runs ``ema_last_segmented`` (the
implemented tick-scale path, arrow summarizer — the right engine at
1e6-row segments; see the operator docstring for the measured
catalyst/arrow crossover) with 1e6-row segments at every n — its group
memory is bounded by the segment, so its per-row cost must stay flat
through the sizes where the whole-key path degrades. The two results are
cross-checked equal (4-dp) at every n, so the comparison measures the
same computation.

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

    from yfinance_etl_spark.operators.sequential import ema_last, ema_last_segmented
    from yfinance_etl_spark.session import get_spark

    SEG_ROWS = 10**6  # segment width for the scale path: ~23 MiB/group

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
        # the implemented scale path on the SAME input: segment width
        # SEG_ROWS bounds each task's Arrow group regardless of n. The
        # arrow summarizer is the right engine at 1e6-row segments (the
        # catalyst fold is for the many-small-segments regime — measured
        # 69 s vs 8 s here, GC-bound in collect_list boxing), and shuffle
        # partitions must track segment count: at the default 32, one task
        # would buffer 1/32nd of ALL rows in aggregation state.
        spark.conf.set("spark.sql.shuffle.partitions", str(max(32, n // SEG_ROWS)))
        t1 = time.monotonic()
        try:
            seg_row = ema_last_segmented(
                bars, span=20, key="suppkey", date="ddate",
                segment=(F.col("ddate") / SEG_ROWS).cast("bigint"),
                summarizer="arrow",
            ).collect()[0]
        except Exception as ex:  # noqa: BLE001 — record it, keep the sweep
            seg_wall = time.monotonic() - t1
            sweeps.append({
                "n_rows": n,
                "group_mb": round(n * BYTES_PER_ROW / 2**20, 1),
                "wall_sec": round(wall, 2),
                "sec_per_million_rows": round(per_m, 3),
                "segmented_error": str(ex)[:200],
                "segmented_wall_sec": round(seg_wall, 2),
                "ok": ok,
            })
            print(f"n={n:>12,}  segmented FAILED after {seg_wall:.1f}s: {str(ex)[:120]}")
            break
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        seg_wall = time.monotonic() - t1
        same = (seg_row.n_days == row.n_days
                and abs(seg_row.last_ema - row.last_ema) < 5e-4)
        sweeps.append({
            "n_rows": n,
            "group_mb": round(n * BYTES_PER_ROW / 2**20, 1),
            "wall_sec": round(wall, 2),
            "sec_per_million_rows": round(per_m, 3),
            "segmented_wall_sec": round(seg_wall, 2),
            "segmented_sec_per_million_rows": round(seg_wall / (n / 1e6), 3),
            "segmented_matches": same,
            "ok": ok,
        })
        print(f"n={n:>12,}  group≈{n * BYTES_PER_ROW / 2**20:>8.1f} MiB  "
              f"wall={wall:>7.2f}s  {per_m:>7.3f} s/Mrow  "
              f"segmented={seg_wall:>7.2f}s ({seg_wall / (n / 1e6):.3f} s/Mrow, "
              f"match={same})")
    out = {"metric": "ema_applyinpandas_ceiling", "bytes_per_row": BYTES_PER_ROW,
           "segment_rows": SEG_ROWS, "sweeps": sweeps}
    path = os.path.join(REPO, "ema_ceiling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
