"""Root-cause experiment for the r13 common-query bench drift (r13 verdict
task #1).

Background: BENCH_r13's 61-query common wall ran 11% slower than r12, and
seven queries in UNTOUCHED code regressed beyond their own fresh-JVM spread
(dedup_simhash +66%, benchmark_ols +26%, revenue_by_region +22%, ...). The
r13 rotation put the five heaviest r13 newcomers (the IVFPQ index builders +
the two-day streaming crawl) at the HEAD of the registry, so in bench.py they
run immediately after ``cache_shared_stages`` and before every common query.
Hypothesized mechanism: the heavy block's execution-memory / python-worker /
GC pressure ages the session (and possibly evicts the shared cached stages)
before the common queries run.

This tool measures that directly, in fresh subprocess JVMs:

* mode ``solo``   — setup (cache + warm) -> probe cached-stage count() times
                    -> time each target query.
* mode ``after``  — setup -> probe -> run the heavy block UNTIMED -> probe
                    the cached stages AGAIN (eviction shows up as a count()
                    going from ~0.1 s back to scan-time) -> time each target.

If ``after`` reproduces the r13 elevation and ``solo`` matches r12, the
drift is in-suite contention from the heavy block and the mitigation is
bench-local ordering (run the heavy block LAST); the cache probes say
whether the specific mechanism is storage eviction or general session aging.

Writes bench_drift.json. Usage: python tools/bench_drift.py [--reps N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: the seven r12->r13 regressions beyond their own fresh-JVM spread
TARGETS = [
    "dedup_simhash",
    "benchmark_ols",
    "revenue_by_region",
    "vocab_heavy_hitters",
    "pdf_report_roundtrip",
    "contamination_substring",
    "pricing_summary",
]

#: the r13 newcomers that build/write indexes or run streaming loops —
#: the block that newly precedes every common query in the r13 suite order
HEAVY = [
    "ann_ivfpq_appended",
    "ann_ivfpq_persisted",
    "ann_ivfpq_quant_error",
    "crawl_two_day_dedup",
    "knn_join_banded",
]

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from yfinance_etl_spark.cache import cache_shared_stages
from yfinance_etl_spark.catalog import TABLES, load_table
from yfinance_etl_spark.plans.queries import REGISTRY
from yfinance_etl_spark.session import get_spark

mode = {mode!r}
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("bench-drift")
spark.sparkContext.setLogLevel("ERROR")

def mat(df):
    df.write.format("noop").mode("overwrite").save()

cached = cache_shared_stages(spark, sf_dir)
for t in TABLES:
    if t not in ("lineitem", "documents"):
        mat(load_table(spark, sf_dir, t))

def probe():
    out = []
    for df in cached:
        t0 = time.perf_counter()
        df.count()
        out.append(round(time.perf_counter() - t0, 3))
    return out

probe_before = probe()
if mode == "after":
    for name in {heavy!r}:
        mat(REGISTRY[name].fn(spark, sf_dir))
probe_after = probe()

timings = {{}}
for name in {targets!r}:
    t0 = time.perf_counter()
    mat(REGISTRY[name].fn(spark, sf_dir))
    timings[name] = round(time.perf_counter() - t0, 3)

print("DRIFT_JSON " + json.dumps({{
    "mode": mode, "timings": timings,
    "cache_probe_before": probe_before, "cache_probe_after": probe_after,
}}))
"""


def run_worker(mode: str) -> dict:
    code = _WORKER.format(repo=REPO, mode=mode, heavy=HEAVY, targets=TARGETS)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1200,
        env={**os.environ},
    )
    for line in proc.stdout.splitlines():
        if line.startswith("DRIFT_JSON "):
            return json.loads(line[len("DRIFT_JSON "):])
    raise RuntimeError(
        f"worker({mode}) rc={proc.returncode}\n{proc.stdout[-800:]}\n{proc.stderr[-800:]}"
    )


def main() -> int:
    reps = 2
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    runs: dict[str, list[dict]] = {"solo": [], "after": []}
    for rep in range(reps):
        for mode in ("solo", "after"):
            t0 = time.perf_counter()
            res = run_worker(mode)
            res["wall"] = round(time.perf_counter() - t0, 1)
            runs[mode].append(res)
            print(f"rep{rep} {mode}: {res['timings']} "
                  f"probe_after={res['cache_probe_after']}", flush=True)

    summary = {}
    for name in TARGETS:
        solo = sorted(r["timings"][name] for r in runs["solo"])
        after = sorted(r["timings"][name] for r in runs["after"])
        summary[name] = {
            "solo_med": solo[len(solo) // 2],
            "after_med": after[len(after) // 2],
            "solo": solo,
            "after": after,
        }
    out = {"targets": summary, "runs": runs, "heavy": HEAVY, "reps": reps}
    with open(os.path.join(REPO, "bench_drift.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({n: {k: v for k, v in s.items() if k.endswith("_med")}
                      for n, s in summary.items()}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
