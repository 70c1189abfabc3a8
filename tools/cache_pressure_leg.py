"""r17 cache-pressure leg (VERDICT item 10): is the broad 0.7-0.9x drift
on UNTOUCHED queries machine state, or storage pressure from the growing
shared-cache footprint?

Two fresh-subprocess legs, identical except for the resident cache set:

* ``full``    — cache_shared_stages as shipped (r17: + 4 modality
                signature entries, + verified-LSH-pairs entry, gram
                entry widened with the md5 digest column).
* ``reduced`` — the same setup minus the r17 additions (modality and
                lsh-pairs entries skipped).

Each leg then times the SAME panel of queries whose operators touch none
of those entries (price/window/rollup/stream paths), 2 reps, min kept.
If ``full`` inflates the panel beyond the fresh-JVM spread, the drift is
storage pressure; if the legs match, it is machine state (the r13/r16
conclusion, re-confirmed under control).

Appends an ``r17_cache_pressure`` section to bench_drift.json.
Usage: python tools/cache_pressure_leg.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PANEL = [
    "benchmark_ols",
    "incremental_rollup",
    "kmeans_clusters",
    "contamination_bloom",
    "stream_session_rollup",
    "vocab_heavy_hitters",
    "ema_20",
    "revenue_by_region",
    "split_leakage_check",
    "dsir_importance_topk",
    "display_formatting",
    "sma_min_periods",
]

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from concurrent.futures import ThreadPoolExecutor

from yfinance_etl_spark.catalog import load_table
from yfinance_etl_spark.plans.queries import REGISTRY
from yfinance_etl_spark.session import get_spark

mode = {mode!r}
SF = "/root/testdata/sf0.1"
spark = get_spark("bench")
spark.sparkContext.setLogLevel("ERROR")

t0 = time.perf_counter()
if mode == "full":
    from yfinance_etl_spark.cache import cache_shared_stages

    cache_shared_stages(spark, SF)
else:  # reduced: the r16-era entry set (no modality sigs, no lsh pairs)
    from yfinance_etl_spark.operators.dedup import (
        doc_hashes, doc_shingles, hashed_grams, jaccard_pairs, minhash_bands)
    from yfinance_etl_spark.operators.rag import chunk_embeddings, doc_embeddings
    from yfinance_etl_spark.operators.windows import daily_bars

    docs = lambda: load_table(spark, SF, "documents")
    base = [
        daily_bars(load_table(spark, SF, "lineitem")),
        doc_shingles(docs()), doc_hashes(docs()), hashed_grams(docs()),
        chunk_embeddings(docs()), doc_embeddings(docs()),
    ]
    pairs = jaccard_pairs(docs(), threshold=None)
    bands = minhash_bands(docs())
    for df in [*base, pairs, bands]:
        df.cache()
    with ThreadPoolExecutor(max_workers=len(base)) as pool:
        list(pool.map(lambda df: df.count(), base))
    with ThreadPoolExecutor(max_workers=2) as pool:
        list(pool.map(lambda df: df.count(), [pairs, bands]))
setup = round(time.perf_counter() - t0, 2)

panel = {panel!r}
out = {{}}
for rep in range(2):
    for name in panel:
        t1 = time.perf_counter()
        REGISTRY[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t1, 2)
        out[name] = min(out.get(name, 99.0), dt)
print("LEGRESULT " + json.dumps({{"mode": mode, "setup": setup, "panel": out}}))
"""


def run_leg(mode: str) -> dict:
    code = _WORKER.format(repo=REPO, mode=mode, panel=PANEL)
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env={**os.environ, "SPARK_GRAFT_CPUS": "32"},
    )
    for line in p.stdout.splitlines():
        if line.startswith("LEGRESULT "):
            return json.loads(line[len("LEGRESULT "):])
    raise RuntimeError(f"leg {mode} produced no result:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> int:
    legs = [run_leg("reduced"), run_leg("full"), run_leg("reduced"), run_leg("full")]
    path = os.path.join(REPO, "bench_drift.json")
    data = json.load(open(path))
    best = {}
    for mode in ("reduced", "full"):
        merged = {}
        for leg in legs:
            if leg["mode"] == mode:
                for k, v in leg["panel"].items():
                    merged[k] = min(merged.get(k, 99.0), v)
        best[mode] = merged
    ratio = {
        k: round(best["full"][k] / best["reduced"][k], 3) for k in best["full"]
    }
    data["r17_cache_pressure"] = {
        "legs": legs,
        "panel_min": best,
        "full_over_reduced": ratio,
        "note": (
            "two fresh-JVM legs per cache variant, interleaved "
            "reduced/full/reduced/full; panel = untouched queries whose "
            "operators use none of the r17 entries"
        ),
    }
    json.dump(data, open(path, "w"), indent=1, sort_keys=True)
    print(json.dumps(ratio, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
