"""Audit cache substitution UNDER BENCH CONDITIONS (r17, VERDICT item 2).

The r16 verdict flagged two builder-box wins that did not transfer to the
driver box (`substring_dup_winnowed`, `dedup_minhash_lsh`) and asked for a
plan audit run from INSIDE a bench-identical session: same `get_spark`
conf, same `cache_shared_stages` entries, node counts taken from the
query's own executed-plan string — not from the separate capture harness.

Usage: python tools/bench_plan_audit.py <query> [...]
Prints, per query: InMemoryTableScan / Exchange / parquet-scan / checkpoint
(LogicalRDD) node counts of the pre-execution physical plan.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yfinance_etl_spark.cache import cache_shared_stages  # noqa: E402
from yfinance_etl_spark.plans.queries import REGISTRY  # noqa: E402
from yfinance_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def counts(plan: str) -> dict[str, int]:
    return {
        "InMemoryTableScan": len(re.findall(r"InMemoryTableScan", plan)),
        "Exchange": len(re.findall(r"\bExchange\b", plan)),
        "parquet_scans": len(re.findall(r"Scan parquet|FileScan parquet", plan)),
        "LogicalRDD(ckpt)": len(re.findall(r"Scan ExistingRDD", plan)),
        "BroadcastHashJoin": len(re.findall(r"BroadcastHashJoin", plan)),
        "SortMergeJoin": len(re.findall(r"SortMergeJoin", plan)),
    }


def main() -> int:
    names = sys.argv[1:]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    cache_shared_stages(spark, SF_DIR)
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        print(name, counts(plan), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
