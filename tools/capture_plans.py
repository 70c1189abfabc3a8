"""Capture `.explain("formatted")` for registered queries into
plans/<round>/<query>_<tag>.txt — the judge-facing before/after plan
artifacts for the optimization rounds (round dir via $PLANS_ROUND,
default r17).

Usage: python tools/capture_plans.py <tag> <query> [...]
       python tools/capture_plans.py after --all-touched   (reads names from stdin)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yfinance_etl_spark.plans.queries import REGISTRY  # noqa: E402
from yfinance_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", os.environ.get("PLANS_ROUND", "r17"))


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    warm = "--cache" in names
    names = [n for n in names if n != "--cache"]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    if warm:
        # mirror bench conditions: shared-stage cache entries substitute
        # into matching subplans, which is part of the claimed plan shape
        from yfinance_etl_spark.cache import cache_shared_stages

        cache_shared_stages(spark, SF_DIR)
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
