"""Run-to-run bench variance: >=3 fresh-JVM bench passes at the same commit.

Round-6 advice item 6 introduced this tool at 2 samples; round 8 proved
2 is not enough — byte-identical code swung individual queries by up to
±0.46 s between rounds while the 2-sample artifact published 0.04 s
spreads for the same queries. The harness therefore runs ``bench.py``
THREE times by default (r8 verdict item 6) as independent subprocesses
(fresh JVM, fresh page-cache state per run — true run-to-run, not
min-of-N inside one aging session, which bench.py's own comments
document as biased) and writes ``bench_variance.json``:

* per-query timings from every run, their MEDIAN (the number to cite),
  and their spread (max - min over the >=3 samples),
* the prior-round delta (|BENCH_r{N} - BENCH_r{N-1}|) where both driver
  artifacts report the query,
* ``flagged``: queries whose run-to-run spread EXCEEDS their last
  round-over-round delta — i.e. queries where the round-over-round
  "regression" or "win" was within noise and must not be cited,
* ``round_deltas_within_spread_pct``: what fraction of the newest
  adjacent round-over-round deltas the measured spreads bound — when the
  adjacent rounds ran the same code (as r7→r8 did), this is a direct
  calibration check of the harness itself. r9 measured 90%: cross-round
  (cold machine-state) noise has a component that even 3 same-session
  fresh-JVM samples cannot capture, so
* ``noise_floor`` per query = max(spread, prior round-over-round delta,
  0.15 s): the DO-NOT-CITE threshold — a future round-over-round delta
  below it is noise by measurement, not judgment. (When the prior rounds
  ran the same code, folding their delta in is exact; when they did not,
  it is conservative — it can only over-estimate the floor, never let a
  real regression through as noise... at worst a real sub-floor
  regression waits one round for a clean same-code baseline.)

Usage: python tools/bench_variance.py [--runs N]
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(env: dict) -> dict:
    """One fresh-process bench pass; returns the full bench_detail payload."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench.py rc={proc.returncode}: {proc.stdout[-500:]}\n{proc.stderr[-500:]}")
    with open(os.path.join(REPO, "bench_detail.json")) as f:
        return json.load(f)


def prior_round_deltas() -> dict[str, float]:
    """|r{N} - r{N-1}| per query from the two newest ADJACENT parseable
    driver BENCH artifacts. Rounds 1-5 have head-truncated stdout lines
    ("parsed": null), so this is empty until two consecutive parsed rounds
    exist (r6 onward all parse); the flagging floor covers the gap."""
    parsed: dict[int, dict] = {}
    for p in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        rnd = int(re.search(r"_r(\d+)", p).group(1))
        try:
            data = json.load(open(p))
        except (json.JSONDecodeError, OSError):
            continue
        q = (data.get("parsed") or {}).get("queries") if isinstance(data, dict) else None
        if q:
            parsed[rnd] = q
    for rnd in sorted(parsed, reverse=True):
        if rnd - 1 in parsed:
            cur, prev = parsed[rnd], parsed[rnd - 1]
            return {n: round(abs(cur[n] - prev[n]), 2) for n in cur if n in prev}
    return {}


def main() -> int:
    # 5-run floor (r15 verdict what's-wrong #2: the r15 artifact's 3-run
    # floor was a weaker floor than the r14 precedent it replaced — the
    # CITEABLE/NOISE annotation layer adjudicates round deltas, so give
    # it the sample size the adjudication leans on)
    runs = 5
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    env = dict(os.environ)
    details = [run_bench(env) for _ in range(runs)]

    names = sorted(set().union(*(d["queries"] for d in details)))
    per_query = {}
    for n in names:
        ts = [d["queries"].get(n) for d in details]
        present = sorted(t for t in ts if t is not None)
        mid = len(present) // 2
        median = (
            None if not present
            else present[mid] if len(present) % 2
            else round((present[mid - 1] + present[mid]) / 2, 3)
        )
        per_query[n] = {
            "runs": ts,
            "median": median,
            "spread": round(max(present) - min(present), 2) if present else None,
        }
    prior = prior_round_deltas()
    for n in names:
        s = per_query[n]["spread"]
        per_query[n]["noise_floor"] = (
            None if s is None else round(max(s, prior.get(n, 0.0), 0.15), 2)
        )
    # calibration over the ELIGIBLE set only: a prior-delta query absent
    # from the current runs (renamed/removed, or no spread) can never be
    # bounded, so counting it in the denominator fakes a calibration
    # failure the harness never measured
    eligible = [
        n for n in prior
        if n in per_query and per_query[n]["spread"] is not None
    ]
    bounded = [
        n for n in eligible if prior[n] <= max(per_query[n]["spread"], 0.15)
    ]
    bounded_pct = round(100 * len(bounded) / len(eligible), 1) if eligible else None
    # A query is flagged when its same-commit spread exceeds its last
    # round-over-round delta (when known) — any perf claim about it from
    # single samples is noise. Floor 0.15 s: sub-0.15 s spreads are
    # JIT/GC jitter at this suite's timing granularity.
    flagged = sorted(
        n for n in names
        if per_query[n]["spread"] is not None
        and per_query[n]["spread"] > max(prior.get(n, 0.0), 0.15)
    )
    out = {
        "metric": "bench_run_to_run",
        "n_runs": runs,
        "sf": details[0].get("sf"),
        "suite_wall_sec": [d["value"] for d in details],
        "setup_sec": [d.get("setup_sec") for d in details],
        "queries": per_query,
        "prior_round_delta": prior,
        "flagged_noisier_than_round_delta": flagged,
        "round_deltas_within_spread_pct": bounded_pct,
    }
    path = os.path.join(REPO, "bench_variance.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    walls = ", ".join(f"{v:.1f}s" for v in out["suite_wall_sec"])
    print(f"wrote {path}: walls [{walls}], {len(flagged)} queries noisier than their round delta")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
