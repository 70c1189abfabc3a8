"""Round-over-round bench comparison with noise annotation (r14 verdict
minor #5 / next #4): every per-query delta between two bench artifacts is
auto-annotated CITEABLE or NOISE against its measured ``noise_floor``
from ``bench_variance.json`` — the do-not-cite threshold (max of the
same-commit run-to-run spread, the last round-over-round delta, and the
0.15 s jitter floor). A delta below its floor is noise BY MEASUREMENT;
only citeable deltas may be read as regressions or wins.

Why annotation instead of chasing ``round_deltas_within_spread_pct``
to 85: r14's controlled drift experiments (bench_drift.json) showed the
cross-round residual is machine state that same-session fresh-JVM
sampling cannot bound — more samples shrink the spread, not the
residual. The honest fix is to carry the floor into every comparison
rather than pretend a tighter spread bounds a component it never
measured.

Usage:
    python tools/bench_compare.py                 # newest BENCH_r vs previous
    python tools/bench_compare.py --current-detail  # bench_detail.json (HEAD)
                                                    # vs newest BENCH_r
Writes ``bench_compare.json`` and prints the summary line.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _parsed_bench_rounds() -> dict[int, dict]:
    """round -> per-query seconds from every parseable BENCH_r*.json."""
    out: dict[int, dict] = {}
    for p in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"_r(\d+)", p)
        if not m:  # digitless stray like BENCH_r.json — skip, don't crash
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(p))
        except (json.JSONDecodeError, OSError):
            continue
        q = (data.get("parsed") or {}).get("queries") if isinstance(data, dict) else None
        if q:
            out[rnd] = q
    return out


def compare(
    cur: dict[str, float],
    prev: dict[str, float],
    floors: dict[str, float],
    cur_label: str,
    prev_label: str,
) -> dict:
    """The annotated comparison: per common query, the delta and whether
    its magnitude clears the query's noise floor (missing floor -> the
    0.15 s jitter minimum, the conservative direction for citing)."""
    common = sorted(set(cur) & set(prev))
    rows = {}
    for n in common:
        delta = round(cur[n] - prev[n], 2)
        floor = floors.get(n, 0.15)
        rows[n] = {
            "prev": prev[n],
            "cur": cur[n],
            "delta": delta,
            "noise_floor": floor,
            "citeable": abs(delta) > floor,
        }
    cur_wall = round(sum(cur[n] for n in common), 1)
    prev_wall = round(sum(prev[n] for n in common), 1)
    return {
        "metric": "bench_round_compare",
        "cur": cur_label,
        "prev": prev_label,
        "n_common": len(common),
        "common_wall_cur_sec": cur_wall,
        "common_wall_prev_sec": prev_wall,
        "common_ratio": round(cur_wall / prev_wall, 3) if prev_wall else None,
        "queries": rows,
        "citeable_regressions": sorted(
            n for n, r in rows.items() if r["citeable"] and r["delta"] > 0
        ),
        "citeable_wins": sorted(
            n for n, r in rows.items() if r["citeable"] and r["delta"] < 0
        ),
        "noise_deltas": sum(1 for r in rows.values() if not r["citeable"]),
    }


def main() -> int:
    floors = {}
    var_path = os.path.join(REPO, "bench_variance.json")
    if os.path.exists(var_path):
        var = json.load(open(var_path))
        floors = {
            n: row["noise_floor"]
            for n, row in var.get("queries", {}).items()
            if row.get("noise_floor") is not None
        }
    rounds = _parsed_bench_rounds()
    if "--current-detail" in sys.argv:
        detail = json.load(open(os.path.join(REPO, "bench_detail.json")))
        cur, cur_label = detail["queries"], "bench_detail.json (HEAD)"
        if not rounds:
            print("need one parseable BENCH_r*.json round", file=sys.stderr)
            return 1
        prev_rnd = max(rounds)
        prev, prev_label = rounds[prev_rnd], f"BENCH_r{prev_rnd:02d}"
    else:
        newest = sorted(rounds, reverse=True)[:2]
        if len(newest) < 2:
            print("need two parseable BENCH_r*.json rounds", file=sys.stderr)
            return 1
        cur, cur_label = rounds[newest[0]], f"BENCH_r{newest[0]:02d}"
        prev, prev_label = rounds[newest[1]], f"BENCH_r{newest[1]:02d}"
    out = compare(cur, prev, floors, cur_label, prev_label)
    path = os.path.join(REPO, "bench_compare.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(
        f"wrote {path}: {out['cur']} vs {out['prev']} — common ratio "
        f"{out['common_ratio']} over {out['n_common']} queries; "
        f"{len(out['citeable_regressions'])} citeable regressions, "
        f"{len(out['citeable_wins'])} citeable wins, "
        f"{out['noise_deltas']} deltas inside their noise floor"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
