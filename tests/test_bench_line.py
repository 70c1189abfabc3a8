"""The driver archives only the last 2000 chars of stdout; bench.py's one
JSON line must always fit or the BENCH artifact is unparseable (r2-r5)."""

from __future__ import annotations

import json

from bench import fit_line


def _out(n_queries: int) -> dict:
    timings = {f"some_long_query_name_{i:03d}": round(0.1 + i * 0.07, 2) for i in range(n_queries)}
    return {
        "metric": "suite_wall_sec",
        "value": round(sum(timings.values()) + 20.0, 2),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "setup_sec": 20.0,
        "n_queries": n_queries,
    }


def test_short_suite_is_untouched():
    out = _out(10)
    line = fit_line(out, 1950)
    parsed = json.loads(line)
    assert "omitted" not in parsed and len(parsed["queries"]) == 10


def test_oversized_suite_fits_budget_and_drops_fastest_first():
    out = _out(120)
    full = dict(out["queries"])
    line = fit_line(out, 1950)
    assert len(line) <= 1950
    parsed = json.loads(line)
    kept = parsed["queries"]
    om = parsed["omitted"]
    assert om["n"] == len(full) - len(kept)
    # everything dropped is no slower than everything kept
    assert om["max_sec"] <= min(kept.values())
    assert om["sum_sec"] == round(sum(v for k, v in full.items() if k not in kept), 2)
    # the slowest queries always survive
    slowest = sorted(full, key=full.get)[-10:]
    assert all(s in kept for s in slowest)


def test_real_registry_line_fits():
    # with 82 registered queries and realistic 2-dp timings the emitted
    # line must stay inside the driver's capture window
    from yfinance_etl_spark.plans.queries import REGISTRY

    out = {
        "metric": "suite_wall_sec",
        "value": 102.33,
        "unit": "sec",
        "queries": {n: 1.23 for n in REGISTRY},
        "sf": 0.1,
        "setup_sec": 20.52,
        "n_queries": len(REGISTRY),
    }
    line = fit_line(out, 1950)
    assert len(line) <= 1950
    assert json.loads(line)


def test_mass_failure_errors_are_bounded_too():
    # many long error strings used to keep the line over budget no matter
    # how many timings were folded — the unparseable-BENCH failure mode
    import bench

    out = {
        "metric": "suite_wall_sec",
        "value": 1.0,
        "queries": {f"q{i}": 0.1 for i in range(30)},
        "errors": {f"q{i}": "SparkException: " + "x" * 180 for i in range(12)},
    }
    line = bench.fit_line(out, budget=1950)
    assert len(line) <= 1950
    import json as _json

    parsed = _json.loads(line)  # the line is complete JSON, not a prefix
    assert parsed["errors"]  # failures still visible (count or messages)


def test_n_queries_survives_the_fold_and_accounts_for_omissions():
    # the fold never touches n_queries: the printed line's n_queries is
    # the FULL timed count, and kept + omitted always reconciles to it —
    # a silently-dropped query can't hide inside the cut
    out = _out(120)
    line = fit_line(out, 1950)
    parsed = json.loads(line)
    assert parsed["n_queries"] == 120
    assert len(parsed["queries"]) + parsed["omitted"]["n"] == parsed["n_queries"]


def test_committed_bench_detail_covers_the_whole_registry():
    # bench_detail.json (the full, never-folded per-query record the
    # judge reads) must be regenerated whenever the registry changes —
    # same discipline as correctness_full.json: n_queries == |REGISTRY|
    # proves no query was silently dropped from the published bench
    import pathlib

    from yfinance_etl_spark.plans.queries import REGISTRY

    detail = json.loads(
        (pathlib.Path(__file__).resolve().parents[1] / "bench_detail.json").read_text()
    )
    assert detail["n_queries"] == len(REGISTRY), (
        f"bench_detail.json has {detail['n_queries']} queries but the "
        f"registry has {len(REGISTRY)} — re-run bench.py at this HEAD"
    )
    assert set(detail["queries"]) == set(REGISTRY) - set(detail.get("errors", {}))
