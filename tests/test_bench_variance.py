"""The committed bench_variance.json is the noise floor for perf claims:
a round-over-round delta smaller than a query's same-commit spread must
not be cited as a regression or a win (r6 verdict item 6). These tests
pin the artifact's contract without re-running the (multi-minute) bench."""

from __future__ import annotations

import json
import pathlib

_REPO = pathlib.Path(__file__).resolve().parents[1]


def _artifact() -> dict:
    return json.load(open(_REPO / "bench_variance.json"))


def test_variance_artifact_has_three_fresh_runs():
    # r8 proved 2 samples under-estimate the noise floor (same-code
    # rounds swung ±0.46 s while the artifact claimed 0.04 s spreads)
    v = _artifact()
    assert v["metric"] == "bench_run_to_run"
    assert v["n_runs"] >= 3
    assert len(v["suite_wall_sec"]) == v["n_runs"]
    assert all(w > 0 for w in v["suite_wall_sec"])


def test_variance_artifact_covers_full_registry():
    from yfinance_etl_spark.plans.queries import REGISTRY

    v = _artifact()
    missing = set(REGISTRY) - set(v["queries"])
    assert not missing, f"queries without a variance record: {sorted(missing)}"
    for name, row in v["queries"].items():
        assert len(row["runs"]) == v["n_runs"], name
        assert row["spread"] is None or row["spread"] >= 0, name
        # the citable number: median of the >=3 samples, inside their range
        present = [t for t in row["runs"] if t is not None]
        if present:
            assert min(present) <= row["median"] <= max(present), name
            # do-not-cite floor: bounds spread, prior round delta, and the
            # 0.15 s jitter floor (r9)
            prior = v["prior_round_delta"].get(name, 0.0)
            assert row["noise_floor"] >= max(row["spread"], prior, 0.15) - 1e-9, name


def test_flagged_set_is_consistent_with_spreads():
    v = _artifact()
    prior = v["prior_round_delta"]
    for name in v["flagged_noisier_than_round_delta"]:
        row = v["queries"][name]
        assert row["spread"] > max(prior.get(name, 0.0), 0.15), name
