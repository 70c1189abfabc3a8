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


def test_bench_compare_annotates_deltas_against_noise_floors():
    """r14 verdict #4: every round-over-round delta carries a CITEABLE /
    NOISE annotation from the measured noise_floor — a delta inside its
    floor must never surface as a regression or win, and a query with no
    measured floor falls back to the conservative 0.15 s jitter minimum."""
    import sys

    sys.path.insert(0, str(_REPO / "tools"))
    from bench_compare import compare

    cur = {"a": 2.0, "b": 1.0, "c": 5.0, "d": 0.5}
    prev = {"a": 1.0, "b": 1.3, "c": 5.05, "e": 9.9}
    floors = {"a": 0.5, "b": 0.4, "c": 0.2}
    out = compare(cur, prev, floors, "cur", "prev")
    assert out["n_common"] == 3  # d/e not shared -> excluded everywhere
    q = out["queries"]
    assert q["a"]["citeable"] and q["a"]["delta"] == 1.0  # above its floor
    assert not q["b"]["citeable"]  # |−0.3| < 0.4: noise by measurement
    assert not q["c"]["citeable"]  # 0.05 < 0.2
    assert out["citeable_regressions"] == ["a"]
    assert out["citeable_wins"] == []
    assert out["noise_deltas"] == 2
    # ratio over the 0.1 s-rounded common walls (the tool's citation grain)
    assert out["common_ratio"] == round(
        round(2.0 + 1.0 + 5.0, 1) / round(1.0 + 1.3 + 5.05, 1), 3
    )
    # missing floor -> 0.15 default
    out2 = compare({"x": 1.0}, {"x": 1.1}, {}, "c", "p")
    assert not out2["queries"]["x"]["citeable"]
    out3 = compare({"x": 1.0}, {"x": 1.3}, {}, "c", "p")
    assert out3["queries"]["x"]["citeable"]


def test_committed_bench_compare_artifact_is_consistent():
    """The committed bench_compare.json must agree with its inputs: the
    annotation rule replayed over its own rows, and the headline ratio
    recomputed from the per-query columns."""
    import json

    art = json.loads((_REPO / "bench_compare.json").read_text())
    rows = art["queries"]
    assert art["n_common"] == len(rows) > 0
    for n, r in rows.items():
        assert r["citeable"] == (abs(r["delta"]) > r["noise_floor"]), n
        assert abs(r["delta"] - round(r["cur"] - r["prev"], 2)) < 1e-9, n
    cw = round(sum(r["cur"] for r in rows.values()), 1)
    pw = round(sum(r["prev"] for r in rows.values()), 1)
    assert abs(art["common_ratio"] - round(cw / pw, 3)) < 1e-9
    assert art["noise_deltas"] == sum(1 for r in rows.values() if not r["citeable"])


def test_variance_floor_is_five_runs():
    # r15 verdict what's-wrong #2: the committed artifact silently
    # dropped to a 3-run floor; the CITEABLE/NOISE annotation layer
    # (tools/bench_compare.py) adjudicates round-over-round deltas
    # against these floors, so the committed artifact must carry at
    # least the r14-precedent 5 runs
    assert _artifact()["n_runs"] >= 5
