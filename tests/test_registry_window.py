"""The driver hash-checks only the first 50 registry entries per round;
these pins make the rotation an explicit, tested contract rather than an
accident of decorator order."""

from __future__ import annotations

import json
import pathlib

from yfinance_etl_spark.plans.queries import REGISTRY, _WINDOW_PRIORITY

_REPO = pathlib.Path(__file__).resolve().parents[1]

# every query absent from CORRECTNESS_r06.json (driver rows 1-50 of the
# round-6 order) — round 7's rotation must put ALL of them in the window,
# plus the two never-hash-attested entries, so no query's last driver
# attestation is more than two rounds old
_R06_UNCHECKED = {
    "flagship_risk", "pricing_summary", "top_orders", "revenue_by_region",
    "orders_with_lineitems_semi", "customers_without_urgent_orders_anti",
    "sma_min_periods", "cumulative_return", "uptrend_flags",
    "positional_lookback", "benchmark_ols", "sortino", "dividend_yield",
    "ema_20", "text_quality", "chunk_stats", "scalar_profile",
    "events_json_profile", "doc_sentiment", "sink_roundtrip",
    "datasource_history", "sector_weights", "rag_retrieval", "rag_answers",
    "multimodal_features", "newsfeed_sentiment", "pdf_page_text",
    "peer_group_lookup", "sql_top_orders_per_priority", "token_stats",
    "rolling_fingerprint", "bucketed_join_revenue", "revenue_rollup",
    "metrics_unpivot",
}

_NEVER_HASH_ATTESTED = {"funnel_conversions"}


def test_priority_names_lead_the_registry():
    assert list(REGISTRY)[: len(_WINDOW_PRIORITY)] == _WINDOW_PRIORITY


def test_driver_window_covers_all_previously_unchecked_queries():
    window = set(list(REGISTRY)[:50])
    missing = (_R06_UNCHECKED | _NEVER_HASH_ATTESTED) - window
    assert not missing, f"not in the driver's 50-row window: {sorted(missing)}"
    # the round-6 red row must lead the window so its fix is attested first
    assert list(REGISTRY)[0] == "funnel_conversions"


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
