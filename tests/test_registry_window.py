"""The driver hash-checks only the first 50 registry entries per round;
these pins make the rotation an explicit, tested contract rather than an
accident of decorator order."""

from __future__ import annotations

from yfinance_etl_spark.plans.queries import REGISTRY, _WINDOW_PRIORITY

# every query absent from CORRECTNESS_r05.json (driver rows 1-50 of the
# round-5 order) — round 6's rotation must put ALL of them in the window
_R05_UNCHECKED = {
    "price_band_join", "lang_profile", "price_pivot_wide",
    "datasource_monthly_bars", "order_value_quantiles", "sketch_profile",
    "orders_cube", "ticker_correlation_matrix", "dedup_clusters",
    "tfidf_top_terms", "train_split_counts", "salted_revenue_by_segment",
    "incremental_rollup", "doc_quality_gopher", "pii_redaction",
    "url_domain_stats", "kmeans_clusters", "symbol_search",
    "fund_expense_ratio", "tz_normalize", "stream_static_enriched",
    "stream_interval_join", "watchlist_parse", "stratified_sample",
    "shard_packing", "compacted_sink_roundtrip", "funnel_conversions",
    "cohort_retention", "contamination_check", "multimodal_resize",
    "frame_sample",
}


def test_priority_names_lead_the_registry():
    assert list(REGISTRY)[: len(_WINDOW_PRIORITY)] == _WINDOW_PRIORITY


def test_driver_window_covers_all_previously_unchecked_queries():
    window = set(list(REGISTRY)[:50])
    missing = _R05_UNCHECKED - window
    assert not missing, f"not in the driver's 50-row window: {sorted(missing)}"
    assert "order_value_deciles" in window  # new this round


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
    import json

    from yfinance_etl_spark.plans.queries import REGISTRY

    snap = json.load(open("/root/repo/correctness_full.json"))
    missing = set(REGISTRY) - set(snap["results"])
    assert not missing, f"queries not attested by correctness_full.json: {sorted(missing)}"
    assert snap["n_fail"] == 0, snap
    assert snap["n_queries"] == len(REGISTRY)
