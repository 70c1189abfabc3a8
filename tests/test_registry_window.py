"""The driver hash-checks only the first 50 registry entries per round;
these pins make the rotation an explicit, tested contract rather than an
accident of decorator order."""

from __future__ import annotations

import json
import pathlib

from yfinance_etl_spark.plans.queries import REGISTRY, _WINDOW_PRIORITY

_REPO = pathlib.Path(__file__).resolve().parents[1]

# every query whose last driver attestation is r6 or older (r8 skipped the
# rotation, so CORRECTNESS_r07/r08 re-attested the same 50 names) — round
# 9's rotation must put ALL 35 of them in the window so no query's last
# driver attestation falls more than three rounds behind
_R8_STALE = {
    "order_value_quantiles", "orders_cube", "pii_redaction",
    "price_band_join", "price_pivot_wide", "salted_revenue_by_segment",
    "shard_packing", "stratified_sample", "stream_interval_join",
    "stream_static_enriched", "symbol_search", "tfidf_top_terms",
    "ticker_correlation_matrix", "train_split_counts", "tz_normalize",
    "url_domain_stats", "watchlist_parse", "lang_profile",
    "stream_dedup_distinct", "stream_session_rollup", "stream_sliding_avg",
    "stream_tumbling_counts", "asof_click_attribution",
    "stream_ema_stateful", "stream_parquet_sink_roundtrip",
    "ann_bucketed_topk", "ann_ivf_topk", "ann_multiprobe_topk",
    "dedup_embedding_cosine", "dedup_simhash", "dedup_exact_fingerprint",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "knn_cosine_topk",
}


def test_priority_names_lead_the_registry():
    assert list(REGISTRY)[: len(_WINDOW_PRIORITY)] == _WINDOW_PRIORITY


def test_driver_window_covers_all_stale_queries():
    window = set(list(REGISTRY)[:50])
    missing = _R8_STALE - window
    assert not missing, f"not in the driver's 50-row window: {sorted(missing)}"


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
