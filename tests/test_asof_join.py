"""As-of join semantics on hand-built fixtures."""

from __future__ import annotations

import datetime as dt

from yfinance_etl_spark.operators.joins import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_latest_at_or_before(spark):
    trades = spark.createDataFrame(
        [(1, "A", _ts(5)), (2, "A", _ts(10)), (3, "B", _ts(7))],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [("A", _ts(4), 100.0), ("A", _ts(9), 101.0), ("A", _ts(11), 999.0), ("B", _ts(8), 50.0)],
        "sym string, ts timestamp, px double",
    )
    out = {
        r.trade_id: r.asof_px
        for r in asof_join(trades, quotes, "sym", "ts", ["px"]).collect()
    }
    assert out[1] == 100.0  # latest quote <= 00:05 is 00:04
    assert out[2] == 101.0  # 00:09 quote, NOT the later 00:11 one
    assert out[3] is None  # B's only quote is AFTER the trade → null


def test_asof_equal_timestamp_inclusive(spark):
    trades = spark.createDataFrame([(1, "A", _ts(5))], "trade_id long, sym string, ts timestamp")
    quotes = spark.createDataFrame([("A", _ts(5), 42.0)], "sym string, ts timestamp, px double")
    out = asof_join(trades, quotes, "sym", "ts", ["px"]).collect()
    assert out[0].asof_px == 42.0  # ts >= quote.ts is INCLUSIVE


def test_asof_null_payload_comes_from_matched_row(spark):
    # The matched (latest) quote has px=NULL but sz=9 — native ASOF returns
    # BOTH from that row: px must be NULL, not stitched from the earlier quote.
    trades = spark.createDataFrame([(1, "A", _ts(10))], "trade_id long, sym string, ts timestamp")
    quotes = spark.createDataFrame(
        [("A", _ts(4), 100.0, 5.0), ("A", _ts(9), None, 9.0)],
        "sym string, ts timestamp, px double, sz double",
    )
    out = asof_join(trades, quotes, "sym", "ts", ["px", "sz"]).collect()
    assert out[0].asof_px is None and out[0].asof_sz == 9.0


def test_asof_carry_forward_many_lefts(spark):
    trades = spark.createDataFrame(
        [(i, "A", _ts(i)) for i in range(3, 9)], "trade_id long, sym string, ts timestamp"
    )
    quotes = spark.createDataFrame([("A", _ts(2), 7.0)], "sym string, ts timestamp, px double")
    out = asof_join(trades, quotes, "sym", "ts", ["px"]).collect()
    assert all(r.asof_px == 7.0 for r in out)  # one quote serves every later trade


# ---------------------------------------------------------------------------
# Property: for arbitrary event sets the window-based asof_join is
# row-for-row identical to DuckDB's native ASOF LEFT JOIN (the oracle
# semantics funnel_conversions and asof_click_attribution are graded
# against). Right sides are generated unique on (key, ts): equal-timestamp
# duplicates have no defined winner in either engine.
# ---------------------------------------------------------------------------

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

_g_keys = st.sampled_from(["A", "B", "C"])
_g_ts = st.integers(min_value=0, max_value=50)
_g_px = st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000).map(float))

_lefts = st.lists(st.tuples(_g_keys, _g_ts), min_size=1, max_size=25)
_rights = st.lists(
    st.tuples(_g_keys, _g_ts, _g_px), min_size=0, max_size=25, unique_by=lambda t: (t[0], t[1])
)


@settings(max_examples=12, deadline=None)
@given(_lefts, _rights)
def test_asof_join_matches_duckdb_native_asof(spark, lefts, rights):
    trades_pd = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)], columns=["trade_id", "sym", "ts"]
    )
    quotes_pd = pd.DataFrame(rights, columns=["sym", "ts", "px"])

    trades = spark.createDataFrame(trades_pd.astype({"ts": "int64"}))
    quotes = (
        spark.createDataFrame(quotes_pd.astype({"ts": "int64"}))
        if len(quotes_pd)
        else spark.createDataFrame([], "sym string, ts bigint, px double")
    )
    got = {
        r.trade_id: r.asof_px
        for r in asof_join(trades, quotes, "sym", "ts", ["px"]).collect()
    }

    con = duckdb.connect()
    con.register("trades", trades_pd)
    con.register("quotes", quotes_pd)
    want = {
        tid: px
        for tid, px in con.execute(
            """
            SELECT t.trade_id, q.px
            FROM trades t ASOF LEFT JOIN quotes q
              ON t.sym = q.sym AND t.ts >= q.ts
            """
        ).fetchall()
    }
    con.close()
    assert got == want


def test_asof_tied_right_rows_resolve_deterministically(spark):
    # two clicks at the identical (key, ts) used to race: last(ignorenulls)
    # took whichever the shuffle ordered later. The payload struct is now
    # the tie-break — largest payload wins, stable under repartitioning.
    trades = spark.createDataFrame(
        [(1, "A", _ts(5))], "trade_id long, sym string, ts timestamp"
    )
    quotes = spark.createDataFrame(
        [("A", _ts(4), 100.0), ("A", _ts(4), 101.0)],
        "sym string, ts timestamp, px double",
    )
    for n in (1, 3, 7):
        out = asof_join(
            trades, quotes.repartition(n), "sym", "ts", ["px"]
        ).collect()
        assert out[0].asof_px == 101.0
