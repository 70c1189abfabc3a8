"""Property: range_band_join (broadcast + map-side BETWEEN) is row-identical
to a plain SQL LEFT JOIN ... ON v >= lo AND v < hi in DuckDB, including
overlapping bands (row multiplication) and uncovered values (null band)."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from yfinance_etl_spark.operators.joins import range_band_join

_vals = st.lists(
    st.integers(min_value=-100, max_value=100).map(float), min_size=1, max_size=30
)
_bands = st.lists(
    st.tuples(
        st.integers(min_value=-100, max_value=90),
        st.integers(min_value=1, max_value=60),
    ),
    min_size=0,
    max_size=8,
)


@settings(max_examples=12, deadline=None)
@given(_vals, _bands)
def test_band_join_matches_duckdb_left_between_join(spark, vals, bands):
    facts_pd = pd.DataFrame(
        [(i, v) for i, v in enumerate(vals)], columns=["fact_id", "v"]
    )
    bands_pd = pd.DataFrame(
        [(f"b{j}", float(lo), float(lo + w)) for j, (lo, w) in enumerate(bands)],
        columns=["band", "lo", "hi"],
    )

    facts = spark.createDataFrame(facts_pd)
    bdf = (
        spark.createDataFrame(bands_pd)
        if len(bands_pd)
        else spark.createDataFrame([], "band string, lo double, hi double")
    )
    got = sorted(
        (r.fact_id, r.band)
        for r in range_band_join(facts, bdf, "v").select("fact_id", "band").collect()
    )

    con = duckdb.connect()
    con.register("facts", facts_pd)
    con.register("bands", bands_pd)
    want = sorted(
        (fid, b)
        for fid, b in con.execute(
            "SELECT f.fact_id, b.band FROM facts f "
            "LEFT JOIN bands b ON f.v >= b.lo AND f.v < b.hi"
        ).fetchall()
    )
    con.close()
    assert got == want
