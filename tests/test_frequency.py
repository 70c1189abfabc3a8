"""Heavy hitters (operators/frequency.py): exact regime, eviction regime,
bounded summary memory, tie-break determinism, and the broadcast verify."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from yfinance_etl_spark.operators.frequency import (
    _mg_reduce,
    heavy_hitters,
    misra_gries_partition,
    word_stream,
)


def _zipf_values():
    """Deterministic skewed corpus: 5 heavy values well above the MG
    detection threshold n/(capacity+1), then a 995-value uniform tail.
    n = 4635, capacity 32 → threshold ≈ 140 < the 5th frequency (200)."""
    heavy = {"w0": 500, "w1": 400, "w2": 300, "w3": 250, "w4": 200}
    vals = [w for w, c in heavy.items() for _ in range(c)]
    vals += [f"t{i}" for i in range(995) for _ in range(3)]
    random.Random(7).shuffle(vals)
    return vals, heavy


def test_exact_regime_matches_plain_groupby(spark):
    # distinct (4) < capacity (8): no eviction ever happens, so the MG
    # pass is itself exact and the verify pass is a formality
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 1
    df = spark.createDataFrame(rows, "value string").repartition(4)
    got = [(r.value, r.cnt) for r in heavy_hitters(df, "value", k=3, capacity=8).collect()]
    # b and c tie at 3 → value ASC breaks the tie deterministically
    assert got == [("a", 5), ("b", 3), ("c", 3)]


def test_eviction_regime_recovers_exact_topk(spark):
    vals, heavy = _zipf_values()
    df = spark.createDataFrame([(v,) for v in vals], "value string").repartition(8)
    got = [(r.value, r.cnt) for r in heavy_hitters(df, "value", k=5, capacity=32).collect()]
    assert got == sorted(heavy.items(), key=lambda kv: (-kv[1], kv[0]))


def test_partition_summary_is_capacity_bounded():
    # the 100 TB claim in miniature: 1000 distinct values stream through
    # one partition in several Arrow batches, and the emitted summary
    # still holds at most `capacity` rows
    vals, heavy = _zipf_values()
    batches = [
        pd.DataFrame({"value": vals[i : i + 500]}) for i in range(0, len(vals), 500)
    ]
    (out,) = list(misra_gries_partition(iter(batches), capacity=32))
    assert len(out) <= 32
    # every heavy value survives with a positive lower bound <= true count
    lb = dict(zip(out["value"], out["lb"]))
    for w, c in heavy.items():
        assert 0 < lb[w] <= c


def test_mg_reduce_preserves_undercount_bound():
    s = pd.Series({f"v{i}": i + 1 for i in range(10)})  # counts 1..10
    out = _mg_reduce(s, capacity=4)
    assert len(out) <= 4
    # subtracted amount is uniform: surviving counters keep their order
    # and each drops by exactly the cut value (the 6th-smallest count)
    assert (out == s[out.index] - 6).all()


def test_k_must_not_exceed_capacity(spark):
    df = spark.createDataFrame([("a",)], "value string")
    with pytest.raises(ValueError, match="k <= capacity"):
        heavy_hitters(df, "value", k=9, capacity=8)


def test_verify_join_is_broadcast(spark):
    df = spark.createDataFrame([("a",)] * 3 + [("b",)], "value string")
    plan = heavy_hitters(df, "value", k=1, capacity=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_word_stream_matches_duckdb_tokenization(spark):
    import duckdb

    df = spark.createDataFrame(
        [(1, "The  quick FOX"), (2, "fox the")], "doc_id bigint, text string"
    )
    got = sorted(r.value for r in word_stream(df).collect())
    want = sorted(
        r[0]
        for r in duckdb.sql(
            "SELECT unnest(string_split(lower(t), ' ')) FROM "
            "(VALUES ('The  quick FOX'), ('fox the')) v(t)"
        ).fetchall()
        if r[0] != ""
    )
    assert got == want  # double space → empty token filtered on both sides
