"""Text operators (tokens/shingles/chunking/fingerprint) and the sequential
EMA — the edge cases the round-1 ADVICE flagged: short documents, .5 rounding
ties, long series."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from yfinance_etl_spark.operators.sequential import ema_last, round_half_away
from yfinance_etl_spark.operators.text import chunk_text, fingerprint, tokens, word_shingles


def _docs(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_word_shingles_short_docs_yield_empty(spark):
    out = (
        _docs(spark, ["", "one", "one two", "one two three", "a b c d"])
        .select("doc_id", word_shingles("text").alias("sh"))
        .orderBy("doc_id")
        .collect()
    )
    assert [r.sh for r in out[:2]] == [[], []]  # 0/1 tokens → empty, no crash
    assert out[2].sh == []  # 2 tokens < n=3
    assert out[3].sh == ["one two three"]
    assert out[4].sh == ["a b c", "b c d"]


def test_tokens_collapse_whitespace(spark):
    out = _docs(spark, ["  a\t b\n  c  "]).select(tokens("text").alias("t")).collect()
    assert out[0].t == ["a", "b", "c"]


def test_fingerprint_normalizes_case_and_whitespace(spark):
    out = _docs(spark, ["Hello   World", "hello world", "hello worlds"]).select(
        fingerprint("text").alias("fp")
    ).collect()
    assert out[0].fp == out[1].fp
    assert out[0].fp != out[2].fp


def test_chunk_text_boundaries(spark):
    # size=10, overlap=4 → stride 6; 22 chars → ceil((22-4)/6)=3 chunks
    text = "abcdefghijklmnopqrstuv"
    out = _docs(spark, [text]).select(F.explode(chunk_text("text", 10, 4)).alias("c")).collect()
    chunks = [(r.c.chunk_id, r.c.chunk) for r in out]
    assert chunks == [(0, text[0:10]), (1, text[6:16]), (2, text[12:22])]
    # short text → exactly one chunk of the whole text
    out1 = _docs(spark, ["tiny"]).select(F.explode(chunk_text("text", 10, 4)).alias("c")).collect()
    assert [(r.c.chunk_id, r.c.chunk) for r in out1] == [(0, "tiny")]


def test_round_half_away_matches_duckdb_round():
    import duckdb

    for x in [0.00005, -0.00005, 0.12345, -0.12345, 2.5e-4, 1.23455]:
        duck = duckdb.sql(f"SELECT ROUND({x!r}::DOUBLE, 4) AS v").fetchone()[0]
        assert round_half_away(x, 4) == duck, x


def test_ema_matches_pandas_ewm_long_series(spark):
    # 10k rows/key — far past where the old POWER-rescaled oracle overflowed
    n = 10_000
    prices = [100.0 + (i % 37) * 0.25 + (i % 11) * 0.1 for i in range(n)]
    rows = [
        (1, dt.date(2020, 1, 1) + dt.timedelta(days=i), p, 1.0)
        for i, p in enumerate(prices)
    ]
    bars = spark.createDataFrame(rows, "suppkey bigint, ddate date, price double, qty double")
    row = ema_last(bars, span=20).collect()[0]
    expected = pd.Series(prices).ewm(span=20, adjust=False).mean().iloc[-1]
    assert row.n_days == n
    assert row.last_ema == pytest.approx(round_half_away(float(expected), 4), abs=1e-12)


@pytest.mark.parametrize("summarizer", ["catalyst", "arrow"])
def test_ema_segmented_matches_whole_key_loop(spark, summarizer):
    # The tick-scale path (bounded-segment affine scan) must agree with
    # the whole-key pandas loop — under BOTH summarizer engines (the JVM
    # HOF fold and the Arrow/pandas loop are pinned to the same IEEE op
    # order): bit-identical when a key has ONE segment, and within
    # cross-segment reassociation ulps (absorbed by the 4-dp round) when
    # it has many — including single-row segments (year boundaries with
    # one trading day).
    from yfinance_etl_spark.operators.sequential import ema_last_segmented

    rows = []
    # key 1: 5 years, ~37 rows/year (multi-segment, uneven sizes)
    d = dt.date(2019, 6, 1)
    for i in range(185):
        rows.append((1, d, 100.0 + (i % 37) * 0.25 + (i % 11) * 0.1, 1.0))
        d += dt.timedelta(days=10)
    # key 2: one segment only → must be BIT-identical to ema_last
    rows += [
        (2, dt.date(2021, 1, 1) + dt.timedelta(days=i), 50.0 + i * 0.5, 1.0)
        for i in range(30)
    ]
    # key 3: single-row segments (one observation per year)
    rows += [(3, dt.date(2015 + i, 3, 1), 10.0 * (i + 1), 1.0) for i in range(6)]
    # key 4: one row total
    rows += [(4, dt.date(2020, 5, 5), 77.7, 1.0)]
    bars = spark.createDataFrame(
        rows, "suppkey bigint, ddate date, price double, qty double"
    )
    whole = {r.suppkey: r for r in ema_last(bars, span=20).collect()}
    seg = {
        r.suppkey: r
        for r in ema_last_segmented(bars, span=20, summarizer=summarizer).collect()
    }
    assert set(whole) == set(seg) == {1, 2, 3, 4}
    for k in whole:
        assert seg[k].n_days == whole[k].n_days
        assert seg[k].last_ema == pytest.approx(whole[k].last_ema, abs=5e-4)
    # single-segment keys ride the identical pandas loop: exact equality
    assert seg[2].last_ema == whole[2].last_ema
    assert seg[4].last_ema == whole[4].last_ema == 77.7
    # multi-segment keys against an independent full-series recompute
    for k in (1, 3):
        pdf = (
            pd.DataFrame(
                [(r[1], r[2]) for r in rows if r[0] == k], columns=["d", "x"]
            )
            .sort_values("d")["x"]
            .ewm(span=20, adjust=False)
            .mean()
            .iloc[-1]
        )
        assert seg[k].last_ema == round_half_away(float(pdf), 4)


def test_ema_segmented_is_partition_count_invariant(spark):
    # the segment summaries shuffle twice; values must not depend on how
    # the input was partitioned
    from yfinance_etl_spark.operators.sequential import ema_last_segmented

    rows = [
        (k, dt.date(2018, 1, 1) + dt.timedelta(days=7 * i), 20.0 + k + i * 0.3, 1.0)
        for k in (1, 2, 3)
        for i in range(260)
    ]
    bars = spark.createDataFrame(
        rows, "suppkey bigint, ddate date, price double, qty double"
    )
    a = sorted(map(tuple, ema_last_segmented(bars, span=20).collect()))
    b = sorted(map(tuple, ema_last_segmented(bars.repartition(7), span=20).collect()))
    c = sorted(map(tuple, ema_last_segmented(bars.coalesce(1), span=20).collect()))
    assert a == b == c


def test_regex_tokens_bpe_ish(spark):
    from yfinance_etl_spark.operators.text import regex_tokens

    df = spark.createDataFrame([("hello, world42! x",)], "t string")
    got = df.select(regex_tokens("t").alias("v")).collect()[0].v
    assert got == ["hello", ",", "world", "42", "!", "x"]


def test_rolling_hash_shift_invariance(spark):
    from yfinance_etl_spark.operators.text import rolling_hashes

    # a one-char prefix edit changes only the first k window hashes; the
    # tail hashes are identical (the property md5 fingerprints lack)
    df = spark.createDataFrame(
        [("abcdefghijklmnop",), ("Xbcdefghijklmnop",)], "t string"
    )
    h1, h2 = [r.v for r in df.select(rolling_hashes("t").alias("v")).collect()]
    assert len(h1) == len(h2) == 9
    assert h1[0] != h2[0]
    assert h1[1:] == h2[1:]


def test_rolling_hash_short_text_empty(spark):
    from yfinance_etl_spark.operators.text import rolling_hashes

    df = spark.createDataFrame([("short",)], "t string")
    assert df.select(rolling_hashes("t").alias("v")).collect()[0].v == []


def test_rolling_hash_udf_matches_hof(spark):
    from yfinance_etl_spark.operators.text import rolling_hashes, rolling_hashes_udf

    texts = ["abcdefghijklmnop", "hello world this is a test", "short", "x" * 100]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    rows = df.select(
        rolling_hashes("t").alias("hof"), rolling_hashes_udf("t").alias("udf")
    ).collect()
    for r in rows:
        assert r.hof == r.udf


def test_chunk_text_null_and_empty_yield_no_chunks(spark):
    # greatest(NULL,1)/greatest(0,1) used to mint ONE chunk whose text was
    # NULL/'' — which then flowed into embedding as if it were a document
    from yfinance_etl_spark.operators.text import chunk_text

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x" * 250)], "doc_id bigint, text string"
    )
    out = df.select(
        "doc_id", F.explode(chunk_text("text", size=200, overlap=50)).alias("c")
    )
    rows = out.collect()
    assert {r.doc_id for r in rows} == {3}  # NULL and '' produce zero rows
    assert len(rows) == 2  # 250 chars / stride 150 -> 2 chunks
