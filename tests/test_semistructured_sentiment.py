"""F9/F10 JSON-path and L1 sentiment unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yfinance_etl_spark.functions.scalar import coalesce_default
from yfinance_etl_spark.functions.semistructured import (
    extract_json_object,
    json_field,
    parse_json,
)
from yfinance_etl_spark.operators.sentiment import (
    sentiment_score,
    sentiment_score_udf,
)


def test_parse_json_happy_path(spark):
    df = spark.createDataFrame([('{"k": 42}',)], "props string")
    got = df.select(parse_json("props").getField("k").alias("k")).collect()
    assert got[0].k == 42


def test_parse_json_fallback_on_malformed(spark):
    # the reference's try/except-default (fund_comp2.py:148-150): garbage,
    # empty, no-object, and prose-wrapped JSON all resolve without error
    rows = [
        ("not json at all",),
        ("",),
        (None,),
        ('reply: {"k": 7} thanks',),  # prose-wrapped → slice finds the object
        ('{"other": 1}',),  # valid JSON, missing field
    ]
    df = spark.createDataFrame(rows, "props string")
    got = [
        r.k
        for r in df.select(
            coalesce_default(parse_json("props").getField("k"), -1).alias("k")
        ).collect()
    ]
    assert got == [-1, -1, -1, 7, -1]


def test_extract_json_object_slices_first_to_last_brace(spark):
    df = spark.createDataFrame([('x {"a": {"b": 1}} y',)], "s string")
    got = df.select(extract_json_object("s").alias("j")).collect()[0].j
    assert got == '{"a": {"b": 1}}'


def test_json_field_path(spark):
    df = spark.createDataFrame([('{"k": 5, "tags": ["x"]}',)], "s string")
    got = df.select(json_field("s", "$.k").alias("k")).collect()[0].k
    assert got == "5"


@pytest.mark.parametrize(
    "text,expected",
    [
        ("fast fast slow table", (2 - 1) / 4),
        ("table scan join", 0.0),
        ("slow slow", -1.0),
        ("", None),
        ("   ", None),
    ],
)
def test_sentiment_score_hof(spark, text, expected):
    df = spark.createDataFrame([(text,)], "t string")
    got = df.select(sentiment_score("t").alias("s")).collect()[0].s
    assert got == expected


def test_sentiment_udf_matches_hof(spark):
    texts = [
        "fast value gain growth",
        "slow crash loss risk table",
        "the quick brown fox",
        "fast slow fast slow",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    both = df.select(
        sentiment_score("t").alias("hof"),
        sentiment_score_udf("t").alias("udf"),
    ).collect()
    for r in both:
        assert r.hof == r.udf


def test_multiline_json_extracts_like_the_reference_slice(spark):
    # the reference slices raw[find('{'):rfind('}')+1], which spans
    # newlines; without (?s) the regexp returned '' for any pretty-printed
    # object and the parse silently fell back to the default
    import duckdb

    raw = 'prefix {\n  "k": 7\n} suffix'
    df = spark.createDataFrame([(raw,)], "props string")
    got = df.select(
        coalesce_default(parse_json("props")["k"], -1).alias("k")
    ).collect()[0]
    assert got.k == 7
    # the DuckDB oracle regex (same (?s) flag) agrees
    duck = duckdb.sql(
        "SELECT COALESCE(TRY_CAST(json_extract_string("
        "regexp_extract(?, '(?s)(\\{.*\\})', 1), '$.k') AS INT), -1) AS k",
        params=[raw],
    ).fetchone()[0]
    assert duck == 7
