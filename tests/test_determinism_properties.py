"""Property-based tests (hypothesis) for the engine's determinism core.

The whole correctness story rests on one claim: decimal-routed float
aggregates are exact and therefore identical across partitionings, row
orders, and engines. These properties attack that claim with arbitrary
inputs rather than fixtures.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from yfinance_etl_spark.functions.scalar import dsum

#: money-magnitude floats with full fractional noise
money = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=64
)


@settings(max_examples=10, deadline=None)
@given(st.lists(money, min_size=1, max_size=60), st.integers(min_value=1, max_value=7))
def test_dsum_invariant_under_repartitioning(spark, xs, n_parts):
    df = spark.createDataFrame([(x,) for x in xs], "v double")
    a = df.coalesce(1).agg(dsum("v").alias("s")).collect()[0].s
    b = df.repartition(n_parts).agg(dsum("v").alias("s")).collect()[0].s
    # bit-for-bit equal, not approx: the decimal route must kill order effects
    assert a == b


@settings(max_examples=10, deadline=None)
@given(st.lists(money, min_size=1, max_size=60))
def test_dsum_matches_exact_decimal_arithmetic(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "v double")
    got = df.agg(dsum("v").alias("s")).collect()[0].s
    # the reference computation mirrors Spark's double→decimal conversion:
    # SHORTEST decimal representation (BigDecimal.valueOf == repr), then
    # HALF_UP quantization to scale 12, exact decimal sum, one final
    # rounding back to double. Decimal(x) (exact binary expansion) would
    # differ in the last ulp — hence repr(x).
    exact = sum(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-12), rounding=ROUND_HALF_UP)
        for x in xs
    )
    assert got == float(exact)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=10))
def test_sentiment_hof_udf_agree_on_arbitrary_text(spark, texts):
    from yfinance_etl_spark.operators.sentiment import sentiment_score, sentiment_score_udf

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    rows = df.select(
        sentiment_score("t").alias("hof"), sentiment_score_udf("t").alias("udf")
    ).collect()
    for r in rows:
        assert r.hof == r.udf
