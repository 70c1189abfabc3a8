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


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10_000), st.integers(min_value=1, max_value=500)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=6),
)
def test_pack_shards_invariant_under_partitioning(spark, rows, n_parts):
    # shard assignment must depend on KEY ORDER alone — never on how rows
    # arrive (the distributed prefix-sum's correctness claim)
    from yfinance_etl_spark.operators.sampling import pack_shards

    df = spark.createDataFrame(rows, "k bigint, w bigint")
    a = {
        r.k: r.shard_id
        for r in pack_shards(df, "w", "k", budget=700, num_ranges=n_parts).collect()
    }
    run, expect = 0, {}
    for k, w in sorted(rows):
        expect[k] = run // 700
        run += w
    assert a == expect


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=2, max_value=9))
def test_stratified_sample_membership_is_partition_free(spark, n_parts):
    from yfinance_etl_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "s" + str(i % 3)) for i in range(300)], "doc_id bigint, stratum string"
    )
    base = {r.doc_id for r in stratified_sample(df, "stratum", {"s0": 0.5}, "doc_id", 0.2).collect()}
    re = {
        r.doc_id
        for r in stratified_sample(
            df.repartition(n_parts), "stratum", {"s0": 0.5}, "doc_id", 0.2
        ).collect()
    }
    assert base == re


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
