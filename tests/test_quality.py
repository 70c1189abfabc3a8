"""Gopher/C4 repetition-quality operators — the Arrow counting kernel must be
row-for-row identical to the pure-Catalyst HOF reference, including the edge
cases (empty string, single token, all-repeated tokens, null text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yfinance_etl_spark.operators.quality import (
    with_repetition_features,
    with_repetition_features_hof,
)

FEATURES = [
    "n_words",
    "dup_word_fraction",
    "top_word_fraction",
    "top_bigram_fraction",
    "mean_word_len",
    "keep",
]

EDGE_TEXTS = [
    "",  # one empty token (split('', ' ') semantics)
    "word",  # single token → no bigrams → null top_bigram_fraction
    "spam spam spam spam",  # fully repeated
    "the quick brown fox jumps over the lazy dog",
    "  leading   and \t trailing  ",  # whitespace collapse
    "a b a b a b a b",  # repeated bigram
    None,  # null text → all-null features
    "one two three four five six seven eight nine ten",
    "\tfoo bar",  # leading tab survives JVM trim → leading empty token
    "nbsp stays inside token",  # Java \s is ASCII-only: NBSP is not a separator
    "tab\tand\nnewline\x0bmix\r\fdone",  # every ASCII \s char collapses
]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_arrow_kernel_matches_hof_reference(spark):
    docs = _docs(spark, EDGE_TEXTS)
    fast = with_repetition_features(docs).orderBy("doc_id").collect()
    ref = with_repetition_features_hof(docs).orderBy("doc_id").collect()
    assert len(fast) == len(ref) == len(EDGE_TEXTS)
    for f, r in zip(fast, ref):
        for c in FEATURES:
            assert f[c] == r[c], (f.doc_id, c, f[c], r[c])


def test_repetition_features_values(spark):
    rows = {
        r.doc_id: r
        for r in with_repetition_features(_docs(spark, EDGE_TEXTS)).collect()
    }
    spammy = rows[2]
    assert spammy.n_words == 4
    assert spammy.dup_word_fraction == 0.75
    assert spammy.top_word_fraction == 1.0
    assert spammy.top_bigram_fraction == 1.0
    assert spammy.keep is False
    single = rows[1]
    assert single.n_words == 1
    assert single.top_bigram_fraction is None
    nullrow = rows[6]
    assert nullrow.n_words is None and nullrow.keep is None


def test_repetition_features_on_fixture_corpus(spark):
    # real corpus smoke: every non-null feature in-range, keep is boolean
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = with_repetition_features(docs).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("top_word_fraction").alias("lo"),
        F.max("top_word_fraction").alias("hi"),
        F.sum(F.col("keep").cast("int")).alias("n_keep"),
    ).collect()[0]
    assert out.n > 0
    assert 0.0 < out.lo <= out.hi <= 1.0
    assert 0 <= out.n_keep <= out.n


# ---------------------------------------------------------------------------
# Character entropy (char_entropy + its map-only Arrow twin)
# ---------------------------------------------------------------------------


def test_char_entropy_known_values(spark):
    from yfinance_etl_spark.operators.quality import char_entropy

    df = spark.createDataFrame(
        [(0, "aabb"), (1, "aaaa"), (2, "abcd")], "doc_id bigint, text string"
    )
    got = {r.doc_id: r for r in char_entropy(df).collect()}
    # 2 symbols, uniform → exactly 1 bit; 1 symbol → 0; 4 uniform → 2 bits
    assert got[0].entropy_bits == 1.0
    assert got[1].entropy_bits == 0.0
    assert got[2].entropy_bits == 2.0
    assert (got[0].n_chars_counted, got[0].distinct_chars) == (4, 2)
    assert (got[2].n_chars_counted, got[2].distinct_chars) == (4, 4)


def test_char_entropy_kernel_pins_catalyst(spark):
    """Map-only Arrow twin == shuffle-form Catalyst entropy at 6dp on a
    messy corpus (skewed distributions, long text, single char)."""
    from yfinance_etl_spark.operators.quality import char_entropy, char_entropy_kernel

    rows = [
        (0, "the quick brown fox jumps over the lazy dog " * 7),
        (1, "aaaaaaaaaaaaaaaaaaaaab"),
        (2, "z"),
        (3, "abab cdcd efef 1212 !?!? " * 3),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    cat = {r.doc_id: r.entropy_bits for r in char_entropy(df).collect()}
    ker = {r.doc_id: r.entropy_bits for r in char_entropy_kernel(df).collect()}
    assert cat == ker


def test_char_entropy_skips_empty_and_null(spark):
    from yfinance_etl_spark.operators.quality import char_entropy

    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "ok")], "doc_id bigint, text string"
    )
    got = {r.doc_id for r in char_entropy(df).collect()}
    assert got == {2}  # no chars → no row, not a NaN/zero row


def test_char_entropy_character_unit_contract(spark):
    """The character-unit contract (r9 advice), made executable: on BMP
    non-ASCII text the Catalyst form's UTF-16 code-unit split equals the
    codepoint distribution (== the DuckDB oracle's string_split), while
    the UTF-8-byte-counting Arrow kernel sees a DIFFERENT distribution —
    so a multilingual fixture trips the kernel-pin test loudly instead of
    letting the twins drift apart silently."""
    import math
    from collections import Counter

    from yfinance_etl_spark.operators.quality import char_entropy, char_entropy_kernel

    txt = "héllo wörld — café naïve"  # BMP only: 2-/3-byte UTF-8, no astral
    df = spark.createDataFrame([(0, txt)], "doc_id bigint, text string")
    cat = char_entropy(df).collect()[0]
    # codepoint truth (Python str iterates codepoints; == UTF-16 units on BMP)
    cnt = Counter(txt)
    tot = sum(cnt.values())
    want = round(
        math.fsum(-(n / tot) * math.log(n / tot) for n in cnt.values())
        / math.log(2.0),
        6,
    )
    assert cat.distinct_chars == len(cnt)
    assert abs(cat.entropy_bits - want) <= 1e-6
    # the byte-level kernel counts é/ö/— as 2-3 symbols each → diverges
    ker = char_entropy_kernel(df).collect()[0].entropy_bits
    assert abs(ker - cat.entropy_bits) > 1e-3
