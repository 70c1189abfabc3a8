"""Text-analysis operators over the documents table (north-star extension:
the ops a large-scale training-data pipeline needs — quality scoring, token
counting, language-ID heuristic, fingerprinting).

All pure Catalyst expressions (split / higher-order functions / regexp) —
JVM-side, no UDFs, so they run inside whole-stage codegen and scale linearly
with a parquet scan. The RAG-chunking analog of the reference
(pdf_rag_chatbot.py:218, 800-char chunks / 100 overlap) lives here too as a
HOF explode, not a UDTF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny deterministic english marker list for the lang-ID heuristic
EN_MARKERS = ("the", "a", "of", "and", "to", "is", "in")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization after whitespace normalization."""
    text = F.col(text) if isinstance(text, str) else text
    return F.split(F.regexp_replace(F.trim(text), r"\s+", " "), " ")


def with_text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document features: token count, avg token length, stopword ratio,
    quality score (length/stopword heuristics a pretraining pipeline filters on)."""
    t = tokens(text_col)
    n_tok = F.size(t)
    tok_chars = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )
    markers = F.array(*[F.lit(m) for m in EN_MARKERS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(markers, x)))
    return (
        docs.withColumn("n_tokens", n_tok)
        .withColumn("avg_token_len", F.round(tok_chars / n_tok, 6))
        .withColumn("stopword_ratio", F.round(n_stop / n_tok, 6))
        .withColumn(
            "quality_score",
            F.round(
                F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.5
                + (1 - n_stop / n_tok) * 0.5,
                6,
            ),
        )
        .withColumn(
            "pred_lang",
            F.when(n_stop >= 2, F.lit("en")).otherwise(F.lit("unknown")),
        )
    )


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 over normalized text
    (lowercase, collapsed whitespace) — the exact-dedup key."""
    text = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array column (input to MinHash/Jaccard dedup).

    Documents shorter than n tokens yield an EMPTY array (matching the
    DuckDB ``range(1, m+1)`` oracle semantics). Without the guard,
    ``sequence(1, 0)`` would produce a *descending* [1, 0] array and
    ``element_at`` would fail on out-of-range indices for short docs.
    """
    t = tokens(text)
    m = F.size(t) - (n - 1)
    shingles = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, (i + k).cast("int")) for k in range(n)]
        ),
    )
    return F.when(m >= 1, shingles).otherwise(F.array().cast("array<string>"))


def chunk_text(text: Column | str, size: int = 800, overlap: int = 100) -> Column:
    """L3 chunker (reference RecursiveCharacterTextSplitter(800,100),
    pdf_rag_chatbot.py:218) as a pure HOF: fixed-stride character windows,
    ARRAY<STRUCT<chunk_id,text>> ready for ``explode``. Deterministic, so
    chunk counts/boundaries are oracle-testable."""
    text = F.col(text) if isinstance(text, str) else text
    stride = size - overlap
    n_chunks = F.greatest(
        F.ceil((F.length(text) - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.substring(text, (i * stride + 1).cast("int"), size).alias("chunk"),
        ),
    )
