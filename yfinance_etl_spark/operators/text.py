"""Text-analysis operators over the documents table (north-star extension:
the ops a large-scale training-data pipeline needs — quality scoring, token
counting, language-ID heuristic, fingerprinting).

Pure Catalyst expressions (split / higher-order functions / regexp) —
JVM-side, codegen-friendly, scaling linearly with a parquet scan. The one
exception is ``rolling_hashes_udf``, the Arrow-vectorized twin of the
Catalyst ``rolling_hashes`` for the compute-dense fingerprint path. The
RAG-chunking analog of the reference (pdf_rag_chatbot.py:218, 800-char
chunks / 100 overlap) lives here too as a HOF explode, not a UDTF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

#: tiny deterministic english marker list for the lang-ID heuristic
EN_MARKERS = ("the", "a", "of", "and", "to", "is", "in")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization after whitespace normalization.

    Tokenizer unit contract (r10 verdict #5): the split is on the ASCII
    space after collapsing the ASCII ``\\s`` class — Java regex (Spark,
    no UNICODE_CHARACTER_CLASS) and RE2 (DuckDB) both read ``\\s`` as
    ASCII-only, and no per-character iteration happens, so ENGINE PARITY
    holds for arbitrary Unicode text (pinned by the BMP fixture test in
    tests/test_text_ops.py). The limitation is semantic, not
    cross-engine: NBSP/ideographic spaces are token-INTERNAL characters
    and unsegmented CJK is one long token — a real multilingual pipeline
    swaps in a language-aware segmenter upstream of these counters."""
    text = F.col(text) if isinstance(text, str) else text
    return F.split(F.regexp_replace(F.trim(text), r"\s+", " "), " ")


def token_char_sum(t: Column) -> Column:
    """Sum of token character lengths as an aggregate HOF. Shared by the
    text features here and the quality module's pure-HOF reference twin —
    one definition, so a change to length semantics (e.g. code-unit vs
    code-point) can't silently leave the other computing the old value."""
    return F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )


def with_text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document features: token count, avg token length, stopword ratio,
    quality score (length/stopword heuristics a pretraining pipeline filters on)."""
    t = tokens(text_col)
    n_tok = F.size(t)
    tok_chars = token_char_sum(t)
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


#: default word-shingle width. Shared constant (r17, ADVICE): dedup's
#: ``doc_hashes`` filters on ``size(tokens) >= SHINGLE_N`` as the cheap
#: equivalent of word_shingles' ``m >= 1`` non-empty guard — the two must
#: move together or the MinHash/SimHash row set silently desyncs.
SHINGLE_N = 3


def word_shingles(text: Column | str, n: int = SHINGLE_N) -> Column:
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
    chunk counts/boundaries are oracle-testable.

    NULL and empty documents yield an EMPTY array (zero chunks after
    ``explode``) — the reference splitter returns ``[]`` for empty input.
    Without the guard, ``greatest(NULL, 1)`` / ``greatest(0, 1)`` minted
    ONE chunk whose text was NULL/'' , which then flowed into downstream
    embedding as if it were a document."""
    text = F.col(text) if isinstance(text, str) else text
    stride = size - overlap
    n_chunks = F.greatest(
        F.ceil((F.length(text) - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.substring(text, (i * stride + 1).cast("int"), size).alias("chunk"),
        ),
    )
    empty = F.array().cast("array<struct<chunk_id:int,chunk:string>>")
    return F.when(F.length(text) > 0, chunks).otherwise(empty)


def regex_tokens(text: Column | str) -> Column:
    """BPE-ish regex tokenization: letter runs, digit runs, and single
    punctuation marks as separate tokens (the GPT-2 pre-tokenizer shape,
    minus unicode categories). Catalyst regexp_extract_all — JVM-side.

    Tokenizer unit contract: ``[A-Za-z]``/``[0-9]``/``\\s`` are ASCII in
    BOTH engines, and the catch-all ``[^...]`` class matches one CODE
    POINT in both Java regex and RE2 for BMP text — so a non-ASCII BMP
    char (é, я, 中, —) is one token on both sides, pinned by the BMP
    fixture test. Astral (non-BMP) chars are the one stated exposure:
    Java matches the class per code point, which the BMP contract
    deliberately stays inside (same boundary as ``char_entropy``)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document: (doc_id, term, tf, tfidf).

    Pure Catalyst: explode → two hash aggs (tf, then document frequency) →
    one broadcast of the 1-row corpus count → windowed top-k. The df agg
    output is vocabulary-sized (≪ corpus), so its join back to tf is the
    classic broadcast-able dimension; idf = ln(n_docs/df) is plain IEEE
    double math, bit-equal across engines, which is what lets the DuckDB
    oracle hash-match. Ties break by term for cross-engine determinism.
    """
    toks = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                6,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", "tf", "tfidf")
    )


#: rolling-hash parameters (Karp-Rabin): p fits every gram hash in int64
RH_K = 8
RH_BASE = 31
RH_MOD = 1_000_000_007


def rolling_hashes(text: Column | str, k: int = RH_K) -> Column:
    """Karp-Rabin k-gram hash sequence: h_i = (Σ_j ascii(c_{i+j})·B^j) mod p
    for every character window. The min over windows is a winnowing-style
    document fingerprint robust to content shifts (unlike the whole-doc
    md5, a one-char edit changes only k of the window hashes).

    The inner sum is unrolled over the fixed k — plain codegen arithmetic,
    no nested lambda. Exact int64: max Σ < 255·31⁷·8 ≪ 2⁶³.
    """
    text = F.col(text) if isinstance(text, str) else text
    n_windows = F.length(text) - (k - 1)

    def gram(i):
        h = F.ascii(text.substr(i, F.lit(1))).cast("long")
        for j in range(1, k):
            h = h + F.ascii(text.substr(i + F.lit(j), F.lit(1))).cast("long") * (RH_BASE**j)
        return h % RH_MOD

    return F.when(
        n_windows >= 1,
        F.transform(F.sequence(F.lit(1), n_windows), lambda i: gram(i)),
    ).otherwise(F.array().cast("array<long>"))


@F.pandas_udf(ArrayType(LongType()))
def rolling_hashes_udf(texts: pd.Series) -> pd.Series:
    """Arrow pandas-UDF twin of ``rolling_hashes`` (unit-tested equal):
    the k-gram hash sequence as one vectorized ``np.correlate`` per doc.
    The Catalyst version defines the semantics; this is the throughput
    path — per-window interpreted-lambda evaluation costs ~10µs/window,
    the correlation costs nanoseconds."""
    import numpy as np

    kernel = np.array([RH_BASE**j for j in range(RH_K)], dtype=np.int64)

    def hashes(t):
        if t is None:
            return None
        try:
            # ASCII fast path: byte values ARE the codepoints, and frombuffer
            # beats the per-char ord() comprehension by ~2 orders of magnitude
            codes = np.frombuffer(t.encode("ascii"), dtype=np.uint8).astype(np.int64)
        except UnicodeEncodeError:
            codes = np.array([ord(c) for c in t], dtype=np.int64)
        if len(codes) < RH_K:
            return []
        # correlate (unlike convolve) does NOT flip the kernel:
        # out[i] = Σ_j codes[i+j]·kernel[j], exactly h_i in window order
        return (np.correlate(codes, kernel, "valid") % RH_MOD).tolist()

    return texts.map(hashes)
