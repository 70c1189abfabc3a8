"""Deterministic lexicon sentiment scoring — SURVEY.md §2.9 L1 (+S6 analog).

The reference scores news headlines with TextBlob polarity
(streamlit_app.py:479-481: ``TextBlob(title).sentiment.polarity`` averaged
over articles, then bucketed at ±0.1). TextBlob itself is a lexicon lookup
under the hood; the engine re-expresses that as an explicit, reproducible
lexicon so a SQL oracle can replicate it bit-for-bit:

    score(text) = (|tokens ∩ POSITIVE| − |tokens ∩ NEGATIVE|) / |tokens|

Two implementations with identical semantics:

* ``sentiment_score``      — Catalyst HOF (filter/size over split), JVM-side,
                             codegen-friendly. THE scale path: at 100 TB this
                             is a narrow map, no shuffle, no Python.
* ``sentiment_score_udf``  — Arrow-batched pandas UDF. Exists because L1 in
                             the reference IS a Python-library UDF; this is
                             the idiomatic Spark shape for that (vectorized
                             batches, not row-at-a-time). Unit-tested equal
                             to the HOF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

#: fixed lexicons — deterministic TextBlob stand-in, reproducible in SQL
POSITIVE = ("fast", "good", "value", "smart", "gain", "growth")
NEGATIVE = ("slow", "bad", "error", "crash", "loss", "risk")


def _tokens(c: Column) -> Column:
    # single-space tokenization, empties dropped — matches the oracle's
    # string_split + list_filter and the pandas UDF's str.split(' ')
    return F.filter(F.split(c, " "), lambda t: F.length(t) > 0)


def sentiment_score(c: Column | str) -> Column:
    """Lexicon polarity in [-1, 1] as a pure Catalyst expression."""
    c = F.col(c) if isinstance(c, str) else c
    toks = _tokens(c)
    pos = F.size(F.filter(toks, lambda t: t.isin(*POSITIVE)))
    neg = F.size(F.filter(toks, lambda t: t.isin(*NEGATIVE)))
    n = F.size(toks)
    # int/int division on identical operands → identical IEEE double in any
    # engine; null (not NaN) on empty docs, like the oracle's NULLIF
    return (pos - neg) / F.nullif(n.cast("double"), F.lit(0.0))


@F.pandas_udf(DoubleType())
def sentiment_score_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched pandas UDF twin of ``sentiment_score`` (L1)."""
    pos, neg = set(POSITIVE), set(NEGATIVE)

    def score(t):
        if t is None:
            return None
        toks = [w for w in t.split(" ") if w]
        if not toks:
            return None
        p = sum(1 for w in toks if w in pos)
        m = sum(1 for w in toks if w in neg)
        return (p - m) / float(len(toks))

    return texts.map(score)


def oracle_score_sql(text_col: str = "text") -> str:
    """DuckDB SQL computing the same score (shared by query oracles)."""
    pos = ", ".join(f"'{w}'" for w in POSITIVE)
    neg = ", ".join(f"'{w}'" for w in NEGATIVE)
    return (
        f"(len(list_filter(string_split({text_col}, ' '), t -> t IN ({pos})))"
        f" - len(list_filter(string_split({text_col}, ' '), t -> t IN ({neg}))))"
        f" / NULLIF(CAST(len(list_filter(string_split({text_col}, ' '), t -> t != '')) AS DOUBLE), 0.0)"
    )
