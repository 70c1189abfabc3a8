"""Heavy hitters: approximate frequent items with an exact verify pass.

The frequent-items member of the sketch family (alongside the HLL++ /
GK / KMV aggregates in ``plans/queries.py``): find the top-k most
frequent values of a column whose domain is far too large to
``groupBy`` at 100 TB — the canonical use is corpus vocabulary
("which tokens dominate my pretraining mix?"), where a full
word-frequency shuffle moves billions of distinct keys.

Two passes, both cluster-shaped:

1. **Misra-Gries summaries per partition** (``mapInPandas``): each task
   keeps at most ``capacity`` counters regardless of how many distinct
   values stream through it — bounded memory by construction. Counters
   are merged by value (a shuffle of at most ``tasks x capacity`` tiny
   rows, nothing like the full domain) into global LOWER BOUNDS with
   total undercount <= n/(capacity+1).
2. **Exact verify**: the candidate set (<= capacity values after the
   bound-ordered cut) is broadcast back over the token stream as a
   semi-join, and only candidate values are exactly counted — the agg's
   map-side partial state is <= capacity cells per task, so the second
   pass is a map-only scan plus a constant-size exchange.

Guarantee (standard MG): every value with true frequency
> n/(capacity+1) survives pass 1 with a positive merged bound, so the
reported top-k IS the exact top-k (exact counts, exact order) whenever
the k-th true frequency clears that threshold — trivially true when the
distinct count never exceeds ``capacity`` (no counter is ever evicted),
and true in the eviction regime for any Zipf-shaped corpus with
``capacity`` a small multiple of k. The unit tests pin both regimes;
the registry query runs the no-eviction regime so the DuckDB oracle
(full unnest + GROUP BY) matches bit-for-bit at every sf.

Reference scope note: the reference has no sketch surface at all (its
frequency displays are eager pandas ``value_counts`` over one frame,
e.g. news-source counts streamlit_app.py:464-476); this operator is
part of the brief-mandated 100 TB extension family.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yfinance_etl_spark.operators.partitioning import spread

#: mapInPandas output schema for the per-partition MG summaries
_MG_SCHEMA = "value string, lb long"


def _mg_reduce(counters: pd.Series, capacity: int) -> pd.Series:
    """Shrink a counter series to ``capacity`` entries the Misra-Gries
    way, vectorized: subtracting the (len-capacity)-th smallest count
    from every counter and dropping the non-positive ones is the batch
    equivalent of that many single-token decrement rounds (each round
    removes one unit from > capacity counters at once), so the MG
    undercount bound survives intact."""
    if len(counters) <= capacity:
        return counters
    cut = counters.nsmallest(len(counters) - capacity).iloc[-1]
    out = counters - cut
    return out[out > 0]


def misra_gries_partition(
    batches: Iterator[pd.DataFrame], capacity: int
) -> Iterator[pd.DataFrame]:
    """One partition's MG summary: fold Arrow batches into a single
    counter series (``value_counts`` per batch keeps the hot loop in C),
    reducing to ``capacity`` counters after each batch. Emits at most
    ``capacity`` (value, lower-bound) rows for the whole partition."""
    counters = pd.Series(dtype="int64")
    for pdf in batches:
        batch = pdf["value"].value_counts()
        counters = counters.add(batch, fill_value=0).astype("int64")
        counters = _mg_reduce(counters, capacity)
    yield pd.DataFrame({"value": counters.index, "lb": counters.to_numpy()})


def heavy_hitters(
    values: DataFrame, col: str, k: int, capacity: int = 64
) -> DataFrame:
    """Exact top-``k`` most frequent values of ``values[col]`` via the
    two-pass MG-candidates + exact-verify plan described in the module
    docstring. Returns columns ``(value, cnt)`` ordered by
    ``cnt DESC, value ASC`` (deterministic under count ties).

    ``capacity`` trades memory for the detection threshold n/(capacity+1);
    it must be >= k (the candidate cut keeps ``capacity`` values)."""
    if not 1 <= k <= capacity:
        raise ValueError(f"need 1 <= k <= capacity, got k={k} capacity={capacity}")
    toks = spread(values.select(F.col(col).cast("string").alias("value")))
    summaries = toks.mapInPandas(
        lambda it: misra_gries_partition(it, capacity), _MG_SCHEMA
    )
    # merged lower bounds; the cut keeps the candidate set <= capacity so
    # the verify side stays broadcastable no matter how many tasks ran
    candidates = (
        summaries.groupBy("value")
        .agg(F.sum("lb").alias("lb"))
        .orderBy(F.desc("lb"), F.asc("value"))
        .limit(capacity)
        .select("value")
    )
    exact = (
        toks.join(F.broadcast(candidates), "value", "left_semi")
        .groupBy("value")
        .agg(F.count("*").alias("cnt"))
    )
    return exact.orderBy(F.desc("cnt"), F.asc("value")).limit(k)


def word_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Lower-cased single-space word stream of a document table — the
    vocabulary-scan input shape for ``heavy_hitters``. Single-space
    split (not ``\\s+``) to stay definitionally identical to the DuckDB
    oracle's ``string_split(lower(text), ' ')``."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("value")
        )
        .filter(F.col("value") != "")
    )
