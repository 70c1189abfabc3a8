"""Deterministic corpus blow-up for scale-stress runs.

The dedup/ANN family claims its cost tracks the CANDIDATE set, not
|docs|². Fixtures can't test that claim — they are fully sampled — so
this module scales a corpus N× deterministically while keeping the true
duplicate structure LINEAR in corpus size:

* replica 0 of every row is the original, byte-identical;
* replica r > 0 prefixes every 4th word with an ``r``-specific marker.
  A word-3gram shingle window covers 3 words, so a mutation every 4
  words touches ~3 of every 4 shingles → cross-replica Jaccard ≈ 0.14,
  far under any dedup threshold. Replicas of the SAME underlying
  near-dup pair (a_r, b_r) remain near-dups of each other, so true
  pairs grow ~N×, never N².

Everything is a per-row ``explode`` + HOF projection — zero shuffle, no
driver data, scale-invariant (the blow-up itself is 100 TB-shaped).
``tools/scale_stress.py`` runs the measurements; the sub-quadratic
candidate-growth property is pinned in tests/test_scale_stress.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blow_up_documents(docs: DataFrame, factor: int) -> DataFrame:
    """Corpus × factor with replica-specific word mutations (see module
    doc). New doc_id = doc_id * factor + replica — collision-free and
    reproducible from (doc_id, factor) alone."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    rep = F.col("__rep")
    words = F.split("text", " ")
    mutated = F.array_join(
        F.transform(
            words,
            lambda w, i: F.when(
                (rep > 0) & (i % 4 == 0),
                F.concat(F.lit("v"), rep.cast("string"), F.lit("_"), w),
            ).otherwise(w),
        ),
        " ",
    )
    return (
        docs.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__rep")
        )
        .withColumn("doc_id", F.col("doc_id") * factor + rep)
        .withColumn("text", mutated)
        .withColumn("n_chars", F.length(mutated))
        .drop("__rep")
    )


def blow_up_embeddings(emb: DataFrame, factor: int) -> DataFrame:
    """Embedding table × factor: replica r > 0 perturbs each dimension by
    a small deterministic offset in [-0.03, 0.03] — replicas stay in the
    same neighborhood (realistic near-duplicate vectors) without being
    byte-equal."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    rep = F.col("__rep")
    perturbed = F.transform(
        "embedding",
        lambda x, i: (
            x + F.when(rep > 0, ((rep * 31 + i) % 7 - 3) * F.lit(0.01)).otherwise(0.0)
        ).cast("float"),
    )
    return (
        emb.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__rep")
        )
        .withColumn("vec_id", F.col("vec_id") * factor + rep)
        .withColumn("embedding", perturbed)
        .drop("__rep")
    )


def blow_up_events(events: DataFrame, factor: int) -> DataFrame:
    """Event stream × factor at the SAME time span: replica r shifts ts by
    r seconds and renumbers event_id collision-free, user_id unchanged —
    so per-user event RATE scales ×factor while per-user ordering stays
    realistic. This is the load knob for the as-of-join and streaming
    state sweeps (state must track rate × window, never total volume)."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    rep = F.col("__rep")
    return (
        events.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__rep")
        )
        .withColumn("event_id", F.col("event_id") * factor + rep)
        .withColumn("ts", F.col("ts") + rep * F.expr("INTERVAL 1 SECOND"))
        .drop("__rep")
    )


def lsh_candidate_volume(docs: DataFrame) -> int:
    """Σ over (band_id, band_val) buckets of n·(n-1)/2 — the number of
    candidate comparisons the MinHash-LSH band join performs (with
    multiplicity across bands). THE scale metric: corpus N× with linear
    dup structure must grow this ~N×, not N²."""
    from yfinance_etl_spark.operators.dedup import minhash_bands

    return int(
        minhash_bands(docs)
        .groupBy("band_id", "band_val")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("v"))
        .collect()[0]["v"]
        or 0
    )


def jaccard_candidate_volume(docs: DataFrame) -> int:
    """Σ over surviving shingles of df·(df-1)/2 — comparisons the
    inverted-index Jaccard join performs after the df-cutoff."""
    from yfinance_etl_spark.operators.dedup import MAX_DF_FRAC, _df_filtered_shingles

    return int(
        _df_filtered_shingles(docs, MAX_DF_FRAC)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("v"))
        .collect()[0]["v"]
        or 0
    )


def ann_candidate_volume(emb: DataFrame, n_planes: int = 6) -> int:
    """Σ over hyperplane-LSH buckets of n·(n-1)/2 — comparisons the
    bucketed ANN self-join performs (brute force would be N·(N-1)/2)."""
    from yfinance_etl_spark.operators.similarity import lsh_bucket

    return int(
        lsh_bucket(emb, n_planes)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("v"))
        .collect()[0]["v"]
        or 0
    )
