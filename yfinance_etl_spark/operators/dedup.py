"""Deduplication operators over the documents table (north-star extension).

Three tiers, all shuffle-conscious:

* exact: hash-groupBy on a normalized fingerprint — one shuffle, the 100 TB
  workhorse.
* n-gram Jaccard: inverted-index self-join on shingles (join fans out only on
  *shared* shingles, so cost tracks true similarity, not |docs|²).
* MinHash + LSH: constant-size signatures (k seeded md5 minima), banded so
  only same-bucket docs join — the scale path; candidates are then verified
  with exact Jaccard *on the candidate set only* (the classic
  cheap-filter → exact-verify pipeline).

MinHash uses lexicographic minima of seeded md5 hex digests: md5 is available
and bit-identical in both Spark and DuckDB, which keeps the whole pipeline
oracle-testable (a seeded murmur would not be).

Reference has no dedup at all; nearest analogs are its FAISS near-neighbor
retrieval (pdf_rag_chatbot.py:223) and pandas index dedup — cited for parity
bookkeeping only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yfinance_etl_spark.operators.text import fingerprint, word_shingles

N_HASHES = 16
BAND_ROWS = 4  # → 4 bands of 4 rows: S-curve midpoint (1/4)^(1/4) ≈ 0.707,
# matched to the 0.7 verify threshold (pairs well below it rarely candidate,
# pairs above it almost always do)

#: shingles present in more than this fraction of the corpus are dropped
#: before any self-join — a stop-phrase shingle in 10⁶ docs would otherwise
#: fan the inverted-index join out to 10¹² rows. Dropping it loses almost no
#: signal (a shingle shared by half the corpus identifies nothing).
MAX_DF_FRAC = 0.5


def exact_dedup_stats(docs: DataFrame) -> DataFrame:
    """Per-source exact-duplicate profile via normalized-md5 fingerprint."""
    fp = docs.select("source", fingerprint("text").alias("fp"))
    return fp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_dupes"),
    )


def doc_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) distinct pairs — the inverted-index base."""
    return docs.select(
        "doc_id", F.explode(word_shingles("text")).alias("shingle")
    ).distinct()


def _df_filtered_shingles(docs: DataFrame, max_df_frac: float) -> DataFrame:
    """Inverted index with hot (stop-phrase) shingles removed.

    The document-frequency cutoff is THE guard that keeps the shingle
    self-join linear-ish at scale: join fan-out per shingle is df², so one
    shingle with df=10⁶ costs 10¹² rows. Sizes downstream are computed on
    this same filtered universe so Jaccard stays internally consistent.
    No collect(): the corpus size joins in as a broadcast 1-row aggregate.
    """
    sh = doc_shingles(docs)
    if max_df_frac >= 1.0:
        return sh
    n = docs.select(F.count(F.lit(1)).alias("n_docs"))
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(dfreq, "shingle")
        .join(F.broadcast(n))
        .filter(F.col("df") <= max_df_frac * F.col("n_docs"))
        .select("doc_id", "shingle")
    )


def jaccard_pairs(
    docs: DataFrame, threshold: float = 0.8, max_df_frac: float = MAX_DF_FRAC
) -> DataFrame:
    """All doc pairs with word-3gram Jaccard ≥ threshold, via inverted index
    (hot shingles df-filtered first — see _df_filtered_shingles)."""
    sh = _df_filtered_shingles(docs, max_df_frac)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


#: smallest prime above 2³² — modulus of the affine MinHash permutations
H_PRIME = 4294967311


def minhash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_val): banded MinHash signatures.

    One 32-bit base hash per shingle (first 8 md5 hex chars), then the i-th
    MinHash is min over shingles of the affine permutation
    ``((2i+1)·h + i) mod H_PRIME`` — N_HASHES plain MIN aggregates in a
    single doc_id shuffle. (The previous shape exploded every shingle
    N_HASHES× and re-ran md5 per seed: 16× the shuffle rows and 16× the
    hashing for the same signatures. max |a·h| < 2⁵·2³² ≪ 2⁶³, no overflow.)
    A band is the '|'-join of its BAND_ROWS consecutive minima.
    """
    sh = doc_shingles(docs)
    h = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    minh = sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(2 * i + 1) * h + F.lit(i)) % F.lit(H_PRIME)).alias(f"mh{i}")
            for i in range(N_HASHES)
        ]
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    "|",
                    *[F.col(f"mh{b * BAND_ROWS + r}").cast("string") for r in range(BAND_ROWS)],
                ).alias("band_val"),
            )
            for b in range(N_HASHES // BAND_ROWS)
        ]
    )
    return minh.select("doc_id", F.explode(bands).alias("bd")).select(
        "doc_id", F.col("bd.band_id").alias("band_id"), F.col("bd.band_val").alias("band_val")
    )


SIMHASH_BITS = 32
SIM_BANDS = 4  # 4 bands of 8 bits — see simhash_neardup's pigeonhole note
HAMMING_MAX = 3


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 32-bit SimHash over the shingle set.

    Per shingle one 32-bit base hash; bit b of the signature is the sign of
    the vote Σ(2·bit_b(h) − 1) over shingles. Like MinHash this is
    N_BITS plain SUM aggregates in one doc_id shuffle — no row expansion.
    Near-dup docs differ in few shingles → few vote flips → small Hamming
    distance between signatures.
    """
    sh = doc_shingles(docs)
    h = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    votes = sh.groupBy("doc_id").agg(
        *[
            F.sum(F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"v{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sig = sum(
        (F.when(F.col(f"v{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0)) for b in range(SIMHASH_BITS)),
        F.lit(0),
    )
    return votes.select("doc_id", sig.cast("long").alias("simhash"))


def simhash_neardup(docs: DataFrame, hamming_max: int = HAMMING_MAX) -> DataFrame:
    """SimHash near-dedup: Hamming-LSH banding into FOUR 8-bit bands of the
    32-bit signature, then exact Hamming verify on candidates. Pigeonhole
    guarantee: a pair within Hamming ≤ 3 has its differing bits in at most
    3 of the 4 bands, so at least one band matches exactly — recall at the
    hamming_max=3 threshold is 1.0 by construction, not probabilistic.
    (Fewer, wider bands would deterministically miss pairs whose differing
    bits span every band.) Same cheap-filter → exact-verify shape as the
    MinHash path; the band join key is what keeps this linear-ish at
    corpus scale."""
    sig = simhash_signatures(docs)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(F.col("simhash"), 8 * b).bitwiseAND(F.lit(255)).alias("band_val"),
                    )
                    for b in range(SIM_BANDS)
                ]
            )
        ).alias("bd"),
    ).select("doc_id", "simhash", "bd.band_id", "bd.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= hamming_max)
        .select("doc_a", "doc_b", "hamming")
    )


def minhash_lsh_neardup(docs: DataFrame, threshold: float = 0.7) -> DataFrame:
    """Full near-dedup pipeline: LSH candidate pairs → exact Jaccard verify.

    Only same-bucket docs are joined (the LSH point); exact Jaccard then runs
    on the tiny candidate set. Returns (doc_a, doc_b, n_shared_bands, jaccard).
    """
    bands = minhash_bands(docs)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    sh = doc_shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    ia = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("sh_a"))
    ib = sh.select(F.col("doc_id").alias("cand_b"), F.col("shingle").alias("sh_b"))
    inter = (
        cand.select("doc_a", "doc_b")
        .join(ia, "doc_a")
        .join(ib, (F.col("doc_b") == F.col("cand_b")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        cand.join(inter, ["doc_a", "doc_b"])
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", "n_shared_bands", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
