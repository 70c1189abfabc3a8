"""Contrastive training-pair mining over the dedup candidate graph.

A training-data pipeline that runs near-dup detection already holds the
most valuable supervision signal for training retrieval/embedding models:
verified-similar pairs (positives) and verified-NOT-similar-but-related
pairs (hard negatives — the candidates that shared an indexed shingle yet
verified below the dup threshold, exactly the "looks close, isn't" rows a
contrastive loss needs). This module turns that byproduct into (anchor,
positive, negative) triplets deterministically, with a seeded-permutation
fallback negative for anchors whose candidate neighborhood offers no hard
negative.

Reference analog: the reference pipeline embeds chunks for FAISS retrieval
(pdf_rag_chatbot.py:60-61) but never mines its dedup structure for
training pairs — this is engine-side leverage a 100 TB corpus makes
valuable (SimCLR/DPR-style hard-negative mining, re-expressed relationally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yfinance_etl_spark.operators.dedup import jaccard_pairs


def contrastive_triplets(
    docs: DataFrame,
    threshold: float = 0.8,
    floor: float = 0.05,
    seed: str = "ctr",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """(anchor_id, positive_id, negative_id, pos_jaccard, neg_jaccard,
    neg_kind) — one triplet per anchor that has a verified positive.

    * positive: the anchor's highest-jaccard partner at/above
      ``threshold`` (tie → lowest id) — the dedup verdict reused as a
      similarity label.
    * negative, ``neg_kind='hard'``: the anchor's highest-jaccard
      candidate BELOW ``threshold`` but at/above ``floor`` — shares
      indexed vocabulary with the anchor (related) while verified
      not-duplicate: the classic mined hard negative.
    * negative, ``neg_kind='permuted'``: when no such candidate exists,
      a seeded-permutation pick — docs are ranked by md5(seed:doc_id)
      (a deterministic global shuffle), and the anchor jumps a
      seed-derived offset along that ring. A fallback that lands on the
      anchor's positive or on ANY of its candidates is dropped rather
      than silently mislabeled (stated contract: the triplet set is a
      subset of anchors, never a wrong label); its ``neg_jaccard`` is
      0.0 — "no shared indexed shingle", the candidate graph's notion
      of unrelated.

    Determinism: every choice is a window rank over (jaccard desc, id)
    or md5 arithmetic — reproducible across runs, engines, and partition
    layouts; the DuckDB oracle replays all of it.

    Scale shape: the dominant cost is the inverted-index pair join the
    dedup pass ALREADY paid (pass it via ``pairs`` / hit the shared
    cache); everything on top is two window ranks over the pair frame
    (anchor-keyed — shuffles on the anchor id), one corpus-sized
    permutation window for the fallback ring, and candidate-sized
    anti/equi-joins. No driver round-trips, no per-row Python."""
    if floor >= threshold:
        raise ValueError(
            f"floor must be < threshold (got floor={floor}, threshold={threshold})"
        )
    all_pairs = (
        pairs if pairs is not None else jaccard_pairs(docs, threshold=None)
    )
    sym = all_pairs.select(
        F.col("doc_a").alias("anchor_id"),
        F.col("doc_b").alias("other_id"),
        "jaccard",
    ).unionAll(
        all_pairs.select(
            F.col("doc_b").alias("anchor_id"),
            F.col("doc_a").alias("other_id"),
            "jaccard",
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("jaccard"), F.asc("other_id")
    )
    pos = (
        sym.filter(F.col("jaccard") >= threshold)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("other_id").alias("positive_id"),
            F.col("jaccard").alias("pos_jaccard"),
        )
    )
    hard = (
        sym.filter((F.col("jaccard") < threshold) & (F.col("jaccard") >= floor))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("other_id").alias("hard_id"),
            F.col("jaccard").alias("hard_jaccard"),
        )
    )

    # seeded-permutation ring: rank docs by md5(seed:doc_id) (tie →
    # zero-padded doc_id), jump a seed-derived offset in [1, n-1] from
    # the anchor's own slot — lands on a different slot by construction.
    # The global rank is NOT a no-partition window (one-reducer at
    # scale): a seeded permutation is pack_shards with unit weight and
    # unit budget — rank = exclusive prefix + 1 — which already carries
    # the distributed prefix-sum shape (range shuffle + pid window +
    # k-scalar offset broadcast).
    from yfinance_etl_spark.operators.sampling import pack_shards

    ids = docs.select("doc_id")
    n = ids.count()
    ring_key = F.concat(
        F.md5(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string"))),
        F.lit(":"),
        F.lpad(F.col("doc_id").cast("string"), 20, "0"),
    )
    ring = pack_shards(
        ids.select("doc_id", ring_key.alias("__rkey"), F.lit(1).alias("__one")),
        weight_col="__one",
        key="__rkey",
        budget=1,
    ).select("doc_id", (F.col("shard_id") + 1).cast("int").alias("rk"))
    offset = (
        F.lit(1)
        + F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}#"), F.col("anchor_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(max(n - 1, 1))
    )
    anchors = pos.select("anchor_id", "positive_id")
    fb = (
        anchors.join(
            ring.select(F.col("doc_id").alias("anchor_id"), F.col("rk").alias("ark")),
            "anchor_id",
        )
        .withColumn("trk", (F.col("ark") - 1 + offset) % F.lit(n) + 1)
        .join(
            ring.select(F.col("doc_id").alias("fb_id"), F.col("rk").alias("trk")),
            "trk",
        )
        .select("anchor_id", "positive_id", "fb_id")
    )
    # a fallback landing on the positive or on ANY candidate of the
    # anchor is dropped, never mislabeled
    fb_valid = (
        fb.filter(F.col("fb_id") != F.col("positive_id"))
        .join(
            sym.select("anchor_id", F.col("other_id").alias("fb_id")),
            ["anchor_id", "fb_id"],
            "left_anti",
        )
        .select("anchor_id", "fb_id")
    )
    return (
        pos.join(hard, "anchor_id", "left")
        .join(fb_valid, "anchor_id", "left")
        .select(
            "anchor_id",
            "positive_id",
            F.coalesce(F.col("hard_id"), F.col("fb_id")).alias("negative_id"),
            "pos_jaccard",
            F.coalesce(F.col("hard_jaccard"), F.lit(0.0)).alias("neg_jaccard"),
            F.when(F.col("hard_id").isNotNull(), F.lit("hard"))
            .otherwise(F.lit("permuted"))
            .alias("neg_kind"),
        )
        .filter(F.col("negative_id").isNotNull())
    )
