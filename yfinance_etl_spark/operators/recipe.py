"""The end-to-end training-mix recipe as a reusable operator (r15).

curation_verdict → MinHash near-dup dedup → quota mixture → shard
packing, composed over a documents frame. Extracted from the registered
``training_mix_recipe`` query so the scale sweep
(tools/scale_stress.py kind=recipe) and any pipeline caller run the
IDENTICAL composition the oracle gates.

Composition contract (each choice is load-bearing at 100 TB):

* curation carries (source, text) through its single projection chain —
  the keep-filter is INLINE, no corpus self-join on doc_id;
* the near-dup pair set is detected over the FULL corpus (per-doc
  signatures commute with filters, so the full-table subplan is the one
  the shared cache pins) and then restricted to pairs with BOTH ends
  kept — curate-then-dedup semantics; a pair drops its higher id;
* the quota pick is the two-phase prefiltered form (sampling.py) and
  shard packing the distributed prefix-sum — both already scale-tiered;
* nothing materializes the corpus driver-side: driver traffic is the
  stratum-sized quota frames and pack_shards' range-count offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def training_mix(
    docs: DataFrame,
    total: int = 120,
    budget: int = 1500,
    threshold: float = 0.7,
    salt: str = "recipe",
    diag: dict | None = None,
) -> DataFrame:
    """Returns (doc_id, source, n_tokens, shard_id) — ``total`` docs,
    temperature-flattened across sources, curated and near-dup-free,
    packed into ~``budget``-token shards. ``diag`` (optional) receives
    stage cardinalities for the scale sweep."""
    from yfinance_etl_spark.operators.dedup import minhash_lsh_neardup
    from yfinance_etl_spark.operators.quality import curation_verdict
    from yfinance_etl_spark.operators.sampling import pack_shards, quota_sample
    from yfinance_etl_spark.operators.text import tokens

    kept = curation_verdict(
        docs.select("doc_id", "source", "text"), carry=("source", "text")
    ).filter("keep")
    pairs = minhash_lsh_neardup(docs, threshold=threshold)
    kept_ids = kept.select("doc_id")
    drops = (
        pairs.join(
            kept_ids.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi"
        )
        .join(kept_ids.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_semi")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    surv = kept.join(drops, "doc_id", "left_anti")
    picked = quota_sample(surv, "source", key="doc_id", total=total, salt=salt)
    toks = picked.select(
        "doc_id", "source", F.size(tokens("text")).alias("n_tokens")
    )
    packed = pack_shards(toks, "n_tokens", "doc_id", budget)
    out = packed.select("doc_id", "source", "n_tokens", "shard_id")
    if diag is not None:
        diag.update(
            n_kept=kept.count(),
            n_dropped=drops.count(),
            n_picked=picked.count(),
        )
    return out
