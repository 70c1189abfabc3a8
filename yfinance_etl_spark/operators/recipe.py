"""The end-to-end training-mix recipe as a reusable operator (r15;
multimodal composition r16).

curation_verdict → near-dup dedup (text MinHash ∪ any modality pair
frames) → quota mixture → shard packing, composed over a documents
frame. Extracted from the registered ``training_mix_recipe`` /
``training_mix_multimodal`` queries so the scale sweep
(tools/scale_stress.py kind=recipe / kind=recipe_mm) and any pipeline
caller run the IDENTICAL composition the oracle gates.

Composition contract (each choice is load-bearing at 100 TB):

* curation carries (source, text) through its single projection chain —
  the keep-filter is INLINE, no corpus self-join on doc_id;
* the near-dup pair set is detected over the FULL corpus (per-doc
  signatures commute with filters, so the full-table subplan is the one
  the shared cache pins) and then restricted to pairs with BOTH ends
  kept — curate-then-dedup semantics; a pair drops its higher id. The
  THREE MODALITY TIERS feed the SAME drop logic: every tier emits
  (doc_a, doc_b) with doc_a < doc_b (the shared dHash-word contract),
  so a multimodal corpus loses its image/audio/video near-dups in the
  same union the text near-dups flow through (r15 verdict missing #3);
* the quota pick is the two-phase prefiltered form (sampling.py) and
  shard packing the distributed prefix-sum — both already scale-tiered;
* nothing materializes the corpus driver-side: driver traffic is the
  stratum-sized quota frames and pack_shards' range-count offsets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def training_mix(
    docs: DataFrame,
    total: int = 120,
    budget: int = 1500,
    threshold: float = 0.7,
    salt: str = "recipe",
    diag: dict | None = None,
    asset_pairs: Sequence[DataFrame] = (),
    budget_unit: str = "whitespace",
    n_merges: int = 8,
) -> DataFrame:
    """Returns (doc_id, source, n_tokens, shard_id) — ``total`` docs,
    temperature-flattened across sources, curated and near-dup-free,
    packed into ~``budget``-token shards. ``asset_pairs``: extra
    near-dup pair frames, each (doc_a, doc_b) with doc_a < doc_b (e.g.
    the image/audio/video tiers — see :func:`training_mix_multimodal`),
    unioned into the drop set alongside the text MinHash pairs.
    ``diag`` (optional) receives stage cardinalities for the scale
    sweep; requesting it localCheckpoints the kept/drop frames so the
    extra counting actions re-read frozen partitions instead of
    re-running the curation and signature pipelines (r15 ADVICE).

    ``budget_unit="bpe"`` (r16, closes r15 missing #5's budget half):
    the mix trains its own tokenizer — ``bpe_learn`` over the PICKED
    docs (driver tier, one shared model: the split-form cache rule) —
    and ``pack_shards`` consumes the learned-unit budgets from
    ``bpe_token_counts`` instead of whitespace counts; the output's
    token column is then named ``n_bpe_tokens``. A picked doc with no
    alphabetic words budgets at 0 and still lands in a shard."""
    from yfinance_etl_spark.operators.dedup import minhash_lsh_neardup
    from yfinance_etl_spark.operators.quality import curation_verdict
    from yfinance_etl_spark.operators.sampling import pack_shards, quota_sample
    from yfinance_etl_spark.operators.text import tokens

    kept = curation_verdict(
        docs.select("doc_id", "source", "text"), carry=("source", "text")
    ).filter("keep")
    if diag is not None:
        kept = kept.localCheckpoint(eager=True)
    pairs = minhash_lsh_neardup(docs, threshold=threshold).select(
        "doc_a", "doc_b"
    )
    for ap in asset_pairs:
        pairs = pairs.unionByName(ap.select("doc_a", "doc_b"))
    kept_ids = kept.select("doc_id")
    drops = (
        pairs.join(
            kept_ids.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi"
        )
        .join(kept_ids.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_semi")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    if diag is not None:
        drops = drops.localCheckpoint(eager=True)
    surv = kept.join(drops, "doc_id", "left_anti")
    # Decide on small rows, attach the payload once (guide §8 / r16):
    # quota_sample runs TWO eager scans of its input at call time (the
    # stratum-count checkpoint and the survivor checkpoint) — fed the
    # full (doc_id, source, text) survivor frame, each scan re-ran the
    # ENTIRE curation + text-MinHash + modality-pair pipeline upstream
    # of the (lazy) drop join. Checkpointing just the (doc_id, source)
    # proxy runs that pipeline ONCE, the quota pick ranks id-sized rows,
    # and the sample-sized picked frame joins text back from the source
    # corpus (AQE broadcasts the picked side — the corpus is never
    # shuffled to be re-attached). Pick semantics depend only on
    # (source, doc_id), so the sample is row-identical.
    surv_ids = surv.select("doc_id", "source").localCheckpoint(eager=True)
    picked = quota_sample(
        surv_ids, "source", key="doc_id", total=total, salt=salt
    ).join(docs.select("doc_id", "text"), "doc_id")
    if budget_unit == "bpe":
        from yfinance_etl_spark.operators.bpe import bpe_learn, bpe_token_counts

        model = bpe_learn(picked, n_merges=n_merges)
        toks = picked.select("doc_id", "source").join(
            bpe_token_counts(picked, model=model).select(
                "doc_id", "n_bpe_tokens"
            ),
            "doc_id",
        )
        packed = pack_shards(toks, "n_bpe_tokens", "doc_id", budget)
        out = packed.select("doc_id", "source", "n_bpe_tokens", "shard_id")
    elif budget_unit == "whitespace":
        toks = picked.select(
            "doc_id", "source", F.size(tokens("text")).alias("n_tokens")
        )
        packed = pack_shards(toks, "n_tokens", "doc_id", budget)
        out = packed.select("doc_id", "source", "n_tokens", "shard_id")
    else:
        raise ValueError(f"unknown budget_unit {budget_unit!r}")
    if diag is not None:
        # kept/drops are checkpoint-frozen above; picked is eager by
        # quota_sample's own contract — these counts re-run nothing
        diag.update(
            n_kept=kept.count(),
            n_dropped=drops.count(),
            n_picked=picked.count(),
        )
    return out


def training_mix_multimodal(
    docs: DataFrame,
    image_assets: DataFrame | None = None,
    audio_assets: DataFrame | None = None,
    video_assets: DataFrame | None = None,
    include_video_offset: bool = False,
    audio_seq_assets: DataFrame | None = None,
    **kwargs,
) -> DataFrame:
    """The recipe over a MULTIMODAL corpus (r16, closes r15 missing #3):
    documents plus any of image/audio/video asset frames (doc_id +
    binary content, the multimodal column model). Each modality's
    near-dup tier runs over its asset frame — PNG pixel dHash, WAV
    frame-energy fingerprint, per-frame temporal video dedup — and the
    resulting pair frames join the text MinHash pairs in ONE drop set,
    so the sampled mix is near-dup-free across every modality it
    carries. Docs without assets simply never appear in a modality's
    pair frame.

    ``include_video_offset=True`` (r16 capstone) additionally unions
    the OFFSET-VOTING video tier's pairs — the trimmed/offset
    re-uploads the aligned tier is structurally blind to — over the
    SAME per-frame signature frame (computed once, checkpointed,
    shared by both tiers).

    ``audio_seq_assets`` (r16, the audio analog of the video offset
    leg): clips fingerprinted per fixed-length FRAME
    (``audio_frame_fingerprint``) and deduped through the SAME generic
    offset-vote tier — so a clipped re-upload (intro trimmed) drops
    from the mix exactly like a trimmed video.

    Scale shape: each tier is the already-plan-pinned banded equi-join
    (no Cartesian anywhere); the union is pair-frame-sized; everything
    downstream is the text recipe unchanged."""
    from concurrent.futures import ThreadPoolExecutor

    from yfinance_etl_spark.multimodal.audio import (
        audio_fingerprint,
        audio_frame_fingerprint,
    )
    from yfinance_etl_spark.multimodal.columns import image_dhash
    from yfinance_etl_spark.multimodal.video import (
        video_frame_dhash,
        video_neardup,
        video_neardup_offset,
    )
    from yfinance_etl_spark.operators.dedup import dhash_neardup

    # Each tier eagerly checkpoints its signature frame at construction
    # (their documented eager contracts), so building the list inline ran
    # 3-5 INDEPENDENT synthesis+decode+checkpoint jobs back to back while
    # most cores idled through each job's small tail stages. Submit the
    # per-modality constructions from a thread pool instead (guide §2.6
    # overlap; the scheduler interleaves their stages) and collect in a
    # FIXED order — the drop-set union is order-insensitive (distinct on
    # doc_id), but determinism costs nothing. The video pair is one task:
    # its two tiers share the checkpointed frame sequentially by design.
    def _image():
        return dhash_neardup(image_dhash(image_assets))

    def _audio():
        return dhash_neardup(audio_fingerprint(audio_assets))

    def _video():
        fsig = video_frame_dhash(video_assets)
        if include_video_offset:
            fsig = fsig.localCheckpoint(eager=True)  # shared by both tiers
            return [
                video_neardup_offset(fsig, checkpointed=True),
                video_neardup(fsig, checkpointed=True),
            ]
        return [video_neardup(fsig)]

    def _audio_seq():
        return [video_neardup_offset(audio_frame_fingerprint(audio_seq_assets))]

    tasks = []
    if image_assets is not None:
        tasks.append(lambda: [_image()])
    if audio_assets is not None:
        tasks.append(lambda: [_audio()])
    if video_assets is not None:
        tasks.append(_video)
    if audio_seq_assets is not None:
        tasks.append(_audio_seq)
    asset_pairs: list[DataFrame] = []
    if tasks:
        with ThreadPoolExecutor(max_workers=len(tasks)) as pool:
            for frames in pool.map(lambda fn: fn(), tasks):
                asset_pairs.extend(frames)
    return training_mix(docs, asset_pairs=asset_pairs, **kwargs)
