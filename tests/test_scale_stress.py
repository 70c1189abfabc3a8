"""Empirical scale posture of the dedup/ANN family: candidate volumes must
grow ~linearly with corpus size under a blow-up whose true duplicate
structure is linear (see operators/synth.py). Brute force is quadratic —
doubling the corpus ×4s the pair count; the LSH paths must stay far from
that. tools/scale_stress.py runs the big sweep; this pins the property at
test scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from yfinance_etl_spark.operators.synth import (
    ann_candidate_volume,
    blow_up_documents,
    blow_up_embeddings,
    lsh_candidate_volume,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, factor):
    base = spark.read.parquet(f"{SF}/documents.parquet")
    return blow_up_documents(base, factor).repartition(16).localCheckpoint(eager=True)


def test_blow_up_replicas_are_not_near_dups(spark):
    # replica mutation must push cross-replica Jaccard far under the dedup
    # threshold, else "N× corpus" silently means "N² true pairs"
    docs = _docs(spark, 2)
    from yfinance_etl_spark.operators.dedup import doc_shingles

    sh = doc_shingles(docs).groupBy("doc_id").agg(
        F.collect_set("shingle").alias("s")
    )
    a = sh.where("doc_id % 2 = 0").select((F.col("doc_id") / 2).cast("long").alias("k"), F.col("s").alias("sa"))
    b = sh.where("doc_id % 2 = 1").select(((F.col("doc_id") - 1) / 2).cast("long").alias("k"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = inter / (F.size("sa") + F.size("sb") - inter)
    worst = a.join(b, "k").select(F.max(jac).alias("j")).collect()[0]["j"]
    assert worst < 0.5, f"replica pairs too similar (max J={worst})"


def test_lsh_candidate_volume_grows_linearly_not_quadratically(spark):
    v2 = lsh_candidate_volume(_docs(spark, 2))
    v8 = lsh_candidate_volume(_docs(spark, 8))
    assert v2 > 0  # fixture has real dup structure
    ratio = v8 / v2
    # corpus ×4: linear → ~4, quadratic → ~16. Generous headroom at 8.
    assert ratio < 8, f"LSH candidate volume grew {ratio:.1f}x on a 4x corpus"


def test_ann_candidate_volume_stays_far_below_brute_force(spark):
    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    small = blow_up_embeddings(base, 2).repartition(16).localCheckpoint(eager=True)
    big = blow_up_embeddings(base, 8).repartition(16).localCheckpoint(eager=True)
    v_small, v_big = ann_candidate_volume(small), ann_candidate_volume(big)
    n_small, n_big = small.count(), big.count()
    # bucketing prunes most of the N²/2 comparisons at every size...
    assert v_big < 0.15 * n_big * (n_big - 1) / 2
    # ...and the PRUNING RATIO does not degrade as the corpus grows
    frac_small = v_small / (n_small * (n_small - 1) / 2)
    frac_big = v_big / (n_big * (n_big - 1) / 2)
    assert frac_big <= frac_small * 1.5
