"""Measure the approximate-dedup / ANN recall table at sf0.01 (r13
verdict stretch #8): every approximate tier's recall against its exact
ground truth, on the committed fixtures, in one process. The pipeline is
deterministic end to end, so each number is an exact fixture constant —
tests/test_recall_regression.py pins this table (small tolerance for
float-boundary safety) so a future change that silently degrades any
tier fails a test instead of a future round's sweep.

Usage: python tools/measure_recall.py  → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from yfinance_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def pair_recall(got, want) -> float:
    return round(len(got & want) / max(len(want), 1), 4)


def measure(spark, sf_dir: str) -> dict[str, float]:
    """The full tier × measured-recall table at ``sf_dir`` — deterministic
    fixture constants (every pipeline stage is deterministic), reused by
    tests/test_recall_regression.py as the live side of the pin."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out: dict[str, float] = {}

    # --- text near-dup: exact all-pairs Jaccard >= 0.7 ground truth ----
    from yfinance_etl_spark.operators.dedup import minhash_lsh_neardup
    from yfinance_etl_spark.operators.text import word_shingles

    sh = docs.select(
        "doc_id", F.explode(word_shingles("text")).alias("shingle")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    truth_pairs = {
        (r.doc_a, r.doc_b)
        for r in inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                            .withColumnRenamed("sz", "sa"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("sz", "sb"), "doc_b")
        .filter(F.round(F.col("c") / (F.col("sa") + F.col("sb") - F.col("c")), 6) >= 0.7)
        .collect()
    }
    got = {(r.doc_a, r.doc_b)
           for r in minhash_lsh_neardup(docs, threshold=0.7).collect()}
    out["minhash_lsh@0.7"] = pair_recall(got, truth_pairs)
    out["_n_truth_jaccard07"] = len(truth_pairs)

    # --- embedding near-dup tiers: exact cosine >= 0.95 ground truth ---
    from yfinance_etl_spark.operators.dedup import embedding_neardup
    from yfinance_etl_spark.operators.rag import doc_embeddings
    from yfinance_etl_spark.operators.similarity import cosine

    de = doc_embeddings(docs).localCheckpoint(eager=True)
    x = de.alias("x")
    y = de.alias("y")
    etruth = {
        (r.doc_a, r.doc_b)
        for r in x.join(y, F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"),
            F.round(cosine(F.col("x.embedding"), F.col("y.embedding")), 6).alias("s"),
        )
        .filter(F.col("s") >= 0.95)
        .collect()
    }
    for tier in ("banded", "screen"):
        gt = {(r.doc_a, r.doc_b)
              for r in embedding_neardup(docs, tier=tier).collect()}
        out[f"embedding_neardup:{tier}@0.95"] = pair_recall(gt, etruth)
    out["_n_truth_cos095"] = len(etruth)

    # --- ANN family: recall@5 against the exact scan ------------------
    from yfinance_etl_spark.operators.pq import ivfpq_topk, pq_topk
    from yfinance_etl_spark.operators.similarity import (
        ann_bucketed_topk,
        int8_topk,
        ivf_topk,
        knn_join,
        knn_topk,
        scaled_plane_count,
    )

    exact5 = {(r.q_id, r.neighbor_id) for r in knn_topk(emb, k=5).collect()}

    def rec(df) -> float:
        return pair_recall({(r.q_id, r.neighbor_id) for r in df.collect()}, exact5)

    out["ann_bucketed@5"] = rec(ann_bucketed_topk(emb, k=5, n_planes=6, dim=64))
    out["ann_ivf@5"] = rec(ivf_topk(emb, k=5))
    out["ann_pq@5"] = rec(pq_topk(emb, k=5))
    out["ann_ivfpq@5"] = rec(ivfpq_topk(emb, k=5, rerank_factor="auto"))
    out["ann_int8@5"] = rec(int8_topk(emb, k=5))

    # --- kNN join (all-vectors), production default geometry ----------
    n = emb.count()
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = e.select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    alljoin = (
        e.crossJoin(q)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("neighbor_id"),
                F.round(cosine(F.col("qv"), F.col("v")), 6).alias("s"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("s"), F.asc("neighbor_id"))
    jtruth = {
        (r.q_id, r.neighbor_id)
        for r in alljoin.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3).collect()
    }
    out["knn_join:scaled@3"] = pair_recall(
        {(r.q_id, r.neighbor_id) for r in knn_join(emb, k=3, dim=64).collect()},
        jtruth,
    )
    out["knn_join:banded3x6@3"] = pair_recall(
        {(r.q_id, r.neighbor_id)
         for r in knn_join(emb, k=3, bands=3, rows_per_band=6, dim=64).collect()},
        jtruth,
    )
    out["_n_planes_scaled"] = scaled_plane_count(n, dim=64)
    return out


def main() -> int:
    spark = get_spark("measure-recall")
    spark.sparkContext.setLogLevel("ERROR")
    out = measure(spark, SF_DIR)
    out["_sf_dir"] = SF_DIR
    print(json.dumps(out, sort_keys=True), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
