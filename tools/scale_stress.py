"""Scale-stress the dedup/ANN family on a deterministically blown-up corpus.

Measures, at each blow-up factor over $SPARK_GRAFT_SF_DIR (default sf0.1):
  * candidate-comparison volumes (LSH bands, inverted-index Jaccard,
    ANN buckets) — the quantities the "cost tracks candidates, not
    |docs|²" claim is about, plus the brute-force N·(N-1)/2 for contrast;
  * wall time of the three end-to-end operators.

Prints one JSON line per factor plus a growth-exponent summary: fitted
log-log slope of candidates vs corpus size (1.0 = linear, 2.0 =
quadratic). Run:  python tools/scale_stress.py [factors ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yfinance_etl_spark.operators.dedup import jaccard_pairs, minhash_lsh_neardup  # noqa: E402
from yfinance_etl_spark.operators.similarity import (  # noqa: E402
    ann_bucketed_topk,
    ann_multiprobe_topk,
    knn_topk,
)
from yfinance_etl_spark.operators.synth import (  # noqa: E402
    ann_candidate_volume,
    blow_up_documents,
    blow_up_embeddings,
    jaccard_candidate_volume,
    lsh_candidate_volume,
)
from yfinance_etl_spark.session import get_spark  # noqa: E402


def _timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def _recall(approx, exact) -> float:
    """Fraction of the exact top-k neighbor pairs the approximate path
    recovers — the quality half of the pruning-vs-recall tradeoff."""
    a = {(r.q_id, r.neighbor_id) for r in approx.select("q_id", "neighbor_id").collect()}
    e = {(r.q_id, r.neighbor_id) for r in exact.select("q_id", "neighbor_id").collect()}
    return round(len(a & e) / len(e), 3) if e else 1.0


def main(factors: list[int]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    rows = []
    for f in factors:
        # the fixture parquet is a single row-group → one partition; the
        # zero-shuffle blow-up inherits it, so spread explicitly before
        # measuring (production inputs arrive already partitioned)
        docs = blow_up_documents(docs0, f).repartition(64).localCheckpoint(eager=True)
        emb = blow_up_embeddings(emb0, f).repartition(64).localCheckpoint(eager=True)
        n_docs, n_vecs = docs.count(), emb.count()
        r = {
            "factor": f,
            "n_docs": n_docs,
            "n_vecs": n_vecs,
            "brute_force_doc_pairs": n_docs * (n_docs - 1) // 2,
            "lsh_cand": lsh_candidate_volume(docs),
            "jacc_cand": jaccard_candidate_volume(docs),
            "ann_cand": ann_candidate_volume(emb),
            # fixed planes prune a constant FRACTION of N²/2 (linear
            # speedup, quadratic growth); the scale path grows the plane
            # count with log(N) so bucket occupancy — and with it the
            # candidate volume per vector — stays ~flat
            "ann_planes_scaled": 6 + round(math.log2(f)),
            "ann_cand_scaled": ann_candidate_volume(emb, 6 + round(math.log2(f))),
            "brute_force_vec_pairs": n_vecs * (n_vecs - 1) // 2,
            "sec_minhash_lsh": _timed(minhash_lsh_neardup(docs)),
            "sec_jaccard": _timed(jaccard_pairs(docs)),
            "sec_ann_bucketed": _timed(ann_bucketed_topk(emb)),
            "sec_ann_scaled": _timed(
                ann_bucketed_topk(emb, n_planes=6 + round(math.log2(f)))
            ),
        }
        # MinHash recall vs exact Jaccard at the same threshold: precision
        # is 1.0 by construction (candidates are exact-verified), so
        # banding misses are the only loss — 4x4 banding collides with
        # prob 1-(1-J^4)^4 (0.67 at J=0.70, 0.95 at J=0.90)
        mh = {
            (p.doc_a, p.doc_b)
            for p in minhash_lsh_neardup(docs).select("doc_a", "doc_b").collect()
        }
        ex = {
            (p.doc_a, p.doc_b)
            for p in jaccard_pairs(docs, threshold=0.7).select("doc_a", "doc_b").collect()
        }
        r["n_true_pairs_at_07"] = len(ex)
        r["minhash_recall_at_07"] = round(len(mh & ex) / len(ex), 3) if ex else 1.0
        # recall@5 vs brute-force exact: pruning without recall is half
        # the story — multi-probe is what pays for the extra planes
        exact = knn_topk(emb).localCheckpoint(eager=True)
        planes = 6 + round(math.log2(f))
        r["recall_bucketed_scaled"] = _recall(
            ann_bucketed_topk(emb, n_planes=planes), exact
        )
        r["recall_multiprobe_scaled"] = _recall(
            ann_multiprobe_topk(emb, n_planes=planes), exact
        )
        rows.append(r)
        print(json.dumps(r), flush=True)

    if len(rows) >= 2:
        a, b = rows[0], rows[-1]

        def slope(metric: str, size: str) -> float:
            return round(
                math.log(max(b[metric], 1) / max(a[metric], 1))
                / math.log(b[size] / a[size]),
                2,
            )

        print(
            json.dumps(
                {
                    "growth_exponent_vs_corpus": {
                        "lsh_cand": slope("lsh_cand", "n_docs"),
                        "jacc_cand": slope("jacc_cand", "n_docs"),
                        "ann_cand": slope("ann_cand", "n_vecs"),
                        "ann_cand_scaled": slope("ann_cand_scaled", "n_vecs"),
                        "sec_minhash_lsh": slope("sec_minhash_lsh", "n_docs"),
                        "sec_jaccard": slope("sec_jaccard", "n_docs"),
                        "sec_ann_bucketed": slope("sec_ann_bucketed", "n_vecs"),
                    },
                    "note": "1.0 = linear in corpus size, 2.0 = quadratic (brute force)",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main([int(x) for x in sys.argv[1:]] or [1, 5, 20, 50])
