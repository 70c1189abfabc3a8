"""Approximate-dedup / ANN recall regression corpus (r13 verdict stretch
#8): ONE committed table of operator × tier × measured recall, re-measured
LIVE against exact ground truth per run — the same pin discipline the plan
shapes have, applied to retrieval quality. Every pipeline stage is
deterministic (deterministic hyperplanes, hash-spread centroids, md5
minhashes), so each number is an exact fixture constant at sf0.01; the
tolerance only absorbs float-boundary environment skew. A change that
silently degrades any tier — a plane-family edit, a band-window shuffle,
a rerank-budget cut — fails here, in this round, instead of surfacing two
rounds later as a sweep anomaly.

The table IS documentation too: it is the measured content of each tier's
recall contract (embedding_neardup's 0.89-vs-0.29 banded/screen split, the
int8 tier's exact-rerank 1.0, the IVF family's n_probe ceiling at this
corpus size, and ann_bucketed's 0.0 — six fixed planes over 200 vectors
over-prune, which is precisely the failure scaled_plane_count exists to
prevent and knn_join:scaled measurably avoids).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: measured at sf0.01 (tools/measure_recall.py, r14) — exact fixture
#: constants; see module docstring for why each is the number it is
RECALL_TABLE = {
    "minhash_lsh@0.7": 1.0,
    "embedding_neardup:banded@0.95": 0.8853,
    "embedding_neardup:screen@0.95": 0.2915,
    "ann_bucketed@5": 0.0,
    "ann_ivf@5": 0.28,
    "ann_pq@5": 0.56,
    "ann_ivfpq@5": 0.28,
    "ann_int8@5": 1.0,
    "knn_join:scaled@3": 0.1293,
    "knn_join:banded3x6@3": 0.1207,
}

#: ground-truth set sizes — a truth-set change (fixture or shingle/embed
#: edit) must be LOUD, not silently re-baselined into new recalls
TRUTH_SIZES = {"_n_truth_jaccard07": 25, "_n_truth_cos095": 741}

TOL = 0.03


def test_recall_table_matches_committed_measurements(spark):
    from tools.measure_recall import measure

    got = measure(spark, "/root/testdata/sf0.01")
    for key, size in TRUTH_SIZES.items():
        assert got[key] == size, (key, got[key], size)
    assert got["_n_planes_scaled"] == 4  # 200 vectors → ⌈log2(200/32)⌉
    errors = {
        key: (got.get(key), want)
        for key, want in RECALL_TABLE.items()
        if got.get(key) is None or abs(got[key] - want) > TOL
    }
    assert not errors, f"recall tiers drifted from the committed table: {errors}"
    # the tier ORDERING contracts, independent of exact values: the
    # recall-grade banded embedding tier dominates the screen tier, and
    # the exact-rerank int8 tier dominates the quantized-candidate ones
    assert got["embedding_neardup:banded@0.95"] > got["embedding_neardup:screen@0.95"] + 0.3
    assert got["ann_int8@5"] >= got["ann_pq@5"] >= got["ann_ivfpq@5"] - TOL
