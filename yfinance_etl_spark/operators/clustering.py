"""Distributed k-means over the embeddings table (fixed-iteration Lloyd).

The iterative-algorithm template for the engine (the batch sibling of the
Pregel-style label propagation in operators/graph.py): each Lloyd round is

    assign:    vectors × broadcast(centroids) → nearest centroid
    recompute: posexplode → per-(cluster, dim) exact decimal mean → rebuild

Every step is a DataFrame op — nothing is collected to the driver. The
centroid table is k rows, so the assign join is a broadcast nested loop
(k·dim multiply-adds per row, map-side only, no shuffle); recompute is one
hash aggregation on (cluster, dim) — dim·k cells of state, trivially
partial-aggregable. At 100 TB the cost per round is exactly one corpus
scan + one k·dim-sized shuffle, which is the optimal shape for Lloyd.

Determinism (what lets a DuckDB oracle replay it):
* init: centroids = the k vectors with the smallest vec_id (no RNG);
* distances rounded to 9 decimals, ties broken by cent_id — the argmin is
  unambiguous cross-engine;
* centroid means via exact decimal sums (order-insensitive), rounded to 9
  and cast back to double, so round i+1 starts from bit-identical
  centroids in both engines.

A fixed iteration count (not convergence-test) keeps the plan static and
the oracle expressible as chained CTEs; production would loop to
convergence with a localCheckpoint per round to truncate lineage (see
operators/graph.py for that pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yfinance_etl_spark.functions.scalar import STAT_SCALE, dsum

#: decimals kept for distances and centroid coordinates (cross-engine anchor)
COORD_DECIMALS = 9


def _as_double_vec(embs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """float[] → double[] once, up front: all distance math in float64."""
    return embs.select(
        "vec_id",
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )


def _sqdist(a, b):
    """Σ (a_i - b_i)² — a left-to-right fold, same evaluation order as the
    oracle's list_sum(list_transform(...)), rounded to the shared grid."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        COORD_DECIMALS,
    )


def assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vec_id, vec, cent_id, d2).

    crossJoin(broadcast(k rows)) → per-row argmin via min(struct): the
    struct comparison orders by (d2, cent_id), so the partial-aggregable
    min IS the deterministic argmin — no window, no extra shuffle beyond
    the one hash agg on vec_id.
    """
    scored = vecs.crossJoin(
        F.broadcast(centroids.select("cent_id", "cent"))
    ).withColumn("d2", _sqdist(F.col("vec"), F.col("cent")))
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct("d2", "cent_id")).alias("best"),
        # every row in the group carries the same vec (key = vec_id);
        # min() keeps it without a first()-style nondeterminism flag
        F.min("vec").alias("vec"),
    )
    return best.select(
        "vec_id", "vec", F.col("best.cent_id").alias("cent_id"), F.col("best.d2").alias("d2")
    )


def recompute(assigned: DataFrame) -> DataFrame:
    """New centroids: per-(cluster, dim) exact decimal mean → array rebuild.

    posexplode fans each row into dim rows — at 100 TB that is a dim×
    row-count flat map feeding a (k·dim)-cell hash agg, which partial-
    aggregates down to k·dim rows before the shuffle. The rebuild
    (collect_list of dim structs per cluster) moves k·dim rows total.
    """
    per_dim = assigned.select(
        "cent_id", F.posexplode("vec").alias("pos", "val")
    ).groupBy("cent_id", "pos").agg(
        F.round(dsum("val", STAT_SCALE) / F.count("val"), COORD_DECIMALS)
        .cast("double")
        .alias("cval")
    )
    return per_dim.groupBy("cent_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))), lambda s: s.cval
        ).alias("cent")
    )


def kmeans(
    embs: DataFrame, k: int = 8, iters: int = 3, vec_col: str = "embedding"
) -> tuple[DataFrame, DataFrame]:
    """Run ``iters`` Lloyd rounds; returns (assignments, centroids).

    assignments: (vec_id, vec, cent_id, d2) under the FINAL centroids;
    centroids:   (cent_id, cent) after the final recompute.
    """
    # materialize the (static) vector frame once: it appears in every Lloyd
    # round's assign, so without the checkpoint the single final job would
    # rescan + re-cast it iters+1 times (same lineage-truncation pattern as
    # graph.connected_components). Spread an under-partitioned input first
    # (a single-row-group fixture scan otherwise pins every assign pass of
    # every iteration to ONE task).
    from yfinance_etl_spark.operators.partitioning import spread

    vecs = _as_double_vec(spread(embs), vec_col).localCheckpoint(eager=True)
    # seed = the k SMALLEST vec_ids (TakeOrderedAndProject, k rows to the
    # driver-side plan, still deterministic) — NOT filter(vec_id < k), which
    # silently yields < k centroids when ids are sparse or offset
    centroids = vecs.orderBy("vec_id").limit(k).select(
        F.col("vec_id").alias("cent_id"), F.col("vec").alias("cent")
    )
    assigned = None
    for _ in range(iters):
        assigned = assign(vecs, centroids)
        centroids = recompute(assigned)
    # final assignment under the final centroids (standard Lloyd reporting)
    assigned = assign(vecs, centroids)
    return assigned, centroids


def cluster_profile(assigned: DataFrame, centroids: DataFrame) -> DataFrame:
    """Per-cluster summary: size, mean squared distance (inertia/n), and
    centroid L2 norm — the numbers a user checks after a clustering job."""
    sizes = assigned.groupBy("cent_id").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(dsum("d2", STAT_SCALE) / F.count("d2"), 6).alias("avg_sq_dist"),
    )
    norms = centroids.select(
        "cent_id",
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("cent"), lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
            6,
        ).alias("centroid_norm"),
    )
    return sizes.join(norms, "cent_id").select(
        F.col("cent_id").alias("cluster_id"), "n_vecs", "avg_sq_dist", "centroid_norm"
    )
