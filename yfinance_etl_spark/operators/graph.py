"""Iterative graph operators — dedup-cluster construction.

Near-dup detection (operators/dedup.py) emits PAIRS; a 100 TB pipeline
needs CLUSTERS: the connected components of the pair graph, so each group
of mutual near-duplicates collapses to one canonical representative.

Spark shape: Pregel-style min-label propagation. Each iteration is one
shuffle (message groupBy) + one join — the same cost profile per round as
any keyed agg, and the round count is the cluster DIAMETER (tiny for dup
clusters: near-dup graphs are dense cliques, so 2-4 rounds in practice),
not the corpus size. ``localCheckpoint`` truncates lineage each round so
the plan doesn't grow exponentially with iterations — the standard Spark
iterative-algorithm pattern (GraphX Pregel does the same internally).

The driver-side loop is iteration CONTROL only (a convergence count per
round); all data movement stays distributed. The reference has no graph
ops; this extends its dedup story the way the brief's training-data
pipeline requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    the smallest node id reachable from it (undirected).

    Converges when an iteration changes no label; ``max_iter`` bounds the
    worst case. If the label set is still changing when the bound is hit
    (a path graph of diameter > max_iter — not a shape dup clusters take),
    the result would be silently WRONG (some nodes not yet carrying their
    component's min id), so that raises instead of returning.
    """
    if max_iter < 1:
        # with zero iterations the loop never runs, `changed` stays None,
        # and the convergence check would wave through every-node-its-own-
        # component — exactly the silent wrongness the docstring forbids
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    # materialize the (static) edge set FIRST, then derive labels from the
    # checkpointed frame — deriving them from the raw plan would re-execute
    # the full upstream pair computation inside the first iteration (twice:
    # once for the labels join, once for the convergence count)
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )

    changed = None
    for _ in range(max_iter):
        msgs = (
            sym.join(labels, sym["a"] == labels["node"])
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        # the did-this-label-change flag rides the round's own projection
        # (r17): the convergence test used to be a SECOND job joining the
        # new checkpoint back to the old one — per round, a full
        # label-frame shuffle join just to count inequalities. Computing
        # the flag where both values are already side by side makes the
        # count a checkpoint-partition scan (no recompute, no join): one
        # substantive job per round instead of two.
        newc = F.least(F.col("component"), F.coalesce("nbr_min", "component"))
        new_labels = (
            labels.join(msgs, "node", "left")
            .select(
                "node",
                newc.alias("component"),
                (newc != F.col("component")).alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("chg").count()
        labels = new_labels.select("node", "component")
        if changed == 0:
            break
    if changed:
        raise RuntimeError(
            f"connected_components did not converge in max_iter={max_iter} "
            f"iterations ({changed} labels still changing) — the graph's "
            "diameter exceeds the bound; raise max_iter"
        )
    return labels


def dedup_clusters(pairs: DataFrame, doc_a: str = "doc_a", doc_b: str = "doc_b") -> DataFrame:
    """Near-dup pairs → (doc_id, component, cluster_size), the keep-one-per-
    cluster decision input: everything with ``doc_id != component`` is a
    removable duplicate (component = smallest doc_id = the canonical keep)."""
    comp = connected_components(pairs, src=doc_a, dst=doc_b)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(F.col("node").alias("doc_id"), "component", "cluster_size")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iters`` fixed PageRank rounds over the
    UNDIRECTED pair graph — the canonical-representative scorer for dup
    clusters: where ``dedup_clusters`` picks the min-id representative,
    rank picks the most CENTRAL one (the document most near-duplicated
    by the rest — usually the cleanest copy), and the same scores rank
    hub documents for curation review.

    Spark shape (the ``connected_components`` discipline): symmetrized
    edge set checkpointed once; each round is a ranks ⋈ degrees join
    (node-sized frames — AQE broadcasts them while they fit; past that,
    equi-shuffles on the node key), the message join along edges, and
    the per-node aggregation — per-round cost a handful of keyed ops on
    node/edge-sized frames, never corpus-quadratic; rounds fixed at
    ``iters``; every node has degree ≥ 1 by symmetry so no dangling-mass
    term is needed.

    Deterministic cross-engine by construction, same discipline as the
    metric aggregates: per-edge contributions quantize to the shared
    9 dp grid BEFORE the sum, the sum runs in DECIMAL(38,18)
    (order-insensitive, exact), and each round's rank re-quantizes to
    9 dp — so a DuckDB oracle unrolling the same rounds reproduces the
    hash exactly. Fixed iterations, not convergence-tested: the oracle
    must replay the round count, and 3 rounds separate centers from
    leaves on the near-clique graphs dup clusters form (diameter 2-4)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        # NULL endpoints are dropped, stated: a NULL node would receive
        # rank but never match the contribs equi-join (NULL == NULL is
        # NULL), silently vanishing after round 1 — exclude it up front
        # (no near-dup pair source emits NULL ids; generic callers might)
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("a").count().withColumnRenamed("count", "deg")
    n = deg.count()
    if n == 0:
        return sym.select(
            F.col("a").alias("node"), F.lit(0.0).alias("rank")
        )
    # The teleport term is quantized to the SAME 9 dp grid as every other
    # intermediate (r13 advice): DuckDB parses 0.85 as DECIMAL and computes
    # (1 - 0.85)/n exactly (0.049999999999999996 for n=3) while Spark's
    # double expression gives 0.05000000000000001 — a ~1e-17 skew the
    # per-round ROUND(, 9) hides at fixture scale but that can flip a
    # digit when a pre-round value lands within epsilon of a .5e-9
    # boundary. Rounding teleport itself puts both engines on the
    # identical grid double by construction (oracle mirrors with
    # ROUND((1 - d)/nn.n, 9) in _pagerank_sql).
    teleport = F.round((F.lit(1.0) - F.lit(damping)) / F.lit(n), 9)
    ranks = deg.select(
        F.col("a").alias("node"), F.round(F.lit(1.0) / F.lit(n), 9).alias("rank")
    )
    for k in range(iters):
        contribs = (
            ranks.join(deg, ranks.node == deg.a)
            .select("node", F.round(F.col("rank") / F.col("deg"), 9).alias("c"))
        )
        msgs = sym.join(contribs, sym.a == contribs.node).select(
            F.col("b").alias("node"), "c"
        )
        ranks = (
            msgs.groupBy("node")
            .agg(
                F.sum(F.col("c").cast("decimal(38,18)"))
                .cast("double")
                .alias("s")
            )
            .select(
                "node",
                F.round(teleport + F.lit(damping) * F.col("s"), 9).alias("rank"),
            )
        )
        if k < iters - 1:
            # truncate lineage between rounds; the FINAL round stays a
            # live plan (one message join + one keyed agg over the
            # checkpointed leaves) so downstream consumers compose with
            # it lazily and the plan audit can see the round's shape
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
