"""Shared partitioning guards for compute-dense stages.

``spread`` is the single home for the under-partitioned-input guard that
dedup, RAG embedding, and k-means all need (previously three drifting
copies — r6 advice): a single-row-group fixture scan otherwise pins an
Arrow/md5-dense kernel to ONE task (measured: doc_hashes 14 s serial vs
3 s spread at sf0.1; embed kernel 4 s vs 0.4 s for 5k docs). It never
coalesces an input that already has enough partitions, so on a real
many-file 100 TB scan it is a no-op and the stage stays map-only.

Deliberately NOT keyed (a plain round-robin repartition): spreading a
broadcast-join probe side BY ITS JOIN KEY re-concentrates hot buckets —
the measured counter-experiment (9 s vs 3.6 s) is in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism iff it currently has fewer partitions; identity
    otherwise. Streaming frames pass through untouched: partition count
    is a per-micro-batch source property there (asking the RDD is an
    AnalysisException), and the guard exists for single-row-group BATCH
    fixture scans — a streaming micro-batch inherits the source's file
    split parallelism."""
    if df.isStreaming:
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par) if df.rdd.getNumPartitions() < par else df
