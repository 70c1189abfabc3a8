"""Deterministic sampling / split assignment for training-data pipelines.

At 100 TB, train/val/test splits must be (a) reproducible across runs and
engines, (b) stable under repartitioning and row order, and (c) computable
without a shuffle. ``rand(seed)`` fails (a)+(b) — Spark's seed is
per-partition, so the split changes with the partition layout, and no
external system can re-derive it. The standard fix is HASH-MOD
assignment: bucket = md5(key) mod 100, split by bucket range. Pure
per-row Catalyst expressions — zero shuffle, any engine (here: DuckDB)
reproduces the exact assignment from the key alone.

Same pattern covers deterministic down-sampling (``bucket < pct``) and
A/B cohorting. Reference has no sampling; this is a brief-mandated
training-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: split name → [lo, hi) bucket range out of 100
DEFAULT_SPLITS = {"train": (0, 80), "val": (80, 90), "test": (90, 100)}


def hash_bucket(key: Column | str, n_buckets: int = 100) -> Column:
    """Stable bucket in [0, n_buckets): first 8 md5 hex chars as an int.

    32 hash bits mod 100 gives bias < 2⁻²⁵ per bucket — unmeasurable at
    any corpus size; md5-on-string is bit-identical in Spark and DuckDB.
    """
    key = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    return (h % n_buckets).cast("int")


def with_split(
    df: DataFrame, key: str, splits: dict[str, tuple[int, int]] = DEFAULT_SPLITS
) -> DataFrame:
    """Assign each row its split name from the hash bucket of ``key``."""
    b = hash_bucket(key)
    expr = F.lit(None).cast("string")
    # build the when-chain in reverse so the first split wins ties
    for name, (lo, hi) in reversed(list(splits.items())):
        expr = F.when((b >= lo) & (b < hi), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)
