"""Table loaders for the driver testdata (TESTDATA.md).

All reads are plain ``spark.read.parquet`` so Catalyst gets the parquet footer
statistics, column pruning, and predicate pushdown for free. At 100 TB these
tables would be written ``partitionBy`` their natural key (see sources/sink.py);
the loaders don't care — partition pruning comes from the path layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ns_ts_to_micros(df: DataFrame, col: str = "ts") -> DataFrame:
    """TIMESTAMP(NANOS) read as long (legacy.parquet.nanosAsLong) → µs
    timestamp. Integer div, not /: ns-since-epoch (~1.7e18) overflows
    double's 53-bit mantissa. Truncation matches DuckDB's ns→µs read.
    The ONE conversion rule — batch (load_table) and streaming
    (streams.read_events_stream) must share it or they silently diverge.
    """
    if isinstance(df.schema[col].dataType, LongType):
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Make ``col`` a watermark-legal TIMESTAMP for event-time operators.

    The driver's regenerated events fixture stores TIMESTAMP(MICROS) with
    isAdjustedToUTC=0, which Spark 4 reads as TIMESTAMP_NTZ — fine for batch
    (DuckDB's oracle is naive-timestamp too, so hashes match), but
    ``withWatermark`` requires TIMESTAMP proper. The cast interprets the
    naive value in the session time zone (UTC for our sessions), so the
    wall-clock value — and therefore every window boundary and the
    collected result — is preserved. Batch loaders deliberately do NOT
    apply this: changing the batch ``ts`` type would perturb schema_match
    for the green event queries.
    """
    if isinstance(df.schema[col].dataType, TimestampNTZType):
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def _enable_nanos_as_long(spark: SparkSession) -> None:
    """The events fixture stores TIMESTAMP(NANOS) which vanilla Spark 4
    rejects (PARQUET_TYPE_ILLEGAL). ``nanosAsLong`` is a runtime-settable
    SQL conf, so set it here — at read time — rather than relying on
    whoever built the session (the driver's own SparkSession doesn't go
    through our session.py builder)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        _enable_nanos_as_long(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = ns_ts_to_micros(df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` plans work too."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def non_empty(df: DataFrame) -> DataFrame | None:
    """P5 empty-result guard (reference ``if df.empty: return None``,
    yfinance_client.py:24-26, etl.py:10-12).

    ``df.isEmpty()`` runs a LocalLimit(1)-style job — it stops after the
    first row found, never counts the table — so the guard costs one
    near-instant job even on a 100 TB input."""
    return None if df.isEmpty() else df
