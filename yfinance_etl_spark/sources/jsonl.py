"""JSONL (newline-delimited JSON) document source/sink — the interchange
format every training-data pipeline meets at its edges (web-scrape dumps,
annotation exports, eval suites ship as .jsonl long before anything is
parquet).

Two halves, both distributed end-to-end:

* ``write_jsonl``: rows → one JSON object per line via Catalyst
  ``to_json`` (escaping — embedded newlines, quotes, unicode — is the
  JVM writer's, so a line is ALWAYS one record), written through the
  text sink. An optional deterministic corruption knob truncates chosen
  lines — the fixture generator for the read path's error handling; real
  corpora arrive pre-corrupted.
* ``read_jsonl``: schema-explicit PERMISSIVE read — malformed lines land
  in a ``_corrupt`` column instead of killing the job (the only sane
  default at 100 TB: one truncated shard line must not fail a
  1000-executor ingest) — with the raw line preserved for quarantine.
  Schema is REQUIRED: schema inference reads the whole input twice and
  silently widens types; an ingest at scale declares its contract.

Reference parity: the reference ingests only yfinance DataFrames and PDF
bytes (src/jobs/yfinance_etl/streamlit_app.py:279, pdf_rag_chatbot.py:150);
JSONL is brief-mandated source-format breadth for the training-data
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: quarantine column for PERMISSIVE parsing (Spark's columnNameOfCorruptRecord)
CORRUPT_COL = "_corrupt"


def write_jsonl(
    df: DataFrame,
    path: str,
    corrupt_pred=None,
    corrupt_len: int = 25,
) -> None:
    """Write ``df`` as JSONL at ``path`` (one object per line, Catalyst
    ``to_json`` over the full row struct — null fields are omitted, the
    JSON convention round-trip readers expect). ``corrupt_pred`` (a
    boolean Column) truncates matching rows' lines to ``corrupt_len``
    chars — deterministic fixture damage for exercising the PERMISSIVE
    read path; leave None for a faithful write. Map-only: no shuffle,
    one output file per input partition, like any text sink."""
    line = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    if corrupt_pred is not None:
        # a non-"{" prefix makes the damage unconditional: mere truncation
        # of a row whose nullable fields were omitted could still be a
        # complete (valid) object, silently un-corrupting the fixture
        damaged = F.concat(F.lit("CORRUPT>>"), F.substring(line, 1, corrupt_len))
        line = F.when(corrupt_pred, damaged).otherwise(line)
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema-explicit PERMISSIVE JSONL scan: well-formed lines parse into
    ``schema``'s columns; malformed lines yield NULL fields plus the raw
    line in ``_corrupt`` (quarantine-grade evidence, not a crash, and not
    a silent drop — DROPMALFORMED loses data invisibly and FAILFAST turns
    one bad byte into a dead 100 TB job). The parse is a map-only
    projection over the text scan; predicate/column pruning still reach
    the reader via the declared schema.

    Spark restriction, inherited deliberately: a query whose pruned
    schema is ONLY the corrupt column is rejected
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN — the parser cannot know a line is
    bad without parsing the real columns). Reference ``_corrupt``
    together with at least one data column (as ``jsonl_ingest_profile``
    does), or materialize the parse first."""
    return (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def jsonl_ingest_profile(parsed: DataFrame, group_col: str = "lang") -> DataFrame:
    """The first report every JSONL ingest runs: per-group row count and
    payload volume over the GOOD rows, plus one ``__corrupt__`` row
    counting the quarantine (sum_chars NULL there — corrupt lines have no
    parsed text to measure). One hash aggregate; the corrupt branch rides
    the same scan via a grouping expression, not a second pass."""
    status = F.when(
        F.col(CORRUPT_COL).isNotNull(), F.lit("__corrupt__")
    ).otherwise(F.col(group_col))
    return (
        parsed.groupBy(status.alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("sum_chars"),
        )
    )
