"""JSONL source/sink: escaping-safe single-line records, schema-explicit
PERMISSIVE quarantine, deterministic fixture damage (r10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yfinance_etl_spark.sources.jsonl import (
    CORRUPT_COL,
    jsonl_ingest_profile,
    read_jsonl,
    write_jsonl,
)

SCHEMA = "doc_id bigint, lang string, text string"


def test_roundtrip_preserves_values_and_escaping(spark, tmp_path):
    """Embedded newlines/quotes/tabs must survive the line discipline —
    to_json escapes them, so a record is always exactly one line."""
    rows = [
        (0, "en", 'line one\nline "two"\twith tab'),
        (1, "de", "plain"),
        (2, None, None),  # null lang AND null text
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    p = str(tmp_path / "docs")
    write_jsonl(df, p)
    back = read_jsonl(spark, p, SCHEMA).collect()
    got = sorted((r.doc_id, r.lang, r.text) for r in back)
    assert got == sorted(rows)
    assert all(r[CORRUPT_COL] is None for r in back)


def test_corrupt_lines_quarantine_not_crash_not_drop(spark, tmp_path):
    rows = [(i, "en", f"document number {i} with some text") for i in range(20)]
    df = spark.createDataFrame(rows, SCHEMA)
    p = str(tmp_path / "docs")
    write_jsonl(df, p, corrupt_pred=F.col("doc_id") % 4 == 1)
    # full-schema collect: a plan pruned down to ONLY _corrupt is
    # rejected by Spark (QUERY_ONLY_CORRUPT_RECORD_COLUMN, documented on
    # read_jsonl) — quarantine inspection always rides the data columns
    rows = read_jsonl(spark, p, SCHEMA).collect()
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(bad) == 5  # doc_ids 1,5,9,13,17
    # quarantined rows keep the raw line as evidence, parse nothing
    assert all(r[CORRUPT_COL].startswith("CORRUPT>>") for r in bad)
    assert all(r.doc_id is None and r.text is None for r in bad)
    # good rows all parse
    assert len(rows) - len(bad) == 15


def test_damage_is_unconditional_even_for_minimal_rows(spark, tmp_path):
    """A row whose nullable fields are omitted serializes short — plain
    truncation could leave VALID json; the CORRUPT>> prefix cannot."""
    df = spark.createDataFrame([(1, None, None)], SCHEMA)
    p = str(tmp_path / "docs")
    write_jsonl(df, p, corrupt_pred=F.lit(True))
    rows = read_jsonl(spark, p, SCHEMA).collect()
    assert len(rows) == 1 and rows[0][CORRUPT_COL] is not None


def test_ingest_profile_matches_direct_aggregation(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = str(tmp_path / "docs")
    write_jsonl(docs, p, corrupt_pred=F.col("doc_id") % 7 == 2)
    parsed = read_jsonl(
        spark, p,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    got = {r.lang: (r.n_docs, r.sum_chars) for r in jsonl_ingest_profile(parsed).collect()}
    want = {
        r.lang: (r.n, r.s)
        for r in docs.filter(F.col("doc_id") % 7 != 2)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.length("text")).alias("s"))
        .collect()
    }
    want["__corrupt__"] = (docs.filter(F.col("doc_id") % 7 == 2).count(), None)
    assert got == want


def test_parse_is_map_only(spark, tmp_path):
    # the PERMISSIVE parse + profile must be scan -> project -> one agg:
    # no Python eval, no extra exchange beyond the group-by's
    df = spark.createDataFrame([(1, "en", "x")], SCHEMA)
    p = str(tmp_path / "docs")
    write_jsonl(df, p)
    plan = (
        jsonl_ingest_profile(read_jsonl(spark, p, SCHEMA))
        ._jdf.queryExecution().executedPlan().toString()
    )
    for py_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_op not in plan, py_op
    assert plan.count("Exchange hashpartitioning") <= 1, plan[:1500]


def test_empty_quarantine_emits_no_corrupt_group_and_oracle_agrees(spark, tmp_path):
    """r10 review: an ungrouped COUNT(*) oracle branch returned a phantom
    ('__corrupt__', 0, NULL) row over corpora with no doc_id % 7 == 2 —
    the operator rightly emits no group when nothing was damaged. Pinned
    with a sparse-doc_id mini-corpus run through BOTH engines."""
    import duckdb
    import pandas as pd

    from yfinance_etl_spark.plans.queries import _JSONL_SQL

    rows = [(i, f"text number {i}", "en", "s", 10) for i in (0, 1, 3, 4, 5, 6, 8)]
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    docs = spark.createDataFrame(rows, schema)
    p = str(tmp_path / "docs")
    write_jsonl(docs, p, corrupt_pred=F.col("doc_id") % 7 == 2)  # matches nothing
    got = {
        tuple(r)
        for r in jsonl_ingest_profile(read_jsonl(spark, p, schema)).collect()
    }
    assert not any(r[0] == "__corrupt__" for r in got)
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"]),
    )
    want = {tuple(r) for r in con.execute(_JSONL_SQL).fetchall()}
    con.close()
    assert got == want
