"""RAG pipeline unit tests: embedding equivalence, retrieval, prompts."""

from __future__ import annotations

from pyspark.sql import functions as F

from yfinance_etl_spark.operators.rag import (
    EMBED_DIM,
    answer,
    chunk_embeddings,
    embed_udf,
    hash_embed,
    mock_completion_udf,
    retrieve_topk,
)


def test_embed_udf_matches_hof(spark):
    texts = ["fast value growth", "slow risk", "", "the quick brown fox", "a a a"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    rows = df.select(hash_embed("t").alias("hof"), embed_udf("t").alias("udf")).collect()
    for r in rows:
        assert r.hof == r.udf
        assert len(r.hof) == EMBED_DIM


def test_retrieval_prefers_matching_chunk(spark):
    docs = spark.createDataFrame(
        [(0, "fast value growth dividend yield compound"), (1, "unrelated words entirely here nothing")],
        "doc_id bigint, text string",
    )
    chunks = chunk_embeddings(docs, size=200, overlap=50)
    q = spark.createDataFrame([(0, "fast value growth")], "qid int, question string").select(
        "qid", "question", hash_embed("question").alias("q_emb")
    )
    top = retrieve_topk(chunks, q, k=1).collect()
    assert len(top) == 1 and top[0].doc_id == 0 and top[0].rag_rank == 1


def test_answer_prompt_shape_and_mock(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon zeta")], "doc_id bigint, text string"
    )
    chunks = chunk_embeddings(docs)
    q = spark.createDataFrame([(7, "alpha beta")], "qid int, question string").select(
        "qid", "question", hash_embed("question").alias("q_emb")
    )
    out = answer(retrieve_topk(chunks, q, k=2)).collect()[0]
    assert out.qid == 7 and out.n_ctx == 2
    assert out.answer.startswith("[mock] Context:\n")
    assert out.answer.endswith(f"#{out.prompt_len}")


def test_mock_completion_deterministic(spark):
    df = spark.createDataFrame([("p" * 100,)], "p string")
    a1 = df.select(mock_completion_udf("p").alias("a")).collect()[0].a
    assert a1 == "[mock] " + "p" * 40 + " #100"


def test_null_text_embeds_to_null_in_both_twins(spark):
    # size(NULL) under ANSI made the HOF return a non-null array of 16
    # NULLs for NULL text while the UDF returned NULL — junk embeddings
    # for null docs and a broken twin equivalence on exactly the input
    # class the pinned equality exists for
    df = spark.createDataFrame([(None,), ("real text",)], "t string")
    rows = df.select(hash_embed("t").alias("hof"), embed_udf("t").alias("udf")).collect()
    for r in rows:
        assert r.hof == r.udf
    assert any(r.hof is None for r in rows)
