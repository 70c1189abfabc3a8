"""S8: PDF text source (reference pdf_rag_chatbot.py:150-160 — PyPDF2
``page.extract_text()`` over an uploaded file, driver-side and serial).

Spark-first shape: ``spark.read.format("binaryFile")`` scans the document
store (each file one row: path/length/content), and page extraction runs
in ``mapInPandas`` — so a million PDFs parse across the cluster instead of
one at a time in the driver.

STUB NOTICE: no PDF library ships in this container, so the parser reads
a deterministic fake format ``PDF|<doc_id>|<body>`` with fixed 100-char
pages, and raises ``NotImplementedError`` on real PDF magic. Swapping in
``pypdf`` changes only ``_parse_pdf`` — the binaryFile scan and the
Arrow-batched extraction plumbing are production-real.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from yfinance_etl_spark.scratch import is_staged, mark_staged, scratch_dir

MAGIC = b"PDF|"
PAGE_CHARS = 100

PAGES_SCHEMA = "doc_id bigint, page_no int, page_text string"


def stage_fake_pdfs(docs, key: str) -> str:
    """Fixture-only: materialize documents as fake .pdf files so the real
    binaryFile source has something to scan (production storage already has
    the files; this stands in for it). Driver-side by design — it is test
    fixture synthesis, not a query path."""
    d = scratch_dir("yfinance_etl_pdf", key)
    if is_staged(d):  # completeness marker — a partial/crashed staging is redone
        return d
    for row in docs.select("doc_id", "text").toLocalIterator():
        with open(os.path.join(d, f"doc_{row.doc_id}.pdf"), "wb") as f:
            f.write(MAGIC + str(row.doc_id).encode() + b"|" + row.text.encode())
    mark_staged(d)
    return d


def _parse_pdf(b: bytes) -> tuple[int, list[str]]:
    """STUB parser for the fake format; a real deployment replaces this one
    function with ``pypdf.PdfReader(io.BytesIO(b))``."""
    if not b.startswith(MAGIC):
        raise NotImplementedError(
            "real PDF parsing needs a PDF library (not in this container); "
            "payloads must be the deterministic PDF|doc_id|body fake format"
        )
    _, doc_id, body = b.split(b"|", 2)
    text = body.decode()
    pages = [text[i : i + PAGE_CHARS] for i in range(0, max(len(text), 1), PAGE_CHARS)]
    return int(doc_id), pages


def read_pdf_pages(spark: SparkSession, pdf_dir: str) -> DataFrame:
    """binaryFile scan → distributed page extraction."""
    files = spark.read.format("binaryFile").load(os.path.join(pdf_dir, "*.pdf"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                doc_id, pages = _parse_pdf(bytes(content))
                rows.extend((doc_id, i, p) for i, p in enumerate(pages))
            yield pd.DataFrame(rows, columns=["doc_id", "page_no", "page_text"])

    return files.select("content").mapInPandas(extract, PAGES_SCHEMA)
