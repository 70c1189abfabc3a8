"""S8: PDF text source (reference pdf_rag_chatbot.py:150-160 — PyPDF2
``page.extract_text()`` over an uploaded file, driver-side and serial).

Spark-first shape: ``spark.read.format("binaryFile")`` scans the document
store (each file one row: path/length/content), and page extraction runs
in ``mapInPandas`` — so a million PDFs parse across the cluster instead of
one at a time in the driver.

STUB NOTICE: no PDF library ships in this container, so by default the
parser reads a deterministic fake format ``PDF|<doc_id>|<body>`` with
fixed 100-char pages. When ``pypdf`` or ``pdfplumber`` IS importable
(checked via ``importlib.util.find_spec`` at import time, never a hard
dependency), real ``%PDF`` payloads route to it; without a library, real
magic raises ``NotImplementedError``. Either way the binaryFile scan and
the Arrow-batched extraction plumbing are production-real.
"""

from __future__ import annotations

import importlib.util
import io
import os
import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from yfinance_etl_spark.scratch import is_staged, mark_staged, scratch_dir

MAGIC = b"PDF|"
PAGE_CHARS = 100

PAGES_SCHEMA = "doc_id bigint, page_no int, page_text string"

#: which real-PDF library (if any) this environment offers — evaluated once,
#: import-safe in containers that ship neither
PDF_BACKEND: str | None = next(
    (m for m in ("pypdf", "pdfplumber") if importlib.util.find_spec(m) is not None),
    None,
)


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


def _doc_id_from_path(path: str) -> int:
    """Deterministic doc id for real PDFs: trailing digits of the file stem
    (``report_17.pdf`` → 17) or a crc32 of the basename otherwise."""
    stem = os.path.splitext(os.path.basename(path))[0]
    m = re.search(r"(\d+)$", stem)
    return int(m.group(1)) if m else zlib.crc32(stem.encode("utf-8"))


def _parse_pdf_real(b: bytes) -> list[str]:
    """Adapter over whichever optional library is installed (pypdf's and
    pdfplumber's page iteration differ only in spelling — reference analogue
    pdf_rag_chatbot.py:12-20)."""
    if PDF_BACKEND == "pypdf":
        import pypdf

        return [p.extract_text() or "" for p in pypdf.PdfReader(io.BytesIO(b)).pages]
    if PDF_BACKEND == "pdfplumber":
        import pdfplumber

        with pdfplumber.open(io.BytesIO(b)) as doc:
            return [p.extract_text() or "" for p in doc.pages]
    raise NotImplementedError(
        "real PDF parsing needs pypdf or pdfplumber (neither is installed); "
        "without one, payloads must be the deterministic PDF|doc_id|body fake format"
    )


def _parse_pdf(b: bytes, path: str = "") -> tuple[int, list[str]]:
    """Fake-format parser, with real ``%PDF`` payloads routed to the
    optional-library adapter when one is installed."""
    if b.startswith(MAGIC):
        _, doc_id, body = b.split(b"|", 2)
        text = body.decode()
        pages = [
            text[i : i + PAGE_CHARS] for i in range(0, max(len(text), 1), PAGE_CHARS)
        ]
        return int(doc_id), pages
    return _doc_id_from_path(path), _parse_pdf_real(b)


def read_pdf_pages(spark: SparkSession, pdf_dir: str) -> DataFrame:
    """binaryFile scan → distributed page extraction."""
    files = spark.read.format("binaryFile").load(os.path.join(pdf_dir, "*.pdf"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                doc_id, pages = _parse_pdf(bytes(content), path)
                rows.extend((doc_id, i, p) for i, p in enumerate(pages))
            yield pd.DataFrame(rows, columns=["doc_id", "page_no", "page_text"])

    return files.select("path", "content").mapInPandas(extract, PAGES_SCHEMA)
