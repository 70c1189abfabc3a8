"""S8: PDF text source (reference pdf_rag_chatbot.py:150-160 — PyPDF2
``page.extract_text()`` over an uploaded file, driver-side and serial).

Spark-first shape: ``spark.read.format("binaryFile")`` scans the document
store (each file one row: path/length/content), and page extraction runs
in ``mapInPandas`` — so a million PDFs parse across the cluster instead of
one at a time in the driver.

STUB NOTICE: no PDF library ships in this container, so the oracle-checked
queries read a deterministic fake format ``PDF|<doc_id>|<body>`` with
fixed 100-char pages. Real ``%PDF`` payloads route by capability: to
``pypdf`` or ``pdfplumber`` when importable (checked via
``importlib.util.find_spec`` at import time, never a hard dependency),
else to the built-in mini extractor for uncompressed content streams —
so the real-PDF route IS exercised in CI here — and compressed
(``/Filter``) documents raise ``NotImplementedError`` toward the library
adapters. Either way the binaryFile scan and the Arrow-batched
extraction plumbing are production-real.
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


#: PDF literal-string escapes (ISO 32000-1 §7.3.4.2) the mini extractor maps
_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _pdf_unescape(s: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(s):
        c = s[i : i + 1]
        if c == b"\\" and i + 1 < len(s):
            nxt = s[i + 1 : i + 2]
            if nxt in _PDF_ESCAPES:
                out += _PDF_ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal \d{1,3}
                j = i + 1
                while j < min(i + 4, len(s)) and s[j : j + 1].isdigit():
                    j += 1
                out.append(int(s[i + 1 : j], 8) & 0xFF)
                i = j
                continue
        out += c
        i += 1
    return out.decode("latin-1")


#: show-text operands: "(...) Tj", "(...) '", or "[...] TJ" array elements
_TEXT_SHOW_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|')", re.S)
_TJ_ARRAY_RE = re.compile(rb"\[((?:[^\]\\]|\\.)*)\]\s*TJ", re.S)
_TJ_STRING_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)


def _extract_text_mini(b: bytes) -> list[str]:
    """Built-in minimal extractor for UNCOMPRESSED-content-stream PDFs
    (the class the committed fixture and simple report generators emit):
    each plain-text content stream containing a BT...ET text block becomes
    one page; the page text is the concatenation of its Tj / ' / TJ
    show-text operands in stream order, PDF string escapes decoded.
    Compressed (/Filter, e.g. FlateDecode) content raises — decoding
    arbitrary filter chains is exactly what the pypdf/pdfplumber adapters
    are for; this path exists so the real-%PDF route is executable (and
    CI-tested) even in containers that ship neither library."""
    pages = []
    for m in _STREAM_RE.finditer(b):
        payload = m.group(1)
        if b"BT" not in payload:
            continue  # image/XObject or non-text stream
        try:
            payload.decode("ascii")
        except UnicodeDecodeError:
            continue  # compressed or binary content stream
        chunks = [_pdf_unescape(s) for s in _TEXT_SHOW_RE.findall(payload)]
        for arr in _TJ_ARRAY_RE.findall(payload):
            chunks.extend(_pdf_unescape(s) for s in _TJ_STRING_RE.findall(arr))
        pages.append("".join(chunks))
    if not pages:
        raise NotImplementedError(
            "mini PDF extractor found no uncompressed text content streams "
            "(compressed /Filter streams need the pypdf or pdfplumber adapter)"
        )
    return pages


def _parse_pdf_real(b: bytes) -> list[str]:
    """Adapter over whichever optional library is installed (pypdf's and
    pdfplumber's page iteration differ only in spelling — reference analogue
    pdf_rag_chatbot.py:12-20), falling back to the built-in mini extractor
    for uncompressed-stream documents when neither library exists."""
    if PDF_BACKEND == "pypdf":
        import pypdf

        return [p.extract_text() or "" for p in pypdf.PdfReader(io.BytesIO(b)).pages]
    if PDF_BACKEND == "pdfplumber":
        import pdfplumber

        with pdfplumber.open(io.BytesIO(b)) as doc:
            return [p.extract_text() or "" for p in doc.pages]
    return _extract_text_mini(b)


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
