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
else to the built-in mini extractor — which handles plain AND
``/Filter /FlateDecode`` content streams via stdlib ``zlib`` (the
dominant real-world class) — so the real-PDF route IS exercised in CI
here. Streams under any OTHER filter (DCTDecode images, LZW, crypt) are
skipped as non-text; a document whose text is only reachable through
such filters raises ``NotImplementedError`` toward the library adapters.
Either way the binaryFile scan and the Arrow-batched extraction plumbing
are production-real.
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
            if b"0" <= nxt <= b"7":  # octal: 1-3 OCTAL digits only (§7.3.4.2)
                j = i + 1
                while j < min(i + 4, len(s)) and b"0" <= s[j : j + 1] <= b"7":
                    j += 1
                out.append(int(s[i + 1 : j], 8) & 0xFF)
                i = j  # \118 -> chr(0o11) then literal '8' on the next pass
                continue
            if nxt in (b"\r", b"\n"):  # line continuation: drop \ and the EOL
                i += 2
                if nxt == b"\r" and s[i : i + 1] == b"\n":
                    i += 1
                continue
            # any other char: the REVERSE SOLIDUS is ignored, char stands
            i += 1
            continue
        out += c
        i += 1
    return out.decode("latin-1")


#: show-text operands in ONE pass so emission follows stream byte order:
#: alternative 1 = "(...) Tj" / "(...) '", alternative 2 = "[...] TJ"
_SHOW_OP_RE = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|')"
    rb"|\[((?:[^\]\\]|\\.)*)\]\s*TJ",
    re.S,
)
_TJ_STRING_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)", re.S)
# (?!\d) pins the match to the WHOLE digit run before testing the
# indirect-ref lookahead — without it the regex backtracks inside the
# digits of '/Length 58 0 R' until the lookahead passes, yielding a
# truncated bogus length (group='5') that silently mis-slices the
# stream; (?!\s+\d+\s+R) rejects any generation number, not just 0
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")
_FILTER_RE = re.compile(rb"/Filter\s*(/\w+|\[[^\]]*\])")


def _stream_dict(window: bytes) -> bytes:
    """The OUTERMOST ``<< ... >>`` dictionary preceding ``stream`` in
    ``window``. A plain ``rfind(b"<<")`` lands on a NESTED sub-dictionary
    (``/DecodeParms << /Predictor 12 >>`` is routine in real writers) and
    hides the outer dict's /Filter and /Length — scan the ``<<``/``>>``
    tokens backward from the end, tracking depth, to find where the dict
    that closes last actually opens."""
    tokens = [(m.start(), m.group()) for m in re.finditer(rb"<<|>>", window)]
    depth = 0
    for pos, tok in reversed(tokens):
        depth += 1 if tok == b">>" else -1
        if depth == 0 and tok == b"<<":
            return window[pos:]
    return b""


def _iter_streams(b: bytes):
    """Yield ``(stream_dict, payload)`` for every ``stream...endstream``
    object. When the preceding dictionary carries a direct-integer
    ``/Length``, the payload is sliced by that length — so binary
    (e.g. Flate) payloads that happen to contain the bytes ``endstream``
    still split correctly; otherwise it falls back to the next
    ``endstream`` keyword with a single trailing EOL stripped."""
    pos = 0
    while True:
        s = b.find(b"stream", pos)
        if s < 0:
            return
        after = b[s + 6 : s + 8]
        if after[:2] == b"\r\n":
            data_start = s + 8
        elif after[:1] in (b"\n", b"\r"):
            data_start = s + 7
        else:  # 'endstream' or a name like /StreamX — not the keyword
            pos = s + 6
            continue
        window = b[max(0, s - 512) : s]
        dct = _stream_dict(window)
        m_len = _LENGTH_RE.search(dct)
        if m_len:
            n = int(m_len.group(1))
            payload = b[data_start : data_start + n]
            end = b.find(b"endstream", data_start + n)
        else:
            end = b.find(b"endstream", data_start)
            payload = b[data_start:end] if end >= 0 else b""
            if payload.endswith(b"\r\n"):
                payload = payload[:-2]
            elif payload[-1:] in (b"\n", b"\r"):
                payload = payload[:-1]
        if end < 0:
            return
        yield dct, payload
        pos = end + len(b"endstream")


def _extract_text_mini(b: bytes) -> list[str]:
    """Built-in minimal extractor for plain and FlateDecode content-stream
    PDFs (the classes simple report generators and virtually all real-world
    writers emit): each content stream containing a BT...ET text block
    becomes one page; the page text is the concatenation of its Tj / ' /
    TJ show-text operands in stream byte order, PDF string escapes
    decoded. ``/Filter /FlateDecode`` payloads are inflated with stdlib
    ``zlib``; streams under any other filter (DCTDecode images, LZW,
    JBIG2...) are skipped as non-text — a document whose text is only
    reachable through such filters raises toward the pypdf/pdfplumber
    adapters."""
    pages = []
    for dct, payload in _iter_streams(b):
        m_filt = _FILTER_RE.search(dct)
        if m_filt:
            filt = m_filt.group(1)
            # accept a bare /FlateDecode or a one-element [/FlateDecode]
            names = re.findall(rb"/(\w+)", filt)
            if names != [b"FlateDecode"]:
                continue  # image/other codec stream — not mini-extractable text
            try:
                # decompressobj tolerates the spec-permitted trailing EOL
                payload = zlib.decompressobj().decompress(payload)
            except zlib.error:
                continue  # corrupt or mis-split stream: skip, don't crash a task
        if b"BT" not in payload:
            continue  # image/XObject or non-text stream
        try:
            payload.decode("ascii")
        except UnicodeDecodeError:
            continue  # binary content stream
        chunks = []
        for m in _SHOW_OP_RE.finditer(payload):
            if m.group(1) is not None:  # (...)Tj / (...)'
                chunks.append(_pdf_unescape(m.group(1)))
            else:  # [...]TJ: emit the array's strings in element order
                chunks.extend(
                    _pdf_unescape(s) for s in _TJ_STRING_RE.findall(m.group(2))
                )
        pages.append("".join(chunks))
    if not pages:
        raise NotImplementedError(
            "mini PDF extractor found no plain or FlateDecode text content "
            "streams (other /Filter chains need the pypdf or pdfplumber adapter)"
        )
    return pages


def _parse_pdf_real(b: bytes, backend: str | None = None) -> list[str]:
    """Adapter over whichever optional library is installed (pypdf's and
    pdfplumber's page iteration differ only in spelling — reference analogue
    pdf_rag_chatbot.py:12-20), falling back to the built-in mini extractor
    for plain / FlateDecode-stream documents when neither library exists.
    ``backend`` overrides the auto-detected route ("mini" forces the
    built-in extractor even when a library is importable)."""
    backend = PDF_BACKEND if backend is None else backend
    if backend == "pypdf":
        import pypdf

        return [p.extract_text() or "" for p in pypdf.PdfReader(io.BytesIO(b)).pages]
    if backend == "pdfplumber":
        import pdfplumber

        with pdfplumber.open(io.BytesIO(b)) as doc:
            return [p.extract_text() or "" for p in doc.pages]
    return _extract_text_mini(b)


def _parse_pdf(
    b: bytes, path: str = "", backend: str | None = None
) -> tuple[int, list[str]]:
    """Fake-format parser, with real ``%PDF`` payloads routed to the
    optional-library adapter when one is installed."""
    if b.startswith(MAGIC):
        _, doc_id, body = b.split(b"|", 2)
        text = body.decode()
        pages = [
            text[i : i + PAGE_CHARS] for i in range(0, max(len(text), 1), PAGE_CHARS)
        ]
        return int(doc_id), pages
    return _doc_id_from_path(path), _parse_pdf_real(b, backend)


def read_pdf_pages(
    spark: SparkSession, pdf_dir: str, backend: str | None = None
) -> DataFrame:
    """binaryFile scan → distributed page extraction.

    ``backend="mini"`` pins the built-in extractor regardless of which
    libraries the environment offers. The S11 round-trip query uses it:
    its oracle encodes the mini extractor's exact operand concatenation,
    and pypdf/pdfplumber interleave their own layout newlines — the
    query's correctness must not depend on what happens to be
    pip-installed."""
    files = spark.read.format("binaryFile").load(os.path.join(pdf_dir, "*.pdf"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                doc_id, pages = _parse_pdf(bytes(content), path, backend)
                rows.extend((doc_id, i, p) for i, p in enumerate(pages))
            yield pd.DataFrame(rows, columns=["doc_id", "page_no", "page_text"])

    return files.select("path", "content").mapInPandas(extract, PAGES_SCHEMA)
