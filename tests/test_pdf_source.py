"""S8 PDF text source tests."""

from __future__ import annotations

import pytest

from yfinance_etl_spark.sources.pdf import _parse_pdf, read_pdf_pages, stage_fake_pdfs


def test_parse_pages_and_boundaries():
    doc_id, pages = _parse_pdf(b"PDF|7|" + b"x" * 250)
    assert doc_id == 7
    assert [len(p) for p in pages] == [100, 100, 50]


def test_parse_rejects_real_pdf_magic_without_backend():
    import yfinance_etl_spark.sources.pdf as pdfmod

    if pdfmod.PDF_BACKEND is not None:  # environment has a real library
        pytest.skip(f"real backend available: {pdfmod.PDF_BACKEND}")
    with pytest.raises(NotImplementedError, match="pypdf or pdfplumber"):
        _parse_pdf(b"%PDF-1.7 ...")


def test_real_pdf_routes_to_backend_adapter(monkeypatch):
    # force a fake backend and check selection: real magic goes to the
    # adapter (with doc_id derived from the path), fake magic never does
    import yfinance_etl_spark.sources.pdf as pdfmod

    calls = []

    def fake_real(b, backend=None):
        calls.append(b)
        return ["page one", "page two"]

    monkeypatch.setattr(pdfmod, "_parse_pdf_real", fake_real)
    doc_id, pages = pdfmod._parse_pdf(b"%PDF-1.7 ...", "/data/report_17.pdf")
    assert (doc_id, pages) == (17, ["page one", "page two"])
    assert calls  # adapter used
    calls.clear()
    pdfmod._parse_pdf(b"PDF|3|abc", "/data/report_17.pdf")
    assert not calls  # fake format stays on the stub path


def test_doc_id_from_path_deterministic():
    from yfinance_etl_spark.sources.pdf import _doc_id_from_path

    assert _doc_id_from_path("/a/b/doc_123.pdf") == 123
    # no trailing digits → stable crc32, not a crash
    assert _doc_id_from_path("/a/b/report.pdf") == _doc_id_from_path("/c/report.pdf")


def test_backend_selection_is_importable_everywhere():
    # PDF_BACKEND must be None or a spelled backend — never an ImportError
    from yfinance_etl_spark.sources.pdf import PDF_BACKEND

    assert PDF_BACKEND in (None, "pypdf", "pdfplumber")


class _FakePage:
    def __init__(self, text):
        self._text = text

    def extract_text(self):
        return self._text


def _install_fake_pdf_lib(monkeypatch, name, pages_text):
    """Install a minimal stand-in for pypdf / pdfplumber in sys.modules so
    the adapter BODY in ``_parse_pdf_real`` executes in this lib-less
    container (the routing tests above only prove selection). Driver-side
    by necessity — sys.modules injection cannot reach Spark workers — but
    the adapter is a plain function, identical in both places."""
    import sys
    import types

    mod = types.ModuleType(name)
    seen = []
    if name == "pypdf":

        class PdfReader:
            def __init__(self, fh):
                seen.append(fh.read())
                self.pages = [_FakePage(t) for t in pages_text]

        mod.PdfReader = PdfReader
    else:

        class _Doc:
            def __init__(self):
                self.pages = [_FakePage(t) for t in pages_text]
                self.closed = False

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                self.closed = True
                return False

        docs = []

        def open_(fh):
            seen.append(fh.read())
            docs.append(_Doc())
            return docs[-1]

        mod.open = open_
        mod._docs = docs
    monkeypatch.setitem(sys.modules, name, mod)
    return seen


def test_pypdf_adapter_body_executes_with_fake_module(monkeypatch):
    from yfinance_etl_spark.sources.pdf import _parse_pdf_real

    payload = b"%PDF-1.7 fake"
    # None from extract_text must coerce to "" (pypdf returns None for
    # image-only pages) -- the `or ""` in the adapter is load-bearing
    seen = _install_fake_pdf_lib(monkeypatch, "pypdf", ["alpha", None, "gamma"])
    assert _parse_pdf_real(payload, backend="pypdf") == ["alpha", "", "gamma"]
    assert seen == [payload]  # full bytes reached the reader


def test_pdfplumber_adapter_body_executes_with_fake_module(monkeypatch):
    import sys

    from yfinance_etl_spark.sources.pdf import _parse_pdf_real

    payload = b"%PDF-1.4 fake"
    seen = _install_fake_pdf_lib(monkeypatch, "pdfplumber", [None, "beta"])
    assert _parse_pdf_real(payload, backend="pdfplumber") == ["", "beta"]
    assert seen == [payload]
    # the with-block must close the document (pdfplumber holds file state)
    assert sys.modules["pdfplumber"]._docs[0].closed


def test_binaryfile_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "a" * 120), (2, "b" * 30)], "doc_id bigint, text string"
    )
    d = stage_fake_pdfs(docs, key=str(tmp_path))
    got = sorted(
        (r.doc_id, r.page_no, len(r.page_text))
        for r in read_pdf_pages(spark, d).collect()
    )
    assert got == [(1, 0, 100), (1, 1, 20), (2, 0, 30)]
