"""S8 PDF text source tests."""

from __future__ import annotations

import pytest

from yfinance_etl_spark.sources.pdf import _parse_pdf, read_pdf_pages, stage_fake_pdfs


def test_parse_pages_and_boundaries():
    doc_id, pages = _parse_pdf(b"PDF|7|" + b"x" * 250)
    assert doc_id == 7
    assert [len(p) for p in pages] == [100, 100, 50]


def test_parse_rejects_real_pdf_magic():
    with pytest.raises(NotImplementedError, match="PDF library"):
        _parse_pdf(b"%PDF-1.7 ...")


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
