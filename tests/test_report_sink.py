"""S11 PDF report sink: the writer must emit STRUCTURALLY valid PDF (a
third-party reader walks the xref, not our parser), round-trip byte-exact
text through the S8 mini extractor, paginate deterministically, and hold
the k-row presentation contract. F6 formatters are pinned here too — their
cross-engine contract (pre-round, negative zero) is measured in the gate,
but the Spark-side semantics need a local pin."""

from __future__ import annotations

import re

import pytest

from yfinance_etl_spark.functions.scalar import fmt_num, fmt_pct
from yfinance_etl_spark.sources.pdf import _extract_text_mini
from yfinance_etl_spark.sources.report import (
    MAX_REPORT_ROWS,
    pdf_report_sink,
    render_pdf,
)


def test_render_pdf_structure_is_walkable_without_our_parser():
    b = render_pdf(["Title", "row one", "row two"])
    assert b.startswith(b"%PDF-1.4\n")
    assert b.rstrip().endswith(b"%%EOF")
    # startxref points at the xref keyword
    startxref = int(re.search(rb"startxref\n(\d+)\n", b).group(1))
    assert b[startxref : startxref + 4] == b"xref"
    # every in-use xref offset points at exactly its "N 0 obj" header
    entries = re.findall(rb"(\d{10}) 00000 n", b)
    for num, off in enumerate(entries, start=1):
        assert b[int(off) :].startswith(b"%d 0 obj" % num), f"xref slot {num}"
    # trailer names the catalog; pages tree count matches
    assert b"/Root 1 0 R" in b
    assert b"/Count 1" in b
    # content streams are genuinely Flate-compressed (no plain BT in file)
    assert b"/Filter /FlateDecode" in b and b"BT /F1" not in b


def test_roundtrip_through_the_mini_extractor_with_hostile_chars():
    lines = ["Title", "parens (both) kinds", "back\\slash", "pct 12.50%"]
    pages = _extract_text_mini(render_pdf(lines))
    assert pages == ["\n".join(lines)]


def test_non_ascii_text_roundtrips_via_octal_escapes():
    # r9 review: a raw latin-1 byte in the content stream trips the S8
    # parser's binary-content ASCII gate and silently drops the page —
    # the writer must emit octal escapes so the stream stays pure ASCII
    lines = ["Café reports", "naïve ± 5%", "control\x01char"]
    b = render_pdf(lines)
    # the content streams are ASCII after inflation (the gate the parser
    # applies), and the text survives exactly
    import zlib as _z

    for m in re.finditer(rb"stream\n(.*?)\nendstream", b, re.S):
        _z.decompress(m.group(1)).decode("ascii")  # must not raise
    assert _extract_text_mini(b) == ["\n".join(lines)]


def test_non_latin1_text_raises_instead_of_silent_replacement():
    # '€' (U+20AC) has no latin-1 byte; errors="replace" would render '?'
    # — a silently wrong report. The writer must refuse loudly instead.
    with pytest.raises(NotImplementedError, match="non-latin-1"):
        render_pdf(["total €1,000"])


def test_property_writer_reader_roundtrip_arbitrary_latin1_reports():
    # end-to-end property (vs the codec-level escape test in
    # test_realparse_fixtures): ANY latin-1 report of ANY shape must
    # survive the FULL pipeline — page-stream assembly, Flate
    # compression, xref/trailer, pagination — through the S8 mini
    # extractor, page text equal to the newline-join of that page's rows.
    from hypothesis import given, settings
    from hypothesis import strategies as st

    latin1_line = st.text(
        alphabet=st.characters(min_codepoint=0, max_codepoint=255),
        max_size=30,
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(latin1_line, min_size=1, max_size=12), st.integers(1, 5))
    def check(lines, rows_per_page):
        pages = _extract_text_mini(render_pdf(lines, rows_per_page=rows_per_page))
        expected = [
            "\n".join(lines[i : i + rows_per_page])
            for i in range(0, len(lines), rows_per_page)
        ]
        assert pages == expected

    check()


def test_pagination_splits_every_rows_per_page_lines():
    lines = [f"line {i}" for i in range(7)]
    pages = _extract_text_mini(render_pdf(lines, rows_per_page=3))
    assert pages == ["line 0\nline 1\nline 2", "line 3\nline 4\nline 5", "line 6"]
    assert b"/Count 3" in render_pdf(lines, rows_per_page=3)


def test_empty_report_is_a_valid_single_page():
    # zero data rows: the title still renders on one page
    b = render_pdf(["Only the title"])
    assert _extract_text_mini(b) == ["Only the title"]


def test_sink_contract_single_line_column_and_row_cap(spark, tmp_path):
    good = spark.createDataFrame([("a",), ("b",)], "line string")
    path = pdf_report_sink(good, str(tmp_path), title="T", report_id=7)
    assert path.endswith("report_7.pdf")
    assert _extract_text_mini(open(path, "rb").read()) == ["T\na\nb"]

    with pytest.raises(ValueError, match="exactly one column"):
        pdf_report_sink(
            spark.createDataFrame([(1, "a")], "k int, line string"), str(tmp_path), "T"
        )

    import yfinance_etl_spark.sources.report as rep

    big = spark.range(5).selectExpr("CAST(id AS STRING) AS line")
    orig = rep.MAX_REPORT_ROWS
    rep.MAX_REPORT_ROWS = 3
    try:
        with pytest.raises(ValueError, match="MAX_REPORT_ROWS"):
            pdf_report_sink(big, str(tmp_path), "T")
    finally:
        rep.MAX_REPORT_ROWS = orig
    assert MAX_REPORT_ROWS == orig


def test_fmt_num_and_fmt_pct_spark_semantics(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0.125,), (-0.0049999,), (550.0,), (0.2,)], "v double"
    ).select(
        fmt_num("v").alias("n"),
        fmt_pct(F.col("v")).alias("p"),
        fmt_num("v", places=1).alias("n1"),
    )
    rows = {r.n: r for r in df.collect()}
    assert rows["0.13"].p == "12.50%"          # HALF_UP at the display edge
    assert rows["0.00"].p == "-0.50%"          # nonzero at 2 dp keeps sign…
    assert rows["0.00"].n1 == "0.0"            # …rounds-to-zero normalizes -0.0
    assert rows["550.00"].p == "55000.00%"
    assert rows["0.20"].p == "20.00%"