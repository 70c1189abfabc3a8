"""S11: PDF report sink (reference fund_comp2.py:610-834 —
``generate_pdf_report(data)`` renders reportlab tables/paragraphs into a
``BytesIO``).

Spark-first shape: a report is presentation over an already-AGGREGATED
result, so the engine side is a normal Catalyst plan that reduces the data
to report lines (callers compose the F6 display formatters —
``functions/scalar.fmt_pct`` / ``fmt_num`` — into a single string column),
and only the final k-row render is driver-side. ``pdf_report_sink``
enforces that contract with a hard row cap: feeding it an unaggregated
table is an error, not an accidental driver OOM.

The renderer emits a REAL, minimal PDF 1.4: catalog → page tree → one page
object + one FlateDecode-compressed content stream per ``rows_per_page``
lines (Helvetica, one ``Tj`` per line with explicit ``Td`` leading), a
byte-exact xref table and trailer. Zero dependencies — stdlib ``zlib``
only — and the output closes the loop with the S8 source: ``read_pdf_pages``
(sources/pdf.py) parses the sink's files back to their exact text, which is
what makes the sink oracle-gatable (``pdf_report_roundtrip``).
"""

from __future__ import annotations

import os
import zlib

from pyspark.sql import DataFrame

#: presentation contract: a report is k rows, not a table scan
MAX_REPORT_ROWS = 10_000

_FONT = "Helvetica"
_PAGE_W, _PAGE_H = 612, 792  # US Letter, 1/72 inch units
_MARGIN_X, _TOP_Y = 72, 720
_LEADING = 14  # points between baselines


def _esc(s: str) -> bytes:
    """PDF literal-string escaping (ISO 32000-1 §7.3.4.2): backslash and
    parens escaped; every byte outside printable ASCII emitted as a
    3-digit OCTAL escape. The octal form matters for the roundtrip
    contract: a raw latin-1 byte (é = 0xE9) in the stream would trip the
    S8 mini extractor's binary-content ASCII gate and silently drop the
    whole page, whereas ``\\351`` keeps the stream pure ASCII and the
    parser's octal unescape restores the exact character.

    Characters outside latin-1 raise (loud, like every other unsupported
    format in this engine) instead of being silently replaced with ``?``
    — a report that says ``?1,000`` where the data said ``€1,000`` is a
    wrong answer, not a rendering nicety."""
    try:
        encoded = s.encode("latin-1")
    except UnicodeEncodeError as e:
        raise NotImplementedError(
            f"report text contains non-latin-1 character {s[e.start]!r} "
            "(WinAnsi/Type1 Helvetica covers latin-1 only; multi-byte "
            "fonts need a CID font, out of scope for the minimal writer)"
        ) from e
    out = bytearray()
    for ch in encoded:
        if ch in (0x5C, 0x28, 0x29):  # \ ( )
            out += b"\\" + bytes([ch])
        elif 0x20 <= ch <= 0x7E:
            out.append(ch)
        else:
            out += b"\\%03o" % ch
    return bytes(out)


def _page_stream(lines: list[str]) -> bytes:
    """One page's content stream: a BT..ET text block, each line shown by
    its own ``Tj`` at an explicit ``Td`` offset (so real viewers lay the
    lines out as a list), with a ``\\n`` escape INSIDE each operand — the
    mini parser concatenates operands byte-for-byte, so the page text
    round-trips as newline-joined lines."""
    parts = [b"BT /F1 11 Tf %d %d Td" % (_MARGIN_X, _TOP_Y)]
    for i, ln in enumerate(lines):
        if i:
            parts.append(b"0 -%d Td" % _LEADING)
        sep = b"\\n" if i else b""
        parts.append(b"(" + sep + _esc(ln) + b") Tj")
    parts.append(b"ET")
    return b" ".join(parts)


def render_pdf(lines: list[str], rows_per_page: int = 40) -> bytes:
    """Deterministic minimal PDF: same lines → same bytes (zlib level
    fixed). Pages split every ``rows_per_page`` lines."""
    chunks = [lines[i : i + rows_per_page] for i in range(0, len(lines), rows_per_page)]
    if not chunks:
        chunks = [[]]
    n_pages = len(chunks)
    # object numbering: 1 catalog, 2 pages tree, 3 font,
    # then (page obj, content obj) pairs from 4
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /" + _FONT.encode() + b" >>",
    }
    kids = []
    for p, page_lines in enumerate(chunks):
        page_no, content_no = 4 + 2 * p, 5 + 2 * p
        kids.append(b"%d 0 R" % page_no)
        objs[page_no] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % (_PAGE_W, _PAGE_H, content_no)
        )
        payload = zlib.compress(_page_stream(page_lines), 6)
        objs[content_no] = (
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(payload)
            + payload
            + b"\nendstream"
        )
    objs[2] = b"<< /Type /Pages /Kids [" + b" ".join(kids) + b"] /Count %d >>" % n_pages

    out = bytearray(b"%PDF-1.4\n%\xc2\xb5\xc2\xb6\n")  # binary-comment marker line
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n_objs = max(objs) + 1
    out += b"xref\n0 %d\n" % n_objs
    out += b"0000000000 65535 f \n"
    for num in range(1, n_objs):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n_objs, xref_at)
    )
    return bytes(out)


def pdf_report_sink(
    df: DataFrame,
    out_dir: str,
    title: str,
    report_id: int = 0,
    rows_per_page: int = 40,
) -> str:
    """Render ``df`` — a SINGLE string column ``line``, already ordered —
    into ``report_<id>.pdf`` under ``out_dir`` and return the file path.

    The collect here is the presentation boundary, k-row by contract
    (``MAX_REPORT_ROWS``), exactly like the reference's
    ``generate_pdf_report`` over its display dict — everything upstream of
    the ``line`` column stays a distributed Catalyst plan."""
    if df.columns != ["line"]:
        raise ValueError(f"report df must have exactly one column 'line', got {df.columns}")
    capped = df.limit(MAX_REPORT_ROWS + 1).collect()
    if len(capped) > MAX_REPORT_ROWS:
        raise ValueError(
            f"report exceeds MAX_REPORT_ROWS={MAX_REPORT_ROWS}: aggregate "
            "before sinking — a report is presentation, not a table scan"
        )
    lines = [title] + [r.line for r in capped]
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"report_{report_id}.pdf")
    with open(path, "wb") as f:
        f.write(render_pdf(lines, rows_per_page=rows_per_page))
    return path
