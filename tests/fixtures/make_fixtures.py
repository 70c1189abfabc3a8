"""Generate the committed real-format fixtures (tiny.pdf, tiny.png).

Run once (``python tests/fixtures/make_fixtures.py``) and commit the
output; tests read the committed bytes so the suite never depends on this
script at runtime. Both files are built from format primitives only — no
pypdf/PIL needed to WRITE them, which is the point: the container has no
parser libraries, yet the committed fixtures must be genuinely valid so
the ``-m realparse`` leg exercises the real adapter paths
(sources/pdf.py, multimodal/columns.py) wherever those libs DO exist.

* tiny.pdf — minimal one-page PDF 1.4: catalog → pages → page with a
  Helvetica Tj content stream. The xref table offsets are COMPUTED from
  the assembled byte stream (pdfminer/pdfplumber require them exact;
  pypdf would tolerate drift but correctness costs nothing here).
* tiny_flate.pdf — the same document with its content stream
  ``/Filter /FlateDecode`` zlib-compressed (r9): the class virtually
  every real-world PDF writer emits, exercising the mini extractor's
  stdlib-zlib inflate branch. Uses a TJ array + escapes so the
  byte-order and escape-decode paths run on the compressed leg too.
* tiny.png — 4x2 RGB8 PNG: signature + IHDR + zlib-compressed scanlines
  (filter byte 0 per row) + IEND, CRCs computed. A distinctive pixel
  pattern lets the test assert PIL round-trips actual pixel data, not
  just dimensions.
"""

from __future__ import annotations

import os
import struct
import zlib

HERE = os.path.dirname(os.path.abspath(__file__))

PDF_TEXT = "Hello Spark engine page one"


# Flate fixture page text: Tj + TJ + octal/paren escapes, so the compressed
# leg also covers operand ordering and string decoding. Expected extraction:
FLATE_TEXT = "Compressed (flate) page: Hi kerned TJ tail"
FLATE_STREAM = (
    rb"BT /F1 12 Tf 72 720 Td "
    rb"(Compressed \(flate\) page: ) Tj "
    rb"(\110\151 ) Tj "  # "Hi " via octal escapes
    rb"[(kerned) -250 ( TJ) -250 ( tail)] TJ "
    rb"ET"
)


def build_pdf(text: str = PDF_TEXT, stream: bytes | None = None, flate: bool = False) -> bytes:
    if stream is None:
        stream = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode("ascii")
    extra = b""
    if flate:
        stream = zlib.compress(stream)
        extra = b" /Filter /FlateDecode"
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d%b >>\nstream\n%b\nendstream" % (len(stream), extra, stream),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%b\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return bytes(out)


# 4x2 RGB: top row red/green/blue/white, bottom row black/gray/yellow/cyan
PNG_W, PNG_H = 4, 2
PNG_PIXELS = [
    [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)],
    [(0, 0, 0), (128, 128, 128), (255, 255, 0), (0, 255, 255)],
]


def build_png() -> bytes:
    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", PNG_W, PNG_H, 8, 2, 0, 0, 0)  # RGB8
    raw = b"".join(
        b"\x00" + b"".join(bytes(px) for px in row) for row in PNG_PIXELS
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


if __name__ == "__main__":
    with open(os.path.join(HERE, "tiny.pdf"), "wb") as f:
        f.write(build_pdf())
    with open(os.path.join(HERE, "tiny_flate.pdf"), "wb") as f:
        f.write(build_pdf(stream=FLATE_STREAM, flate=True))
    with open(os.path.join(HERE, "tiny.png"), "wb") as f:
        f.write(build_png())
    print("wrote tiny.pdf, tiny_flate.pdf, tiny.png")
