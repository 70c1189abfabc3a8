"""Multimodal binary columns — opaque payload + typed metadata, decoded in
Arrow batches (north-star extension; the reference's only binary medium is
the PDF byte stream it parses driver-side, pdf_rag_chatbot.py:150-160).

Convention: an asset row is

    (doc_id, content: binary, meta: struct<kind,width,height,mime>)

* ``content`` is opaque bytes — Spark never interprets it; at 100 TB the
  payloads ride through shuffles/scans untouched and only the decode stage
  reads them.
* decode / feature-extract runs in ``mapInPandas`` — Arrow batches of
  bytes into Python, columnar features out, schema declared up front. This
  is THE pattern for plugging imaging/audio libs into the engine: swap the
  payload parser below for PIL/librosa and the Spark plumbing (schema,
  batching, partitioning) is unchanged.

STUB NOTICE: this container ships no imaging/audio libraries, so the
oracle-checked queries use a deterministic fake payload format
(``IMG|<w>|<h>|<body>``). Real payloads route by capability:
PIL when installed; PNGs through the built-in stdlib decoder
(``_decode_png_mini`` — zlib inflate + scanline unfilter, so real pixel
decode IS exercised in CI here); anything else raises
``NotImplementedError`` toward the PIL adapter. METADATA needs no such
gate (r10): ``image_meta`` reads JPEG frame headers (stdlib SOF marker
walk) and PNG IHDRs directly, so dimension/channel profiling of a
multimodal corpus — the most common real need — is fully supported with
zero deps; only JPEG PIXEL decode remains PIL-gated.
"""

from __future__ import annotations

import importlib.util
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from yfinance_etl_spark.operators.partitioning import spread
from pyspark.sql import functions as F

#: optional imaging backend — found via find_spec at import time, never a
#: hard dependency (this container ships none)
HAVE_PIL: bool = importlib.util.find_spec("PIL") is not None

#: declared output schema of the image feature extractor
IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, kind string, width int, height int, n_bytes bigint, checksum int"
)

MAGIC = b"IMG|"


def synthesize_image_assets(docs: DataFrame) -> DataFrame:
    """Deterministic fake image assets from the documents table: payload
    ``IMG|<w>|<h>|<text>``, dimensions derived from doc_id. Stands in for a
    ``spark.read.format('binaryFile')`` scan of real images."""
    w = (F.lit(64) + F.col("doc_id") % 64).cast("int")
    h = (F.lit(48) + F.col("doc_id") % 48).cast("int")
    # coalesce: concat_ws silently DROPS null args, which would emit a
    # 3-field payload and break the 4-field decode contract
    body = F.coalesce(F.col("text"), F.lit(""))
    payload = F.concat_ws("|", F.lit("IMG"), w.cast("string"), h.cast("string"), body)
    return docs.select(
        "doc_id",
        F.encode(payload, "UTF-8").alias("content"),
        F.struct(
            F.lit("image").alias("kind"),
            w.alias("width"),
            h.alias("height"),
            F.lit("image/x-fake").alias("mime"),
        ).alias("meta"),
    )


PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type → channels per pixel (8-bit depth only in the mini path)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _decode_png_mini(b: bytes) -> tuple[int, int, bytes]:
    """Built-in stdlib PNG decoder (zlib inflate + scanline unfilter, PNG
    spec §9): 8-bit gray/RGB/gray+alpha/RGBA, non-interlaced, non-palette
    — the class the committed fixture and most ML-corpus thumbnails are.
    Returns (width, height, raw pixel bytes), same contract as the PIL
    ``im.tobytes()`` path, so downstream byte-oriented ops compose
    unchanged. Anything fancier (palette, 16-bit, Adam7, JPEG, ...)
    raises toward the optional PIL adapter."""
    import struct
    import zlib

    pos, width = len(PNG_SIG), -1
    height = bit_depth = color_type = interlace = 0
    idat = bytearray()
    while pos + 8 <= len(b):
        (length,), tag = struct.unpack(">I", b[pos : pos + 4]), b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if width < 0 or bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace:
        raise NotImplementedError(
            "mini PNG decoder handles 8-bit gray/RGB/alpha non-interlaced only "
            f"(got depth={bit_depth} color_type={color_type} interlace={interlace}); "
            "other formats need the PIL adapter"
        )
    bpp = _PNG_CHANNELS[color_type]
    stride = width * bpp
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise NotImplementedError(f"PNG IDAT inflate failed: {e}") from e
    if len(raw) != height * (stride + 1):
        raise NotImplementedError(
            f"PNG pixel data truncated: {len(raw)} bytes for {width}x{height}"
        )
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        base = y * (stride + 1)
        ftype, line = raw[base], bytearray(raw[base + 1 : base + 1 + stride])
        for x in range(stride):
            a = line[x - bpp] if x >= bpp else 0  # left (already reconstructed)
            bb = prev[x]  # up
            c = prev[x - bpp] if x >= bpp else 0  # upper-left
            if ftype == 1:
                line[x] = (line[x] + a) & 0xFF
            elif ftype == 2:
                line[x] = (line[x] + bb) & 0xFF
            elif ftype == 3:
                line[x] = (line[x] + (a + bb) // 2) & 0xFF
            elif ftype == 4:  # Paeth predictor
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
            elif ftype != 0:
                raise NotImplementedError(f"PNG filter type {ftype}")
        out += line
        prev = line
    return width, height, bytes(out)


JPEG_SOI = b"\xff\xd8"

#: SOF0-SOF15 frame-header markers, minus the non-frame C-block members
#: (C4 = DHT, C8 = JPG reserved, CC = DAC) — ITU-T T.81 table B.1
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}

#: standalone markers with NO length field: TEM + RST0-7 (T.81 §B.1.1.3)
_JPEG_STANDALONE = frozenset({0x01, *range(0xD0, 0xD8)})


def _jpeg_meta_mini(b: bytes) -> tuple[int, int, int, bool]:
    """Stdlib JPEG METADATA walk (ITU-T T.81 §B.2): scan the marker
    segments up to the frame header and return (width, height,
    n_components, progressive) from the SOF payload —
    [precision u8][height u16][width u16][ncomp u8]. This closes the most
    common real need for JPEG corpora (dimension profiling) with zero
    deps; PIXEL decode (DHT/DQT + entropy decoding) stays honestly behind
    ``NotImplementedError`` toward the PIL adapter (reference analog:
    pdfplumber accepts image-bearing PDFs,
    /root/reference/src/jobs/yfinance_etl/pdf_rag_chatbot.py:12-20).

    Walk rules actually exercised by tests: 0xFF fill-byte padding before
    a marker; standalone TEM/RSTn (no length field); stop conditions —
    SOF found (success), SOS or EOI before any SOF, truncation (all
    raise). `progressive` = SOF2 (the web's second-most-common coding)."""
    import struct

    if not b.startswith(JPEG_SOI):
        raise NotImplementedError("not a JPEG stream (missing SOI)")
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise NotImplementedError(f"JPEG marker sync lost at byte {pos}")
        marker = b[pos + 1]
        if marker == 0xFF:  # fill byte (§B.1.1.2): resync on the next FF
            pos += 1
            continue
        if marker in _JPEG_STANDALONE:
            pos += 2
            continue
        if marker == 0xD9:  # EOI with no frame header
            break
        (seg_len,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        if marker in _JPEG_SOF:
            if pos + 10 > len(b):
                break  # truncated SOF payload
            _prec, h, w, ncomp = struct.unpack(">BHHB", b[pos + 4 : pos + 10])
            return w, h, ncomp, marker == 0xC2
        if marker == 0xDA:  # SOS before any SOF: malformed stream
            break
        pos += 2 + seg_len
    raise NotImplementedError(
        "no SOF frame header found (truncated or malformed JPEG)"
    )


def _png_meta(b: bytes) -> tuple[int, int, int]:
    """PNG METADATA from the IHDR chunk alone (always first, spec §11.2.2):
    (width, height, n_components). Palette images report 1 (the index
    stream's channel count pre-expansion); no pixel work."""
    import struct

    if len(b) < len(PNG_SIG) + 25 or b[len(PNG_SIG) + 4 : len(PNG_SIG) + 8] != b"IHDR":
        raise NotImplementedError("PNG without leading IHDR chunk")
    w, h, _depth, color_type = struct.unpack(
        ">IIBB", b[len(PNG_SIG) + 8 : len(PNG_SIG) + 18]
    )
    channels = {**_PNG_CHANNELS, 3: 1}.get(color_type)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color_type}")
    return w, h, channels


def _decode_payload(b: bytes) -> tuple[int, int, bytes]:
    """Decoder for the deterministic fake format, with real image payloads
    routed to PIL when it is installed (optional import — see HAVE_PIL)
    and PNGs decoded by the built-in stdlib path otherwise. Both real
    paths return the raw pixel buffer as the body, so downstream ops that
    treat the body as opaque bytes (resize ratios, frame splits, byte
    counts) compose unchanged."""
    if b.startswith(MAGIC):
        _, w, h, body = b.split(b"|", 3)
        return int(w), int(h), body
    if HAVE_PIL:
        from PIL import Image

        im = Image.open(io.BytesIO(b))
        return im.width, im.height, im.tobytes()
    if b.startswith(PNG_SIG):
        return _decode_png_mini(b)
    raise NotImplementedError(
        "real non-PNG image decode needs PIL (not installed in this container); "
        "payloads must be PNG or the deterministic IMG|w|h|body fake format"
    )


def synthesize_jpeg_assets(docs: DataFrame) -> DataFrame:
    """Deterministic minimal-but-spec-valid JPEG headers from the
    documents table (SOI → APP0/JFIF → COM carrying the doc text → SOF0
    or SOF2 → SOS → token entropy bytes with an FF00 stuffing sample →
    EOI). Dimensions/channel-count/coding derive from doc_id arithmetic,
    so the DuckDB oracle replays the ARITHMETIC while the Spark path
    replays the PARSE — a real header roundtrip, not a fixture echo:

        width  = 16 + doc_id % 240      height      = 16 + doc_id % 120
        ncomp  = 1 if doc_id % 4 == 0 else 3
        progressive (SOF2) iff doc_id % 5 == 0
        EXIF APP1 present iff doc_id % 3 != 2, carrying
        orientation = 1 + doc_id % 8 in a 1-entry IFD0, byte order
        MM (big-endian) when doc_id % 2 == 0 else II — both TIFF
        endiannesses exercised (r10 verdict stretch #8)

    Entropy data is a stub (pixel decode is out of scope, see
    ``_jpeg_meta_mini``); every segment the metadata walk touches is
    byte-exact per T.81 / Exif 2.x (TIFF 6.0 IFD layout)."""
    import struct

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        app0 = (
            b"\xff\xe0" + struct.pack(">H", 16)
            + b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
        )

        def app1_exif(orientation: int, big_endian: bool,
                      multi_entry: bool = False) -> bytes:
            # TIFF header + IFD0 per TIFF 6.0 §2: tag 0x0112
            # (Orientation), type 3 (SHORT), count 1, value
            # left-justified in the 4-byte field. The minimal form is a
            # one-entry IFD0 at offset 8; ``multi_entry`` is the
            # real-world shape (r11 verdict #6): IFD0 at a NON-minimal
            # offset (16, after 8 padding bytes) with THREE entries —
            # ImageWidth first, Orientation second, ExifIFDPointer last
            # — so the walk's entry loop and offset handling are both
            # load-bearing, not vacuously satisfied by entry 0 at 8.
            e = ">" if big_endian else "<"
            bom = b"MM" if big_endian else b"II"
            if not multi_entry:
                tiff = (
                    bom
                    + struct.pack(e + "HI", 42, 8)
                    + struct.pack(e + "H", 1)
                    + struct.pack(e + "HHI", 0x0112, 3, 1)
                    + struct.pack(e + "HH", orientation, 0)
                    + struct.pack(e + "I", 0)
                )
            else:
                tiff = (
                    bom
                    + struct.pack(e + "HI", 42, 16)
                    + b"\x00" * 8  # padding: IFD0 need not start at 8
                    + struct.pack(e + "H", 3)
                    + struct.pack(e + "HHI", 0x0100, 3, 1)  # ImageWidth
                    + struct.pack(e + "HH", 1, 0)
                    + struct.pack(e + "HHI", 0x0112, 3, 1)  # Orientation
                    + struct.pack(e + "HH", orientation, 0)
                    + struct.pack(e + "HHI", 0x8769, 4, 1)  # ExifIFD ptr
                    + struct.pack(e + "I", 0)
                    + struct.pack(e + "I", 0)
                )
            body = b"Exif\x00\x00" + tiff
            return b"\xff\xe1" + struct.pack(">H", 2 + len(body)) + body

        def app1_xmp() -> bytes:
            # the OTHER APP1: XMP, which real cameras/editors often emit
            # BEFORE the Exif APP1 — the walk must skip it by its
            # namespace header, not stop at "first APP1"
            body = b"http://ns.adobe.com/xap/1.0/\x00<x:xmpmeta/>"
            return b"\xff\xe1" + struct.pack(">H", 2 + len(body)) + body

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                w, h = 16 + doc_id % 240, 16 + doc_id % 120
                ncomp = 1 if doc_id % 4 == 0 else 3
                # real-world APP1 shapes, cycled by doc_id (r11 verdict
                # #6): %7==1 → XMP APP1 precedes the Exif one; %7==3 →
                # multi-entry IFD0 at a non-minimal offset; else the
                # minimal 1-entry form. Orientation VALUE arithmetic is
                # unchanged, so the oracle replay is shape-blind — only
                # the Spark-side parse has to earn the match.
                if doc_id % 3 != 2:
                    app1 = app1_exif(
                        1 + doc_id % 8, doc_id % 2 == 0,
                        multi_entry=doc_id % 7 == 3,
                    )
                    if doc_id % 7 == 1:
                        app1 = app1_xmp() + app1
                else:
                    app1 = b""
                com_body = (text or "")[:32].encode("utf-8")
                com = b"\xff\xfe" + struct.pack(">H", 2 + len(com_body)) + com_body
                sof = (
                    (b"\xff\xc2" if doc_id % 5 == 0 else b"\xff\xc0")
                    + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
                    + b"".join(
                        struct.pack(">BBB", i + 1, 0x11, 0) for i in range(ncomp)
                    )
                )
                sos = (
                    b"\xff\xda" + struct.pack(">H", 6 + 2 * ncomp) + bytes([ncomp])
                    + b"".join(struct.pack(">BB", i + 1, 0) for i in range(ncomp))
                    + b"\x00\x3f\x00"
                )
                payload = (
                    JPEG_SOI + app0 + app1 + com + sof + sos
                    + b"\x12\x34\xff\x00\x56"  # stub entropy incl. FF00 stuffing
                    + b"\xff\xd9"
                )
                rows.append(
                    (
                        doc_id,
                        payload,
                        {"kind": "image", "width": w, "height": h,
                         "mime": "image/jpeg"},
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "content", "meta"])

    return docs.mapInPandas(
        gen,
        "doc_id bigint, content binary, "
        "meta struct<kind: string, width: int, height: int, mime: string>",
    )


#: declared output schema of the metadata-only profiler
IMAGE_META_SCHEMA = (
    "doc_id bigint, format string, width int, height int, "
    "n_components int, progressive boolean"
)


def image_meta(assets: DataFrame) -> DataFrame:
    """Metadata-only corpus profile — the dimension/channel census a
    multimodal pipeline runs BEFORE deciding what to decode, so it must
    not pay (or require) pixel decode: JPEG via the stdlib SOF marker
    walk, PNG via its IHDR, the fake format via its header. Same
    mapInPandas plumbing as ``image_features``.

    Quarantine contract (the sources/jsonl.py philosophy): a census run
    BEFORE deciding what to decode must survive the corpus it is
    profiling, so one corrupt payload must never kill the job —
    unrecognized magic emits ``format='unknown'`` and a recognized-but-
    malformed stream (truncated SOF, short IHDR) emits ``format='error'``,
    both with NULL dims, instead of raising. Only the pixel-DECODE ops
    (``image_features``) keep the explicit raise toward the PIL adapter."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(content)
                try:
                    if b.startswith(JPEG_SOI):
                        w, h, nc, prog = _jpeg_meta_mini(b)
                        rows.append((doc_id, "jpeg", w, h, nc, prog))
                    elif b.startswith(PNG_SIG):
                        w, h, nc = _png_meta(b)
                        rows.append((doc_id, "png", w, h, nc, False))
                    elif b.startswith(MAGIC):
                        _, w, h, _body = b.split(b"|", 3)
                        rows.append((doc_id, "fake", int(w), int(h), 1, False))
                    else:
                        rows.append((doc_id, "unknown", None, None, None, None))
                except Exception:
                    rows.append((doc_id, "error", None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "format", "width", "height",
                    "n_components", "progressive",
                ],
            )

    return assets.mapInPandas(walk, IMAGE_META_SCHEMA)


def _exif_orientation(b: bytes) -> int | None:
    """Orientation (Exif tag 0x0112) from the first APP1/Exif segment, or
    None when absent — the stdlib APP1→TIFF-IFD0 walk (Exif 2.x over
    TIFF 6.0): marker scan to APP1 "Exif\\0\\0", byte order from II/MM,
    magic-42 check, then a linear pass over IFD0's 12-byte entries for
    the SHORT orientation value (left-justified in the 4-byte value
    field). Returns None rather than raising on any malformation — this
    feeds the census, which quarantines instead of dying."""
    import struct

    if not b.startswith(JPEG_SOI):
        return None
    pos = 2
    try:
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                return None
            marker = b[pos + 1]
            if marker == 0xFF:
                pos += 1
                continue
            if marker in _JPEG_STANDALONE:
                pos += 2
                continue
            if marker in (0xD9, 0xDA):  # EOI / SOS: no APP1 before image data
                return None
            (seg_len,) = struct.unpack(">H", b[pos + 2 : pos + 4])
            if marker == 0xE1 and b[pos + 4 : pos + 10] == b"Exif\x00\x00":
                t = b[pos + 10 : pos + 2 + seg_len]  # the TIFF stream
                if t[:2] == b"II":
                    e = "<"
                elif t[:2] == b"MM":
                    e = ">"
                else:
                    return None
                magic, ifd0 = struct.unpack_from(e + "HI", t, 2)
                if magic != 42:
                    return None
                (n_entries,) = struct.unpack_from(e + "H", t, ifd0)
                for i in range(n_entries):
                    off = ifd0 + 2 + 12 * i
                    tag, typ, cnt = struct.unpack_from(e + "HHI", t, off)
                    if tag == 0x0112 and typ == 3 and cnt == 1:
                        (val,) = struct.unpack_from(e + "H", t, off + 8)
                        return val if 1 <= val <= 8 else None
                return None
            pos += 2 + seg_len
    except struct.error:
        return None
    return None


#: declared output schema of the EXIF-aware display-geometry census
IMAGE_EXIF_SCHEMA = (
    "doc_id bigint, orientation int, display_width int, display_height int"
)


def image_exif(assets: DataFrame) -> DataFrame:
    """EXIF orientation census — the second metadata field every real
    image pipeline reads after dimensions (r10 verdict stretch #8): a
    stored (width, height) is WRONG for display when orientation 5-8
    transposes the image, so the census publishes the display geometry —
    (orientation, display_width, display_height), dims swapped for the
    transposing orientations, raw otherwise. Missing/invalid EXIF →
    orientation NULL with the raw dims (the de-facto "orientation 1"
    display behavior); a payload whose SOF walk fails quarantines with
    NULL dims (the image_meta contract). Same mapInPandas plumbing as
    the other census ops — map-only, zero exchanges."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(content)
                try:
                    w, h, _nc, _prog = _jpeg_meta_mini(b)
                except Exception:
                    rows.append((doc_id, None, None, None))
                    continue
                o = _exif_orientation(b)
                if o is not None and o >= 5:
                    w, h = h, w
                rows.append((doc_id, o, w, h))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "orientation", "display_width", "display_height"],
            )

    return assets.mapInPandas(walk, IMAGE_EXIF_SCHEMA)


def image_features(assets: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched binary in,
    columnar features out)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content, meta in zip(pdf["doc_id"], pdf["content"], pdf["meta"]):
                b = bytes(content)
                w, h, body = _decode_payload(b)
                # checksum over CODEPOINTS (not UTF-8 bytes): matches the
                # oracle's per-character ascii() on non-ASCII text too; a
                # real-image pixel buffer (PIL path) isn't UTF-8 → sum bytes
                try:
                    csum = sum(ord(c) for c in body.decode("utf-8")) % 256
                except UnicodeDecodeError:
                    csum = sum(body) % 256
                rows.append((doc_id, meta["kind"], w, h, len(b), csum))
            yield pd.DataFrame(
                rows, columns=["doc_id", "kind", "width", "height", "n_bytes", "checksum"]
            )

    return assets.mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


def resize_images(assets: DataFrame, max_dim: int = 64) -> DataFrame:
    """Resize shape for image payloads: scale each asset so its longest
    side is ≤ ``max_dim`` (never upscale), emitting NEW binary assets with
    updated metadata — the standard normalize-before-train step. Same
    mapInPandas plumbing as decode; a real deployment swaps the arithmetic
    for ``PIL.Image.resize`` and the Spark surface is unchanged.

    Deterministic fake semantics (what the oracle can replay): new_w/new_h
    floor-scale by ``max_dim / max(w, h)``; the body CHARACTER count scales
    by the area ratio (floor), standing in for the pixel buffer shrinking.
    Characters, not bytes: the oracle truncates with substr/strlen (both
    codepoint-based), and a byte cut could land mid-codepoint on non-ASCII
    text, making the composed resize→image_features decode raise.

    Real payloads (PIL / mini-PNG decoded) get a REAL nearest-neighbor
    resample over the raw pixel buffer (r7) when the channel count is
    inferable from ``len(body) == w·h·ch``; an opaque non-pixel body falls
    back to the area-ratio byte cut. The branch keys on the payload's
    MAGIC prefix — its origin — never on whether a pixel buffer happens to
    be UTF-8-decodable.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content, meta in zip(pdf["doc_id"], pdf["content"], pdf["meta"]):
                raw = bytes(content)
                w, h, body = _decode_payload(raw)
                scale = min(1.0, max_dim / max(w, h))
                nw, nh = int(w * scale), int(h * scale)
                ch = len(body) // (w * h) if w * h and len(body) % (w * h) == 0 else 0
                if raw.startswith(MAGIC):  # fake format: codepoint semantics
                    text = body.decode("utf-8")
                    nbody = text[: (len(text) * nw * nh) // (w * h)].encode("utf-8")
                elif ch in (1, 2, 3, 4) and nw and nh:  # pixel buffer: resample
                    # direct off:off+ch slices — body[off:][:ch] copied the
                    # whole buffer tail per pixel, O(n·len(body)) churn (r9)
                    nbody = b"".join(
                        body[off : off + ch]
                        for off in (
                            ((y2 * h // nh) * w + (x2 * w // nw)) * ch
                            for y2 in range(nh)
                            for x2 in range(nw)
                        )
                    )
                else:  # opaque body: keep the deterministic byte cut
                    nbody = body[: (len(body) * nw * nh) // (w * h)]
                payload = b"IMG|%d|%d|%b" % (nw, nh, nbody)
                new_meta = {"kind": meta["kind"], "width": nw, "height": nh, "mime": meta["mime"]}
                rows.append((doc_id, payload, new_meta))
            yield pd.DataFrame(rows, columns=["doc_id", "content", "meta"])

    # output keeps the (doc_id, content, meta) asset contract, so decode/
    # feature ops compose over resized assets unchanged
    return assets.mapInPandas(
        resize,
        "doc_id bigint, content binary, "
        "meta struct<kind: string, width: int, height: int, mime: string>",
    )


#: dHash geometry: 8 block-rows x 9 block-columns -> 8x8 = 64 comparison
#: bits, packed as two 32-bit words (hi = rows 0-3, lo = rows 4-7) so the
#: signature never touches the int64 sign bit in either engine
DHASH_ROWS, DHASH_COLS = 8, 9

#: declared output schema of the dHash extractor
IMAGE_DHASH_SCHEMA = "doc_id bigint, dhash_hi bigint, dhash_lo bigint"


def encode_png_gray(pixels: bytes, w: int, h: int) -> bytes:
    """Encode a raw grayscale pixel buffer (row-major, len == w*h) as a
    spec-valid 8-bit non-interlaced PNG (filter 0 scanlines, zlib IDAT,
    CRC-correct chunks) — the exact class ``_decode_png_mini`` decodes.
    Shared by the image and per-video-frame fixture synthesizers."""
    import struct
    import zlib

    if len(pixels) != w * h:
        raise ValueError(f"need {w * h} pixels, got {len(pixels)}")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type 0 per scanline
        raw += pixels[y * w : (y + 1) * w]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def synthesize_png_assets(docs: DataFrame) -> DataFrame:
    """Deterministic REAL PNG assets from the documents table — grayscale
    8-bit non-interlaced streams (zlib-deflated, CRC-correct), the class
    ``_decode_png_mini`` decodes with real inflate + unfilter. Pixel
    content is pure doc_id arithmetic so the DuckDB oracle can replay the
    PIXELS while the Spark path must earn them through an actual PNG
    decode (the synthesize_jpeg_assets contract, extended from headers to
    the full pixel pipeline):

        base  = doc_id - 1 if doc_id % 7 == 3 else doc_id   (near-dup plant)
        bw    = 1 + base % 3     bh = 1 + base % 2
        w, h  = 9*bw, 8*bh       (exact dHash block grid — no resampling)
        pixel(x, y) = byte (x mod 16) of md5('<base>:<y>:<x//16>')
        replicas (doc_id % 7 == 3) additionally brighten block (0,0):
        pixel = (pixel + 100) % 256 for x < bw, y < bh

    One digest covers 16 horizontal pixels (batched-digest noise, the
    video-fixture discipline — 13× fewer md5 calls than the r15
    per-pixel form; still hash-noise, so dHashes stay well-spread).

    md5-noise pixels make distinct scenes' dHash bits i.i.d. coin flips
    (expected pairwise Hamming 32; P(<=7) ~ 1e-12, so the only pairs the
    query emits are the planted replicas) — low-order polynomial
    gradients were tried first and collapsed: monotone scanlines drive
    every image's dHash toward all-ones and 70% of ALL pairs landed
    within Hamming 7.

    The replica construction makes (doc_id-1, doc_id) a planted NEAR-dup
    pair: one brightened corner block can flip at most the single dHash
    comparison it left-anchors (Hamming <= 1), while distinct scenes
    differ in gradient slope and wrap phase across the whole grid."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                base = doc_id - 1 if doc_id % 7 == 3 else doc_id
                bw, bh = 1 + base % 3, 1 + base % 2
                w, h = DHASH_COLS * bw, DHASH_ROWS * bh
                is_rep = doc_id % 7 == 3
                raw = bytearray()
                for y in range(h):
                    row = b"".join(
                        hashlib.md5(f"{base}:{y}:{xb}".encode()).digest()
                        for xb in range((w + 15) // 16)
                    )
                    raw.extend(row[:w])
                if is_rep:
                    for y in range(bh):
                        for x in range(bw):
                            raw[y * w + x] = (raw[y * w + x] + 100) % 256
                payload = encode_png_gray(bytes(raw), w, h)
                rows.append(
                    (
                        doc_id,
                        payload,
                        {"kind": "image", "width": w, "height": h,
                         "mime": "image/png"},
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "content", "meta"])

    return spread(docs.select("doc_id")).mapInPandas(
        gen,
        "doc_id bigint, content binary, "
        "meta struct<kind: string, width: int, height: int, mime: string>",
    )


def image_dhash(assets: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) over DECODED pixel buffers — the
    signature stage of image near-dup dedup (the brief's one dedup-less
    modality until r15; compose with ``dedup.dhash_neardup`` for the
    banded candidate join + Hamming verify).

    Per asset: decode to raw pixels (PIL when installed, the stdlib PNG
    inflate+unfilter path otherwise — REAL pixel work, same routing as
    ``image_features``), average down to the 8x9 block grid, then one
    bit per horizontally adjacent block pair: bit(i,j) = mean(i+1,j) >
    mean(i,j). Gradient comparisons are what survive the transforms that
    defeat exact byte hashing — re-encode, brightness shift, small
    retouch — which is exactly the near-dup class a multimodal corpus
    needs collapsed. 64 bits pack into two 32-bit words (rows 0-3 / 4-7;
    bit index 8*row + col) so neither engine touches the int64 sign bit.

    Multi-channel payloads hash the per-pixel channel SUM (a luma stand-
    in with no float weights — deterministic in any engine); dimensions
    not divisible by the grid use floor block edges (len*k//n), the
    ``resize_images`` nearest-neighbor convention."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                w, h, body = _decode_payload(bytes(content))
                rows.append((doc_id, *_dhash_words(body, w, h)))
            yield pd.DataFrame(rows, columns=["doc_id", "dhash_hi", "dhash_lo"])

    return assets.mapInPandas(extract, IMAGE_DHASH_SCHEMA)


def _dhash_words(body: bytes, w: int, h: int) -> tuple[int, int]:
    """The dHash core over one raw pixel buffer — shared by the image
    and per-video-frame signature extractors. Vectorized block sums over
    the floor-edge grid (numpy int64 throughout — exact; no float enters
    the hash): per-pixel luma stand-in = channel sum, then bincount over
    the flattened (block-row, block-col) index grid."""
    import numpy as np

    ch = len(body) // (w * h) if w * h and len(body) % (w * h) == 0 else 0
    if ch not in (1, 2, 3, 4):
        raise NotImplementedError(
            f"dHash needs a raw pixel body (got {len(body)} bytes for "
            f"{w}x{h}); decode the payload first"
        )
    px = (
        np.frombuffer(body, dtype=np.uint8)
        .astype(np.int64)
        .reshape(h, w, ch)
        .sum(axis=2)
    )
    xs = np.arange(w, dtype=np.int64) * DHASH_COLS // w
    ys = np.arange(h, dtype=np.int64) * DHASH_ROWS // h
    idx = (ys[:, None] * DHASH_COLS + xs[None, :]).ravel()
    ncells = DHASH_ROWS * DHASH_COLS
    sums = np.zeros(ncells, dtype=np.int64)
    np.add.at(sums, idx, px.ravel())
    cnts = np.bincount(idx, minlength=ncells).astype(np.int64)
    sums = sums.reshape(DHASH_ROWS, DHASH_COLS)
    cnts = cnts.reshape(DHASH_ROWS, DHASH_COLS)
    # mean(i+1) > mean(i)  <=>  s1*c0 > s0*c1 (cross-mult in int64:
    # sums < 255*4*w*h, counts < w*h — no overflow)
    bits = sums[:, 1:] * cnts[:, :-1] > sums[:, :-1] * cnts[:, 1:]
    weights = 1 << (
        8 * (np.arange(DHASH_ROWS)[:, None] % 4)
        + np.arange(DHASH_COLS - 1)[None, :]
    ).astype(np.int64)
    packed = (bits * weights).sum(axis=1)
    return int(packed[:4].sum()), int(packed[4:].sum())


def sample_frames(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling shape for video-like payloads: body split on NUL
    markers, every Nth frame kept. Same mapInPandas plumbing as decode."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                _, _, body = _decode_payload(bytes(content))
                frames = body.split(b"\x00")
                for i, fr in enumerate(frames):
                    if i % every_n == 0:
                        rows.append((doc_id, i, len(fr)))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_id", "frame_bytes"])

    return assets.mapInPandas(sample, "doc_id bigint, frame_id int, frame_bytes int")
