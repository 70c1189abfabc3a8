"""Multimodal binary-column plumbing tests."""

from __future__ import annotations

import pytest

from yfinance_etl_spark.multimodal.columns import (
    _decode_payload,
    image_features,
    sample_frames,
    synthesize_image_assets,
)


def _docs(spark):
    return spark.createDataFrame(
        [(0, "abc"), (65, "hello world")], "doc_id bigint, text string"
    )


def test_asset_schema_and_payload(spark):
    assets = synthesize_image_assets(_docs(spark))
    assert [f.name for f in assets.schema.fields] == ["doc_id", "content", "meta"]
    assert assets.schema["content"].dataType.simpleString() == "binary"
    row = assets.filter("doc_id = 0").collect()[0]
    assert bytes(row.content) == b"IMG|64|48|abc"
    assert row.meta.kind == "image" and row.meta.width == 64


def test_image_features_values(spark):
    feats = {r.doc_id: r for r in image_features(synthesize_image_assets(_docs(spark))).collect()}
    # doc 0: body 'abc' → checksum (97+98+99) % 256 = 38; payload 13 bytes
    assert feats[0].checksum == 38 and feats[0].n_bytes == 13
    # doc 65: w = 64 + 65%64 = 65, h = 48 + 65%48 = 65
    assert feats[65].width == 65 and feats[65].height == 65


def test_decode_rejects_unknown_format_without_pil():
    import yfinance_etl_spark.multimodal.columns as mm

    if mm.HAVE_PIL:
        pytest.skip("PIL available: real decode path active")
    with pytest.raises(NotImplementedError, match="PIL"):
        _decode_payload(b"\x89PNG....")


def test_decode_fake_format_never_consults_pil(monkeypatch):
    import yfinance_etl_spark.multimodal.columns as mm

    monkeypatch.setattr(mm, "HAVE_PIL", True)  # even if "available"...
    w, h, body = mm._decode_payload(b"IMG|8|4|xyz")
    assert (w, h, body) == (8, 4, b"xyz")  # ...fake magic stays on the stub


def test_pil_adapter_body_executes_with_fake_module(monkeypatch):
    # the PIL branch of _decode_payload never runs in this container
    # (HAVE_PIL is False); execute its body against a minimal stand-in so
    # the Image.open → width/height/tobytes wiring is covered, not just
    # the routing around it. Driver-side by necessity: sys.modules
    # injection can't reach Spark workers, but the decoder is a plain
    # function, identical in both places.
    import sys
    import types

    import yfinance_etl_spark.multimodal.columns as mm

    seen = []

    class _Im:
        width, height = 7, 3

        def tobytes(self):
            return b"p" * (7 * 3)

    image_mod = types.ModuleType("PIL.Image")

    def open_(fh):
        seen.append(fh.read())
        return _Im()

    image_mod.open = open_
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    monkeypatch.setattr(mm, "HAVE_PIL", True)

    payload = b"\xff\xd8\xff\xe0 jpeg-ish"  # non-PNG: only PIL could decode
    assert mm._decode_payload(payload) == (7, 3, b"p" * 21)
    assert seen == [payload]  # full bytes reached Image.open


def test_sample_frames_stride(spark):
    df = spark.createDataFrame([(1, "f0\x00f1\x00f2\x00f3\x00f4")], "doc_id bigint, text string")
    assets = synthesize_image_assets(df)
    got = sorted((r.frame_id, r.frame_bytes) for r in sample_frames(assets, every_n=2).collect())
    assert [f for f, _ in got] == [0, 2, 4]


def test_resize_caps_longest_side_and_composes(spark):
    from yfinance_etl_spark.multimodal.columns import (
        image_features,
        resize_images,
        synthesize_image_assets,
    )

    docs = spark.createDataFrame(
        [(0, "x" * 100), (63, "y" * 100), (47, "z" * 100)], "doc_id bigint, text string"
    )
    # doc 0: 64x48 (already within cap → untouched); doc 63: 127x63;
    # doc 47: 111x95
    out = {
        r.doc_id: r
        for r in image_features(resize_images(synthesize_image_assets(docs), 64)).collect()
    }
    assert (out[0].width, out[0].height) == (64, 48)  # no upscale, no change
    assert out[0].n_bytes == len("IMG|64|48|" + "x" * 100)
    for r in out.values():
        assert max(r.width, r.height) <= 64
    # 127x63 → scale 64/127: width 64, height 31; body shrunk by area ratio
    assert (out[63].width, out[63].height) == (64, 31)
    expected_body = (100 * 64 * 31) // (127 * 63)
    assert out[63].n_bytes == len("IMG|64|31|") + expected_body


def test_resize_truncates_characters_not_bytes(spark):
    # non-ASCII body: a byte-count cut would land mid-codepoint and make
    # the composed resize -> image_features decode raise; character
    # truncation (matching the oracle's length()/substr()) must not
    from yfinance_etl_spark.multimodal.columns import (
        image_features,
        resize_images,
        synthesize_image_assets,
    )

    text = "é" * 100  # 2 bytes per char in UTF-8
    docs = spark.createDataFrame([(63, text)], "doc_id bigint, text string")
    out = image_features(resize_images(synthesize_image_assets(docs), 64)).collect()[0]
    # 127x63 → 64x31; body keeps (100 * 64 * 31) // (127 * 63) CHARACTERS
    keep_chars = (100 * 64 * 31) // (127 * 63)
    assert out.n_bytes == len("IMG|64|31|") + 2 * keep_chars
    assert out.checksum == (ord("é") * keep_chars) % 256


# ---------------------------------------------------------------------------
# JPEG/PNG metadata census (r10): stdlib SOF marker walk + IHDR read
# ---------------------------------------------------------------------------


def test_jpeg_meta_walk_hand_built_header():
    """Hand-assembled T.81 stream exercising every walk rule: fill-byte
    padding, a standalone RST marker, an APP segment to skip, then SOF0."""
    import struct

    from yfinance_etl_spark.multimodal.columns import _jpeg_meta_mini

    app1 = b"\xff\xe1" + struct.pack(">H", 8) + b"Exif\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 480, 640, 3) + b"\x01\x11\x00" * 1
    b = (
        b"\xff\xd8"          # SOI
        + b"\xff"            # fill byte before the next marker
        + app1
        + b"\xff\xd0"        # RST0: standalone, no length field
        + sof0
        + b"\xff\xd9"
    )
    assert _jpeg_meta_mini(b) == (640, 480, 3, False)


def test_jpeg_meta_walk_progressive_and_failures():
    import struct

    import pytest

    from yfinance_etl_spark.multimodal.columns import _jpeg_meta_mini

    sof2 = b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 10, 20, 1) + b"\x01\x11\x00"
    assert _jpeg_meta_mini(b"\xff\xd8" + sof2 + b"\xff\xd9") == (20, 10, 1, True)
    # DHT (C4) is NOT a frame header: walk must skip it, not misread dims
    dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x01\x02"
    assert _jpeg_meta_mini(b"\xff\xd8" + dht + sof2) == (20, 10, 1, True)
    with pytest.raises(NotImplementedError):
        _jpeg_meta_mini(b"PNGJUNK")           # no SOI
    with pytest.raises(NotImplementedError):
        _jpeg_meta_mini(b"\xff\xd8\xff\xd9")  # EOI before any SOF
    with pytest.raises(NotImplementedError):
        # SOS before SOF: malformed — must not scan into entropy data
        sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
        _jpeg_meta_mini(b"\xff\xd8" + sos + sof2)
    with pytest.raises(NotImplementedError):
        _jpeg_meta_mini(b"\xff\xd8" + sof2[:6])  # truncated mid-SOF


def test_png_meta_reads_ihdr_only():
    import struct
    import zlib

    import pytest

    from yfinance_etl_spark.multimodal.columns import PNG_SIG, _png_meta

    def chunk(tag, data):
        return struct.pack(">I", len(data)) + tag + data + struct.pack(
            ">I", zlib.crc32(tag + data)
        )

    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 320, 200, 8, 2, 0, 0, 0))
    # IDAT deliberately garbage: metadata must never touch pixel data
    png = PNG_SIG + ihdr + chunk(b"IDAT", b"\x00garbage") + chunk(b"IEND", b"")
    assert _png_meta(png) == (320, 200, 3)
    pal = PNG_SIG + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0))
    assert _png_meta(pal) == (4, 4, 1)  # palette: index stream channels
    with pytest.raises(NotImplementedError):
        _png_meta(PNG_SIG + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 7, 0, 0, 0)))


def test_image_meta_roundtrips_synthesized_jpegs(spark):
    """synthesize → parse roundtrip: the walk recovers exactly the
    arithmetic the synthesizer encoded (the oracle contract), across
    both 1- and 3-component and baseline/progressive streams."""
    from yfinance_etl_spark.multimodal.columns import (
        image_meta,
        synthesize_jpeg_assets,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} text") for i in range(0, 25)], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in image_meta(synthesize_jpeg_assets(docs)).collect()}
    assert len(out) == 25
    for i in range(25):
        r = out[i]
        assert (r.format, r.width, r.height) == ("jpeg", 16 + i % 240, 16 + i % 120)
        assert r.n_components == (1 if i % 4 == 0 else 3)
        assert r.progressive == (i % 5 == 0)


def test_image_meta_routes_png_and_fake(spark):
    """One operator, three formats: the census never decodes pixels and
    never guesses on unknown payloads."""
    import struct
    import zlib

    from yfinance_etl_spark.multimodal.columns import PNG_SIG, image_meta

    def chunk(tag, data):
        return struct.pack(">I", len(data)) + tag + data + struct.pack(
            ">I", zlib.crc32(tag + data)
        )

    png = PNG_SIG + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 9, 8, 6, 0, 0, 0))
    rows = [
        (0, bytearray(png), {"kind": "image", "width": 7, "height": 9, "mime": "image/png"}),
        (1, bytearray(b"IMG|12|34|body"), {"kind": "image", "width": 12, "height": 34, "mime": "image/x-fake"}),
    ]
    assets = spark.createDataFrame(
        rows,
        "doc_id bigint, content binary, "
        "meta struct<kind: string, width: int, height: int, mime: string>",
    )
    got = {r.doc_id: r for r in image_meta(assets).collect()}
    assert (got[0].format, got[0].width, got[0].height, got[0].n_components) == ("png", 7, 9, 4)
    assert (got[1].format, got[1].width, got[1].height) == ("fake", 12, 34)


def test_jpeg_meta_walk_never_hangs_or_crashes_on_arbitrary_bytes():
    """Fuzz the marker walk (hypothesis): on ANY byte string it must
    terminate promptly and either raise NotImplementedError or return a
    well-typed (w, h, ncomp, progressive) tuple — never loop, never
    raise anything else. (The walk runs inside executor tasks at corpus
    scale; an infinite loop or a stray IndexError there is a hung or
    dead job, not a quarantined row.)"""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from yfinance_etl_spark.multimodal.columns import _jpeg_meta_mini

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=400))
    def fuzz(b):
        try:
            w, h, nc, prog = _jpeg_meta_mini(b"\xff\xd8" + b)
        except NotImplementedError:
            return
        assert 0 <= w <= 0xFFFF and 0 <= h <= 0xFFFF
        assert 0 <= nc <= 0xFF and isinstance(prog, bool)

    fuzz()


def test_jpeg_meta_walk_rejects_arbitrary_prefixes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pytest

    from yfinance_etl_spark.multimodal.columns import _jpeg_meta_mini

    @settings(max_examples=100, deadline=None)
    @given(st.binary(max_size=64))
    def fuzz(b):
        if b.startswith(b"\xff\xd8"):
            return  # genuine SOI: covered by the other fuzz
        with pytest.raises(NotImplementedError):
            _jpeg_meta_mini(b)

    fuzz()


def test_image_meta_quarantines_corrupt_payloads(spark):
    """The census is a profiling pass over an UNTRUSTED corpus — one
    corrupt payload must not kill the job (ADVICE r10). Unknown magic →
    format='unknown'; recognized-but-malformed → format='error'; both
    with NULL dims, and the healthy rows in the same batch still parse."""
    import struct
    import zlib

    from yfinance_etl_spark.multimodal.columns import PNG_SIG, image_meta

    def chunk(tag, data):
        return struct.pack(">I", len(data)) + tag + data + struct.pack(
            ">I", zlib.crc32(tag + data)
        )

    png = PNG_SIG + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 9, 8, 6, 0, 0, 0))
    rows = [
        (0, bytearray(png), None),                          # healthy PNG
        (1, bytearray(b"GIF89a notreally"), None),          # unknown magic
        (2, bytearray(b"\xff\xd8\xff\xd9"), None),          # JPEG, EOI before SOF
        (3, bytearray(PNG_SIG + b"\x00\x01"), None),        # PNG sig, truncated IHDR
        (4, bytearray(b"IMG|12|34|body"), None),            # healthy fake
    ]
    assets = spark.createDataFrame(
        rows,
        "doc_id bigint, content binary, "
        "meta struct<kind: string, width: int, height: int, mime: string>",
    )
    got = {r.doc_id: r for r in image_meta(assets).collect()}
    assert len(got) == 5  # nothing raised, nothing dropped
    assert (got[0].format, got[0].width, got[0].height) == ("png", 7, 9)
    assert (got[4].format, got[4].width, got[4].height) == ("fake", 12, 34)
    for bad, expect in ((1, "unknown"), (2, "error"), (3, "error")):
        r = got[bad]
        assert r.format == expect
        assert r.width is None and r.height is None and r.n_components is None


def test_exif_orientation_walk_both_endians_and_absence():
    """Hand-built APP1 segments: big- and little-endian TIFF both parse;
    missing APP1, non-Exif APP1 (XMP), bad magic, out-of-range value and
    truncation all yield None (census quarantine, never a raise)."""
    import struct

    from yfinance_etl_spark.multimodal.columns import _exif_orientation

    def jpeg_with(app1_body: bytes | None) -> bytes:
        app1 = (
            b"\xff\xe1" + struct.pack(">H", 2 + len(app1_body)) + app1_body
            if app1_body is not None
            else b""
        )
        sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 10, 20, 1) + b"\x01\x11\x00"
        return b"\xff\xd8" + app1 + sof0 + b"\xff\xd9"

    def tiff(orientation, big, magic=42, typ=3):
        e = ">" if big else "<"
        return (
            b"Exif\x00\x00"
            + (b"MM" if big else b"II")
            + struct.pack(e + "HI", magic, 8)
            + struct.pack(e + "H", 1)
            + struct.pack(e + "HHI", 0x0112, typ, 1)
            + struct.pack(e + "HH", orientation, 0)
            + struct.pack(e + "I", 0)
        )

    assert _exif_orientation(jpeg_with(tiff(6, big=True))) == 6
    assert _exif_orientation(jpeg_with(tiff(3, big=False))) == 3
    assert _exif_orientation(jpeg_with(None)) is None                 # no APP1
    assert _exif_orientation(jpeg_with(b"http://ns.adobe.com/xap/")) is None  # XMP
    assert _exif_orientation(jpeg_with(tiff(6, True, magic=43))) is None      # bad magic
    assert _exif_orientation(jpeg_with(tiff(6, True, typ=4))) is None         # wrong type
    assert _exif_orientation(jpeg_with(tiff(9, big=True))) is None            # out of range
    assert _exif_orientation(jpeg_with(tiff(6, True)[:12])) is None           # truncated
    assert _exif_orientation(b"notajpeg") is None


def test_image_exif_display_geometry_roundtrip(spark):
    """synthesize → parse roundtrip over both endiannesses, the no-EXIF
    third, and the dimension swap for transposing orientations 5-8."""
    from yfinance_etl_spark.multimodal.columns import (
        image_exif,
        synthesize_jpeg_assets,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(24)], "doc_id bigint, text string"
    )
    got = {r.doc_id: r for r in image_exif(synthesize_jpeg_assets(docs)).collect()}
    assert len(got) == 24
    for i in range(24):
        r, w, h = got[i], 16 + i % 240, 16 + i % 120
        if i % 3 == 2:
            assert r.orientation is None
            assert (r.display_width, r.display_height) == (w, h)
        else:
            assert r.orientation == 1 + i % 8
            if r.orientation >= 5:
                assert (r.display_width, r.display_height) == (h, w)
            else:
                assert (r.display_width, r.display_height) == (w, h)


def test_image_exif_multi_app1_and_multi_entry_ifd0_shapes(spark):
    """The r11 verdict's real-world EXIF shapes, pinned as genuinely
    present in the fixture AND correctly parsed: doc_id%7==1 payloads
    carry TWO APP1 segments (XMP first — the walk must skip by
    namespace, not stop at first-APP1); doc_id%7==3 payloads carry a
    THREE-entry IFD0 at non-minimal offset 16 with Orientation as the
    SECOND entry (the entry loop and IFD offset are load-bearing)."""
    from yfinance_etl_spark.multimodal.columns import (
        _exif_orientation,
        synthesize_jpeg_assets,
    )

    # ids chosen to have EXIF (%3 != 2) and cover XMP-first (%7 == 1)
    # and multi-entry (%7 == 3) in BOTH endiannesses (parity of id)
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 3, 10, 15, 22, 24, 36)],
        "doc_id bigint, text string",
    )
    payloads = {
        r.doc_id: bytes(r.content)
        for r in synthesize_jpeg_assets(docs).collect()
    }
    for i, b in payloads.items():
        assert _exif_orientation(b) == 1 + i % 8, i
        n_app1 = b.count(b"\xff\xe1")
        if i % 7 == 1:  # XMP APP1 precedes the Exif APP1
            assert n_app1 == 2 and b.index(b"http://ns.adobe.com/xap/1.0/") < b.index(
                b"Exif\x00\x00"
            ), i
        else:
            assert n_app1 == 1, i
        if i % 7 == 3:  # multi-entry IFD0 at offset 16
            t = b[b.index(b"Exif\x00\x00") + 6 :]
            import struct

            e = ">" if t[:2] == b"MM" else "<"
            magic, ifd0 = struct.unpack_from(e + "HI", t, 2)
            (n_entries,) = struct.unpack_from(e + "H", t, ifd0)
            assert (magic, ifd0, n_entries) == (42, 16, 3), i


def test_image_exif_quarantines_non_jpeg(spark):
    from yfinance_etl_spark.multimodal.columns import image_exif

    assets = spark.createDataFrame(
        [(0, bytearray(b"GIF89a nope"), None)],
        "doc_id bigint, content binary, "
        "meta struct<kind: string, width: int, height: int, mime: string>",
    )
    r = image_exif(assets).collect()[0]
    assert (r.orientation, r.display_width, r.display_height) == (None, None, None)


def test_png_assets_are_real_pngs_and_dhash_rides_a_real_decode(spark):
    """synthesize_png_assets must emit spec-valid grayscale PNGs (the
    stdlib decoder inflates + unfilters them — real pixel work, not a
    header echo), and image_dhash must reproduce a hand-computed dHash
    from the ORIGINAL pixel arithmetic: a decode bug anywhere in the
    zlib/filter path would desync the two."""
    import hashlib

    from yfinance_etl_spark.multimodal.columns import (
        DHASH_COLS,
        DHASH_ROWS,
        PNG_SIG,
        _decode_png_mini,
        image_dhash,
        synthesize_png_assets,
    )

    docs = spark.createDataFrame([(i,) for i in range(22)], "doc_id bigint")
    assets = synthesize_png_assets(docs)
    payloads = {r.doc_id: bytes(r.content) for r in assets.collect()}
    for doc_id, b in payloads.items():
        assert b.startswith(PNG_SIG), doc_id
        base = doc_id - 1 if doc_id % 7 == 3 else doc_id
        bw, bh = 1 + base % 3, 1 + base % 2
        w, h, raw = _decode_png_mini(b)  # raises on any malformation
        assert (w, h) == (DHASH_COLS * bw, DHASH_ROWS * bh)
        # pixel spec replayed straight from the docstring arithmetic
        # (batched-digest form: byte x%16 of md5('<base>:<y>:<x//16>'))
        for (x, y) in [(0, 0), (w - 1, h - 1), (w // 2, h // 3)]:
            hx = hashlib.md5(f"{base}:{y}:{x // 16}".encode()).hexdigest()
            v = int(hx[2 * (x % 16) : 2 * (x % 16) + 2], 16)
            if doc_id % 7 == 3 and x < bw and y < bh:
                v = (v + 100) % 256
            assert raw[y * w + x] == v, (doc_id, x, y)

    sig = {r.doc_id: (r.dhash_hi, r.dhash_lo) for r in image_dhash(assets).collect()}

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    # planted replica pairs sit within one corner-block bit; distinct
    # scenes decorrelate to ~32 bits
    for d in (3, 10, 17):
        assert ham(sig[d - 1], sig[d]) <= 1, d
    assert ham(sig[0], sig[1]) > 7
    assert ham(sig[4], sig[5]) > 7


def test_dhash_neardup_banding_pigeonhole_boundary(spark):
    """8 bands x 8 bits: Hamming <= 7 leaves at least one band clean, so
    recall at the default threshold is 1.0 BY CONSTRUCTION — pinned with
    a pair differing in exactly 7 bits spread over 7 distinct bands.
    The converse boundary is documented too: 8 flipped bits hitting all
    8 bands leave no clean band, and the pair (correctly, per the LSH
    contract) does not surface even though its Hamming is 8."""
    from yfinance_etl_spark.operators.dedup import dhash_neardup

    base_hi, base_lo = 0x12345678, 0x0BCDEF01
    # flip one bit in each of bands 0-6 (bands 0-3 = hi bytes 0-3,
    # 4-6 = lo bytes 0-2): hamming 7, band 7 untouched
    sev_hi = base_hi ^ 0x01010101
    sev_lo = base_lo ^ 0x00010101
    # flip one bit in every band: hamming 8, no clean band anywhere
    eig_hi = base_hi ^ 0x01010101
    eig_lo = base_lo ^ 0x01010101
    sig = spark.createDataFrame(
        [
            (1, base_hi, base_lo),
            (2, sev_hi, sev_lo),
            (3, eig_hi, eig_lo),
        ],
        "doc_id bigint, dhash_hi bigint, dhash_lo bigint",
    )
    got = {(r.doc_a, r.doc_b): r.hamming for r in dhash_neardup(sig).collect()}
    assert got[(1, 2)] == 7
    assert (1, 3) not in got  # all 8 bands dirty: LSH boundary, documented
    # (2,3): hi words equal, lo words differ only in byte 3 (one bit) —
    # hamming 1 with 7 clean bands, found through any of them
    assert got[(2, 3)] == 1


def test_video_container_roundtrip_and_planted_temporal_neardups(spark):
    """pack/unpack must be exact and strict (truncation/garbage raise);
    the synthesized videos carry REAL PNG frames the stdlib decoder
    accepts; planted replicas (doc_id % 11 == 7) differ from their base
    in at most one bit of ONE frame's dHash and surface as near-dups
    matching on every aligned frame, while distinct scenes do not pair."""
    import pytest as _pytest

    from yfinance_etl_spark.multimodal.columns import PNG_SIG, _decode_png_mini
    from yfinance_etl_spark.multimodal.video import (
        pack_video,
        synthesize_video_assets,
        unpack_video,
        video_frame_dhash,
        video_neardup,
    )

    frames = [b"abc", b"", b"0123456789"]
    assert unpack_video(pack_video(frames)) == frames
    with _pytest.raises(NotImplementedError, match="VID1"):
        unpack_video(b"NOPE" + b"\x00" * 8)
    with _pytest.raises(NotImplementedError, match="truncated"):
        unpack_video(pack_video(frames)[:-3])
    with _pytest.raises(NotImplementedError, match="trailing"):
        unpack_video(pack_video(frames) + b"x")

    docs = spark.createDataFrame([(i,) for i in range(25)], "doc_id bigint")
    assets = synthesize_video_assets(docs)
    sample = assets.filter("doc_id = 6").collect()[0]
    fr = unpack_video(bytes(sample.content))
    assert len(fr) == sample.meta.n_frames == 3 + 6 % 3
    for fb in fr:
        assert fb.startswith(PNG_SIG)
        _decode_png_mini(fb)  # real decode, raises on malformation

    out = {
        (r.doc_a, r.doc_b): (r.n_close_frames, r.n_frames_min)
        for r in video_neardup(video_frame_dhash(assets)).collect()
    }
    assert set(out) == {(6, 7), (17, 18)}  # 7 % 11 == 7, 18 % 11 == 7
    for close, mn in out.values():
        assert close == mn  # replicas match on every aligned frame


def test_video_neardup_fraction_rule_boundary(spark):
    """The min_frac rule on crafted per-frame signatures: 2 of 4 aligned
    close frames clears ceil(0.5*4); 1 of 4 does not — sharing a single
    still frame must never pair two videos."""
    from yfinance_etl_spark.multimodal.video import video_neardup

    far = 0x55555555  # 16 bits per word away from 0
    rows = []
    for k in range(4):
        rows.append((1, k, 100 + k, 200 + k))
    # B: frames 0,1 identical to A; 2,3 far
    rows += [(2, 0, 100, 200), (2, 1, 101, 201), (2, 2, far, far), (2, 3, far ^ 3, far ^ 7)]
    # C: only frame 0 identical to A
    rows += [(3, 0, 100, 200), (3, 1, far, 0), (3, 2, 0, far), (3, 3, far, far ^ 1)]
    fsig = spark.createDataFrame(
        rows, "doc_id bigint, frame_idx int, dhash_hi bigint, dhash_lo bigint"
    )
    got = {
        (r.doc_a, r.doc_b): r.n_close_frames
        for r in video_neardup(fsig).collect()
    }
    assert got.get((1, 2)) == 2  # 2 >= ceil(0.5 * 4)
    assert (1, 3) not in got  # 1 < 2: one shared still frame is not a dup


def test_training_mix_multimodal_drops_asset_neardups(spark):
    """The r16 recipe composition: two docs whose TEXTS are unrelated
    (no MinHash pair) but whose IMAGE assets are near-dups (the planted
    doc_id%7==3 replica) — the multimodal recipe drops the higher id
    from the mix while the text-only recipe keeps all four docs."""
    from yfinance_etl_spark.multimodal.columns import synthesize_png_assets
    from yfinance_etl_spark.operators.recipe import (
        training_mix,
        training_mix_multimodal,
    )

    def text(doc_id):  # curation-passing, pairwise-unrelated text
        return " ".join(f"w{j}x{doc_id}" for j in range(120))

    docs = spark.createDataFrame(
        [(i, "web", text(i)) for i in (1, 2, 3, 4)],
        "doc_id long, source string, text string",
    )
    ids = docs.select("doc_id")

    text_only = {r.doc_id for r in
                 training_mix(docs, total=4, budget=500).collect()}
    assert text_only == {1, 2, 3, 4}  # no text near-dups anywhere

    mm = {r.doc_id for r in training_mix_multimodal(
        docs, image_assets=synthesize_png_assets(ids),
        total=3, budget=500).collect()}
    assert mm == {1, 2, 4}  # image replica 3 (of 2) dropped, both kept


def test_video_neardup_offset_finds_trimmed_rejects_shared_still(spark):
    """The r16 offset tier on the planted fixture classes (doc ids
    0..35): the TRIMMED replica (22 = frames 1..n-1 of 20) is invisible
    to the aligned tier but found at voted offset −1 with every frame
    close; the shared-single-still pairs (8,11) and (25,28) vote an
    offset but fail the fraction rule in BOTH tiers; aligned replicas
    are found by both (offset 0)."""
    from yfinance_etl_spark.multimodal.video import (
        _video_cls,
        synthesize_video_assets,
        video_frame_dhash,
        video_neardup,
        video_neardup_offset,
    )

    assert _video_cls(22) == "trim" and _video_cls(11) == "share"
    docs = spark.createDataFrame([(i,) for i in range(36)], "doc_id long")
    fsig = video_frame_dhash(synthesize_video_assets(docs)).localCheckpoint()

    aligned = {(r.doc_a, r.doc_b) for r in video_neardup(fsig).collect()}
    offs = {
        (r.doc_a, r.doc_b): (r.offset, r.n_close_frames, r.n_frames_min)
        for r in video_neardup_offset(fsig).collect()
    }
    # trimmed replica: offset tier only, voted offset -1, every frame close
    assert (20, 22) not in aligned
    assert offs[(20, 22)][0] == -1
    assert offs[(20, 22)][1] == offs[(20, 22)][2]
    # shared single still: rejected by both tiers
    assert (8, 11) not in aligned and (8, 11) not in offs
    assert (25, 28) not in aligned and (25, 28) not in offs
    # aligned replicas: found by both, offset 0
    for pair in ((6, 7), (17, 18), (28, 29)):
        assert pair in aligned
        assert offs[pair][0] == 0


def test_training_mix_full_offset_tier_drops_trimmed_video_replica(spark):
    """The capstone composition's offset leg (r16): a TRIMMED video
    re-upload (doc 22 = frames 1..n-1 of doc 20) survives the
    aligned-tier multimodal mix but is dropped once
    include_video_offset=True — and the shards come back budgeted in
    n_bpe_tokens."""
    from yfinance_etl_spark.multimodal.video import synthesize_video_assets
    from yfinance_etl_spark.operators.recipe import training_mix_multimodal

    def text(doc_id):
        return " ".join(f"w{j}x{doc_id}" for j in range(120))

    docs = spark.createDataFrame(
        [(i, "web", text(i)) for i in (7, 20, 22, 30)],  # 7%11==7: rep of 6 (absent)
        "doc_id long, source string, text string",
    )
    assets = synthesize_video_assets(docs.select("doc_id"))

    aligned_only = {r.doc_id for r in training_mix_multimodal(
        docs, video_assets=assets, total=4, budget=500).collect()}
    assert aligned_only == {7, 20, 22, 30}  # trimmed replica invisible

    full = training_mix_multimodal(
        docs, video_assets=assets, include_video_offset=True,
        total=3, budget=2000, budget_unit="bpe",
    )
    assert "n_bpe_tokens" in full.columns
    assert {r.doc_id for r in full.collect()} == {7, 20, 30}  # 22 dropped


def test_audio_frame_fingerprint_finds_clipped_rejects_shared_jingle(spark):
    """The r16 clipped-audio tier (audio analog of the video offset
    test above — same class algebra): the CLIPPED replica (22 = frames
    1..n-1 of 20) is invisible to the whole-clip fingerprint's banded
    dedup but found by the offset tier at voted offset −1 with every
    frame close; the shared-jingle pairs (8,11)/(25,28) fail the
    fraction rule; DC-shifted aligned replicas vote offset 0. Frame
    signatures of the clipped doc are BIT-identical to the source's
    shifted frames — fixed frame anchoring is the whole point."""
    from yfinance_etl_spark.multimodal.audio import (
        _audio_seq_cls,
        audio_frame_fingerprint,
        synthesize_audio_seq_assets,
    )
    from yfinance_etl_spark.multimodal.video import video_neardup_offset

    assert _audio_seq_cls(22) == "clip" and _audio_seq_cls(11) == "share"
    docs = spark.createDataFrame([(i,) for i in range(36)], "doc_id long")
    fsig = audio_frame_fingerprint(
        synthesize_audio_seq_assets(docs)
    ).localCheckpoint()

    sig = {(r.doc_id, r.frame_idx): (r.dhash_hi, r.dhash_lo)
           for r in fsig.collect()}
    nf20 = max(k for d, k in sig if d == 20) + 1
    nf22 = max(k for d, k in sig if d == 22) + 1
    assert nf22 == nf20 - 1  # intro frame dropped
    for k in range(nf22):  # post-trim frames bit-identical, shifted by 1
        assert sig[(22, k)] == sig[(20, k + 1)]

    offs = {
        (r.doc_a, r.doc_b): (r.offset, r.n_close_frames, r.n_frames_min)
        for r in video_neardup_offset(fsig).collect()
    }
    assert offs[(20, 22)][0] == -1
    assert offs[(20, 22)][1] == offs[(20, 22)][2]
    assert (8, 11) not in offs and (25, 28) not in offs
    for pair in ((6, 7), (17, 18), (28, 29)):  # DC-shifted aligned reps
        assert offs[pair][0] == 0


def test_audio_frame_fingerprint_drops_trailing_partial_frame(spark):
    """The documented contract: a clip that is not frame-aligned loses
    its trailing partial frame (sub-fingerprints need full frames), and
    a clip shorter than one frame yields no rows at all."""
    import pandas as pd

    from yfinance_etl_spark.multimodal.audio import (
        SEQ_FRAME_SAMPLES,
        audio_frame_fingerprint,
        wav_bytes,
    )

    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "content": [
                    wav_bytes([100] * (SEQ_FRAME_SAMPLES + 50)),
                    wav_bytes([100] * (SEQ_FRAME_SAMPLES - 1)),
                ],
            }
        )
    )
    rows = audio_frame_fingerprint(assets).collect()
    assert {(r.doc_id, r.frame_idx) for r in rows} == {(1, 0)}


def test_training_mix_audio_seq_leg_drops_clipped_replica(spark):
    """The capstone's clipped-audio leg (r16): a CLIPPED audio re-upload
    (doc 22 = frames 1..n-1 of doc 20's clip) is invisible to the
    whole-clip fingerprint tier but dropped from the mix once its
    frame-sequence assets flow through the generic offset tier."""
    from yfinance_etl_spark.multimodal.audio import (
        synthesize_audio_fp_assets,
        synthesize_audio_seq_assets,
    )
    from yfinance_etl_spark.operators.recipe import training_mix_multimodal

    def text(doc_id):
        return " ".join(f"w{j}x{doc_id}" for j in range(120))

    docs = spark.createDataFrame(
        [(i, "web", text(i)) for i in (1, 20, 22, 30)],
        "doc_id long, source string, text string",
    )
    ids = docs.select("doc_id")

    whole_clip_only = {r.doc_id for r in training_mix_multimodal(
        docs, audio_assets=synthesize_audio_fp_assets(ids),
        total=4, budget=500).collect()}
    assert whole_clip_only == {1, 20, 22, 30}  # clip invisible

    with_seq = {r.doc_id for r in training_mix_multimodal(
        docs, audio_seq_assets=synthesize_audio_seq_assets(ids),
        total=3, budget=500).collect()}
    assert with_seq == {1, 20, 30}  # clipped replica 22 (of 20) dropped


def test_video_delta_neardup_offset_cross_snapshot_only(spark):
    """The sequence delta member (r16 late): with the %10<2 split, the
    trimmed replica straddling the boundary (20 new / 22 corpus) is
    found at voted offset −1 with every overlap frame close; the
    boundary-straddling aligned replica (40 new / 39 corpus) at offset
    0 with reversed roles; the shared-single-still pair (11 new /
    8 corpus) fails the fraction; corpus-internal replicas — (6,7),
    (17,18), (28,29), all corpus-side — generate NOTHING."""
    from pyspark.sql import functions as F

    from yfinance_etl_spark.multimodal.video import (
        synthesize_video_assets,
        video_delta_neardup_offset,
        video_frame_dhash,
    )

    docs = spark.createDataFrame([(i,) for i in range(45)], "doc_id long")
    fsig = video_frame_dhash(synthesize_video_assets(docs))
    got = {
        (r.new_doc_id, r.corpus_doc_id): (r.offset, r.n_close_frames, r.n_frames_min)
        for r in video_delta_neardup_offset(
            fsig, F.col("doc_id") % 10 < 2
        ).collect()
    }
    assert got[(20, 22)][0] == -1
    assert got[(20, 22)][1] == got[(20, 22)][2]
    assert got[(40, 39)][0] == 0  # roles reversed vs the self form
    assert (11, 8) not in got and (8, 11) not in got
    for pair in ((6, 7), (7, 6), (17, 18), (18, 17), (28, 29), (29, 28)):
        assert pair not in got  # corpus never re-pairs with itself
