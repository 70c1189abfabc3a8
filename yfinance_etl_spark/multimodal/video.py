"""Video columns — frame-sequence payloads with REAL per-frame pixel
decode, and the temporal near-dup tier that completes the modality trio
(image: columns.py dHash, audio: audio.py energy fingerprint, video:
here). No codec library ships in this container, so the container format
is a minimal length-prefixed concatenation of REAL PNG frames::

    b"VID1" + u32 n_frames + n_frames * (u32 byte_len + png_bytes)

— an honest custom container (a deployment swaps the walker for a
pyav/ffmpeg adapter; the Spark plumbing, per-frame decode, and the
signature/dedup machinery below are unchanged), while the per-frame
pixel work is the same stdlib zlib inflate + scanline unfilter the image
path exercises.

Dedup model (temporal alignment is the point): a video's signature is
its SEQUENCE of per-frame dHashes. Candidates come from a band join
keyed on (frame_idx, band_id, band_val) — two videos collide only when
the SAME temporal position shares a band — and verify counts aligned
frames within Hamming ≤ t. A pair is a near-dup when at least
``min_frac`` of the shorter video's frames are close: re-encoded or
lightly-retouched copies match on almost every frame, while two videos
that merely share one still frame do not clear the fraction.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yfinance_etl_spark.multimodal.columns import (
    DHASH_COLS,
    DHASH_ROWS,
    _decode_payload,
    _dhash_words,
    encode_png_gray,
)

VID_MAGIC = b"VID1"

VIDEO_ASSET_SCHEMA = (
    "doc_id bigint, content binary, "
    "meta struct<kind: string, n_frames: int, mime: string>"
)

FRAME_DHASH_SCHEMA = (
    "doc_id bigint, frame_idx int, dhash_hi bigint, dhash_lo bigint"
)


def pack_video(frames: list[bytes]) -> bytes:
    out = [VID_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def unpack_video(b: bytes) -> list[bytes]:
    """Walk the container back to its frame payloads; raises on any
    malformation (truncated length, trailing garbage) rather than
    guessing — the decode ops downstream want real frames or an error."""
    if b[:4] != VID_MAGIC:
        raise NotImplementedError("not a VID1 frame-sequence payload")
    (n,) = struct.unpack("<I", b[4:8])
    pos, frames = 8, []
    for _ in range(n):
        if pos + 4 > len(b):
            raise NotImplementedError("VID1 frame table truncated")
        (ln,) = struct.unpack("<I", b[pos : pos + 4])
        pos += 4
        if pos + ln > len(b):
            raise NotImplementedError("VID1 frame payload truncated")
        frames.append(b[pos : pos + ln])
        pos += ln
    if pos != len(b):
        raise NotImplementedError("VID1 trailing bytes after last frame")
    return frames


def synthesize_video_assets(docs: DataFrame) -> DataFrame:
    """Deterministic real-frame videos from the documents table:

        base     = doc_id - 1 if doc_id % 11 == 7 else doc_id
        n_frames = 3 + base % 3
        bw, bh   = 1 + base % 3, 1 + base % 2   (frame dims 9*bw x 8*bh)
        frame k pixel(x, y) = first byte of md5('<base>:<k>:<x>:<y>')
        replicas (doc_id % 11 == 7) brighten frame 0's block (0,0) by
        +100 mod 256 — ONE frame's dHash moves by at most one bit, the
        other frames stay bit-identical: the planted temporal near-dup.

    md5-noise pixels for the same reason as the image fixture (gradient
    frames collapse every dHash together)."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                base = doc_id - 1 if doc_id % 11 == 7 else doc_id
                n_frames = 3 + base % 3
                bw, bh = 1 + base % 3, 1 + base % 2
                w, h = DHASH_COLS * bw, DHASH_ROWS * bh
                is_rep = doc_id % 11 == 7
                frames = []
                for k in range(n_frames):
                    raw = bytearray()
                    for y in range(h):
                        for x in range(w):
                            v = int(
                                hashlib.md5(
                                    f"{base}:{k}:{x}:{y}".encode()
                                ).hexdigest()[:2],
                                16,
                            )
                            if is_rep and k == 0 and x < bw and y < bh:
                                v = (v + 100) % 256
                            raw.append(v)
                    frames.append(encode_png_gray(bytes(raw), w, h))
                rows.append(
                    (
                        doc_id,
                        pack_video(frames),
                        ("video", n_frames, "video/x-frames"),
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "content", "meta"])

    return docs.select("doc_id").mapInPandas(gen, VIDEO_ASSET_SCHEMA)


def video_frame_dhash(assets: DataFrame) -> DataFrame:
    """Per-frame dHash signatures: walk the container, decode every
    frame's REAL pixels, hash with the shared ``_dhash_words`` core.
    Output (doc_id, frame_idx, dhash_hi, dhash_lo) — one row per frame,
    the exploded temporal signature ``video_neardup`` consumes."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                for k, fb in enumerate(unpack_video(bytes(content))):
                    w, h, body = _decode_payload(fb)
                    rows.append((int(doc_id), k, *_dhash_words(body, w, h)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "dhash_hi", "dhash_lo"]
            )

    return assets.select("doc_id", "content").mapInPandas(
        extract, FRAME_DHASH_SCHEMA
    )


def video_neardup(
    fsig: DataFrame, hamming_max: int = 7, min_frac: float = 0.5
) -> DataFrame:
    """Temporal near-dup over per-frame dHash signatures: band-join
    candidates keyed on (frame_idx, band_id, band_val) — alignment IS
    the key, so candidate volume follows true near-dup density per
    temporal position, never the video-pair (or frame-pair) square —
    then exact per-frame popcount verify, and a pair survives when at
    least ``min_frac`` of the SHORTER video's frames are within
    ``hamming_max``. Per aligned frame the pigeonhole guarantee of the
    8-band split holds (Hamming ≤ 7 ⇒ one clean band), so a qualifying
    frame is never missed — recall of the frame stage is 1.0 by
    construction, and the fraction rule on top is exact arithmetic.

    Returns (doc_a, doc_b, n_close_frames, n_frames_min)."""
    fsig = fsig.localCheckpoint(eager=True)
    nframes = fsig.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nf"))
    bands = fsig.select(
        "doc_id",
        "frame_idx",
        "dhash_hi",
        "dhash_lo",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(
                            F.col("dhash_hi" if b < 4 else "dhash_lo"),
                            8 * (b % 4),
                        )
                        .bitwiseAND(F.lit(255))
                        .alias("band_val"),
                    )
                    for b in range(8)
                ]
            )
        ).alias("bd"),
    ).select(
        "doc_id", "frame_idx", "dhash_hi", "dhash_lo",
        "bd.band_id", "bd.band_val",
    )
    a, b = bands.alias("a"), bands.alias("b")
    close = (
        a.join(
            b,
            (F.col("a.frame_idx") == F.col("b.frame_idx"))
            & (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.frame_idx").alias("frame_idx"),
            (
                F.bit_count(F.col("a.dhash_hi").bitwiseXOR(F.col("b.dhash_hi")))
                + F.bit_count(F.col("a.dhash_lo").bitwiseXOR(F.col("b.dhash_lo")))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= hamming_max)
        # a frame pair collides in up to 8 bands; count it once
        .distinct()
    )
    pairs = close.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_close_frames")
    )
    na = nframes.select(F.col("doc_id").alias("doc_a"), F.col("nf").alias("nfa"))
    nb = nframes.select(F.col("doc_id").alias("doc_b"), F.col("nf").alias("nfb"))
    # no broadcast hint on the frame-count side: it is CORPUS-sized; the
    # pair frame is the tiny side and AQE picks the build side per run
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("n_frames_min", F.least("nfa", "nfb"))
        .filter(
            F.col("n_close_frames")
            >= F.ceil(F.lit(min_frac) * F.col("n_frames_min"))
        )
        .select("doc_a", "doc_b", "n_close_frames", "n_frames_min")
    )
