"""Real-WAV audio path (multimodal/audio.py): the synthesized bytes must
be genuinely valid RIFF/WAVE — proven against Python's STDLIB ``wave``
reader, an independent parser — and the chunk walker must handle
non-canonical layouts (metadata chunks, word alignment) plus raise
honestly on formats outside the 16-bit PCM contract."""

from __future__ import annotations

import io
import math
import struct
import wave

import pytest

from yfinance_etl_spark.multimodal import audio as A


def test_wav_bytes_validated_by_stdlib_wave_reader():
    samples = A._samples(7)
    b = A.wav_bytes(samples)
    with wave.open(io.BytesIO(b)) as w:
        assert w.getframerate() == A.SAMPLE_RATE
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getnframes() == len(samples)
        frames = w.readframes(len(samples))
    assert list(struct.unpack(f"<{len(samples)}h", frames)) == samples


def test_parse_wav_roundtrips_the_samples():
    samples = A._samples(12)
    rate, channels, out = A.parse_wav(A.wav_bytes(samples))
    assert (rate, channels) == (A.SAMPLE_RATE, 1)
    assert out == samples


def test_wav_roundtrips_arbitrary_samples_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(st.integers(-32768, 32767), min_size=0, max_size=200),
        st.sampled_from([8000, 16000, 44100]),
    )
    def check(samples, rate):
        got_rate, channels, out = A.parse_wav(A.wav_bytes(samples, rate))
        assert (got_rate, channels, out) == (rate, 1, samples)

    check()


def test_parse_wav_walks_extra_chunks_and_word_alignment():
    # canonical header + an odd-length LIST chunk BEFORE data: a parser
    # that assumes the 44-byte layout breaks on exactly this class
    samples = [100, -200, 300]
    b = A.wav_bytes(samples)
    fmt_chunk = b[12:36]  # "fmt " + 16-byte body
    data_chunk = b[36:]
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded to even
    body = fmt_chunk + lst + data_chunk
    rebuilt = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, channels, out = A.parse_wav(rebuilt)
    assert (rate, channels, out) == (A.SAMPLE_RATE, 1, samples)


def test_parse_wav_rejects_non_pcm_and_non_riff():
    with pytest.raises(NotImplementedError, match="RIFF/WAVE"):
        A.parse_wav(b"OggS" + b"\x00" * 40)
    b = bytearray(A.wav_bytes([1, 2]))
    b[20] = 3  # fmt code 3 = IEEE float
    with pytest.raises(NotImplementedError, match="16-bit PCM"):
        A.parse_wav(bytes(b))


def test_parse_wav_raises_not_struct_error_on_truncated_fmt():
    # a malformed chunk must surface as the adapter contract error, never
    # an opaque struct.error from inside an executor task
    b = b"RIFF" + struct.pack("<I", 12) + b"WAVE" + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
    with pytest.raises(NotImplementedError, match="truncated"):
        A.parse_wav(b)


def test_stereo_wav_reports_frames_not_interleaved_samples(spark):
    # r9 ADVICE fix: a stereo clip must report per-channel FRAME count and
    # true duration — not 2x, which is what counting interleaved samples
    # gives. Stdlib wave cross-checks the fixture's frame count.
    left, right = [1000, -2000, 3000, 32767], [-1000, 2000, -3000, -32768]
    interleaved = [s for pair in zip(left, right) for s in pair]
    b = A.wav_bytes(interleaved, rate=8000, channels=2)
    with wave.open(io.BytesIO(b)) as w:
        assert w.getnchannels() == 2 and w.getnframes() == 4
    df = spark.createDataFrame(
        [(1, b, ("audio", 8000, "audio/wav"))], A.AUDIO_ASSET_SCHEMA
    )
    r = A.audio_features(df).collect()[0]
    assert r.n_channels == 2
    assert r.n_samples == 4  # frames, not 8 interleaved samples
    assert r.duration_ms == 4 * 1000 // 8000
    # RMS stays the cross-channel energy mean over ALL samples; peak global
    assert r.rms == math.sqrt(sum(s * s for s in interleaved) / 8)
    assert r.peak == 32768


def test_parse_wav_rejects_zero_channel_fmt():
    b = bytearray(A.wav_bytes([1, 2]))
    b[22] = 0  # nChannels = 0
    with pytest.raises(NotImplementedError, match="zero channels"):
        A.parse_wav(bytes(b))


def test_audio_features_end_to_end(spark):
    df = spark.createDataFrame([(3,), (7,)], "doc_id long")
    rows = {
        r.doc_id: r
        for r in A.audio_features(A.synthesize_audio_assets(df)).collect()
    }
    for d in (3, 7):
        samples = A._samples(d)
        n = len(samples)
        r = rows[d]
        assert r.sample_rate == A.SAMPLE_RATE and r.n_channels == 1
        assert r.n_samples == n == A.N_BASE + d % A.N_MOD
        assert r.duration_ms == n * 1000 // A.SAMPLE_RATE
        assert r.rms == math.sqrt(sum(s * s for s in samples) / n)
        assert r.peak == max(abs(s) for s in samples)


def test_audio_fingerprint_rides_a_real_wav_decode_and_finds_planted_pairs(spark):
    """The fingerprint must come from the DECODED RIFF bytes: recompute
    it straight from the _fp_samples formula and require equality (an
    encode/parse bug anywhere desyncs the two); planted replicas
    (doc_id % 9 == 5) sit within one energy-comparison bit of their
    base, distinct scenes decorrelate to ~32; the n < 65 guard raises."""
    import pytest as _pytest

    from yfinance_etl_spark.multimodal.audio import (
        FP_FRAMES,
        _fp_samples,
        audio_fingerprint,
        synthesize_audio_fp_assets,
        wav_bytes,
    )

    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id bigint")
    sig = {
        r.doc_id: (r.dhash_hi, r.dhash_lo)
        for r in audio_fingerprint(synthesize_audio_fp_assets(docs)).collect()
    }

    def ref(doc_id):
        samples = _fp_samples(doc_id)
        n = len(samples)
        e = [0] * FP_FRAMES
        for i, s in enumerate(samples):
            e[i * FP_FRAMES // n] += s * s
        hi = lo = 0
        for j in range(FP_FRAMES - 1):
            if e[j + 1] > e[j]:
                if j < 32:
                    hi |= 1 << j
                else:
                    lo |= 1 << (j - 32)
        return hi, lo

    assert sig == {d: ref(d) for d in range(20)}

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    assert ham(sig[4], sig[5]) <= 1  # planted replica (5 % 9 == 5)
    assert ham(sig[13], sig[14]) <= 1  # 14 % 9 == 5
    assert ham(sig[0], sig[1]) > 7  # distinct scenes decorrelate
    assert ham(sig[6], sig[7]) > 7

    # guard: a clip too short to fill the frame grid raises, not garbage
    short = spark.createDataFrame(
        [(99, bytearray(wav_bytes([100] * 10)), None)],
        "doc_id bigint, content binary, "
        "meta struct<kind: string, sample_rate: int, mime: string>",
    )
    with _pytest.raises(Exception, match="65 samples"):
        audio_fingerprint(short).collect()
