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
