"""Real-bytes WAV codec tests — run UNCONDITIONALLY in this environment:
functions/wav.py needs only stdlib struct + numpy, so the genuine audio
decode path (RIFF magic, chunk walk with pad bytes, fmt parse, PCM16
de-quantization) executes here instead of skipping on the absent
soundfile. The audio twin of tests/test_png_codec.py.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from amorphous_mapreduce_spark.functions.wav import decode_wav, encode_wav


def test_mono_roundtrip_exact():
    rng = np.random.default_rng(20260816)
    s = rng.integers(-32768, 32768, 257).astype("<i2")
    out, sr = decode_wav(encode_wav(s, sample_rate=8000))
    assert sr == 8000
    assert out.dtype == np.dtype("<i2")
    assert np.array_equal(out, s)


def test_stereo_roundtrip_exact():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, (100, 2)).astype("<i2")
    out, sr = decode_wav(encode_wav(s, sample_rate=44100))
    assert sr == 44100
    assert out.shape == (100, 2)
    assert np.array_equal(out, s)


def test_extremes_and_header_bytes():
    s = np.array([-32768, 32767, 0, -1, 1], dtype="<i2")
    blob = encode_wav(s, sample_rate=16000)
    # canonical 44-byte header: RIFF size, PCM tag, mono, rate, 16-bit
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    assert struct.unpack("<I", blob[4:8])[0] == len(blob) - 8
    fmt = struct.unpack("<HHIIHH", blob[20:36])
    assert fmt == (1, 1, 16000, 32000, 2, 16)
    assert blob[36:40] == b"data"
    out, _ = decode_wav(blob)
    assert np.array_equal(out, s)


def test_unknown_chunks_and_odd_pad_skipped():
    """Real encoders interleave LIST/INFO chunks; odd sizes carry a pad
    byte — the chunk walk must skip both without touching the PCM."""
    s = np.arange(-30, 34, dtype="<i2")
    base = encode_wav(s, sample_rate=8000)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd + pad
    blob = base[:12] + extra + base[12:]
    blob = blob[:4] + struct.pack("<I", len(blob) - 8) + blob[8:]
    out, sr = decode_wav(blob)
    assert sr == 8000
    assert np.array_equal(out, s)


def test_rejects_non_wav_and_unsupported():
    with pytest.raises(ValueError, match="magic"):
        decode_wav(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    s = np.zeros(8, dtype="<i2")
    blob = bytearray(encode_wav(s))
    blob[20] = 3  # WAVE_FORMAT_IEEE_FLOAT
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(blob))
    with pytest.raises(ValueError, match="missing"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_default_decoder_probes_wav_backend():
    """default_decoder must decode RIFF/WAVE bytes for real in this
    container (soundfile absent), with soundfile's int16 convention."""
    from amorphous_mapreduce_spark.operators.multimodal import default_decoder

    s = np.array([-32768, -16384, 0, 16384, 32767], dtype="<i2")
    feats = np.asarray(default_decoder(encode_wav(s), {"media_type": "audio"}))
    assert np.array_equal(feats, s.astype(np.float64) / 32768.0)
    # every value is dyadic: rint(f * 32768) recovers the int16 exactly
    assert np.array_equal(np.rint(feats * 32768.0).astype("<i2"), s)
