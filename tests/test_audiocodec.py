"""Stdlib WAV codec (functions/audiocodec.py): PCM round-trips, format
coverage, segment-RMS features, and the AudioFeatureStage real path."""

import numpy as np
import pytest
import ray.data as rd

from palimpzest_ray.functions import audiocodec as ac
from palimpzest_ray.stages import multimodal


def test_wav_pcm16_roundtrip():
    rng = np.random.default_rng(0)
    mono = rng.uniform(-1, 1, 1000).astype(np.float32)
    got, rate = ac.decode_wav(ac.write_wav(mono, 16000))
    assert rate == 16000 and got.shape == (1000, 1)
    # PCM16 write(×32767)/read(÷32768) asymmetry + rounding ≤ ~5e-5
    np.testing.assert_allclose(got[:, 0], mono, atol=1e-4)
    stereo = rng.uniform(-1, 1, (500, 2)).astype(np.float32)
    got2, _ = ac.decode_wav(ac.write_wav(stereo, 8000))
    assert got2.shape == (500, 2)
    np.testing.assert_allclose(got2, stereo, atol=1e-4)


def test_wav_8bit_and_float32():
    import struct

    # hand-built 8-bit unsigned PCM: [0, 128, 255] → [-1, 0, ~0.99]
    raw = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", 3) + raw + b"\0"  # odd-size pad
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    got, rate = ac.decode_wav(blob)
    np.testing.assert_allclose(got[:, 0], [-1.0, 0.0, 127 / 128], atol=1e-6)

    # IEEE float32
    x = np.array([0.25, -0.5, 1.0], dtype="<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 44100, 44100 * 4, 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", 12) + x.tobytes()
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    got, rate = ac.decode_wav(blob)
    assert rate == 44100
    np.testing.assert_allclose(got[:, 0], x, atol=0)


def test_wav_rejects():
    with pytest.raises(ValueError, match="RIFF"):
        ac.decode_wav(b"not audio")
    with pytest.raises(ValueError, match="missing fmt"):
        ac.decode_wav(b"RIFF\x04\x00\x00\x00WAVE")


def test_segment_rms_known_values():
    # constant-amplitude signal → every segment RMS equals the amplitude
    s = np.full(80, 0.5, dtype=np.float32)
    np.testing.assert_allclose(ac.segment_rms(s, 8), np.full(8, 0.5), atol=1e-6)
    # silent half / loud half with 2 segments
    s = np.concatenate([np.zeros(40), np.ones(40)]).astype(np.float32)
    np.testing.assert_allclose(ac.segment_rms(s, 2), [0.0, 1.0], atol=1e-6)
    assert ac.segment_rms(np.empty(0), 4).tolist() == [0.0] * 4


def test_audio_stage_real_wav(ray_session):
    rate = 16000
    tone = np.sin(2 * np.pi * 440 * np.arange(rate * 2) / rate).astype(np.float32)
    blobs = [ac.write_wav(tone * 0.5, rate), b"\0" * 64_000]  # real + stub
    ds = rd.from_arrow(
        multimodal.table_from_blobs(["tone.wav", "junk.bin"], blobs, "audio/wav")
    )
    rows = sorted(
        multimodal.audio_features(ds, concurrency=1).take_all(),
        key=lambda r: r["media_id"],
    )
    junk, tone_row = rows
    assert tone_row["duration_s"] == pytest.approx(2.0)
    # RMS of a 0.5-amplitude sine ≈ 0.5/√2 in every segment
    feats = np.asarray(tone_row["audio_feat"])
    np.testing.assert_allclose(feats, 0.5 / np.sqrt(2), atol=5e-3)
    # non-WAV payload keeps the stub contract (64 kB @ 32 kB/s = 2 s)
    assert junk["duration_s"] == pytest.approx(2.0)
    assert len(junk["audio_feat"]) == 32


def test_stage_survives_zero_channel_wav(ray_session):
    import struct

    fmt = struct.pack("<HHIIHH", 1, 0, 16000, 0, 0, 16)  # channels=0
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\0\0\0\0"
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="channels"):
        ac.decode_wav(blob)
    ds = rd.from_arrow(multimodal.table_from_blobs(["z.wav"], [blob], "audio/wav"))
    rows = multimodal.audio_features(ds, concurrency=1).take_all()
    assert len(rows) == 1 and len(rows[0]["audio_feat"]) == 32  # stub fallback
