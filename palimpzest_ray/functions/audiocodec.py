"""Pure-stdlib WAV (RIFF/PCM) codec: decode 8/16/32-bit PCM and 32-bit
IEEE-float WAVE files to float32 sample matrices, plus a PCM16 writer
for fixtures and sinks.

Sibling of ``imagecodec.py`` / ``sources/officeparse.py``: gives the
audio modality a REAL decode kernel in containers without
soundfile/torchaudio (``struct`` + ``numpy`` only). The stage
(`stages/multimodal.AudioFeatureStage`) prefers soundfile when
importable and falls back here; non-WAV payloads fall through to the
deterministic stub per row.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples float32 in [-1, 1] of shape (n, channels),
    sample_rate). PCM 8/16/32-bit and IEEE float32; chunk-walk per the
    RIFF spec (fmt may precede data with other chunks between)."""
    if not sniff(data):
        raise ValueError("not a WAV: bad RIFF/WAVE signature")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks pad to even
        if cid == b"fmt ":
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                (audio_fmt,) = struct.unpack("<H", body[24:26])
            fmt = (audio_fmt, ch, rate, bits)
        elif cid == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("corrupt WAV: missing fmt or data chunk")
    audio_fmt, ch, rate, bits = fmt
    if ch <= 0 or rate <= 0:
        raise ValueError(f"corrupt WAV: channels={ch}, rate={rate}")
    if audio_fmt == 1:  # integer PCM
        if bits == 8:  # unsigned, offset-binary
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_fmt == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(raw, dtype="<f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format code {audio_fmt}/{bits}-bit")
    n = (len(x) // ch) * ch
    return x[:n].reshape(-1, ch), rate


def write_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, ch) float in [-1, 1] (or int16) → PCM16 WAV bytes."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.dtype != np.int16:
        s = np.clip(np.round(np.asarray(s, np.float64) * 32767.0), -32768, 32767)
        s = s.astype("<i2")
    ch = s.shape[1]
    raw = np.ascontiguousarray(s).tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", len(body)) + body


def segment_rms(samples: np.ndarray, n_segments: int) -> np.ndarray:
    """Mono-mixed per-segment RMS energy — the deterministic feature
    vector the audio stage emits (float32, length n_segments)."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    out = np.zeros(n_segments, dtype=np.float32)
    if n == 0:
        return out
    edges = (np.arange(n_segments + 1) * n) // n_segments
    sq = np.concatenate([[0.0], np.cumsum(mono.astype(np.float64) ** 2)])
    for i in range(n_segments):
        lo, hi = edges[i], edges[i + 1]
        if hi > lo:
            out[i] = np.sqrt((sq[hi] - sq[lo]) / (hi - lo))
    return out
