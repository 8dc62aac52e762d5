"""Stdlib-only WAV (RIFF/PCM) codec + audio feature primitives.

The audio twin of ``operators/imagecodec.py``: the environment has no
torchaudio/pyav, but PCM WAV needs nothing beyond ``struct`` — so the
audio decode path is REAL, not stubbed.  Supports 8/16-bit integer PCM
(format tag 1), any channel count and rate; other encodings are
rejected with a clear error.

Feature extraction (RMS, peak, zero crossings, duration) runs on the
decoded samples with numpy inside Arrow-batched workers — see
``operators/multimodal.py:extract_audio_features``.

No reference equivalent (the reference has no media path); this is the
repo's own multimodal extension.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_wav(data: bytes):
    """Decode a PCM WAV → ``(sample_rate, n_channels, samples)`` with
    ``samples`` an int32 numpy array of shape (frames, channels)
    (8-bit unsigned PCM is recentered to signed)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format tag {audio_format} (PCM only)")
    if bits == 16:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif bits == 8:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    else:
        raise ValueError(f"unsupported WAV bit depth {bits} (8/16 only)")
    frames = len(samples) // n_channels
    return sample_rate, n_channels, samples[: frames * n_channels].reshape(
        frames, n_channels
    )


def encode_wav(sample_rate: int, samples: "np.ndarray") -> bytes:
    """Encode an int16 (frames, channels) array as a 16-bit PCM WAV."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n_channels = arr.shape[1]
    raw = arr.tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_features(data: bytes) -> dict:
    """Decoded-signal features over channel 0: duration, RMS, peak,
    zero-crossing count (sign changes between consecutive samples;
    zeros inherit the previous sign, so a +/-/+ flip counts twice and a
    plateau not at all)."""
    rate, n_ch, samples = decode_wav(data)
    ch0 = samples[:, 0].astype(np.float64)
    n = len(ch0)
    rms = float(np.sqrt((ch0 * ch0).mean())) if n else 0.0
    peak = int(np.abs(ch0).max()) if n else 0
    sign = np.sign(ch0)
    # propagate the previous sign across exact zeros
    for i in range(1, n):
        if sign[i] == 0:
            sign[i] = sign[i - 1]
    zc = int((sign[1:] * sign[:-1] < 0).sum()) if n > 1 else 0
    return {
        "sample_rate": rate,
        "n_channels": n_ch,
        "n_frames": n,
        "duration_ms": n / rate * 1000.0 if rate else 0.0,
        "rms": rms,
        "peak": peak,
        "zero_crossings": zc,
    }


def render_bits_wav(
    bits60: int, *, bits: int = 60, block: int = 16, amplitude: int = 16384,
    sample_rate: int = 16000
) -> bytes:
    """Synthesize a mono 16-bit PCM WAV whose signal is ``block`` samples
    of +amplitude per 1-bit and -amplitude per 0-bit (MSB first).

    Closed-form features any SQL oracle can compute from the bits alone:
    RMS = amplitude exactly, peak = amplitude, duration = bits * block /
    rate, zero crossings = popcount((v XOR v>>1) masked to bits-1) —
    one crossing per adjacent bit flip."""
    vals = np.empty(bits * block, dtype="<i2")
    for i in range(bits):
        bit = (bits60 >> (bits - 1 - i)) & 1
        vals[i * block : (i + 1) * block] = amplitude if bit else -amplitude
    return encode_wav(sample_rate, vals)
