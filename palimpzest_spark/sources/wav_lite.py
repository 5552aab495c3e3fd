"""Stdlib-only WAV (RIFF/PCM) decode/encode (no librosa in this container).

Makes audio columns real for the most common interchange format: 8/16/32-bit
integer PCM and 32-bit float WAV, mono or multi-channel. Compressed codecs
(MP3/AAC/opus) genuinely need external libraries and stay gated in
``functions/multimodal.py``. Pure functions over bytes, called inside
Arrow-batched ``mapInPandas``.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_DTYPES = {
    (1, 8): np.uint8,     # PCM unsigned 8-bit
    (1, 16): np.int16,
    (1, 32): np.int32,
    (3, 32): np.float32,  # IEEE float
}


def wav_metadata(data: bytes) -> tuple[int, int, int] | None:
    """(sample_rate, channels, duration_ms) from the fmt/data chunks —
    header walk only, no sample decode. None if not RIFF/WAVE."""
    info = _chunks(data)
    if info is None:
        return None
    rate, ch, _fmt, _bits, n_frames, _off, _size = info
    return rate, ch, int(n_frames * 1000 / rate) if rate else 0


def _chunks(data: bytes):
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    rate = ch = fmt = bits = None
    data_off = data_size = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if cid == b"fmt ":
            fmt, ch, rate = struct.unpack("<HHI", data[body : body + 8])
            (bits,) = struct.unpack("<H", data[body + 14 : body + 16])
        elif cid == b"data":
            data_off, data_size = body, min(size, len(data) - body)
        pos = body + size + (size & 1)  # chunks are word-aligned
    if rate is None or data_off is None:
        return None
    frame_bytes = (bits // 8) * ch if bits and ch else 1
    n_frames = data_size // frame_bytes if frame_bytes else 0
    return rate, ch, fmt, bits, n_frames, data_off, data_size


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, float64 array [frames, channels] in [-1, 1])."""
    info = _chunks(data)
    if info is None:
        raise ValueError("not a RIFF/WAVE file")
    rate, ch, fmt, bits, n_frames, off, size = info
    dtype = _FMT_DTYPES.get((fmt, bits))
    if dtype is None:
        raise NotImplementedError(
            f"wav_lite handles PCM 8/16/32-bit and float32 (got fmt={fmt}, bits={bits}; "
            "compressed codecs need ffmpeg/librosa)"
        )
    raw = np.frombuffer(data, dtype=dtype, count=n_frames * ch, offset=off)
    x = raw.astype(np.float64).reshape(-1, ch)
    if dtype is np.uint8:
        x = (x - 128.0) / 128.0
    elif dtype is np.int16:
        x = x / 32768.0
    elif dtype is np.int32:
        x = x / 2147483648.0
    return rate, x


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """float array [frames] or [frames, channels] in [-1, 1] → 16-bit PCM WAV."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    ch = pcm.shape[1]
    body = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    out = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", len(out)) + out
