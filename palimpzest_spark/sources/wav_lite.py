"""Stdlib-only WAV (RIFF) decode/encode (no librosa in this container).

Makes audio columns real for the most common interchange formats: 8/16/32-bit
integer PCM, 32-bit float, and IMA ADPCM (fmt 0x11 — the classic 4:1
compressed WAV, decoded per-block from the public IMA spec). Perceptual
codecs (MP3/AAC/opus) genuinely need external libraries and stay gated in
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
    rate, ch, _fmt, _bits, _align, n_frames, _off, _size = info
    return rate, ch, int(n_frames * 1000 / rate) if rate else 0


def _chunks(data: bytes):
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    rate = ch = fmt = bits = align = None
    data_off = data_size = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if cid == b"fmt ":
            fmt, ch, rate = struct.unpack("<HHI", data[body : body + 8])
            (align,) = struct.unpack("<H", data[body + 12 : body + 14])
            (bits,) = struct.unpack("<H", data[body + 14 : body + 16])
        elif cid == b"data":
            data_off, data_size = body, min(size, len(data) - body)
        pos = body + size + (size & 1)  # chunks are word-aligned
    if rate is None or data_off is None:
        return None
    if fmt == 17 and align and ch:
        # IMA ADPCM: samples/block = 1 (header predictor) + 2 nibbles/byte
        spb = (align - 4 * ch) * 2 // ch + 1
        n_frames = (data_size // align) * spb
    else:
        frame_bytes = (bits // 8) * ch if bits and ch else 1
        n_frames = data_size // frame_bytes if frame_bytes else 0
    return rate, ch, fmt, bits, align, n_frames, data_off, data_size


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, float64 array [frames, channels] in [-1, 1])."""
    info = _chunks(data)
    if info is None:
        raise ValueError("not a RIFF/WAVE file")
    rate, ch, fmt, bits, align, n_frames, off, size = info
    if fmt == 17:
        return rate, _decode_ima_adpcm(data[off : off + size], ch, align)
    dtype = _FMT_DTYPES.get((fmt, bits))
    if dtype is None:
        raise NotImplementedError(
            f"wav_lite handles PCM 8/16/32-bit, float32, and IMA ADPCM "
            f"(got fmt={fmt}, bits={bits}; perceptual codecs need ffmpeg/librosa)"
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


# --- IMA ADPCM (fmt 0x11) -----------------------------------------------------------

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _ima_block_mono(block: bytes) -> list[int]:
    """One channel's samples from one mono-channel IMA block body."""
    sample = struct.unpack("<h", block[0:2])[0]
    index = min(max(block[2], 0), 88)
    out = [sample]
    for byte in block[4:]:
        for nib in (byte & 0x0F, byte >> 4):
            step = _IMA_STEPS[index]
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            sample = sample - diff if nib & 8 else sample + diff
            sample = max(-32768, min(32767, sample))
            index = max(0, min(88, index + _IMA_INDEX[nib]))
            out.append(sample)
    return out


def _decode_ima_adpcm(body: bytes, ch: int, align: int) -> np.ndarray:
    """IMA ADPCM data chunk -> float64 [frames, channels] in [-1, 1].

    Block layout per the public IMA/DVI spec: per channel a 4-byte header
    (int16 predictor, uint8 step index, reserved), then channel data
    interleaved in 4-byte groups (8 nibbles per channel per group)."""
    frames: list[np.ndarray] = []
    for boff in range(0, len(body) - align + 1, align):
        block = body[boff : boff + align]
        if ch == 1:
            frames.append(np.asarray(_ima_block_mono(block), dtype=np.float64))
            continue
        # de-interleave the 4-byte channel groups into per-channel streams
        per = [bytearray(block[4 * c : 4 * c + 4]) for c in range(ch)]
        data = block[4 * ch :]
        for g in range(0, len(data), 4 * ch):
            for c in range(ch):
                per[c] += data[g + 4 * c : g + 4 * c + 4]
        cols = [np.asarray(_ima_block_mono(bytes(p)), dtype=np.float64) for p in per]
        frames.append(np.stack(cols, axis=1).reshape(-1, ch) if ch > 1 else cols[0])
    x = np.concatenate(frames) if frames else np.zeros((0,))
    if x.ndim == 1:
        x = x[:, None]
    return x / 32768.0


def encode_wav_ima_adpcm(samples: np.ndarray, rate: int = 16_000,
                         samples_per_block: int = 505) -> bytes:
    """Mono float [-1,1] -> IMA ADPCM WAV (fmt 0x11) — the spec's mirror
    encoder, used to synthesize test fixtures without external tools."""
    x = np.clip(np.asarray(samples, dtype=np.float64) * 32767.0, -32768, 32767)
    pcm = x.astype(np.int64)
    align = 4 + (samples_per_block - 1) // 2
    blocks = bytearray()
    pos = 0
    index = 0
    while pos < len(pcm):
        chunk = pcm[pos : pos + samples_per_block]
        pos += samples_per_block
        predictor = int(chunk[0])
        blocks += struct.pack("<hBB", predictor, index, 0)
        sample = predictor
        nibs = []
        for target in chunk[1:]:
            step = _IMA_STEPS[index]
            diff = int(target) - sample
            nib = 8 if diff < 0 else 0
            diff = abs(diff)
            d = step >> 3
            if diff >= step:
                nib |= 4
                diff -= step
                d += step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
                d += step >> 1
            if diff >= step >> 2:
                nib |= 1
                d += step >> 2
            sample = sample - d if nib & 8 else sample + d
            sample = max(-32768, min(32767, sample))
            index = max(0, min(88, index + _IMA_INDEX[nib]))
            nibs.append(nib)
        if len(nibs) % 2:
            nibs.append(0)
        for lo, hi in zip(nibs[0::2], nibs[1::2]):
            blocks.append(lo | (hi << 4))
        pad = align - 4 - len(nibs) // 2
        blocks += b"\x00" * max(pad, 0)
    fmt = struct.pack(
        "<HHIIHHHH", 17, 1, rate, rate * align // samples_per_block, align, 4,
        2, samples_per_block,
    )
    out = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    return b"RIFF" + struct.pack("<I", len(out)) + out
