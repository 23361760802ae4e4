"""WAV (RIFF/WAVE) audio codec — pure struct/numpy.

Implements the public RIFF WAVE format: PCM integer (8/16/24/32-bit)
and IEEE float (32/64-bit) sample formats, mono/stereo/N-channel
interleaved, fmt/data chunk walk tolerant of extra chunks (LIST, fact,
cue). This is the real decoder behind the multimodal audio stage's
``backend="real"`` (stages/multimodal.py) — the reference ingests
audio sidecars through GDAL-adjacent tooling, not GDAL itself, so the
contract here is simply faithful PCM decode.

Normalization: integer PCM decodes to float64 in [-1, 1) by dividing
by 2^(bits-1) (8-bit is unsigned, offset by 128); floats pass through.
Encode is the exact inverse, so int16 roundtrips are bit-exact.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_wav", "encode_wav"]

_WAVE_FORMAT_PCM = 1
_WAVE_FORMAT_IEEE_FLOAT = 3
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def decode_wav(buf: bytes):
    """WAV bytes → (pcm float64 array (n_samples, n_channels),
    sample_rate)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    n = len(buf)
    while pos + 8 <= n:
        cid = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)          # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    (tag, ch, sr, _br, _ba, bits) = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag == _WAVE_FORMAT_EXTENSIBLE and len(fmt) >= 26:
        (tag,) = struct.unpack_from("<H", fmt, 24)   # SubFormat GUID head
    if ch < 1:
        raise ValueError("WAV with zero channels")
    if tag == _WAVE_FORMAT_PCM:
        if bits == 8:
            pcm = (np.frombuffer(data, np.uint8).astype(np.float64)
                   - 128.0) / 128.0
        elif bits == 16:
            pcm = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, np.uint8)
            raw = raw[:len(raw) - len(raw) % 3].reshape(-1, 3)
            v = (raw[:, 0].astype(np.int32)
                 | (raw[:, 1].astype(np.int32) << 8)
                 | (raw[:, 2].astype(np.int32) << 16))
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            pcm = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            pcm = np.frombuffer(data, "<i4").astype(np.float64) \
                / float(1 << 31)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif tag == _WAVE_FORMAT_IEEE_FLOAT:
        pcm = np.frombuffer(data, "<f4" if bits == 32 else "<f8") \
            .astype(np.float64)
    else:
        raise ValueError(f"unsupported WAV format tag {tag}")
    pcm = pcm[:len(pcm) - len(pcm) % ch]
    return pcm.reshape(-1, ch), int(sr)


def encode_wav(pcm: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """float64 (n[, ch]) in [-1, 1] → WAV bytes (PCM int or IEEE
    float32 when bits == 32f semantics: pass bits=32 for int32,
    bits=-32 for float32)."""
    a = np.asarray(pcm, np.float64)
    if a.ndim == 1:
        a = a[:, None]
    ch = a.shape[1]
    flat = a.reshape(-1)
    if bits == 8:
        raw = (np.clip(np.round(flat * 128.0 + 128.0), 0, 255)
               .astype(np.uint8)).tobytes()
        tag, ba = _WAVE_FORMAT_PCM, ch
    elif bits == 16:
        raw = np.clip(np.round(flat * 32768.0), -32768, 32767) \
            .astype("<i2").tobytes()
        tag, ba = _WAVE_FORMAT_PCM, 2 * ch
    elif bits == 24:
        v = np.clip(np.round(flat * float(1 << 23)),
                    -(1 << 23), (1 << 23) - 1).astype(np.int64)
        v = np.where(v < 0, v + (1 << 24), v).astype(np.uint32)
        raw = np.stack([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF],
                       axis=1).astype(np.uint8).tobytes()
        tag, ba = _WAVE_FORMAT_PCM, 3 * ch
    elif bits == 32:
        raw = np.clip(np.round(flat * float(1 << 31)),
                      -(1 << 31), (1 << 31) - 1).astype("<i4").tobytes()
        tag, ba = _WAVE_FORMAT_PCM, 4 * ch
    elif bits == -32:
        raw = flat.astype("<f4").tobytes()
        tag, ba, bits = _WAVE_FORMAT_IEEE_FLOAT, 4 * ch, 32
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    fmt = struct.pack("<HHIIHH", tag, ch, sample_rate,
                      sample_rate * ba, ba, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body
